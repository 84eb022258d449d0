#!/usr/bin/env python
"""Regenerate tests/fixtures/eval_golden.json: per-page md5 of the
extracted span sequence over the reference's full 923-page eval corpus
(status + tier + span digest only — the manifest stays small).

Run after INTENTIONAL extraction-behavior changes; the paired test
(tests/test_reference_parity.py::test_eval_corpus_golden_manifest)
fails on any unintentional drift."""

import hashlib
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from trafilatura_spark.core import bare_extraction  # noqa: E402
from trafilatura_spark.settings import Options  # noqa: E402
from trafilatura_spark.sources.loading import decode_file  # noqa: E402


def main() -> None:
    corpus = pathlib.Path("/root/reference/test/eval")
    opts = Options(with_metadata=True)
    manifest = {}
    for page in sorted(corpus.glob("*.html")):
        res = bare_extraction(decode_file(page.read_bytes()), opts,
                              doc_id=page.name)
        payload = json.dumps(
            [[s["kind"], s["text"], s["media_ref"]] for s in res.spans],
            ensure_ascii=False)
        manifest[page.name] = {
            "status": res.status,
            "tier": res.tier,
            "n_spans": len(res.spans),
            "digest": hashlib.md5(payload.encode()).hexdigest(),
        }
    out = pathlib.Path(__file__).resolve().parent.parent / "tests" / \
        "fixtures" / "eval_golden.json"
    out.write_text(json.dumps(manifest, indent=0, ensure_ascii=False,
                              sort_keys=True))
    print(f"wrote {out} ({len(manifest)} pages)")


if __name__ == "__main__":
    main()
