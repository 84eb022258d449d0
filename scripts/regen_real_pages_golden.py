#!/usr/bin/env python
"""Regenerate tests/fixtures/real_pages_spans.parquet: the full span
table of the reference's test/cache corpus (110 real-world pages)
through the default-option extraction cascade — the DuckDB oracle for
the `extract_real_pages` CORRECTNESS query.

Cross-checks every page's span digest against the pytest manifest
tests/fixtures/cache_golden.json before writing, so the oracle parquet
can never drift from the golden the parity tests pin.

Run after INTENTIONAL extraction-behavior changes (after
scripts/regen_cache_golden.py)."""

import hashlib
import json
import pathlib
import sys

import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from trafilatura_spark.core import bare_extraction  # noqa: E402
from trafilatura_spark.settings import Options  # noqa: E402
from trafilatura_spark.sources.loading import decode_file  # noqa: E402

FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main() -> None:
    cache = pathlib.Path("/root/reference/test/cache")
    golden = json.loads((FIXTURES / "cache_golden.json").read_text())
    opts = Options(with_metadata=True)
    rows = []
    for page in sorted(cache.glob("*.html")):
        res = bare_extraction(decode_file(page.read_bytes()), opts,
                              doc_id=page.name)
        payload = json.dumps(
            [[s["kind"], s["text"], s["media_ref"]] for s in res.spans],
            ensure_ascii=False)
        digest = hashlib.md5(payload.encode()).hexdigest()
        want = golden.get(page.name)
        assert want is not None, f"{page.name} missing from cache_golden.json"
        assert digest == want["digest"], \
            f"{page.name}: span digest drifted from cache_golden.json — " \
            "run scripts/regen_cache_golden.py first and review the diff"
        if res.spans:
            for s in res.spans:
                rows.append((page.name, res.status, res.tier,
                             int(s["offset"]), s["kind"], s["text"],
                             s["media_ref"]))
        else:
            # empty docs keep one sentinel row so status/tier stay gated
            # (matches the query's explode_outer + coalesce shape)
            rows.append((page.name, res.status, res.tier, -1, "", "", ""))
    df = pd.DataFrame(rows, columns=["page", "status", "tier", "offset",
                                     "kind", "text", "media_ref"])
    out = FIXTURES / "real_pages_spans.parquet"
    df.to_parquet(out, index=False)
    print(f"wrote {out} ({df['page'].nunique()} pages, {len(df)} rows)")


if __name__ == "__main__":
    main()
