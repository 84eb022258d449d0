#!/usr/bin/env python
"""Interleaved same-process A/B: HEAD readability scorer vs the
incremental-metrics rewrite, over the reference cache corpus (110 live
pages).  Each arm runs ReadabilityDocument(copy).summary() per page;
arms alternate A/B/B/A per rep pair to cancel drift.  Prints per-arm
median ms/doc and the ratio.  Not a recorded benchmark (bench.py is)."""

import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from trafilatura_spark.core import load_html  # noqa: E402
from trafilatura_spark.sources.loading import decode_file  # noqa: E402
from trafilatura_spark.operators import readability as new_mod  # noqa: E402
from trafilatura_spark.operators import _readability_old as old_mod  # noqa: E402

import os  # noqa: E402

CACHE = pathlib.Path(os.environ.get("AB_CORPUS", "/root/reference/test/cache"))
LIMIT = int(os.environ.get("AB_LIMIT", "10000"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    trees = []
    for p in sorted(CACHE.glob("*.html"))[:LIMIT]:
        t = load_html(decode_file(p.read_bytes()))
        if t is not None:
            trees.append(t)
    print(f"{len(trees)} pages parsed")

    def run(mod):
        t0 = time.perf_counter()
        for tree in trees:
            mod.ReadabilityDocument(tree.copy(), min_text_length=25,
                                    retry_length=250).summary()
        return (time.perf_counter() - t0) * 1000 / len(trees)

    # warm both
    run(old_mod), run(new_mod)
    old_ms, new_ms = [], []
    for i in range(reps):
        order = [("old", old_mod), ("new", new_mod)]
        if i % 2:
            order.reverse()
        for name, mod in order:
            (old_ms if name == "old" else new_ms).append(run(mod))
    om, nm = statistics.median(old_ms), statistics.median(new_ms)
    print(f"old: {om:.3f} ms/doc  (all: {[f'{x:.2f}' for x in old_ms]})")
    print(f"new: {nm:.3f} ms/doc  (all: {[f'{x:.2f}' for x in new_ms]})")
    print(f"ratio new/old: {nm/om:.3f}  ({(1-nm/om)*100:+.1f}% change, "
          f"negative=regression)")


if __name__ == "__main__":
    main()
