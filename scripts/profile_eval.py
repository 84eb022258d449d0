#!/usr/bin/env python
"""Profile the default extraction cascade over the reference eval corpus.

Single-core cProfile over N pages (default: all 923) with default
options (fast=False, with_metadata=True) — the exact per-row work the
distributed mapInPandas stage does.  Prints cumulative and tottime top
tables plus pages/s.  Use to pick hot-path targets; not a benchmark
(run bench.py for recorded numbers).
"""

import cProfile
import io
import pathlib
import pstats
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from trafilatura_spark.core import bare_extraction  # noqa: E402
from trafilatura_spark.settings import Options  # noqa: E402
from trafilatura_spark.sources.loading import decode_file  # noqa: E402

EVAL = pathlib.Path("/root/reference/test/eval")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9
    pages = [(p.name, decode_file(p.read_bytes()))
             for p in sorted(EVAL.glob("*.html"))[:n]]
    opts = Options(with_metadata=True)

    def run():
        for name, html in pages:
            bare_extraction(html, opts, doc_id=name)

    run()  # warm caches the way a long-lived worker would
    t0 = time.perf_counter()
    prof = cProfile.Profile()
    prof.runcall(run)
    dt = time.perf_counter() - t0
    print(f"{len(pages)} pages in {dt:.1f}s = {len(pages)/dt:.1f} pages/s "
          "(profiler overhead included)")
    for key in ("cumulative", "tottime"):
        buf = io.StringIO()
        pstats.Stats(prof, stream=buf).sort_stats(key).print_stats(30)
        print(f"\n==== top by {key} ====")
        print("\n".join(buf.getvalue().splitlines()[4:40]))


if __name__ == "__main__":
    main()
