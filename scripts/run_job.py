#!/usr/bin/env python
"""spark-submit driver script:

    scripts/build_pyfiles.sh
    spark-submit --py-files trafilatura_spark.zip scripts/run_job.py \
        --input ... --output ... --progress ...
"""
import sys

from trafilatura_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
