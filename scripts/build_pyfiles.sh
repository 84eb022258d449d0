#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit (north rule ships the job
# as `spark-submit --py-files trafilatura_spark.zip`).
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f trafilatura_spark.zip
python - <<'EOF'
import zipfile, pathlib
root = pathlib.Path(".")
with zipfile.ZipFile("trafilatura_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("trafilatura_spark/**/*.py")):
        z.write(p, p.as_posix())
    # the optional C-accelerator source rides along: workers compile it
    # once per host (cached by digest) and fall back to pure Python when
    # no toolchain is present (trafilatura_spark/chtml.py)
    for p in sorted(root.glob("trafilatura_spark/**/*.c")):
        z.write(p, p.as_posix())
print("wrote trafilatura_spark.zip")
EOF
