#!/bin/sh
# Package the engine for spark-submit --py-files.
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/clara_ocr_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/clara_ocr_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("clara_ocr_spark"):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/clara_ocr_spark.zip")
EOF
