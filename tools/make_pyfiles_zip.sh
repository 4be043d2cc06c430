#!/bin/sh
# Package the engine for spark-submit --py-files (north-rule deployment path):
#   tools/make_pyfiles_zip.sh
#   spark-submit --master <cluster> --py-files aqueduct_core_spark.zip \
#       run_ingest.py --log ... --table ... --checkpoint ...
set -e
cd "$(dirname "$0")/.."
rm -f aqueduct_core_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("aqueduct_core_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, dirs, files in os.walk("aqueduct_core_spark"):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote aqueduct_core_spark.zip")
EOF
