#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (north-rule run mode).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/databridge_spark.zip
python - <<'EOF'
import os, zipfile
pkg = "cityofphiladelphia_databridge_etl_tools_spark"
with zipfile.ZipFile("dist/databridge_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("wrote dist/databridge_spark.zip")
EOF
