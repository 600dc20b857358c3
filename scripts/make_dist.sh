#!/bin/sh
# Package the library for spark-submit --py-files (BASELINE.json north rule).
set -eu
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/twitter_crawler_spark.zip
python - <<'EOF'
import os, zipfile
with zipfile.ZipFile("dist/twitter_crawler_spark.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for root, _dirs, files in os.walk("twitter_crawler_spark"):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, p)
print("dist/twitter_crawler_spark.zip")
EOF
