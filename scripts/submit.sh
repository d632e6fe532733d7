#!/usr/bin/env bash
# Package the engine and run the flagship pipeline via spark-submit
# --py-files (BASELINE.json north_rule deployment shape). Usage:
#
#   scripts/submit.sh [master] [n_pages]
#
# e.g. scripts/submit.sh "local[8]" 1000000
#      scripts/submit.sh spark://host:7077 1000000000   # real cluster
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local[8]}"
N_PAGES="${2:-1000000}"

ZIP=/tmp/upcp_spark_pyfiles.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('urban_pointcloud_processing_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('packaged', '$ZIP')
"

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=64 \
  scripts/submit_job.py "$N_PAGES"
