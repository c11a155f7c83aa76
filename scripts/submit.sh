#!/usr/bin/env bash
# North-rule launch contract: spark-submit --py-files <package zip>.
#
#   scripts/submit.sh [master] [extra run_pipeline.py args...]
#
# Defaults to local[8]; on a real cluster pass e.g. yarn / spark://host:7077
# plus --num-executors etc. via SPARK_SUBMIT_OPTS.
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MASTER="${1:-local[8]}"
shift || true

ZIP="$(mktemp -d)/ebsj_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import os, sys, zipfile
zip_path = sys.argv[1]
with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk("entityblockingbysimilarityjoins_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print(zip_path)
EOF
)

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

exec "$SPARK_SUBMIT" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/run_pipeline.py" "$@"
