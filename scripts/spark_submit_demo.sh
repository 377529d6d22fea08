#!/usr/bin/env bash
# Demonstrates the north rule's run mode: the engine submitted with
# spark-submit --py-files (package zipped, no driver PYTHONPATH), building
# pages→triples through checkpointed stages. Re-running with the same
# OUT_DIR resumes from committed stages.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:-/tmp/pkt_submit_pages}"
OUT="${2:-/tmp/pkt_submit_out}"
ZIP=/tmp/pkt_spark_pkg.zip

if [ ! -e "$PAGES/_SUCCESS" ]; then
  python3 - "$PAGES" <<'PY'
import sys
sys.path.insert(0, "/root/repo")
from pheknowlator_spark.session import get_spark
from pheknowlator_spark.sources.pages import generate_pages
spark = get_spark(app_name="stage_pages", master="local[8]")
generate_pages(spark, 2000, partitions=8, size_factor=2).write.mode("overwrite").parquet(sys.argv[1])
spark.stop()
PY
fi

rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" pheknowlator_spark)

exec spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.ui.enabled=false \
  --py-files "$ZIP" \
  "$REPO/scripts/submit_pipeline.py" "$PAGES" "$OUT"
