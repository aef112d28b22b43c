#!/usr/bin/env bash
# spark-submit --py-files packaging demo (north-rule ship shape).
# Packages the library, submits main.py against a generated corpus,
# and prints the job's summary JSON. On a real cluster, swap --master.
set -euo pipefail
cd "$(dirname "$0")/.."
workdir="${1:-/tmp/logship_submit_demo}"
rm -rf "$workdir" job.zip
zip -qr job.zip log_ship_elastic_postfix_spark
spark-submit --master "local[8]" \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.ui.enabled=false \
    --py-files job.zip \
    main.py --generate 5000 --workdir "$workdir" --batches 2 \
    --now 2024-08-01T00:00:00
rm -f job.zip
