#!/usr/bin/env bash
# Package the engine for spark-submit --py-files (pure Python, no native deps)
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f asf_tools_spark.zip
zip -qr asf_tools_spark.zip asf_tools_spark -x '*__pycache__*'
echo "wrote asf_tools_spark.zip ($(du -h asf_tools_spark.zip | cut -f1))"
echo "run: spark-submit --py-files asf_tools_spark.zip jobs/tile_assignment_job.py --help"
