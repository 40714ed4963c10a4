#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission (north rule: ship via
# spark-submit --py-files to a multi-executor cluster).
#
#   tools/make_pyfiles.sh            -> dist/genesis_spark.zip
#   spark-submit --py-files dist/genesis_spark.zip your_job.py
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/genesis_spark.zip
zip -qr dist/genesis_spark.zip genesis_spark -x '*__pycache__*'
echo "dist/genesis_spark.zip:"
unzip -l dist/genesis_spark.zip | tail -3
