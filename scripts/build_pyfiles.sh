#!/usr/bin/env bash
# Build the --py-files zip for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/epstein_pipeline_spark.zip
zip -qr dist/epstein_pipeline_spark.zip epstein_pipeline_spark -x '*__pycache__*'
echo "dist/epstein_pipeline_spark.zip"
