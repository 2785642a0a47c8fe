#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission:
#   scripts/package.sh && spark-submit --py-files dist/engine.zip jobs/replay.py ...
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip datax_spark -x '*__pycache__*'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -3
