#!/usr/bin/env bash
# Build dist/ulp_spark.zip for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/ulp_spark.zip
# -X drops timestamps/extra fields for a reproducible archive
find ulp_spark -name '__pycache__' -prune -o -name '*.py' -print | sort \
  | zip -X -q dist/ulp_spark.zip -@
echo "dist/ulp_spark.zip:"
unzip -l dist/ulp_spark.zip | tail -3
