#!/usr/bin/env bash
# spark-submit launcher (the north-rule launch mode).
# Usage: scripts/submit.sh <pages.parquet> <workdir> [master] [extra args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PAGES="${1:?pages parquet path}"
WORKDIR="${2:?workdir path}"
MASTER="${3:-local[32]}"
shift $(( $# < 3 ? 2 : 3 ))
ZIP="$(mktemp -d)/sift_kg_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" sift_kg_spark)
exec spark-submit --master "$MASTER" --py-files "$ZIP" \
  "$REPO/scripts/run_pipeline.py" --pages "$PAGES" --workdir "$WORKDIR" "$@"
