#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (so long stress/verify runs don't hold the sbt lock).
# Usage: tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads.
set -euo pipefail
CLASS="$1"; shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
ARGS=()
for p in "${OPENS[@]}"; do ARGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ARGS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
exec java "${ARGS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLASS" "$@"
