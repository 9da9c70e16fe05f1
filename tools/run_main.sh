#!/bin/bash
# Run a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (so long stress/verify runs don't hold the sbt lock).
# Usage: tools/run_main.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), plus whatever the main reads.
set -euo pipefail
[ $# -ge 1 ] || { echo "usage: tools/run_main.sh <mainClass> [args...]" >&2; exit 2; }
CLASS="$1"; shift
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# Test-scoped mains (ProbeMain, PlanAudit) need test-classes and the
# scalatest/scalacheck jars; append them when they exist so those work
# too, not just src/main mains.
TESTCP=""
if [ -d "$REPO/target/scala-2.13/test-classes" ]; then
  TESTCP=":$REPO/target/scala-2.13/test-classes"
  while IFS= read -r jar; do TESTCP="$TESTCP:$jar"; done < <(
    find "$HOME/.cache/coursier" -name '*.jar' 2>/dev/null \
      | grep -E '/(scalatest|scalactic|scalacheck)[^/]*\.jar$' || true)
fi
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
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*$TESTCP" \
  "$CLASS" "$@"
