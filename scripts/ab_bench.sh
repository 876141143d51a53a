#!/bin/bash
# Alternating A/B bench runner for optimization rounds: runs graft.Bench
# on two pre-built class trees B,A,B,A,... in ONE host window, so host
# drift hits both arms equally. Usage:
#   scripts/ab_bench.sh <classesA> <classesB> <rounds> <out_prefix> [query...]
# Emits <out_prefix>_A.jsonl / _B.jsonl (one summary JSON line per run).
A="$1"; B="$2"; N="$3"; OUT="$4"; shift 4
SPARKCP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
run() {
  local CP="$1:$SPARKCP"; shift
  java \
   --add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
   --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED \
   --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED \
   --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
   --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
   --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
   --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
   -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx${JMEM:-16g} \
   -cp "$CP" graft.Bench "$@" 2>/dev/null | grep '"metric"'
  # grep exits 1 when the arm crashed before printing its summary line
  # (OOM, bad classpath) — surface it instead of silently emitting an
  # empty/short side of the comparison
  local rc=${PIPESTATUS[1]}
  if [ "$rc" -ne 0 ]; then echo "ab_bench: arm produced no summary line (cp=$1)" >&2; fi
}
: > "${OUT}_A.jsonl"; : > "${OUT}_B.jsonl"
for i in $(seq 1 "$N"); do
  run "$B" "$@" >> "${OUT}_B.jsonl"
  run "$A" "$@" >> "${OUT}_A.jsonl"
done
na=$(wc -l < "${OUT}_A.jsonl"); nb=$(wc -l < "${OUT}_B.jsonl")
if [ "$na" -ne "$N" ] || [ "$nb" -ne "$N" ]; then
  echo "ab_bench: WARNING expected $N lines per arm, got A=$na B=$nb" >&2
fi
