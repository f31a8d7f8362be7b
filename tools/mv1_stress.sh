#!/usr/bin/env bash
# Driver-shaped stress repro for the mv1_incremental_agg gate row.
#
# The driver's CORRECTNESS artifact has had mv1 red (rows/schema match,
# hash mismatch) two rounds running while every local run passes. This
# script reproduces the driver's exact run shape — fresh JVM per pass,
# graft.Verify's 4-thread pool, mv1 interleaved with its lake-table
# neighbors (lk2 shares the update-set derivation; dv1/dv2 race the
# LakeSql DmlModeConf on the shared session; cd1/lk3/lk5/lk8 exercise
# the same merge/delete/change-feed machinery) — across varied
# SPARK_GRAFT_CPUS, then grades every pass with the local DuckDB oracle
# replica. Usage: tools/mv1_stress.sh [passes-per-cpu-setting]
set -u
cd "$(dirname "$0")/.."
REPS="${1:-2}"
SF=/root/testdata/sf0.01
JAR=target/scala-2.13/datalake_publicspark_2.13-0.1.0.jar
CP="$JAR:/opt/spark/jars/*"
OPTS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC
  -Xmx8g
)
QUERIES="mv1_incremental_agg,lk2_merge_upsert,dv1_mor_delete,dv2_mor_update,cd1_change_feed,lk3_delete_where,lk5_sql_dml,lk8_sql_update"
fails=0
total=0
for cpus in 4 8 16 32; do
  for rep in $(seq 1 "$REPS"); do
    out=$(mktemp -d /tmp/mv1stress.XXXXXX)
    total=$((total + 1))
    SPARK_GRAFT_CPUS=$cpus SPARK_GRAFT_VERIFY_ONLY="$QUERIES" \
      java "${OPTS[@]}" -cp "$CP" graft.Verify "$SF" "$out" \
      >"$out/verify.log" 2>&1
    rc=$?
    if [ $rc -ne 0 ]; then
      echo "cpus=$cpus rep=$rep: VERIFY EXIT $rc (log: $out/verify.log)"
      fails=$((fails + 1))
      continue
    fi
    line=$(python3 tools/check_oracle.py "$SF" "$out" 2>&1 |
      grep mv1_incremental_agg)
    echo "cpus=$cpus rep=$rep: $line"
    case "$line" in
      PASS*) rm -rf "$out" ;;
      *) fails=$((fails + 1))
         echo "  diagnostic kept at $out/mv1_diagnostic.json" ;;
    esac
  done
done
echo "---"
echo "$((total - fails))/$total passes green"
exit $((fails > 0))
