#!/bin/bash
# Standalone ScaleRehearsal runner on a SNAPSHOTTED classpath: copies the
# compiled classes out of target/ first, so the long rehearsal can run in
# the background while sbt keeps compiling/testing (no target-dir lock, no
# mid-run class rewrites under the running JVM). JVM flags mirror
# build.sbt's run/javaOptions (JDK-17 add-opens + UTF-8 + driver memory).
#
# ONE JVM PER SCALE (round 14): growth curves must measure the code, not
# the harness's accumulated session state — running scales ascending in a
# single JVM accumulates localCheckpoint blocks and GC pressure, which
# inflated the 50x clustered build from its true 20.6 s to 41 s in the
# round-13 artifact. Each scale writes target/scale/reh_<s>.json; the
# per-scale rows merge into SCALING_REHEARSAL.json at the end.
#
# Env: SPARK_GRAFT_SCALES (default "1,2,5,10"), SPARK_GRAFT_SF_DIR,
#      SPARK_GRAFT_SCALE_RUNS, SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM.
set -e
cd "$(dirname "$0")/.."
SNAP=${GRAFT_CLASS_SNAP:-/tmp/graft_rehearsal_classes}
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_jvm() {
  java $OPENS \
    -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -Dfile.encoding=UTF-8 \
    -Dsun.jnu.encoding=UTF-8 \
    -Xmx"${SPARK_DRIVER_MEM:-48g}" \
    -cp "$SNAP:/opt/spark/jars/*" graft.ScaleRehearsal
}
SCALES="${SPARK_GRAFT_SCALES:-1,2,5,10}"
mkdir -p target/scale
OUTS=()
for s in ${SCALES//,/ }; do
  SPARK_GRAFT_SCALES="$s" SPARK_GRAFT_OUT="target/scale/reh_$s.json" run_jvm
  OUTS+=("target/scale/reh_$s.json")
done
python3 - "${OUTS[@]}" <<'EOF'
import json, sys
rows = []
for f in sys.argv[1:]:
    rows.extend(json.load(open(f)))
with open("SCALING_REHEARSAL.json", "w") as out:
    out.write("[" + ",\n".join(json.dumps(r, separators=(",", ":")) for r in rows) + "]\n")
EOF
