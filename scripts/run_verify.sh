#!/bin/bash
# Local dev loop: run graft.Verify directly on the exported classpath
# (bypasses sbt startup). Usage: scripts/run_verify.sh [sfDir] [outDir]
set -e
cd /root/repo
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}; shift 2 2>/dev/null || shift $# 
# classpath cache lives OUTSIDE the repo (keeps leak scans clean); rebuild
# with: sbt "export Runtime/fullClasspath" | grep '^/' | tail -1 > /tmp/graft_classpath.txt
if [ ! -f /tmp/graft_classpath.txt ]; then
  sbt -batch "export Runtime/fullClasspath" 2>/dev/null | grep -E '^/' | tail -1 > /tmp/graft_classpath.txt
fi
CP=$(cat /tmp/graft_classpath.txt)
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Verify "$SF" "$OUT" "$@"
