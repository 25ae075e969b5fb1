#!/bin/bash
# spark-submit launcher for the scaling job (north-rule form: the build+query
# job submitted as an application jar to a multi-executor master).
#
# Same configuration as scripts/run_lc.sh (which drives the identical main
# through a bare JVM for the timed matrix); this script is the evidence that
# the job runs via spark-submit against a local-cluster master with separate
# executor JVMs. Requires `sbt -batch package` first (application jar).
#   $1 = executors, $2 = cores/exec, $3 = n docs (default 1M), $4 = MB/exec
set -e
EXECS=$1; CORES=$2; N=${3:-1000000}; MEM=${4:-8192}
JAR=$(ls /root/repo/target/scala-2.13/bm25spark*.jar 2>/dev/null || ls /root/repo/target/scala-2.13/*_2.13-*.jar | head -1)
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
mkdir -p /dev/shm/graft_tmp /dev/shm/spark_local
rm -rf /dev/shm/graft_tmp/graft_scale_idx_* /dev/shm/spark_local/*
EXECMEM=$((MEM-2048))
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED"
SPARK_GRAFT_CPUS=$((EXECS*CORES)) \
/opt/spark/bin/spark-submit \
  --master "local-cluster[$EXECS,$CORES,$MEM]" \
  --class graft.tools.ScalingBench \
  --driver-memory 8g \
  --conf spark.ui.enabled=false \
  --conf spark.executor.memory=${EXECMEM}m \
  --conf spark.local.dir=/dev/shm/spark_local \
  --conf spark.driver.extraJavaOptions="-Djava.io.tmpdir=/dev/shm/graft_tmp" \
  --conf spark.executor.extraJavaOptions="$OPENS -XX:+UseParallelGC -XX:ParallelGCThreads=$CORES -XX:MaxDirectMemorySize=2g -Djdk.nio.maxCachedBufferSize=1048576 -Djava.io.tmpdir=/dev/shm/graft_tmp" \
  "$JAR" "$N" 2>&1 | grep -aE '"bench"|ERROR TaskSetManager|OutOfMemory|Exception in thread "main"' | head -20
