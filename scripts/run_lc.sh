#!/bin/bash
# Scaling-efficiency run: N vs 4N executors via local-cluster (separate
# executor JVMs — single-JVM local[32] hits kernel mm-lock contention on
# this VM and measures garbage).
#   $1 = executors, $2 = cores/exec, $3 = n docs (default 1M), $4 = MB/exec
# GC threads are pinned to the executor's core count: 8 executor JVMs each
# defaulting to ~23 ParallelGC threads oversubscribe a 32-core host and
# serialize the allocation-heavy tokenize stage.
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
EXECS=$1; CORES=$2; N=${3:-1000000}; MEM=${4:-8192}
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
mkdir -p /dev/shm/graft_tmp /dev/shm/spark_local
rm -rf /dev/shm/graft_tmp/graft_scale_idx_* /dev/shm/spark_local/*
TOTAL=$((EXECS*CORES))
# local-cluster[n,cores,mem] sizes the WORKER; executors default to 1 GiB
# unless spark.executor.memory is set explicitly — set it, and cap direct
# memory (an uncapped executor was kernel-OOM-killed at 77 GB anon RSS);
# jdk.nio.maxCachedBufferSize stops per-thread temp direct buffers from
# pinning the whole 2g cap on large parquet reads (1-exec query phase).
EXECMEM=$((MEM-2048))
SPARK_GRAFT_CPUS=$TOTAL SPARK_GRAFT_MASTER="local-cluster[$EXECS,$CORES,$MEM]" \
java $OPENS -Xms4g -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.executor.memory=${EXECMEM}m \
  -Djava.io.tmpdir=/dev/shm/graft_tmp -Dspark.local.dir=/dev/shm/spark_local \
  -Dspark.executor.extraClassPath=/root/repo/target/scala-2.13/classes \
  -Dspark.executor.extraJavaOptions="$OPENS -XX:+UseParallelGC -XX:ParallelGCThreads=$CORES -XX:MaxDirectMemorySize=2g -Djdk.nio.maxCachedBufferSize=1048576 -Djava.io.tmpdir=/dev/shm/graft_tmp" \
  -cp "$CP" graft.tools.ScalingBench $N 2>&1 | grep -aE '"bench"|ERROR TaskSetManager|OutOfMemory|Exception in thread "main"' | head -20
