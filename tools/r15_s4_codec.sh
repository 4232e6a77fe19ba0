#!/bin/bash
# Round-15 session-4 campaign: the codec levers (guide §2.3/§6) the round
# had not yet measured. (1) parquet OUTPUT codec — within-JVM interleaved
# write laps (IoLap, kinds=write, 3 reps); (2) shuffle/spill/RDD-SER
# io codec lz4-vs-zstd — SparkContext-static, so adjudicated by PAIRED
# canary-gated DataPipelineBench legs, ABAB, distinct tags per leg.
# Corpus must exist (GENONLY). Serial sbt: one invocation at a time.
set -u
cd /root/repo
log() { echo "[r15s4 $(date +%H:%M:%S)] $*"; }
wait_clean() {
  mkdir -p /tmp/cgate
  [ -f /tmp/cgate/CanaryGate.class ] || javac tools/CanaryGate.java -d /tmp/cgate
  local deadline=$((SECONDS + 1800))
  until java -cp /tmp/cgate CanaryGate 0.46 0.22; do
    if [ $SECONDS -ge $deadline ]; then
      log "WARN: clean-window deadline passed; proceeding into a dirty window"
      return
    fi
    sleep 45
  done
}
run_one() {
  local label="$1"; shift
  log "start $label"
  sync; sleep 15
  wait_clean
  env SPARK_DRIVER_MEM=64g "$@" > "/tmp/${label}.log" 2>&1
  log "done $label rc=$? $(df -h / | tail -1 | awk '{print $4" free"}')"
}
run_one iolap_write env SPARK_GRAFT_IOLAP_KINDS=write SPARK_GRAFT_BENCH_TAG=write \
  timeout 3600 sbt -batch "runMain graft.tools.IoLap 9.5 3"
run_one r15lz4_a env SPARK_GRAFT_BENCH_TAG=r15lz4a \
  timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench 9.5"
run_one r15zio_a env SPARK_GRAFT_BENCH_TAG=r15zioa \
  SPARK_GRAFT_CONF="spark.io.compression.codec=zstd" \
  timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench 9.5"
run_one r15lz4_b env SPARK_GRAFT_BENCH_TAG=r15lz4b \
  timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench 9.5"
run_one r15zio_b env SPARK_GRAFT_BENCH_TAG=r15ziob \
  SPARK_GRAFT_CONF="spark.io.compression.codec=zstd" \
  timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench 9.5"
log "r15s4 codec campaign done"
