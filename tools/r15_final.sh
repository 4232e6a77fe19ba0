#!/bin/bash
# Round-15 final legs: the new pipeline defaults (cands=bh staging, anti
# keep-best, hashed verify, SER ckpts) at both scales, canary-gated
# starts, plus a 19-target CandsLap for the within-window scaling ratio.
set -u
cd /root/repo
log() { echo "[r15final $(date +%H:%M:%S)] $*"; }
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
run_one r15bh_9.5 env SPARK_GRAFT_BENCH_TAG=r15bh \
  timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench 9.5"
run_one r15bh_19 env SPARK_GRAFT_BENCH_TAG=r15bh \
  timeout 5400 sbt -batch "runMain graft.tools.DataPipelineBench 19"
run_one candslap_19 env SPARK_GRAFT_CANDSLAP_VARIANTS=conf,bh \
  timeout 7200 sbt -batch "runMain graft.tools.CandsLap 19 2"
log "r15final done"
