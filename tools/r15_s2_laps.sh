#!/bin/bash
# Round-15 session-2 campaign: adjudicate the Bloom participant stagings
# for exact dedup and keep-best with DedupLap (within-window interleaved
# laps — the CandsLap protocol), at 11.32 GB first, then 23.01 GB if the
# 11.32 result and disk allow. Corpora must exist (GENONLY).
set -u
cd /root/repo
log() { echo "[r15s2 $(date +%H:%M:%S)] $*"; }
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
run_one deduplap_9.5 timeout 7200 sbt -batch "runMain graft.tools.DedupLap 9.5 2"
log "r15s2 laps done"
