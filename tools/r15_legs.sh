#!/bin/bash
# Round-15 paired measurement campaign. Corpora must already be generated
# (in_9p50 / in_19p00 under target/dpbench) and settled: every leg below
# runs against an on-disk corpus in its own JVM (the settled-corpus
# protocol — see DataPipelineBench's GENONLY note).
#
# Legs (deterministic corpora => counts must be bit-identical across legs
# at the same scale; only stage wall-times may differ):
#   A  r15old @9.5 : legacy band sizing (session conf) + legacy keep-best
#                    (anti UNION semi) — the r14 shape, today's window
#   B  r15new @9.5 : band-key-sized repartition + single-anti keep-best
#   E  r15sv  @9.5 : leg B plus string-shingle verify (the hashed-verify
#                    paired witness: B vs E isolates verify staging)
#   C  r15new @19  : leg B's code at 2.03x data — the scaling ratio
#   D  r15old @19  : leg A's code at 2.03x data — the legacy ratio
set -u
cd /root/repo
log() { echo "[r15legs $(date +%H:%M:%S)] $*"; }
run_leg() {
  local name="$1"; shift
  local tgt="$1"; shift
  log "leg $name target=$tgt env: $*"
  sync; sleep 20
  env "$@" SPARK_GRAFT_BENCH_TAG="$name" SPARK_DRIVER_MEM=64g \
    timeout 3600 sbt -batch "runMain graft.tools.DataPipelineBench $tgt" \
    > "/tmp/dp_${name}_${tgt}.log" 2>&1
  local rc=$?
  log "leg $name rc=$rc $(df -h / | tail -1 | awk '{print $4" free"}')"
  grep '"metric":"pipeline"' "/tmp/dp_${name}_${tgt}.log" | tail -1
}
run_leg r15old 9.5 SPARK_GRAFT_DP_BAND_PARTS=conf SPARK_GRAFT_DP_KEEPBEST=union
run_leg r15new 9.5 SPARK_GRAFT_DUMMY=1
run_leg r15sv  9.5 SPARK_GRAFT_DP_VERIFY=string
run_leg r15new 19  SPARK_GRAFT_DUMMY=1
run_leg r15old 19  SPARK_GRAFT_DP_BAND_PARTS=conf SPARK_GRAFT_DP_KEEPBEST=union
log "campaign done"
