#!/bin/bash
# Round-close snapshot gate (r17 verdict #6): the 2-minute artifact-pin
# subset that MUST be green before the snapshot commit lands. The full
# 1000 s suite stays the hard bar (round chain step 8); this subset
# exists so there is no excuse at commit time even when the full suite
# is too slow mid-loop — it catches exactly the r16/r17 failure class
# (stale or unpaired committed artifacts) by name.
set -e
cd /root/repo
sbt -batch "testOnly graft.ScalingGateSpec graft.EntryContractSpec" \
  || { echo "SNAPSHOT GATE RED — fix or regenerate artifacts before committing"; exit 1; }
echo SNAPSHOT_GATE_GREEN
