#!/bin/bash
# Quiet-window-gated 8->32 scaling probe (see BENCH/BASELINE.md measurement
# policy).  Gates on the pure-CPU burn speedup 8->32 measured twice, 20s
# apart, both >= $GATE (default 3.0 aggregate = 0.75 efficiency); on a pass
# runs the engine pair at sf0.3 and preserves the output as a new raw-record
# file so the committed per-run records are never clobbered.
set -u
cd /root/repo
GATE="${GATE:-3.0}"
SUFFIX="${SUFFIX:-r3e}"
probe() {
  python -c "
import sys; sys.path.insert(0,'/root/repo/tools'); sys.path.insert(0,'/root/repo')
from bench_scaling import hardware_ceiling
b = hardware_ceiling([8, 32]); print(round(b[32]/b[8], 3))"
}
for i in $(seq 1 30); do
  s1=$(probe); sleep 20; s2=$(probe)
  echo "probe attempt $i: burn speedup $s1 / $s2 (gate $GATE)"
  pass=$(python -c "print(1 if min($s1,$s2) >= $GATE else 0)")
  if [ "$pass" = "1" ]; then
    echo "quiet window at attempt $i — running engine pair"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.3 SPARK_GRAFT_SCALING_LEVELS=8,32 \
      SPARK_GRAFT_SCALING_REPEATS=1 python tools/bench_scaling.py
    rc=$?
    if [ -f BENCH/scaling_run_8_32.md ]; then
      if ! git diff --quiet -- BENCH/scaling_run_8_32.md; then
        mv BENCH/scaling_run_8_32.md "BENCH/scaling_run_8_32_${SUFFIX}.md"
        git checkout -- BENCH/scaling_run_8_32.md
      fi
    fi
    exit $rc
  fi
  sleep 90
done
echo "no quiet window found after 30 attempts"
exit 2
