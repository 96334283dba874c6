#!/bin/bash
# Round-5 chip queue (docs/BACKLOG.md order): run the driver bench first,
# then every queued experiment, sequentially (ONE process may hold the
# TPU), each bounded and logged.  Results need interpretation afterwards
# (land/revert per the measure-then-land rule) — the experiments only
# MEASURE; none mutates production code.
#
# Usage: bash benchmarks/run_chip_queue.sh [outdir]
set -u
cd /root/repo
OUT=${1:-/tmp/chip_queue_r5}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout -k 10 "$tmo" "$@" >"$OUT/$name.log" 2>&1
  rc=$?
  echo "    rc=$rc  tail:"
  tail -n 6 "$OUT/$name.log" | sed 's/^/    /'
  # a wedged client needs ~1-2 min to release the device handle
  [ $rc -ne 0 ] && sleep 90
}

run bench           1200 python bench.py
run table_stack     1500 python benchmarks/expt_table_stack.py
run boundary2l      1500 python benchmarks/expt_boundary2l.py
run serving         2400 python benchmarks/serving_bench.py
run place_wide      1800 python benchmarks/expt_place_wide.py
run emit_wide       1800 python benchmarks/expt_emit_wide.py
run h2d_chunks      1500 python benchmarks/expt_h2d_chunks.py
run device_stream   2400 python benchmarks/device_stream_bench.py
echo "=== queue done ($(date +%H:%M:%S)); logs in $OUT ==="
