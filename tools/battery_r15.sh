#!/bin/bash
# Round-15 closing battery: alternating control/HEAD full bench runs.
#
# Control = round-start commit f7a1691 in a worktree, but BOTH arms run
# the HEAD bench.py harness (timing methodology identical; HEAD's only
# bench change is five additive EXTENDED entries + DUCKDB_SKIP, so the
# shared harness gives the round's targets q36/q50/q52/q56/q61 a
# control-arm number too — the round-start tree's own bench would not
# time them at all).  Serialized runs, one pair per iteration, JSONs
# committed as BENCH_r15opt_{control,head}_{i}.json.
set -u
REPO=/root/repo
CTRL=/tmp/repo_r15start
N=${1:-5}
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}

cp "$REPO/bench.py" "$CTRL/bench.py.r15harness"

for i in $(seq 1 "$N"); do
  echo "=== pair $i control ($(date +%T), loadavg $(cut -d' ' -f1 /proc/loadavg)) ==="
  (cd "$CTRL" && cp bench.py.r15harness bench.py \
     && python bench.py 2>/tmp/battery_ctrl_${i}.err | tail -1 \
        > "$REPO/BENCH_r15opt_control_${i}.json")
  echo "=== pair $i head ($(date +%T), loadavg $(cut -d' ' -f1 /proc/loadavg)) ==="
  (cd "$REPO" && python bench.py 2>/tmp/battery_head_${i}.err | tail -1 \
        > "$REPO/BENCH_r15opt_head_${i}.json")
done
echo "battery done"
