#!/bin/bash
# Round-4 session-3 TPU playbook: the remat-loss lever on config #4 (and #3).
#
# Motivation (PERF.md round-4 attribution): the hat G+D phases run 11.32 p/s
# at micro 8 vs the shipped 5.361 at micro 2 — MXU fill at larger micro is
# the remaining lever, blocked by HBM (un-rematted micro-4 needs 17.96G of
# 15.75G; full-backbone remat eats the gain: 4.771). remat_loss checkpoints
# ONLY the G-phase loss tail (D pair + VGG at 512^2) — cheap to recompute
# (D phase is 19% of the step), big to stash.
#
# Honest completion semantics (same as tpu_playbook_r04.sh): .DONE only on
# exit-0 with a log; .FAIL with the exit code; re-runs retry FAILs.
set -u
cd /root/repo
PB=/tmp/playbook_r04c
mkdir -p "$PB"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

run() { # run <name> <timeout-sec> <cmd...>
  local name=$1 tmo=$2; shift 2
  local log=$PB/$name.log
  [ -e "$PB/$name.DONE" ] && { echo "skip $name (DONE)"; return 0; }
  [ -e "$PB/$name.SKIPPED" ] && { echo "skip $name (SKIPPED: $(cat "$PB/$name.SKIPPED"))"; return 0; }
  rm -f "$PB/$name.FAIL"
  echo "=== $name start $(date +%H:%M:%S): $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "exit=$rc" >> "$log"
  if [ $rc -eq 0 ]; then touch "$PB/$name.DONE"; else echo "$rc" > "$PB/$name.FAIL"; fi
  echo "=== $name exit=$rc $(date +%H:%M:%S) ==="
}

# 1. config #4: can remat-loss unlock micro 4 / micro 8? (same 16-patch
#    optimizer step as the shipped micro 2 x accum 8 = 5.361)
run bench4_b4a4_rematloss 4800 python bench.py --arch hat --mode train --batch 4 --accum 4 --remat-loss --iters 10
run bench4_b8a2_rematloss 4800 python bench.py --arch hat --mode train --batch 8 --accum 2 --remat-loss --iters 10
# control: remat-loss cost where memory already fits (shipped split)
run bench4_b2a8_rematloss 3600 python bench.py --arch hat --mode train --batch 2 --accum 8 --remat-loss --iters 10

# 2. the queued non-phase attribution at the SHIPPED split (full_step vs
#    phases-x-accum rows of perf_breakdown --what hat-train)
run hat_train_breakdown_b2 3600 python scripts/perf_breakdown.py --what hat-train --batch 2

# 3. config #3 (swin, reference envelope 2x4=8 patches/step, shipped 14.04
#    at micro 2): same fill question at micro 4 / micro 8
run bench3_b4a2_rematloss 3600 python bench.py --arch swin --mode train --batch 4 --accum 2 --remat-loss --iters 10
run bench3_b8a1_rematloss 3600 python bench.py --arch swin --mode train --batch 8 --accum 1 --remat-loss --iters 10
# does swin micro 4 even need the remat? (isolates remat cost from fill gain)
run bench3_b4a2 3600 python bench.py --arch swin --mode train --batch 4 --accum 2 --iters 10

# 4. fallbacks if micro-4/8 still exceed HBM with remat-loss + state
#    donation: add nn.remat over the HAT groups (--remat). The fill gain at
#    micro 8 (phases run 11.32 p/s) can absorb the recompute cost that made
#    micro-4 full-remat lose at 4.771.
if [ -e "$PB/bench4_b4a4_rematloss.FAIL" ]; then
  run bench4_b4a4_rematloss_remat 4800 python bench.py --arch hat --mode train --batch 4 --accum 4 --remat-loss --remat --iters 10
fi
if [ -e "$PB/bench4_b8a2_rematloss.FAIL" ]; then
  run bench4_b8a2_rematloss_remat 4800 python bench.py --arch hat --mode train --batch 8 --accum 2 --remat-loss --remat --iters 10
fi

echo "PLAYBOOK_R04C COMPLETE $(date +%H:%M:%S)"
