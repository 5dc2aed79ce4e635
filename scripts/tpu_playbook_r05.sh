#!/bin/bash
# Round-5 TPU playbook — VERDICT r4 items 1, 2, 4, 5, 7.
#
# 1. Re-measure configs #3/#4 with the round-4 fixes that landed AFTER the
#    last bench (state donation, prefetch_to_mesh H2D overlap + deferred
#    metric fetch, separable SSIM, D-stage save drop): bare step AND the
#    production staged loop (`bench.py --mode train --loop`), plus the
#    full_step/non-phase re-attribution (perf_breakdown --what hat-train).
# 2. Verify the new config-#3 DEFAULT (micro 8 x accum 1 + remat-loss)
#    reproduces ~15.5 with `python bench.py --mode train`, no flags.
# 4. Post-save-drop split sweep: does PLAIN micro-4 x accum-4 fit now?
# 5. Long-horizon swin stability: 80 epochs at the full flagship config.
# 7. Warm the compile caches for the driver's end-of-round `bench.py`
#    (now all-five-configs) by re-measuring #1/#2/#5.
#
# Logs live under artifacts/bench_r05/ and are COMMITTED (VERDICT r4 item
# 6: the r04 /tmp logs did not survive the host). Honest completion
# semantics (as r04): .DONE only on exit-0 with a log; .FAIL with the exit
# code; re-runs retry FAILs.
set -u
cd /root/repo
PB=artifacts/bench_r05
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

# --- item 2: the new defaults, bare invocations ---
run bench3_default 3600 python bench.py --mode train --iters 10
run bench4_default 4800 python bench.py --arch hat --mode train --iters 10

# --- item 1: the production staged loop (H2D overlap + deferred fetch) ---
run bench4_loop 4800 python bench.py --arch hat --mode train --loop --iters 10
run bench3_loop 3600 python bench.py --mode train --loop --iters 10

# --- item 1: non-phase re-attribution at the shipped hat split ---
run hat_train_breakdown_b2 3600 python scripts/perf_breakdown.py --what hat-train --batch 2

# --- item 4: post-save-drop/donation split sweep for config #4 ---
run bench4_b4a4_plain 4800 python bench.py --arch hat --mode train --batch 4 --accum 4 --no-remat-loss --iters 10
run bench4_b4a4_rl 4800 python bench.py --arch hat --mode train --batch 4 --accum 4 --remat-loss --iters 10
if [ -e "$PB/bench4_b4a4_plain.DONE" ]; then
  # plain micro-4 fits -> try plain micro 8 too (was 21.95G OOM with rl)
  run bench4_b8a2_plain 4800 python bench.py --arch hat --mode train --batch 8 --accum 2 --no-remat-loss --iters 10
fi

# --- item 7 + regression record: configs #1/#2/#5 (also warms the compile
#     cache for the driver's end-of-round all-config bench) ---
run bench1 1800 python bench.py --arch swin --mode infer
run bench2 2400 python bench.py --arch hat --mode infer
run bench5 2400 python bench.py --mode prep

# --- item 5: long-horizon stability, full flagship swin config, 80 epochs
#     (the r4 proof stopped at 25; watch D/G balance, EMA gap, LR tail) ---
run learn_swin_long 10800 python scripts/train_learns.py --arch swin --epochs 80 \
  --data-root /tmp/learn_data --outputs-root /tmp/learn_out_r05 --fresh \
  --artifacts artifacts/learn_r05/swin_long

# --- item 5b: hat long-horizon — the riskier dynamics (warmup->GAN handoff
#     + D/G balance over many GAN epochs; the r4 proof stopped at 12 ep,
#     8 of them GAN). 40 epochs ~ 36 GAN epochs at ~2.5 min/ep. ---
run learn_hat_long 10800 python scripts/train_learns.py --arch hat --epochs 40 \
  --data-root /tmp/learn_data --outputs-root /tmp/learn_out_r05_hat \
  --artifacts artifacts/learn_r05/hat_long

echo "PLAYBOOK_R05 COMPLETE $(date +%H:%M:%S)"

# --- wave 2 (appended 01:15 while wave 1 ran; append-only is safe): the
#     in-step-rest ablation rows added to perf_breakdown after wave 1's
#     hat_train_breakdown_b2 quantified 930 ms staged non-phase. ---
run hat_train_breakdown_b2_ablate 3600 python scripts/perf_breakdown.py --what hat-train --batch 2
