#!/bin/bash
# Round-4 TPU playbook. Priority order is VERDICT r3 "Next round" #1/#2/#4/#6:
#  1. FULL-config learning proofs for BOTH archs (the round-3 skip-marked
#     items) -> artifacts/learn_r04/{swin,hat}
#  2. config #4 A/B that never ran: default vs fused-HAB (OCAB-backward kernel)
#  3. the missing packed-training A/B (bench3_packed)
#  4. hat-train time breakdown (discriminator / OCAB / VGG attribution)
#
# Honest completion semantics (VERDICT r3 weak #1 / item 9):
#  - <name>.DONE    only when the command ACTUALLY ran and exited 0 (log exists)
#  - <name>.FAIL    when it ran and exited nonzero (exit code inside)
#  - <name>.SKIPPED only for a deliberate decision, with the reason inside;
#    the runner never creates these
# A re-run skips DONE and SKIPPED items, retries FAIL items.
set -u
cd /root/repo
PB=/tmp/playbook_r04
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

# 1a. swin learning proof, FULL flagship config (bf16 + fused kernels + VGG)
run learn_swin 9000 python scripts/train_learns.py --arch swin --epochs 25 \
  --data-root /tmp/learn_data --outputs-root /tmp/learn_out_r04 --fresh \
  --artifacts artifacts/learn_r04/swin

# 1b. hat learning proof, FULL config (fused trunk, warmup 3 -> GAN transition)
run learn_hat 9000 python scripts/train_learns.py --arch hat --epochs 12 \
  --warmup-epochs 3 --data-root /tmp/learn_data \
  --outputs-root /tmp/learn_out_r04 --artifacts artifacts/learn_r04/hat

# 2. config #4: the A/B that was skip-marked in round 3. Default (flax HAT
#    backbone + fused trunk) vs fused-HAB/OCAB-backward path. Packed variant
#    already measured 4.124 (loses) in /tmp/playbook/bench4_fusedhab_packed.log.
run bench4_default 3600 python bench.py --arch hat --mode train --iters 10
run bench4_fusedhab 3600 python bench.py --arch hat --mode train --fused-hab --iters 10

# 3. swin training packed A/B (bench3 default re-measured alongside)
run bench3 2400 python bench.py --arch swin --mode train --iters 10
run bench3_packed 2400 env SRDEF_PACKED=auto python bench.py --arch swin --mode train --iters 10

# 4. where the hat step time goes (D / OCAB-bwd / VGG attribution)
run hat_train_breakdown 3600 python scripts/perf_breakdown.py --what hat-train

# ---- session-2 items (queued after the 13:12 completion of 1-4) ----

# 5. config #5: fused prep with the writer-pool IO/compute overlap, plus
#    the IO-only floor (same bytes, no compute) bounding this host.
run bench5_fused_overlap 2400 python bench.py --mode prep --iters 1
run bench5_iofloor 1200 python bench.py --mode prep --impl iofloor --iters 1
run bench5_staged 2400 python bench.py --mode prep --impl xla --iters 1

# 6. config #4 TPU-native accumulation split: same 16-patch optimizer
#    step (grad = mean over 16 either way; scan algebra in train/steps.py)
#    at MXU-friendlier micro sizes. The reference's 1x16 split is a
#    consumer-GPU VRAM artifact (README.md:117).
run bench4_b2a8 3600 python bench.py --arch hat --mode train --batch 2 --accum 8 --iters 10
run bench4_b4a4 3600 python bench.py --arch hat --mode train --batch 4 --accum 4 --iters 10
# HBM fallback if b4a4 OOMs (flax-backbone activation stash scales with micro)
[ -e /tmp/playbook_r04/bench4_b4a4.FAIL ] && \
  run bench4_b4a4_remat 3600 python bench.py --arch hat --mode train --batch 4 --accum 4 --remat --iters 10

# 7. swin train default re-measure now that packed training kernels are
#    the TPU default (should reproduce bench3_packed's 13.813)
run bench3_newdefault 2400 python bench.py --arch swin --mode train --iters 10

echo "PLAYBOOK_R04 COMPLETE $(date +%H:%M:%S)"
