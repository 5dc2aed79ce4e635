#!/bin/bash
# Tunnel-return playbook: every TPU-blocked round-3 measurement, priority
# order, one log per item under /tmp/playbook/. Safe to re-run — each step
# skips itself if its DONE marker exists. Designed to be fired by a tunnel
# watcher the moment the axon device tunnel comes back.
#
# Priority:
#  1. full-config learning proofs (VERDICT r2 #3): swin then hat
#  2. config #4 bench re-measure with the OCAB-backward round-3 kernels
#  3. config #5 fused-prep TPU measure (single-dispatch path, f0d5980)
#  4. headline re-confirm: configs #1/#3
#  5. hat-train breakdown (OCAB backward attribution)
set -u
cd /root/repo
mkdir -p /tmp/playbook
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_comp_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

run() { # run <name> <timeout-sec> <cmd...>
  local name=$1 tmo=$2; shift 2
  local log=/tmp/playbook/$name.log done=/tmp/playbook/$name.DONE
  [ -e "$done" ] && { echo "skip $name (done)"; return 0; }
  echo "=== $name: $* (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "exit=$rc" >> "$log"
  [ $rc -eq 0 ] && touch "$done"
  echo "=== $name exit=$rc ==="
}

# 1a. swin learning proof, FULL flagship config (fused bf16 kernels)
run learn_swin 7200 python scripts/train_learns.py --arch swin --epochs 25 \
  --data-root /tmp/learn_data --outputs-root /tmp/learn_out_full \
  --artifacts artifacts/learn_r03/swin

# 1b. hat learning proof, FULL config (fused trunk, warmup 3)
run learn_hat 7200 python scripts/train_learns.py --arch hat --epochs 12 \
  --warmup-epochs 3 --data-root /tmp/learn_data \
  --outputs-root /tmp/learn_out_full --artifacts artifacts/learn_r03/hat

# 2. config #4 with the round-3 OCAB-backward kernel (fused-HAB path) vs
#    the shipped default (flax backbone + fused trunk); head-packed
#    attention (kernels/packed_heads.py) is OPT-IN via SRDEF_PACKED=auto —
#    the default runs the long-validated per-head loop. If a _packed item
#    wins AND compiles, flip the default in packed_heads._env_mode.
run bench4_default 3600 python bench.py --arch hat --mode train --iters 10
run bench4_fusedhab 3600 python bench.py --arch hat --mode train --fused-hab --iters 10
run bench4_fusedhab_packed 3600 env SRDEF_PACKED=auto python bench.py --arch hat --mode train --fused-hab --iters 10
run bench2 1800 python bench.py --arch hat --mode infer
run bench2_packed 1800 env SRDEF_PACKED=auto python bench.py --arch hat --mode infer

# 3. config #5 fused prep on TPU (single-dispatch) + staged comparison
run bench_prep_fused 1800 python bench.py --mode prep
run bench_prep_staged 1800 python bench.py --mode prep --impl xla

# 4. headline re-confirm + the swin packed-pairs A/B (SRDEF_PACKED=auto
#    group-packs head pairs into M=128/K=60 dots, packed_heads.best_group;
#    the default is the per-head loop)
run bench1 1800 python bench.py --arch swin --mode infer
run bench1_packed 1800 env SRDEF_PACKED=auto python bench.py --arch swin --mode infer
run bench3 2400 python bench.py --arch swin --mode train --iters 10
run bench3_packed 2400 env SRDEF_PACKED=auto python bench.py --arch swin --mode train --iters 10

# 5. where the hat step time goes now (OCAB backward attribution)
run hat_train_breakdown 3600 python scripts/perf_breakdown.py --what hat-train

echo "PLAYBOOK COMPLETE $(date +%H:%M:%S)"
