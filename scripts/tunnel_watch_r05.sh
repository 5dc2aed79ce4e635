#!/bin/bash
# Round-5 tunnel watcher: probe the axon TPU tunnel with a REAL computation
# (round-5 find: the control plane can enumerate devices while the data
# plane is wedged — jax.devices() succeeding is not "up"), then run
# scripts/tpu_playbook_r05.sh until every item has a DONE marker.
# Probes are fresh short-lived subprocesses every 5 min.
set -u
cd /root/repo
mkdir -p artifacts/bench_r05

while true; do
  if timeout 240 python - <<'EOF' > artifacts/bench_r05/probe_last.log 2>&1
import jax, jax.numpy as jnp
assert jax.default_backend() != "cpu"
x = jnp.ones((256, 256))
print("tpu up, matmul:", float((x @ x).sum()))
EOF
  then
    echo "tunnel up at $(date +%F' '%H:%M:%S)" >> artifacts/bench_r05/watch.log
    bash scripts/tpu_playbook_r05.sh >> artifacts/bench_r05/watch.log 2>&1
    n_run=$(grep -c '^run ' scripts/tpu_playbook_r05.sh)
    n_done=$(ls artifacts/bench_r05/*.DONE 2>/dev/null | wc -l)
    if [ "$n_done" -lt "$n_run" ]; then
      echo "playbook incomplete ($n_done/$n_run), retry in 10 min" >> artifacts/bench_r05/watch.log
      sleep 600
      continue
    fi
    echo "playbook complete, watcher exiting" >> artifacts/bench_r05/watch.log
    exit 0
  fi
  echo "tunnel down at $(date +%F' '%H:%M:%S)" >> artifacts/bench_r05/watch.log
  sleep 300
done
