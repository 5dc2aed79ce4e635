#!/bin/bash
# Watch for the axon TPU device tunnel to come back, then run the round-3
# measurement playbook (scripts/tpu_playbook.sh) until every item has its
# DONE marker. Each probe is a fresh short-lived subprocess (a hung
# jax.devices() in a long-lived probe would never recover), every 5 min.
set -u
cd /root/repo
mkdir -p /tmp/playbook

kill_tree() { # kill_tree <pidfile> — kill the recorded pid and its children
  local f=$1
  [ -f "$f" ] || return 0
  local pid
  pid=$(cat "$f")
  [ -d "/proc/$pid" ] || return 0
  local kids
  kids=$(cat /proc/$pid/task/*/children 2>/dev/null)
  kill "$pid" $kids 2>/dev/null
  echo "killed $pid ($kids) from $f"
}

while true; do
  if timeout 120 python - <<'EOF' > /tmp/playbook/probe_last.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("tpu up:", d)
EOF
  then
    echo "tunnel up at $(date +%H:%M:%S)" >> /tmp/playbook/watch.log
    # the full-config TPU proofs supersede the CPU fallback runs — free
    # the single host core for the playbook
    kill_tree /tmp/learn_swin_cpu.pid >> /tmp/playbook/watch.log
    kill_tree /tmp/learn_hat_cpu.pid >> /tmp/playbook/watch.log
    bash scripts/tpu_playbook.sh >> /tmp/playbook/watch.log 2>&1
    if ! ls /tmp/playbook/*.DONE >/dev/null 2>&1 || \
       [ "$(grep -c '^run ' scripts/tpu_playbook.sh)" -gt "$(ls /tmp/playbook/*.DONE 2>/dev/null | wc -l)" ]; then
      echo "playbook incomplete, will retry in 10 min" >> /tmp/playbook/watch.log
      sleep 600
      continue
    fi
    echo "playbook complete, watcher exiting" >> /tmp/playbook/watch.log
    exit 0
  fi
  sleep 300
done
