#!/bin/bash
# Watch for the axon TPU device tunnel to come back, then fire the
# round-3 measurement playbook (scripts/tpu_playbook.sh) exactly once.
# Each probe is a fresh short-lived subprocess (a hung jax.devices() in a
# long-lived probe would never recover), checked every 5 minutes.
set -u
cd /root/repo
mkdir -p /tmp/playbook
while true; do
  if timeout 120 python - <<'EOF' > /tmp/playbook/probe_last.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("tpu up:", d)
EOF
  then
    echo "tunnel up at $(date +%H:%M:%S), firing playbook" | tee /tmp/playbook/watch.log
    bash scripts/tpu_playbook.sh >> /tmp/playbook/watch.log 2>&1
    exit 0
  fi
  sleep 300
done
