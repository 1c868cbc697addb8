#!/bin/bash
# Poll the remote TPU backend; when it answers, run the staged on-chip
# serving A/B (scripts/r3_serving_holder_int8.py).  The tunnel has been
# down for an extended window (RESULTS.md round-3 continuation); this
# keeps the measurement armed without holding a session open.
#
# Usage: nohup bash scripts/watch_backend.sh > /tmp/backend_watch.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
while true; do
  if timeout 900 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0
EOF
  then
    echo "backend UP $(date)"
    touch /tmp/backend_up
    timeout 7200 python scripts/r3_serving_holder_int8.py \
      > /tmp/r3_holder_serving.log 2>&1
    echo "A/B exit=$? $(date)"
    break
  fi
  echo "backend down $(date)"
  sleep 240
done
