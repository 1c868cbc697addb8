#!/bin/bash
# Poll the remote TPU backend; when it answers, run the staged on-chip
# round-3 close-out chain:
#   1. scripts/r3_serving_holder_int8.py  (holder APPLY-mode int8 A/B)
#   2. python bench.py                    (closing inference bench)
#   3. python bench.py --train           (closing train bench)
#   4. SFC_VIT_TPU_TESTS=1 pytest tests/test_tpu_hardware.py
# Logs land in /tmp/r3_*.log; /tmp/backend_up marks the transition.
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
    echo "serving A/B exit=$? $(date)"
    timeout 5400 python bench.py > /tmp/r3_bench_close.log 2>&1
    echo "bench exit=$? $(date)"
    timeout 5400 python bench.py --train > /tmp/r3_bench_train_close.log 2>&1
    echo "bench --train exit=$? $(date)"
    SFC_VIT_TPU_TESTS=1 timeout 7200 python -m pytest \
      tests/test_tpu_hardware.py -q > /tmp/r3_onchip_suite.log 2>&1
    echo "on-chip suite exit=$? $(date)"
    break
  fi
  echo "backend down $(date)"
  sleep 240
done
