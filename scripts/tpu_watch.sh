#!/bin/bash
# Probe the TPU every 10 min; when healthy, fire the round-3 queue once.
cd /root/repo
mkdir -p .tpuruns
while true; do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
assert str(jax.devices()[0]) != ''
print(float(jnp.ones((8,128)).sum()))
" >> .tpuruns/tpu_watch.log 2>&1; then
    echo "$(date) TUNNEL HEALTHY — launching queue" >> .tpuruns/tpu_watch.log
    bash scripts/tpu_queue.sh >> .tpuruns/r3_queue.log 2>&1
    echo "$(date) QUEUE FINISHED" >> .tpuruns/tpu_watch.log
    break
  fi
  echo "$(date) still wedged" >> .tpuruns/tpu_watch.log
  sleep 600
done
