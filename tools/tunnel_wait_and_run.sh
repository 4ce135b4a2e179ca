#!/bin/bash
# Wait for the axon TPU tunnel to come back (probe every 10 min, up to
# ~6 h), then run the queued on-chip measurements (r3_onchip_queue.sh).
# Each probe is a bounded tiny matmul; see MEMORY: the tunnel has
# multi-hour outages where backend init hangs.
cd /root/repo
for i in $(seq 1 36); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
x = (jnp.ones((256,256)) @ jnp.ones((256,256))).sum()
assert float(x) == 256.0 * 256 * 256
print('tunnel up:', jax.devices())
" 2>/tmp/r3q_probe.err; then
    echo "probe $i: UP — running queue"
    exec bash tools/r3_onchip_queue.sh
  fi
  echo "probe $i: down ($(date -u +%H:%M:%S)), sleeping 600s"
  sleep 600
done
echo "TUNNEL_NEVER_CAME_BACK"
exit 1
