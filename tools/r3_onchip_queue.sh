#!/bin/bash
# Pending on-chip measurements, queued while the axon tunnel was down
# (2026-08-17 ~3h outage: even a trivial matmul hung at backend init).
# Run when the chip answers again; each step is independently bounded so
# one flaky phase doesn't lose the rest. Results land in /tmp/r3q/.
set -x
mkdir -p /tmp/r3q
cd /root/repo

# 0. liveness gate
timeout 120 python -c "
import jax, jax.numpy as jnp
print((jnp.ones((256,256))@jnp.ones((256,256))).sum(), jax.devices())
" || { echo TUNNEL_STILL_DOWN; exit 1; }

# 1. bench sanity (inference + training headline numbers); the liveness
#    gate above already passed, so don't let bench.py's own outage-retry
#    loop (MASKUNET_BENCH_TRIES) stretch the step budget. Timeout math:
#    2 tries must fit inside the outer 2700s — probe 180 + child 1100 +
#    sleep 60 + probe 180 + child 1100 = 2620 < 2700 (child compile is
#    ~100s warm-cache; 1100s only trips if the tunnel is degraded).
timeout 2700 env MASKUNET_BENCH_TRIES=2 MASKUNET_BENCH_RETRY_SLEEP_S=60 \
  MASKUNET_BENCH_CHILD_TIMEOUT_S=1100 \
  python bench.py | tee /tmp/r3q/bench.json

# 2. int8 quantized inference A/B (new serving feature: is int8 a win
#    on the MXU once the dynamic-quant reduce + dequant are paid?)
timeout 1800 python tools/quant_ab.py 8 | tee /tmp/r3q/quant_ab.txt

# 3. conv im2col-vs-direct in-model A/B (in flight when the tunnel died)
timeout 2400 python tools/conv_model_ab.py | tee /tmp/r3q/conv_model_ab.txt

# 4. kernel parity on real hardware (regression gate after any kernel use)
timeout 1800 python tools/tpu_kernel_paritycheck.py | tee /tmp/r3q/parity.txt

# 5. precomputed-compaction-plan A/B (VERDICT r2 experiment (b): hoist the
#    mask slot assignment out of the per-step graph)
timeout 1800 python tools/plan_ab.py 8 30 | tee /tmp/r3q/plan_ab.txt
