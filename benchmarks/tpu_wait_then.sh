#!/bin/bash
# Wait until the axon TPU actually executes compute (jax.devices() can
# enumerate while the relay is wedged — probe a matmul + host transfer,
# CLAUDE.md "block_until_ready does not synchronize"), then exec "$@".
# ONE TPU process at a time: the probe exits fully before the payload runs.
set -u
cd /root/repo
stamp() { date +%H:%M:%S; }
for i in $(seq 1 200); do
  if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32) @ jnp.ones((128, 128), jnp.float32)
assert float(np.asarray(x).sum()) == 128.0 * 128 * 128
EOF
  then
    echo "$(stamp) TPU compute OK — launching payload"
    exec "$@"
  fi
  echo "$(stamp) TPU still down (probe $i)"
  sleep 60
done
echo "$(stamp) giving up"
exit 1
