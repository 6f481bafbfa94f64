#!/bin/bash
# Poll the axon TPU relay; when it answers, run the hardware-day battery.
# Bounded: gives up after MAX_TRIES probes.
set -u
cd "$(dirname "$0")/.."
MAX_TRIES=${MAX_TRIES:-60}
SLEEP=${SLEEP:-600}
for i in $(seq 1 "$MAX_TRIES"); do
    echo "[relay_watch $(date +%H:%M:%S)] probe $i/$MAX_TRIES"
    if timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
assert float(np.asarray(jnp.dot(jnp.ones((256, 256)), jnp.ones((256, 256))).sum())) == 256.0**3
print("relay UP:", jax.devices())
EOF
    then
        echo "[relay_watch] relay is UP - starting hw_day"
        bash scripts/hw_day.sh
        exit $?
    fi
    sleep "$SLEEP"
done
echo "[relay_watch] gave up after $MAX_TRIES probes"
exit 1
