#!/bin/bash
# Probe the TPU relay until it answers; exit 0 the moment it does.
# One 1-element fetch per attempt under timeout (CLAUDE.md relay-wedge
# discipline). Interval 600s keeps pressure off the tunnel.
set -u
INTERVAL=${1:-600}
while true; do
  if timeout 90 python -c "
import numpy as np, jax.numpy as jnp
print('probe ok', np.asarray(jnp.zeros(1))[0])" >/dev/null 2>&1; then
    echo "relay ALIVE $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "relay dead $(date -u +%FT%TZ)"
  sleep "$INTERVAL"
done
