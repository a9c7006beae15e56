#!/bin/bash
# Poll for TPU tunnel recovery: exits 0 the moment jax sees a TPU,
# exits 1 after ~6h of trying.  Run in background; its exit is the signal.
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null; then
    echo "TPU BACK after $i attempts"
    exit 0
  fi
  sleep 180
done
echo "TPU still down after 6h"
exit 1
