#!/bin/bash
# Round-3 chip campaign: run the moment the TPU tunnel returns.
# Validates every r3 kernel change compiled-on-chip, then measures the
# perf rows VERDICT r2 asked for.  Each stage logs to /tmp/r3_campaign/
# and failures don't stop later stages (severity-ordered).
set -u
cd "$(dirname "$0")/.."
# Probe scripts import aule_tpu from the repo root.  APPEND to
# PYTHONPATH: the axon TPU plugin registers via /root/.axon_site on
# PYTHONPATH, so overwriting it silently kills the chip backend.
export PYTHONPATH=.:${PYTHONPATH:-}
OUT=/tmp/r3_campaign
mkdir -p $OUT
run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%T)) ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "$name: exit $? (log: $OUT/$name.log)"
}

# 1. Compiled kernel tests — catches Mosaic regressions from the r3
#    kernels (diag strip, varlen, head-ganged split decode, x-batch
#    baton, D=256, gpt2 qkv-major).
run tests_kernels 3600 env AULE_TEST_TPU=1 python -m pytest \
  tests/test_flash_kernel.py tests/test_paged_fused.py \
  tests/test_paged.py tests/test_quant.py -x -q
run tests_models 3600 env AULE_TEST_TPU=1 python -m pytest \
  tests/test_gpt2.py tests/test_model.py tests/test_gravity.py \
  tests/test_needle_long.py -x -q

# 2. Headline bench (also exercises the XBATCH/DIAG fallbacks).
run bench 1800 python bench.py

# 3. Diagonal-strip causal MFU: the north-star rows (B4/S4096, B8/S2048,
#    S8k) with the diag schedule on vs off.
run diag_on  1800 python scripts/probe_r2_flash.py
run diag_off 1800 env AULE_FLASH_DIAG=0 python scripts/probe_r2_flash.py

# 4. Shape-keyed tile sweep (B8/S2k, D=64 MHA, D=256, short-ctx decode).
run shape_tune 3600 python scripts/probe_shape_tune.py

# 5. Decode grids: fused short-ctx (x-batch A/B) + split-layout tok/s.
run decode_xb_on  1800 python scripts/probe_shortctx_decode.py
run decode_xb_off 1800 env AULE_DECODE_XBATCH=0 python scripts/probe_shortctx_decode.py

# 6. Full grid for BENCH_GRID.md refresh.
run grid 3600 python benchmarks/run_grid.py --iters 20

# 7. Speculative decoding end-to-end (engine tok/s envelope + exactness).
run spec_decode 1800 python scripts/probe_spec_decode.py

echo "=== campaign done ($(date +%T)); logs in $OUT ==="
