"""Compiled-mode smoke test on the real TPU chip (not interpret mode).

Usage: python scripts/tpu_smoke.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.ops.reference import attention_reference_numpy
from aule_tpu.utils.testing import max_abs_diff, random_qkv

print("devices:", jax.devices())
assert jax.devices()[0].platform == "tpu", "need a TPU"

# -- forward f32 --
q, k, v = random_qkv(2, 4, 1024, 128)
out, lse = jax.jit(
    lambda q, k, v: flash_attention_fwd(q, k, v, causal=True,
                                        interpret=False)
)(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
want = attention_reference_numpy(q, k, v, causal=True)
print("fwd f32 causal maxAbsDiff:", max_abs_diff(out, want))

# -- forward bf16 + GQA + window --
q, k, v = random_qkv(1, 8, 2048, 128, heads_kv=2)
out2, _ = jax.jit(
    lambda q, k, v: flash_attention_fwd(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True, window_size=256,
        interpret=False)
)(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
want2 = attention_reference_numpy(q, k, v, causal=True, window_size=256)
print("fwd bf16 gqa window maxAbsDiff:", max_abs_diff(np.asarray(out2, np.float32), want2))

# -- backward --
q, k, v = random_qkv(1, 8, 2048, 128, heads_kv=8)
qj, kj, vj = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def loss(q, k, v):
    return jnp.sum(flash_attention_vjp(q, k, v, causal=True) ** 2)


g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qj, kj, vj)
import aule_tpu.ops.reference as R


def loss_ref(q, k, v):
    return jnp.sum(R.attention_reference(q, k, v, causal=True) ** 2)


gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(qj, kj, vj)
for name, a, b in zip("dq dk dv".split(), g, gr):
    print(f"bwd {name} maxAbsDiff:", max_abs_diff(a, b))

# -- quick timing, S=4k bf16 prefill (BASELINE-comparable config) --
B, H, S, D = 4, 32, 4096, 128
q, k, v = random_qkv(B, H, S, D, heads_kv=8, dtype=np.float32)
qj = jnp.asarray(q, jnp.bfloat16)
kj = jnp.asarray(k, jnp.bfloat16)
vj = jnp.asarray(v, jnp.bfloat16)
f = jax.jit(lambda q, k, v: flash_attention_fwd(q, k, v, causal=True,
                                                interpret=False)[0])
f(qj, kj, vj).block_until_ready()
n = 20
t0 = time.perf_counter()
for _ in range(n):
    o = f(qj, kj, vj)
o.block_until_ready()
dt = (time.perf_counter() - t0) / n
flops = 4 * B * H * S * S * D * 0.5  # causal halves the work
print(f"prefill B{B} H{H} S{S} D{D} bf16 causal: {dt*1e3:.2f} ms, "
      f"{flops/dt/1e12:.1f} TFLOP/s (causal-adjusted)")
