"""Backward kernel probe: grad correctness on chip + fwd+bwd perf."""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.ops.reference import attention_reference
from aule_tpu.utils.profiling import attention_flops, benchmark

rng = np.random.default_rng(42)

# correctness: bf16 GQA grads on chip vs XLA-reference autodiff
B, HQ, HKV, S, D = 1, 8, 2, 1024, 128
q = jnp.asarray(rng.standard_normal((B, HQ, S, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, HKV, S, D)), jnp.bfloat16)


def grads(fn):
    def loss(q, k, v):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)


dq, dk, dv = grads(lambda q, k, v: flash_attention_vjp(q, k, v, causal=True))
rq, rk, rv = grads(lambda q, k, v: attention_reference(
    q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
    causal=True))
for name, a, b in (("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv)):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
    print(f"{name} rel_err={rel:.3e}", flush=True)
    assert rel < 5e-2, (name, rel)

# perf: fwd+bwd at the r1 BENCH rows
for (b, s) in [(4, 2048), (2, 4096)]:
    q = jnp.asarray(rng.standard_normal((b, 32, s, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, 8, s, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, 8, s, D)), jnp.bfloat16)

    def fwd_bwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(flash_attention_vjp(
                q, k, v, causal=True).astype(jnp.float32))
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    t = benchmark(fwd_bwd, q, k, v, iters=5)
    fl = attention_flops(b, 32, s, s, D, causal=True, backward=True) \
        + attention_flops(b, 32, s, s, D, causal=True)
    print(f"fwd+bwd B{b} H32/8 S{s}: {t*1e3:.2f} ms  "
          f"{fl/t/1e12:.1f} TFLOP/s eff ({fl/t/1e12/197*100:.1f}%)",
          flush=True)
print("OK", flush=True)
