"""Short-context decode, measured properly (verdict r3 item 6).

Earlier short-ctx rows were timing artifacts (0.03 ms kernels under a
200-iter loop drown in remote-dispatch jitter; several rows printed
>100% of speed-of-light).  This probe times >=50 ms loops and sweeps
pages_per_compute_block at ctx 1024/2048 for int8 and bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_r4_shortctx.py
"""
import jax
import jax.numpy as jnp
import numpy as np

from aule_tpu.ops.paged_fused import paged_attention_fused, to_fused_layout
from aule_tpu.ops.quant import quantize_kv
from aule_tpu.utils.profiling import benchmark, decode_speed_of_light_toks

print(f"device: {jax.devices()[0].device_kind}", flush=True)
rng = np.random.default_rng(23)
B, HQ, HKV, D, page = 8, 32, 8, 128, 16

for ctx in (1024, 2048):
    npg = ctx // page
    num_pages = B * npg + 1
    kf = jnp.asarray(rng.standard_normal((HKV, num_pages, page, D)),
                     jnp.float32)
    vf = jnp.asarray(rng.standard_normal((HKV, num_pages, page, D)),
                     jnp.float32)
    bt = jnp.asarray(1 + np.arange(B * npg, dtype=np.int32).reshape(B, npg))
    lens = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, HQ, D)), jnp.bfloat16)
    iters = max(400, 2_000_000 // ctx)

    for dtype, label in ((jnp.int8, "int8"), (None, "bf16")):
        if dtype is not None:
            kq, ks = quantize_kv(kf, dtype)
            vq, vs = quantize_kv(vf, dtype)
            kv, sc = to_fused_layout(kq, vq, ks, vs)
            bpe = 1 + 2 / 16  # payload + bf16 scale tile traffic
        else:
            kv = to_fused_layout(kf.astype(jnp.bfloat16),
                                 vf.astype(jnp.bfloat16))
            sc = None
            bpe = 2
        sol = decode_speed_of_light_toks(B, HKV, ctx, D, bpe)
        for ppcb in (8, 16, 32, 64):
            if ppcb > npg:
                continue

            def run(q, kv, *s):
                return paged_attention_fused(
                    q, kv, bt, lens, kv_scales=(s[0] if s else None),
                    pages_per_compute_block=ppcb, interpret=False)

            args = (q, kv) + ((sc,) if sc is not None else ())
            try:
                t = benchmark(run, *args, iters=iters, reps=5)
            except Exception as e:
                print(f"ctx{ctx} {label} ppcb{ppcb}: FAIL {e!r:.100}",
                      flush=True)
                continue
            toks = B / t
            print(f"ctx{ctx} {label} ppcb{ppcb}: {t*1e6:7.1f} us  "
                  f"{toks:10,.0f} tok/s  {toks/sol:6.1%} SoL",
                  flush=True)
print("OK", flush=True)
