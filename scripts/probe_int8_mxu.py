"""Probe: s8 x s8 -> s32 dot_general + token-major scale-tile factor build.

Scale pool layout under test: per page [page_size, 128] with row = slot,
lane = kv*64 + h.  DMA'd [ppcb, page, 128] -> merge -> ONE transpose ->
[128, tokens] -> sublane split/slice -> kf/vf [hkv, tokens] lane-major.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

HKV, GP, PPCB, PAGE, D = 8, 8, 32, 16, 128
TOK = PPCB * PAGE


def kern(q_ref, k_ref, v_ref, sc_ref, qf_ref, o_ref):
    q = q_ref[...]          # [HKV, GP, D] i8
    k = k_ref[...]          # [HKV, TOK, D] i8
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [HKV, GP, TOK] i32

    x = sc_ref[...].reshape(PPCB * PAGE, 128)   # [TOK, 128] bf16
    t = jnp.swapaxes(x, 0, 1)                   # [128, TOK]
    t = t.reshape(2, 64, TOK)
    kf = t[0][:HKV].astype(jnp.float32)         # [HKV, TOK]
    vf = t[1][:HKV].astype(jnp.float32)

    qf = qf_ref[...][:, :, :1]                  # [HKV, GP, 1] f32
    sf = s.astype(jnp.float32) * kf.reshape(HKV, 1, TOK) * qf

    m = jnp.max(sf, axis=2, keepdims=True)
    p = jnp.exp(sf - m)
    pv_scaled = p * vf.reshape(HKV, 1, TOK)
    pm = jnp.max(pv_scaled, axis=2, keepdims=True)
    r = jnp.where(pm > 0, 127.0 / pm, 0.0)
    p_i8 = jnp.round(pv_scaled * r).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_i8, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # [HKV, GP, D]
    out = pv.astype(jnp.float32) * jnp.where(r > 0, 1.0 / r, 0.0)
    o_ref[...] = out.reshape(HKV * GP, D)


rng = np.random.default_rng(0)
q = jnp.asarray(rng.integers(-127, 127, (HKV, GP, D)), jnp.int8)
k = jnp.asarray(rng.integers(-127, 127, (HKV, TOK, D)), jnp.int8)
v = jnp.asarray(rng.integers(-127, 127, (HKV, TOK, D)), jnp.int8)
sc = jnp.asarray(rng.standard_normal((PPCB, PAGE, 128)) * 0.01 + 0.02,
                 jnp.bfloat16)
qf = jnp.ones((HKV, GP, 128), jnp.float32) * 0.01
out = pl.pallas_call(
    kern,
    out_shape=jax.ShapeDtypeStruct((HKV * GP, D), jnp.float32),
    interpret=False,
)(q, k, v, sc, qf)
got = np.asarray(out)

# numpy oracle
xn = np.asarray(sc, np.float32).reshape(TOK, 128).T
kf = xn.reshape(2, 64, TOK)[0][:HKV]
vf = xn.reshape(2, 64, TOK)[1][:HKV]
s = np.einsum("hgd,htd->hgt", np.asarray(q, np.float32),
              np.asarray(k, np.float32)) * kf[:, None, :] * 0.01
m = s.max(2, keepdims=True)
p = np.exp(s - m) * vf[:, None, :]
pm = p.max(2, keepdims=True)
r = np.where(pm > 0, 127.0 / pm, 0.0)
p8 = np.round(p * r)
pv = np.einsum("hgt,htd->hgd", p8, np.asarray(v, np.float32))
want = (pv * np.where(r > 0, 1.0 / r, 0.0)).reshape(HKV * GP, D)
err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
print("ok rel_err:", err)
assert err < 1e-3, err
