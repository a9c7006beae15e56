"""Pallas flash kernel tests (interpret mode on CPU; compiled on TPU).

Covers the reference's kernel test matrix (python/tests/test_triton.py,
tests/test_gqa_unit.py, test_sliding_window.py, test_cross_attn.py):
forward vs oracle across causal/GQA/MQA/window/cross/head-dims, LSE,
fused RoPE, and backward gradients vs autodiff through the XLA reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.ops.flash import flash_attention_fwd
from aule_tpu.ops.flash_vjp import flash_attention_vjp
from aule_tpu.ops.reference import (
    attention_reference,
    attention_reference_numpy,
)
from aule_tpu.ops.rope import apply_rope, precompute_rope_frequencies
from aule_tpu.utils.testing import assert_close, random_qkv

# Backward tolerances: interpreter mode is near-exact; compiled f32 on a
# real chip carries (a) ~1e-6 relative rounding from the exp2
# fast-softmax / scale folding, scaled ~30x in absolute terms by the
# arange-weighted test loss, and (b) isolated near-cancellation blowups
# in ds = p*(dp - di) inherent to recompute-based flash backward (worst
# observed: 3/32k elements at ~1% rel on v5e).
import os as _os

BWD_TOL = ((1e-2, 5e-3) if _os.environ.get("AULE_TEST_TPU") == "1"
           else (1e-4, 1e-4))

F32_TOL = (2e-5, 2e-5)


def fwd(q, k, v, **kw):
    out, lse = flash_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), **kw
    )
    return np.asarray(out), np.asarray(lse)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("head_dim", [64, 128, 256])
def test_fwd_basic(causal, head_dim):
    q, k, v = random_qkv(2, 2, 256, head_dim)
    got, _ = fwd(q, k, v, causal=causal)
    want = attention_reference_numpy(q, k, v, causal=causal)
    assert_close(got, want, *F32_TOL, f"fwd causal={causal} D={head_dim}")


def test_fwd_seq_not_multiple_of_block():
    q, k, v = random_qkv(1, 2, 200, 64, seq_k=333)
    got, _ = fwd(q, k, v, causal=False)
    want = attention_reference_numpy(q, k, v)
    assert_close(got, want, *F32_TOL, "ragged-seq")


@pytest.mark.parametrize("kv_len", [37, 130, 256, 384])
def test_fwd_dynamic_kv_len(kv_len):
    """Bucket-padded varlen: a traced kv_len masks the padded KV tail so
    decode steps in the same shape bucket share one compiled kernel (the
    HF-generate patch mechanism; the reference has no varlen analog —
    its Triton path recompiles per KV shape)."""
    q, k, v = random_qkv(2, 4, 1, 128, seq_k=384)
    got, _ = fwd(q, k, v, causal=False, kv_len=jnp.int32(kv_len))
    want = attention_reference_numpy(
        q, k[:, :, :kv_len], v[:, :, :kv_len], causal=False)
    assert_close(got, want, *F32_TOL, f"kv_len={kv_len}")


def test_fwd_dynamic_kv_len_one_compile_per_bucket():
    """All kv_len values in one padded KV shape must reuse ONE jit trace."""
    q, k, v = (jnp.asarray(x) for x in random_qkv(1, 2, 1, 64, seq_k=256))
    traces = []

    @jax.jit
    def step(q, k, v, n):
        traces.append(None)
        out, _ = flash_attention_fwd(q, k, v, causal=False, kv_len=n)
        return out

    outs = [step(q, k, v, jnp.int32(n)) for n in (100, 150, 200, 256)]
    assert len(traces) == 1
    for n, o in zip((100, 150, 200, 256), outs):
        want = attention_reference_numpy(
            np.asarray(q), np.asarray(k)[:, :, :n], np.asarray(v)[:, :, :n])
        assert_close(np.asarray(o), want, *F32_TOL, f"bucketed n={n}")


@pytest.mark.parametrize("hq,hkv", [(8, 2), (4, 1), (12, 2)])
def test_fwd_gqa(hq, hkv):
    q, k, v = random_qkv(2, hq, 256, 64, heads_kv=hkv)
    got, _ = fwd(q, k, v, causal=True)
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got, want, *F32_TOL, f"gqa {hq}:{hkv}")


def test_fwd_cross_attention():
    q, k, v = random_qkv(1, 2, 128, 64, seq_k=384)
    got, _ = fwd(q, k, v)
    want = attention_reference_numpy(q, k, v)
    assert_close(got, want, *F32_TOL, "cross")


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("window", [64, 200])
def test_fwd_sliding_window(causal, window):
    q, k, v = random_qkv(1, 2, 512, 64)
    got, _ = fwd(q, k, v, causal=causal, window_size=window,
                 block_q=128, block_kv=128)
    want = attention_reference_numpy(q, k, v, causal=causal,
                                     window_size=window)
    assert_close(got, want, *F32_TOL, f"window={window} causal={causal}")


def test_fwd_lse():
    q, k, v = random_qkv(1, 2, 256, 64)
    _, lse = fwd(q, k, v, causal=True)
    _, want = attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, return_lse=True,
    )
    assert_close(lse, np.asarray(want), 1e-4, 1e-4, "lse")


def test_fwd_bf16():
    q, k, v = random_qkv(1, 4, 256, 128)
    got, _ = fwd(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), causal=True,
    )
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got.astype(np.float32), want, 2e-2, 2e-2, "bf16")


def test_fwd_fused_rope():
    q, k, v = random_qkv(1, 2, 256, 64)
    cos, sin = precompute_rope_frequencies(256, 64)
    got, _ = fwd(q, k, v, causal=True, rope_cos=cos, rope_sin=sin)
    qr = np.asarray(apply_rope(jnp.asarray(q), cos, sin))
    kr = np.asarray(apply_rope(jnp.asarray(k), cos, sin))
    want = attention_reference_numpy(qr, kr, v, causal=True)
    assert_close(got, want, 5e-5, 5e-5, "fused-rope")


def test_fwd_block_skipping_equivalence():
    """Window block skipping must not change results vs full-range compute."""
    q, k, v = random_qkv(1, 1, 1024, 64)
    got, _ = fwd(q, k, v, causal=True, window_size=100,
                 block_q=128, block_kv=128)
    got_big, _ = fwd(q, k, v, causal=True, window_size=100,
                     block_q=256, block_kv=512)
    want = attention_reference_numpy(q, k, v, causal=True, window_size=100)
    assert_close(got, want, *F32_TOL, "skip-small-blocks")
    assert_close(got_big, want, *F32_TOL, "skip-big-blocks")


@pytest.mark.parametrize("seq_k", [640, 768, 1536])
def test_fwd_f32_default_tiles_odd_seq(seq_k):
    """Regression: f32 default-tile path crashed (NameError est/limit) for
    seq_k whose padded block was not a multiple of the compute chunk
    (VERDICT r1 weak #1)."""
    q, k, v = random_qkv(1, 2, 256, 64, seq_k=seq_k)
    got, _ = fwd(q, k, v, causal=False)
    want = attention_reference_numpy(q, k, v)
    assert_close(got, want, *F32_TOL, f"f32-odd-seq{seq_k}")


@pytest.mark.parametrize("hq,hkv", [(32, 1), (12, 2), (32, 8)])
def test_fwd_gqa_group_batching(hq, hkv):
    """The grid batches the whole GQA group per K/V residency; cover big,
    odd, and Llama-shaped groups with default tiles."""
    q, k, v = random_qkv(1, hq, 320, 64, heads_kv=hkv)
    got, _ = fwd(q, k, v, causal=True)
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got, want, *F32_TOL, f"group {hq}:{hkv}")


def test_fwd_gqa_group_window_rope():
    """Group-batched rows with fused RoPE + window masks (mask/table
    replication across the group's sublane rows)."""
    q, k, v = random_qkv(1, 8, 384, 64, heads_kv=2)
    cos, sin = precompute_rope_frequencies(384, 64)
    got, _ = fwd(q, k, v, causal=True, window_size=100,
                 rope_cos=cos, rope_sin=sin)
    qr = np.asarray(apply_rope(jnp.asarray(q), cos, sin))
    kr = np.asarray(apply_rope(jnp.asarray(k), cos, sin))
    want = attention_reference_numpy(qr, kr, v, causal=True,
                                     window_size=100)
    assert_close(got, want, 5e-5, 5e-5, "group-window-rope")


@pytest.mark.parametrize("seq,blocks", [
    (1000, {}),                                   # ragged vs defaults
    (2048, dict(block_kv=512, block_kv_compute=256)),   # multi-tile walk
    (512, dict(block_q=64, block_kv=256, block_kv_compute=128)),
    (384, dict(block_q=256, block_kv=384, block_kv_compute=128)),  # bkvc<bq
])
def test_fwd_causal_aligned_walk(seq, blocks):
    """The causal path walks kv in diagonal-aligned dynamic-offset chunks;
    pin it against the oracle across tile/chunk geometries."""
    q, k, v = random_qkv(1, 4, seq, 64, heads_kv=2)
    got, _ = fwd(q, k, v, causal=True, **blocks)
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got, want, *F32_TOL, f"aligned-causal S={seq}")


def test_fwd_causal_cross_seq():
    """Causal with seq_q != seq_k exercises the aligned walk's ragged
    bounds (cols past seq_k must mask, not read garbage)."""
    q, k, v = random_qkv(1, 2, 256, 64, seq_k=200)
    got, _ = fwd(q, k, v, causal=True)
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got, want, *F32_TOL, "causal-cross")


def test_fwd_float16():
    """float16 inputs (the reference's attention_f16.comp end-to-end path:
    f16 storage, f32 accumulation)."""
    q, k, v = random_qkv(1, 4, 256, 64, heads_kv=2)
    got, _ = fwd(
        q.astype(np.float16), k.astype(np.float16),
        v.astype(np.float16), causal=True,
    )
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got.astype(np.float32), want, 1e-2, 1e-2, "f16")


def test_bwd_float16():
    """f16 grads: the backward mirrors the forward's f32 upcast (Mosaic
    has no f16 vector type on TPU) and casts dq/dk/dv back to f16."""
    q, k, v = random_qkv(1, 4, 256, 64, heads_kv=2)
    qh, kh, vh = (jnp.asarray(x, jnp.float16) for x in (q, k, v))

    def loss(fn, q, k, v):
        out = fn(q, k, v).astype(jnp.float32)
        w = jnp.arange(out.size).reshape(out.shape).astype(jnp.float32)
        return jnp.sum(out * w * 1e-3)

    dq, dk, dv = jax.grad(
        lambda q, k, v: loss(
            lambda *a: flash_attention_vjp(*a, causal=True), q, k, v),
        argnums=(0, 1, 2))(qh, kh, vh)
    assert dq.dtype == jnp.float16
    rq, rk, rv = jax.grad(
        lambda q, k, v: loss(
            lambda *a: attention_reference(*a, causal=True), q, k, v),
        argnums=(0, 1, 2))(qh.astype(jnp.float32), kh.astype(jnp.float32),
                           vh.astype(jnp.float32))
    assert_close(np.asarray(dq, np.float32), rq, 2e-2, 2e-2, "f16 dq")
    assert_close(np.asarray(dk, np.float32), rk, 2e-2, 2e-2, "f16 dk")
    assert_close(np.asarray(dv, np.float32), rv, 2e-2, 2e-2, "f16 dv")


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.arange(out.size).reshape(out.shape) * 1e-3)

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [False, True])
def test_bwd_matches_reference_autodiff(causal):
    q, k, v = random_qkv(1, 2, 256, 64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(q, k, v, causal=causal), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=causal), q, k, v
    )
    assert_close(dq, rq, *BWD_TOL, "dq")
    assert_close(dk, rk, *BWD_TOL, "dk")
    assert_close(dv, rv, *BWD_TOL, "dv")


def test_bwd_gqa():
    q, k, v = random_qkv(1, 8, 256, 64, heads_kv=2)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(q, k, v, causal=True), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=True), q, k, v
    )
    assert_close(dq, rq, *BWD_TOL, "gqa dq")
    assert_close(dk, rk, *BWD_TOL, "gqa dk")
    assert_close(dv, rv, *BWD_TOL, "gqa dv")


def test_bwd_window():
    q, k, v = random_qkv(1, 2, 384, 64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(
            q, k, v, causal=True, window_size=64), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(
            q, k, v, causal=True, window_size=64), q, k, v
    )
    assert_close(dq, rq, *BWD_TOL, "win dq")
    assert_close(dk, rk, *BWD_TOL, "win dk")
    assert_close(dv, rv, *BWD_TOL, "win dv")


def test_bwd_window_banded_strip_gqa():
    """r5 banded-strip window backward (_win_dq_kernel/_win_dkv_kernel,
    the default path for qualifying shapes: causal window, D%128==0,
    aligned seq) vs reference autodiff on a GQA shape large enough for
    a real band (n_pre=1, multiple q blocks)."""
    from aule_tpu.ops import flash_vjp as fv

    q, k, v = random_qkv(1, 8, 1024, 128, heads_kv=2)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: fv.flash_attention_vjp(
            q, k, v, causal=True, window_size=256), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(
            q, k, v, causal=True, window_size=256), q, k, v
    )
    # the arange-weighted loss scales cotangents ~1000x at this size,
    # amplifying f32 kernel rounding; the r4 tail bug this guards was
    # ~0.4 RELATIVE (orders of magnitude above this gate)
    assert_close(dq, rq, 1e-3, 5e-3, "strip win dq")
    assert_close(dk, rk, 1e-3, 5e-3, "strip win dk")
    assert_close(dv, rv, 1e-3, 5e-3, "strip win dv")


def test_bwd_window_generic_banded_walk_tail(monkeypatch):
    """Regression for the r4 banded-walk dK/dV bug: when the band
    overran the last q block on a block-aligned sequence
    (q_ragged=False), the clipped q block leaked into the last W
    columns of dk/dv under GQA (caught in r5 by cross-checking against
    the banded-strip kernel).  Forces the generic walk with a kv tile
    narrow enough that the band engages (dkv_band < n_q)."""
    monkeypatch.setenv("AULE_FLASH_WIN_BWD", "0")
    monkeypatch.setenv("AULE_BWD_BKV", "256")
    q, k, v = random_qkv(1, 8, 1024, 128, heads_kv=2)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(
            q, k, v, causal=True, window_size=256), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(
            q, k, v, causal=True, window_size=256), q, k, v
    )
    assert_close(dq, rq, 1e-3, 5e-3, "gen win dq")
    assert_close(dk, rk, 1e-3, 5e-3, "gen win dk")
    assert_close(dv, rv, 1e-3, 5e-3, "gen win dv")


def test_bwd_rope_grads_flow():
    q, k, v = random_qkv(1, 2, 128, 64)
    cos, sin = precompute_rope_frequencies(128, 64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(
            q, k, v, causal=True, rope_cos=cos, rope_sin=sin), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(
            q, k, v, causal=True, rope_cos=cos, rope_sin=sin), q, k, v
    )
    assert_close(dq, rq, *BWD_TOL, "rope dq")
    assert_close(dk, rk, *BWD_TOL, "rope dk")
    assert_close(dv, rv, *BWD_TOL, "rope dv")


def test_training_step_loss_decreases():
    """End-to-end sanity: one SGD step lowers a toy loss
    (tests/test_torch_autograd.py analog)."""
    q, k, v = random_qkv(1, 2, 128, 64)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    target = jnp.asarray(random_qkv(1, 2, 128, 64, seed=7)[0])

    def loss_fn(params):
        out = flash_attention_vjp(params["q"], params["k"], params["v"],
                                  causal=True)
        return jnp.mean((out - target) ** 2)

    params = {"q": q, "k": k, "v": v}
    l0 = loss_fn(params)
    g = jax.grad(loss_fn)(params)
    params = jax.tree.map(lambda p, gr: p - 0.5 * gr, params, g)
    l1 = loss_fn(params)
    assert float(l1) < float(l0)


def test_fwd_d256_gqa_bf16():
    """D=256 end-to-end (SURVEY quirk list: the reference caps head_dim
    at 64 Vulkan / 128 Triton; we template D in {64,128,256})."""
    q, k, v = random_qkv(1, 8, 512, 256, heads_kv=2)
    got, _ = fwd(q.astype(np.float32), k.astype(np.float32),
                 v.astype(np.float32), causal=True)
    want = attention_reference_numpy(q, k, v, causal=True)
    assert_close(got, want, *F32_TOL, "d256 gqa")


def test_bwd_d256():
    q, k, v = random_qkv(1, 4, 256, 256, heads_kv=2)
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    dq, dk, dv = _grads(
        lambda q, k, v: flash_attention_vjp(q, k, v, causal=True), q, k, v
    )
    rq, rk, rv = _grads(
        lambda q, k, v: attention_reference(q, k, v, causal=True), q, k, v
    )
    # 2x-longer contractions than D=128 double the f32 rounding walk; on
    # chip the MXU's f32 passes land single outliers ~1e-2 abs on dk
    # (r3 campaign: 1/131072 elements at 8.3e-3 with mean err 4.7e-4),
    # so the chip atol floor is 1.5e-2; interpret keeps the tight floor.
    tol = (max(BWD_TOL[0], 5e-4),
           max(BWD_TOL[1] * 3, 5e-4) if _os.environ.get("AULE_TEST_TPU") == "1"
           else max(BWD_TOL[1], 5e-4))
    assert_close(dq, rq, *tol, "d256 dq")
    assert_close(dk, rk, *tol, "d256 dk")
    assert_close(dv, rv, *tol, "d256 dv")


# ---------------------------------------------------------------------------
# round-4 window-strip kernel (_win_kernel): the dedicated causal
# sliding-window schedule (single-pass banded strips, kv-grid-free;
# chip-measured 4.2x/2.4x/8.9x vs full causal at S=4k/2k/8k W=256).
# ---------------------------------------------------------------------------

def test_window_strip_kernel_dispatch_and_oracle():
    """Qualifying causal-window shapes must take the banded-strip path
    (LAST_LAYOUT.win_strips > 0) and match the oracle, including the
    i < n_pre left edge (clamped chunks masked by the cols>=0 term),
    W > bq (n_pre > 1), GQA and MHA, and LSE."""
    from aule_tpu.ops import flash

    for (b, hq, hkv, s, d, w) in [(1, 8, 2, 1024, 128, 256),
                                  (1, 4, 4, 512, 128, 100),
                                  (1, 8, 2, 1024, 128, 700),
                                  (1, 8, 2, 1024, 256, 256)]:
        q, k, v = random_qkv(b, hq, s, d, heads_kv=hkv)
        got, lse = fwd(q, k, v, causal=True, window_size=w)
        lay = dict(flash.LAST_LAYOUT)
        assert lay.get("win_strips", 0) > 0, (lay, (s, d, w))
        want, wlse = attention_reference_numpy(
            q, k, v, causal=True, window_size=w, return_lse=True)
        assert_close(got, want, *F32_TOL, f"win-strip S={s} W={w}")
        assert_close(lse, wlse, 1e-4, 1e-4, f"win-strip lse W={w}")


def test_window_strip_kernel_rope_fused():
    from aule_tpu.ops import flash

    s, d = 512, 128
    q, k, v = random_qkv(1, 4, s, d, heads_kv=2)
    cos, sin = precompute_rope_frequencies(s, d, 10000.0)
    out = flash_attention_fwd(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True,
        window_size=128, rope_cos=cos, rope_sin=sin, return_lse=False)
    assert dict(flash.LAST_LAYOUT).get("win_strips", 0) > 0
    qr = np.asarray(apply_rope(jnp.asarray(q), cos, sin))
    kr = np.asarray(apply_rope(jnp.asarray(k), cos, sin))
    want = attention_reference_numpy(qr, kr, v, causal=True,
                                     window_size=128)
    assert_close(np.asarray(out), want, 5e-4, 5e-4, "win-strip rope")


def test_window_strip_kernel_bidirectional():
    """r5: bidirectional sliding windows ride the banded-strip kernel
    too (the reference's half-window form, attention_f32.comp:173-187):
    n_post = n_pre extra band chunks above the diagonal, top-clamped
    chunks killed by the cols < seq mask term.  Pins dispatch
    (win_strips > 0, n_post > 0) and the oracle, including W > bq and
    both sequence edges."""
    from aule_tpu.ops import flash

    for (b, hq, hkv, s, d, w) in [(1, 8, 2, 1024, 128, 256),
                                  (1, 4, 4, 512, 128, 100),
                                  (1, 8, 2, 1024, 128, 700)]:
        q, k, v = random_qkv(b, hq, s, d, heads_kv=hkv)
        got, lse = fwd(q, k, v, causal=False, window_size=w)
        lay = dict(flash.LAST_LAYOUT)
        assert lay.get("win_strips", 0) > 0, (lay, (s, d, w))
        assert lay.get("n_post", 0) == lay.get("n_pre"), lay
        want, wlse = attention_reference_numpy(
            q, k, v, causal=False, window_size=w, return_lse=True)
        assert_close(got, want, *F32_TOL, f"bidi win-strip S={s} W={w}")
        assert_close(lse, wlse, 1e-4, 1e-4, f"bidi win-strip lse W={w}")


def test_window_nonqualifying_shapes_fall_back():
    """W >= seq and ragged seq stay on the generic schedule — and stay
    correct.  (Non-causal windows joined the banded path in r5; see
    test_window_strip_kernel_bidirectional.)"""
    from aule_tpu.ops import flash

    q, k, v = random_qkv(1, 4, 320, 128, heads_kv=2)  # ragged
    got, _ = fwd(q, k, v, causal=True, window_size=64)
    assert dict(flash.LAST_LAYOUT).get("win_strips", 0) == 0
    want = attention_reference_numpy(q, k, v, causal=True, window_size=64)
    assert_close(got, want, *F32_TOL, "ragged window fallback")

    q, k, v = random_qkv(1, 4, 512, 128, heads_kv=2)  # W >= seq
    got, _ = fwd(q, k, v, causal=False, window_size=600)
    assert dict(flash.LAST_LAYOUT).get("win_strips", 0) == 0
    want = attention_reference_numpy(q, k, v, window_size=600)
    assert_close(got, want, *F32_TOL, "W>=seq window fallback")
