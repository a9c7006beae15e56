"""Quantized-cache serving engine tests (int8 KV end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def test_quantized_engine_runs_and_tracks_fp32(params):
    """int8-cache generation completes; the first decode step's logits are
    close to the fp32-cache engine's (same prefill, quantization noise only
    in the cache)."""
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 256, size=9).astype(np.int32)

    outs = {}
    for quant in (False, True):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, quantized=quant)
        eng.submit(prompt, max_new_tokens=5)
        done = eng.run()
        assert len(done) == 1
        assert len(done[0].output) == 5
        outs[quant] = done[0].output

    # first token comes from full-precision prefill logits -> identical
    assert outs[True][0] == outs[False][0]


def test_quantized_decode_step_logits_close(params):
    """Single decode step: int8-cache logits close to f32-cache logits."""
    rng = np.random.default_rng(5)
    B, L = 2, CFG.n_layers
    page, npages, maxp = 16, 32, 4
    bt = jnp.asarray(np.arange(B * maxp, dtype=np.int32).reshape(B, maxp) + 1)
    lens = jnp.asarray(np.array([7, 3], np.int32))

    # seed caches with identical history
    hist_k = rng.standard_normal((L, B, CFG.n_kv_heads, 7, CFG.head_dim)
                                 ).astype(np.float32)
    hist_v = rng.standard_normal((L, B, CFG.n_kv_heads, 7, CFG.head_dim)
                                 ).astype(np.float32)
    from aule_tpu.ops.paged import (
        kv_cache_append_prefill,
        kv_cache_append_prefill_quantized,
    )

    kf = jnp.zeros((L, CFG.n_kv_heads, npages, page, CFG.head_dim))
    vf = jnp.zeros_like(kf)
    kq = jnp.zeros(kf.shape, jnp.int8)
    vq = jnp.zeros(kf.shape, jnp.int8)
    ks = jnp.zeros(kf.shape[:-1], jnp.float32)
    vs = jnp.zeros(kf.shape[:-1], jnp.float32)
    seq_lens = jnp.asarray(lens)
    zeros = jnp.zeros((B,), jnp.int32)
    for li in range(L):
        a, b_, _ = kv_cache_append_prefill(
            kf[li], vf[li], jnp.asarray(hist_k[li]), jnp.asarray(hist_v[li]),
            bt, zeros, seq_lens)
        kf, vf = kf.at[li].set(a), vf.at[li].set(b_)
        a, b_, c, d, _ = kv_cache_append_prefill_quantized(
            kq[li], vq[li], ks[li], vs[li],
            jnp.asarray(hist_k[li]), jnp.asarray(hist_v[li]),
            bt, zeros, seq_lens)
        kq, vq = kq.at[li].set(a), vq.at[li].set(b_)
        ks, vs = ks.at[li].set(c), vs.at[li].set(d)

    token = jnp.asarray([5, 9], jnp.int32)
    from aule_tpu.ops.rope import precompute_rope_frequencies

    cos, sin = precompute_rope_frequencies(64, CFG.head_dim, CFG.rope_base)
    logits_f, *_ = llama.decode_step(
        params, token, lens, [kf[i] for i in range(L)],
        [vf[i] for i in range(L)], bt, lens, CFG, cos, sin)
    logits_q, *_ = llama.decode_step(
        params, token, lens, [kq[i] for i in range(L)],
        [vq[i] for i in range(L)], bt, lens, CFG, cos, sin,
        k_scales=[ks[i] for i in range(L)],
        v_scales=[vs[i] for i in range(L)])
    err = np.abs(np.asarray(logits_f) - np.asarray(logits_q)).max()
    rng_mag = np.abs(np.asarray(logits_f)).max()
    assert err < 0.05 * max(rng_mag, 1.0), (err, rng_mag)


@pytest.mark.parametrize("quant", [False, True])
def test_chunked_prefill_matches_whole(params, quant):
    """Chunked prefill (paged_attention_prefill over cache history) must
    generate the same tokens as whole-prompt prefill."""
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, 256, size=n).astype(np.int32)
               for n in (23, 8, 40)]

    outs = {}
    for chunk in (None, 8):
        eng = ServingEngine(params, CFG, max_batch=4, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256, quantized=quant,
                            prefill_chunk=chunk)
        for p in prompts:
            eng.submit(p, max_new_tokens=6)
        done = eng.run()
        assert len(done) == len(prompts)
        outs[chunk] = [r.output for r in done]

    for a, b in zip(outs[None], outs[8]):
        assert a == b, f"chunked prefill diverged: {a} vs {b}"


def test_fp8_engine_end_to_end(params):
    """FP8 (e4m3) KV serving end-to-end: generation completes and the
    first decode-step token matches the f32-cache engine (prefill logits
    are full precision).  BASELINE north-star config 5; on v5e fp8 casts
    are software-emulated so int8 stays the perf default."""
    rng = np.random.default_rng(12)
    prompt = rng.integers(0, 256, size=9).astype(np.int32)

    outs = {}
    for quant_dtype in (None, jnp.float8_e4m3fn):
        eng = ServingEngine(params, CFG, max_batch=2, page_size=16,
                            num_pages=64, max_pages_per_seq=8,
                            max_seq_len=256,
                            quantized=quant_dtype is not None,
                            quant_dtype=quant_dtype or jnp.int8)
        eng.submit(prompt, max_new_tokens=5)
        done = eng.run()
        assert len(done) == 1
        assert len(done[0].output) == 5
        outs[quant_dtype is None] = done[0].output
    assert outs[True][0] == outs[False][0]


def test_fp8_engine_rejects_bad_dtype(params):
    with pytest.raises(ValueError, match="quant_dtype"):
        ServingEngine(params, CFG, max_batch=1, page_size=16,
                      num_pages=32, max_pages_per_seq=4, max_seq_len=64,
                      quantized=True, quant_dtype=jnp.float16)
