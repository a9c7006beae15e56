"""Drop-in `dot_product_attention` + global patch of jax.nn.

The reference monkeypatches `torch.nn.functional.scaled_dot_product_attention`
globally and falls back to the saved original for unsupported arguments
(python/aule/__init__.py:288-350).  The JAX-native equivalent is a drop-in
for `jax.nn.dot_product_attention` (BTNH layout) that routes through
aule-tpu's flash_attention for the supported argument space and defers to
the saved original otherwise.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("aule_tpu")

# Saved original so uninstall() can restore it and the fallback can call it.
_original_dpa = None
_patch_backend: Optional[str] = None

# Global knobs for patched models (reference: patching.py:10-13).
#   causal: None = honor each call site's own is_causal; True/False =
#           force (the reference's diffusion-vs-LLM toggle).
#   backend: forced aule backend for patched models (None = auto).
# (the reference's dead `use_rope` knob is deliberately not carried over —
# fused RoPE is a first-class flash_attention argument here.)
PATCH_CONFIG = {
    "causal": None,
    "backend": None,
}


def dot_product_attention(
    query,
    key,
    value,
    bias=None,
    mask=None,
    *,
    scale=None,
    is_causal: bool = False,
    query_seq_lengths=None,
    key_value_seq_lengths=None,
    local_window_size=None,
    implementation=None,
    **kwargs,
):
    """Drop-in for jax.nn.dot_product_attention (BTNH layout).

    Routes through aule-tpu when the arguments are in our supported space;
    otherwise falls back to the original jax.nn implementation, mirroring
    the reference's fallback behavior (__init__.py:319-347).
    """
    unsupported = (
        bias is not None
        or mask is not None
        or query_seq_lengths is not None
        or key_value_seq_lengths is not None
        or query.ndim != 4
    )
    if unsupported:
        orig = _original_dpa or jax.nn.dot_product_attention
        return orig(
            query, key, value, bias, mask,
            scale=scale, is_causal=is_causal,
            query_seq_lengths=query_seq_lengths,
            key_value_seq_lengths=key_value_seq_lengths,
            local_window_size=local_window_size,
            implementation=implementation, **kwargs,
        )

    from .. import flash_attention

    window = -1
    causal = is_causal
    if local_window_size is not None:
        left, right = local_window_size
        if right == 0:
            causal = True
            window = left
        else:
            window = max(left, right)

    # BTNH -> BHTD
    q = jnp.swapaxes(query, 1, 2)
    k = jnp.swapaxes(key, 1, 2)
    v = jnp.swapaxes(value, 1, 2)
    out = flash_attention(
        q, k, v, causal=causal, scale=scale, window_size=window,
        backend=_patch_backend,
    )
    return jnp.swapaxes(out, 1, 2)


def install_sdpa_patch(backend: Optional[str] = None) -> None:
    global _original_dpa, _patch_backend
    if _original_dpa is None:
        _original_dpa = jax.nn.dot_product_attention
    _patch_backend = backend
    jax.nn.dot_product_attention = dot_product_attention
    logger.debug("patched jax.nn.dot_product_attention (backend=%s)", backend)


def uninstall_sdpa_patch() -> None:
    global _original_dpa
    if _original_dpa is not None:
        jax.nn.dot_product_attention = _original_dpa
        _original_dpa = None


# ---------------------------------------------------------------------------
# HF torch models: an `aule_tpu` entry in transformers' attention-interface
# registry.  The reference monkeypatches GPT2Attention.forward only
# (patching.py:82-100); registering the interface routes EVERY HF torch
# model whose attention goes through ALL_ATTENTION_FUNCTIONS (the modern
# seam the per-class forward patch predates).
# ---------------------------------------------------------------------------

_hf_registered = False
# test/debug visibility: counts calls routed through the aule interface
PATCH_STATS = {"calls": 0}

_KV_BUCKET = 128


@functools.partial(jax.jit, static_argnames=("scale", "backend"))
def _bucketed_decode_attn(qj, kj, vj, kv_len, scale, backend):
    """One-token decode attention over bucket-padded KV (jitted: shape
    stability across decode steps comes from kv_len being traced)."""
    from .. import flash_attention

    out = flash_attention(qj, kj, vj, causal=False, scale=scale,
                          backend=backend, kv_len=kv_len)
    return jnp.swapaxes(out, 1, 2)


def _torch_to_jax(t):
    """torch -> JAX, zero-copy via dlpack when the buffer is shareable
    (CPU/contiguous/dlpack-supported dtype); else one host copy.  The
    f32 upcast of r2 is gone — flash_attention handles f32/bf16/f16."""
    t = t.detach().contiguous()
    try:
        return jnp.from_dlpack(t)
    except Exception:
        import torch

        t = t.cpu()  # accelerator tensors can't .numpy() directly
        if t.dtype == torch.bfloat16:  # numpy has no bf16
            return jnp.asarray(t.view(torch.uint16).numpy()).view(
                jnp.bfloat16)
        return jnp.asarray(t.numpy())


def _jax_to_torch(x, like):
    """JAX -> torch tensor with `like`'s dtype/device; dlpack zero-copy
    when buffers are shareable, else one host copy."""
    import torch

    try:
        return torch.from_dlpack(x).to(dtype=like.dtype,
                                       device=like.device)
    except Exception:
        xn = np.asarray(jax.device_get(x))
        if xn.dtype == jnp.bfloat16:
            return torch.from_numpy(
                xn.view(np.uint16)).view(torch.bfloat16).to(
                    dtype=like.dtype, device=like.device)
        return torch.from_numpy(xn).to(dtype=like.dtype,
                                       device=like.device)


def _aule_hf_attention(module, query, key, value, attention_mask,
                       dropout: float = 0.0, scaling=None, is_causal=None,
                       head_mask=None, **kwargs):
    """transformers AttentionInterface entry.

    query/key/value: torch [B, H, S, D]; returns (out [B, S, H, D], None).
    Arguments outside aule's space (additive masks, dropout, head masks)
    defer to HF's sdpa implementation — the reference's fallback contract
    (python/aule/__init__.py:319-347).

    INFERENCE-ONLY as an aule route: the JAX hop breaks torch autograd,
    so any call that needs grads (torch grad mode on AND a q/k/v requires
    grad) also defers to sdpa rather than silently detaching.
    """
    import torch

    unsupported = (attention_mask is not None or dropout
                   or head_mask is not None
                   or kwargs.get("softcap") is not None
                   or (torch.is_grad_enabled()
                       and (query.requires_grad or key.requires_grad
                            or value.requires_grad)))
    if unsupported:
        from transformers.integrations.sdpa_attention import (
            sdpa_attention_forward,
        )

        return sdpa_attention_forward(
            module, query, key, value, attention_mask,
            dropout=dropout, scaling=scaling, is_causal=is_causal,
            **kwargs)

    causal = PATCH_CONFIG["causal"]
    if causal is None:
        if is_causal is None:
            is_causal = (query.shape[2] > 1
                         and getattr(module, "is_causal", True))
        causal = bool(is_causal)

    from .. import flash_attention

    qj, kj, vj = (_torch_to_jax(t) for t in (query, key, value))
    backend = PATCH_CONFIG["backend"] or _patch_backend
    PATCH_STATS["calls"] += 1
    from ..backends import select_backend

    if query.shape[2] == 1 and select_backend(backend) != "numpy":
        # decode step: KV grows by one token per call, which would jit a
        # fresh kernel per shape; pad KV to a 128-token bucket and pass
        # the true length as a traced kv_len so every step in a bucket
        # reuses one compile (generate cost becomes ~n_buckets compiles,
        # not ~n_tokens).
        sk = kj.shape[2]
        sk_pad = -(-sk // _KV_BUCKET) * _KV_BUCKET
        if sk_pad != sk:
            pad = ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0))
            kj = jnp.pad(kj, pad)
            vj = jnp.pad(vj, pad)
        out = _bucketed_decode_attn(qj, kj, vj, jnp.int32(sk),
                                    scaling, backend)
        return _jax_to_torch(out, query), None
    out = flash_attention(
        qj, kj, vj, causal=causal, scale=scaling, backend=backend)
    # transpose in JAX so the dlpack handoff sees a contiguous buffer
    out = jnp.swapaxes(jnp.asarray(out), 1, 2)
    return _jax_to_torch(out, query), None


def _register_hf_interface() -> None:
    global _hf_registered
    if _hf_registered:
        return
    from transformers.modeling_utils import ALL_ATTENTION_FUNCTIONS

    ALL_ATTENTION_FUNCTIONS.register("aule_tpu", _aule_hf_attention)
    _hf_registered = True


def patch_model(model, causal: Optional[bool] = None,
                backend: Optional[str] = None):
    """Route a model's attention through aule kernels.

    * HF torch models (anything with `config._attn_implementation`):
      registers the `aule_tpu` attention interface and switches the model
      onto it — every attention layer's q/k/v then flows through
      `aule_tpu.flash_attention` (reference analog: the GPT2Attention
      forward monkeypatch, patching.py:103-128, generalized to all
      architectures via the HF attention registry).
    * JAX/Flax models: attention reaching jax.nn.dot_product_attention
      picks up the global SDPA patch (install_sdpa_patch).

    causal: None honors each call site's is_causal; True/False forces it
    (PATCH_CONFIG["causal"], the reference's diffusion-vs-LLM toggle).
    """
    PATCH_CONFIG["causal"] = causal
    PATCH_CONFIG["backend"] = backend
    if hasattr(model, "config") and hasattr(model.config,
                                            "_attn_implementation"):
        _register_hf_interface()
        try:
            model.set_attn_implementation("aule_tpu")
        except AttributeError:  # older transformers
            model.config._attn_implementation = "aule_tpu"
        return model
    install_sdpa_patch(backend)
    return model
