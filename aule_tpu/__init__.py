"""aule-tpu: a TPU-native FlashAttention-2 engine (JAX / XLA / Pallas).

Brand-new implementation of the capability surface of the reference
`aule-attention` library (see /root/repo/SURVEY.md): one public
`flash_attention(q, k, v, ...)` entry point with swappable backends
(pallas -> xla -> numpy instead of triton -> vulkan -> cpu,
python/aule/__init__.py:104-275), fused RoPE, GQA/MQA, cross-attention,
causal + sliding-window masks, a trainable backward pass, paged (vLLM-style)
decode over a block-table KV cache, top-k "gravity" attention — extended
with TPU-first capabilities the reference lacks: bf16/fp8/int8 KV, sharded
attention over a `jax.sharding.Mesh`, and a continuous-batching serving
engine.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .backends import (
    get_available_backends,
    get_backend_errors,
    get_backend_info,
    print_backend_info,
    select_backend,
)
from .config import AuleConfig, get_config, set_config
from .ops.reference import (
    attention_reference,
    attention_reference_numpy,
    paged_attention_reference,
)
from .ops.rope import apply_rope, precompute_rope_frequencies
from .ops.topk import gravity_attention, spatial_sort

__version__ = "0.2.0"

logger = logging.getLogger("aule_tpu")


def _validate(q, k, v) -> None:
    """Shape/GQA validation, mirroring python/aule/__init__.py:140-160."""
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be 4-D [batch, heads, seq, head_dim]; got "
            f"{q.shape}, {k.shape}, {v.shape}"
        )
    if q.shape[0] != k.shape[0] or q.shape[0] != v.shape[0]:
        raise ValueError("batch dims must match")
    if q.shape[3] != k.shape[3] or q.shape[3] != v.shape[3]:
        raise ValueError("head_dim must match across q/k/v")
    if k.shape != v.shape:
        raise ValueError(f"k and v shapes must match; got {k.shape} vs {v.shape}")
    hq, hkv = q.shape[1], k.shape[1]
    if hq % hkv != 0:
        raise ValueError(
            f"num q heads ({hq}) must be divisible by kv heads ({hkv})"
        )


def flash_attention(
    q,
    k,
    v,
    causal: bool = False,
    scale: Optional[float] = None,
    window_size: int = -1,
    rope_cos=None,
    rope_sin=None,
    backend: Optional[str] = None,
    return_lse: bool = False,
    kv_len=None,
):
    """Fused multi-head attention over [batch, heads, seq, head_dim].

    Public entry point, same contract as the reference's
    `aule.flash_attention` (python/aule/__init__.py:104-244):

    Args:
      q: [B, Hq, Sq, D]; k, v: [B, Hkv, Sk, D] with Hq % Hkv == 0 (GQA/MQA)
         and Sq != Sk allowed (cross-attention).
      causal: apply causal mask (q_idx >= k_idx).
      scale: softmax scale; defaults to 1/sqrt(D).
      window_size: sliding window (tokens); -1 disables.  Causal windows
        allow k in [q - W, q]; bidirectional windows allow |q - k| <= W.
      rope_cos / rope_sin: optional [S, D/2] tables for fused RoPE on Q & K
        (half-split convention; see ops/rope.py).
      backend: force 'pallas' | 'xla' | 'numpy'; default auto-selects.
      return_lse: also return the natural-log row log-sum-exp [B, Hq, Sq]
        (the reference's forward-with-LSE training surface,
        python/aule/vulkan.py:824-889).  Differentiable in both outputs on
        the pallas/xla backends (the lse cotangent folds into the
        backward's delta term, ops/flash_vjp.py).
      kv_len: optional (traced) int32 scalar — only the first kv_len k/v
        positions attend.  Lets callers pad k/v to a shape bucket and
        vary the true length without recompiling (varlen decode; used by
        the HF patch).  Forward-only on the pallas backend.

    Returns an array shaped like q, in q's dtype (or an (out, lse) pair
    with return_lse=True).
    """
    _validate(q, k, v)
    chosen = select_backend(backend)
    if get_config().verbose:
        logger.info("flash_attention backend=%s q=%s k=%s", chosen, q.shape, k.shape)

    if chosen == "pallas":
        if kv_len is not None:
            from .ops.flash import flash_attention_fwd

            if rope_cos is not None:
                q = apply_rope(q, rope_cos, rope_sin)
                k = apply_rope(k, rope_cos, rope_sin)
            return flash_attention_fwd(
                q, k, v, causal=causal, scale=scale,
                window_size=window_size, kv_len=kv_len,
                return_lse=return_lse,
            )
        if return_lse:
            from .ops.flash_vjp import flash_attention_lse
            from .ops.rope import apply_rope as _rope

            if rope_cos is not None:
                q = _rope(q, rope_cos, rope_sin)
                k = _rope(k, rope_cos, rope_sin)
            return flash_attention_lse(
                q, k, v, causal=causal, scale=scale,
                window_size=window_size,
            )
        from .ops.flash import flash_attention_pallas

        return flash_attention_pallas(
            q, k, v,
            causal=causal,
            scale=scale,
            window_size=window_size,
            rope_cos=rope_cos,
            rope_sin=rope_sin,
        )
    if chosen == "xla":
        return attention_reference(
            q, k, v,
            causal=causal,
            scale=scale,
            window_size=window_size,
            rope_cos=rope_cos,
            rope_sin=rope_sin,
            return_lse=return_lse,
            kv_len=kv_len,
        )
    # numpy fallback (concrete arrays: varlen bucketing reduces to a slice)
    if kv_len is not None:
        k = np.asarray(k)[:, :, :int(kv_len)]
        v = np.asarray(v)[:, :, :int(kv_len)]
    if rope_cos is not None:
        qr = apply_rope(jnp.asarray(q, jnp.float32), rope_cos, rope_sin)
        kr = apply_rope(jnp.asarray(k, jnp.float32), rope_cos, rope_sin)
        q, k = np.asarray(qr), np.asarray(kr)
    out = attention_reference_numpy(
        np.asarray(q), np.asarray(k), np.asarray(v),
        causal=causal, scale=scale, window_size=window_size,
        return_lse=return_lse,
    )
    return out


# ---------------------------------------------------------------------------
# install()/uninstall(): global default-backend switch + integration patch
# (reference: python/aule/__init__.py:353-442)
# ---------------------------------------------------------------------------

_installed = False
_forced_backend: Optional[str] = None


def install(backend: Optional[str] = None, verbose: bool = False) -> None:
    """Set a global backend default and patch jax.nn.dot_product_attention.

    Analog of the reference's SDPA monkeypatch installer
    (python/aule/__init__.py:353-421).
    """
    global _installed, _forced_backend
    cfg = get_config()
    cfg.backend = backend
    cfg.verbose = verbose
    _forced_backend = backend
    from .integration.patching import install_sdpa_patch

    install_sdpa_patch(backend=backend)
    _installed = True
    if verbose:
        print_backend_info()


def uninstall() -> None:
    """Undo install(): restore jax.nn.dot_product_attention, clear force."""
    global _installed, _forced_backend
    get_config().backend = None
    _forced_backend = None
    from .integration.patching import uninstall_sdpa_patch

    uninstall_sdpa_patch()
    _installed = False


def paged_attention(*args, **kwargs):
    """Paged decode attention over a block-table KV cache (lazy import;
    see ops/paged.py for the cache contract)."""
    from .ops.paged import paged_attention as _impl

    return _impl(*args, **kwargs)


def paged_attention_fused(*args, **kwargs):
    """Fused-layout paged decode — the serving fast path (lazy import;
    see ops/paged_fused.py for the pool layout)."""
    from .ops.paged_fused import paged_attention_fused as _impl

    return _impl(*args, **kwargs)


def paged_attention_prefill(*args, **kwargs):
    """Chunked/multi-turn prefill over a fused paged cache (lazy import;
    see ops/paged_fused.py)."""
    from .ops.paged_fused import paged_attention_prefill as _impl

    return _impl(*args, **kwargs)


def flash_attention_rope(*args, **kwargs):
    """Inference fast path with RoPE fused inside the kernel (the
    reference's public flash_attention_rope, triton_flash.py:561-603)."""
    from .ops.flash import flash_attention_rope as _impl

    return _impl(*args, **kwargs)


def flash_attention_lse(*args, **kwargs):
    """Differentiable (out, lse) pair — the reference's public
    forward-with-LSE training surface (vulkan.py:824-962)."""
    from .ops.flash_vjp import flash_attention_lse as _impl

    return _impl(*args, **kwargs)


def patch_model(model, causal=None, backend=None):
    """Route a model's attention through aule kernels (HF torch models
    via the attention-interface registry; JAX models via the SDPA patch).
    Reference analog: python/aule/patching.py::patch_model."""
    from .integration.patching import patch_model as _impl

    return _impl(model, causal=causal, backend=backend)


def dot_product_attention(*args, **kwargs):
    """Drop-in for jax.nn.dot_product_attention (BTNH layout) — the
    reference's scaled_dot_product_attention analog
    (python/aule/__init__.py:288-350)."""
    from .integration.patching import dot_product_attention as _impl

    return _impl(*args, **kwargs)


__all__ = [
    "flash_attention",
    "flash_attention_rope",
    "flash_attention_lse",
    "dot_product_attention",
    "patch_model",
    "paged_attention",
    "paged_attention_fused",
    "paged_attention_prefill",
    "gravity_attention",
    "spatial_sort",
    "attention_reference",
    "attention_reference_numpy",
    "paged_attention_reference",
    "precompute_rope_frequencies",
    "apply_rope",
    "get_available_backends",
    "get_backend_errors",
    "get_backend_info",
    "print_backend_info",
    "install",
    "uninstall",
    "AuleConfig",
    "get_config",
    "set_config",
    "__version__",
]
