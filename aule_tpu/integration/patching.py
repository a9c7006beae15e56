"""Drop-in `dot_product_attention` + global patch of jax.nn.

The reference monkeypatches `torch.nn.functional.scaled_dot_product_attention`
globally and falls back to the saved original for unsupported arguments
(python/aule/__init__.py:288-350).  The JAX-native equivalent is a drop-in
for `jax.nn.dot_product_attention` (BTNH layout) that routes through
aule-tpu's flash_attention for the supported argument space and defers to
the saved original otherwise.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("aule_tpu")

# Saved original so uninstall() can restore it and the fallback can call it.
_original_dpa = None
_patch_backend: Optional[str] = None

# Global knobs for patched models (reference: patching.py:10-13).
PATCH_CONFIG = {
    "causal": True,
    "use_rope": False,
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


def patch_model(model, causal: Optional[bool] = None):
    """Patch a Flax/Transformers-style module tree to use aule attention.

    Reference analog: patching.py:103-128 (GPT-2 forward monkeypatch).  For
    JAX models we patch at the functional seam instead: any module whose
    attention goes through jax.nn.dot_product_attention picks up the global
    patch from install(); this helper flips PATCH_CONFIG and installs.
    """
    if causal is not None:
        PATCH_CONFIG["causal"] = causal
    install_sdpa_patch()
    return model
