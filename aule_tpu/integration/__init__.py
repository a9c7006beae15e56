"""Integration layer: SDPA-style patching and model patch helpers.

TPU analog of the reference's L5 integration layer
(python/aule/__init__.py:288-442, python/aule/patching.py).
"""

from .patching import (
    dot_product_attention,
    install_sdpa_patch,
    uninstall_sdpa_patch,
    patch_model,
    PATCH_CONFIG,
)

__all__ = [
    "dot_product_attention",
    "install_sdpa_patch",
    "uninstall_sdpa_patch",
    "patch_model",
    "PATCH_CONFIG",
]
