"""Global configuration for aule-tpu.

The reference library scatters configuration over env vars, install() args,
a shader-variant enum and hard-coded constants (see /root/reference
src/backends/backend.zig:86-99, python/aule/__init__.py:353-421).  Here the
equivalent is one dataclass with env-var overrides, plus a per-TPU-generation
tile table that replaces the reference's shader-variant selection
(src/attention_gpu.zig:187-224).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


def _env_str(name: str, default: Optional[str]) -> Optional[str]:
    v = os.environ.get(name)
    return v if v else default


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


@dataclasses.dataclass
class TileConfig:
    """Kernel tile sizes for one device generation / dtype regime.

    Plays the role of the reference's shader-variant enum
    (baseline/fast/fp16/fp16_amd, src/attention_gpu.zig:22-27): instead of
    swapping shaders we swap Pallas block sizes.
    """

    block_q: int = 256
    block_kv: int = 512
    # compute sub-chunk within a DMA'd kv tile (None = whole tile);
    # lets the DMA tile grow without growing the f32 score tile
    block_kv_compute: Optional[int] = None
    # backward tiles: q-row budgets are TOTAL rows per grid step (split
    # across the GQA group, like block_q).  v5e r2 sweep, S=2048 GQA
    # fwd+bwd: (1024,1024) 99.5 TFLOP/s eff > (1024,512)/(512,2048) ~98
    # > (512,1024) 93; rows=2048 exceeds scoped VMEM.
    block_q_dkv: int = 1024
    block_kv_dkv: int = 1024
    block_q_dq: int = 1024
    block_kv_dq: int = 1024
    # paged decode (fused-layout sweep on v5e: ppcb 32 > 16 >> 8;
    # split layout is DMA-issue-bound and flat in ppcb)
    pages_per_compute_block: int = 8
    pages_per_compute_block_fused: int = 32


# Per-generation tuned tiles.  Keys match jax device_kind prefixes.
# v5e measured sweep (scripts/tune_blocks.py, B4 H32/8 S4096 D128 bf16
# causal, on-device fori_loop timing): (1024,1024) 92 TFLOP/s >
# (512,1024) 78 > (1024,2048) 81 > (512,512) 48; block_q=2048 exceeds
# the scoped-VMEM limit.
# Two-level kv blocking (block_kv DMA tile, block_kv_compute chunk):
# (1024, 4096, c1024) measured 96.8 TFLOP/s vs 93.0 for (1024, 1024)
# at B4/S4096 bf16; the flash wrapper clamps the DMA tile for f32 /
# VMEM limits.
TILE_TABLE = {
    "default": TileConfig(block_q=1024, block_kv=4096,
                          block_kv_compute=1024),
    "v5 lite": TileConfig(block_q=1024, block_kv=4096,
                          block_kv_compute=1024),
    "v5e": TileConfig(block_q=1024, block_kv=4096,
                      block_kv_compute=1024),
    "v5p": TileConfig(block_q=1024, block_kv=4096,
                      block_kv_compute=1024),
    "v6": TileConfig(block_q=1024, block_kv=4096,
                     block_kv_compute=1024),
}


@dataclasses.dataclass
class AuleConfig:
    """Library-wide settings, overridable via environment.

    Env vars (analogous to the reference's AULE_BACKEND):
      AULE_TPU_BACKEND     = pallas | xla | numpy   (force backend)
      AULE_TPU_INTERPRET   = 1                      (Pallas interpreter mode)
      AULE_TPU_VERBOSE     = 1                      (per-call debug logs)
      AULE_TPU_INT8_EXACT  = 1                      (int8 pools: exact
                             dequant-then-bf16-matmul path instead of the
                             ~2x-faster int8-MXU path with ~1% extra error)
    """

    backend: Optional[str] = None  # None = auto-detect
    interpret: bool = False
    verbose: bool = False
    # int8 KV decode numerics: False (default) runs both decode matmuls
    # on the int8 MXU with per-row q/p quantization (fast path); True
    # forces exact scale-folded dequantization.  Per-call int8_matmul=
    # overrides this.
    int8_exact: bool = False
    # paged KV-cache defaults (reference: block_size=32, pool 512..8192
    # blocks, src/block_pool.zig:9-16; BASELINE decode config uses block=16)
    page_size: int = 16
    initial_pages: int = 512
    max_pages: int = 8192
    max_pages_per_seq: int = 256

    @classmethod
    def from_env(cls) -> "AuleConfig":
        return cls(
            backend=_env_str("AULE_TPU_BACKEND", None),
            interpret=_env_bool("AULE_TPU_INTERPRET", False),
            verbose=_env_bool("AULE_TPU_VERBOSE", False),
            int8_exact=_env_bool("AULE_TPU_INT8_EXACT", False),
        )


_config: Optional[AuleConfig] = None


def get_config() -> AuleConfig:
    global _config
    if _config is None:
        _config = AuleConfig.from_env()
    return _config


def set_config(cfg: AuleConfig) -> None:
    global _config
    _config = cfg


def get_tile_config(device_kind: Optional[str] = None) -> TileConfig:
    """Pick tile sizes for the current (or given) device kind."""
    if device_kind is None:
        try:
            import jax

            device_kind = jax.devices()[0].device_kind.lower()
        except Exception:  # pragma: no cover - no devices at all
            device_kind = "default"
    device_kind = device_kind.lower()
    for key, tiles in TILE_TABLE.items():
        if key != "default" and key in device_kind:
            return tiles
    return TILE_TABLE["default"]
