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
    # diagonal-strip causal schedule: None = global default (2, the r4
    # sweep winner at every D=128 shape: S4096 117.8/111.2 vs strips4
    # 112.0/106.8 TF/s, S2048 89.3 vs 80.0, S8192 127.5 vs 124.1);
    # 0 = diag off for shapes where the generic walk measures faster
    # (D=256).  AULE_FLASH_DIAG_STRIPS still overrides at trace time.
    diag_strips: Optional[int] = None


@dataclasses.dataclass
class TileRule:
    """One shape-keyed row of the tuned tile table.

    The reference autotunes 13 Triton configs keyed on head_dim per GPU
    arch (triton_flash_amd.py:58-95, vulkan_context.zig:254-319); the
    TPU analog keys TileConfig rows on (device_kind, head_dim range,
    seq_k range).  First matching rule wins; a rule with no bounds is
    the device's default.
    """

    tiles: TileConfig
    min_head_dim: int = 0
    max_head_dim: int = 1 << 30
    min_seq: int = 0
    max_seq: int = 1 << 30
    # None = matches both; True/False = only that mask mode.  Causal and
    # non-causal prefill want different chunk geometry: non-causal peaks
    # with wide maskless chunks (c2048 = 154 TF/s on v5e), causal wants
    # the diagonal-aligned block_q == block_kv_compute walk that turns
    # the ~bkvc/S misalignment waste into the bkvc/(2S) triangle.
    causal: Optional[bool] = None
    note: str = ""

    def matches(self, head_dim: Optional[int], seq: Optional[int],
                causal: Optional[bool] = None) -> bool:
        if head_dim is not None and not (
                self.min_head_dim <= head_dim <= self.max_head_dim):
            return False
        if seq is not None and not (self.min_seq <= seq <= self.max_seq):
            return False
        if self.causal is not None and (causal is None
                                        or self.causal != causal):
            # mask-keyed rows are opt-in: callers that don't say which
            # mask mode they are must not land on one
            return False
        return True


# Per-generation tuned tile rules.  Keys match jax device_kind prefixes.
# v5e measured sweeps (scripts/tune_blocks.py, probe_final_tune.py,
# on-device fori_loop timing):
#   * B4 H32/8 S4096 D128 bf16 causal: (1024, 4096, c1024) 96.8-103
#     TFLOP/s > (1024,1024) 93 > (512,1024) 78 > (512,512) 48;
#     block_q=2048 exceeds scoped VMEM; c512 collapses the chunk rate
#     (non-causal c1024=145 vs c512=83 TF/s).
#   * fused paged decode ppcb sweep: 32 > 16 >> 8 at ctx>=4k.
# Short-seq and D-keyed rows are sweepable via scripts/tune_blocks.py;
# bounds below encode the r3 sweep (probe_shape_tune.py medians).
_V5E_RULES = [
    # D>=256 tiles carry 2x bytes; _pick_blocks additionally divides
    # the row budget by D/128.  r4 sweep (B2 H16/4 S4096 D256 causal):
    # generic bq256(x4 group)/bkv2048/c512 = 117.7 TF/s beats the diag
    # schedule's 112.5 — the wide head amortizes the mask VPU cost over
    # 2x MXU work per element, so diag's group=1 K/V re-reads don't pay.
    # FIRST: head_dim opinions outrank the seq-keyed rows below, which
    # were tuned at D=128 (r4 chip check: the short-seq row used to
    # capture D256/S2048 and hand it D128 geometry).
    TileRule(TileConfig(block_q=2048, block_kv=4096,
                        block_kv_compute=512, diag_strips=0),
             min_head_dim=256, note="wide heads"),
    # S<=2048: the 4096-wide DMA tile leaves ~1.3 live chunks per grid
    # step and per-step overhead dominates (B8/S2048 was 38.7%); r3
    # sweep: see scripts/probe_shape_tune.py
    TileRule(TileConfig(block_q=1024, block_kv=2048,
                        block_kv_compute=1024),
             max_seq=2048, note="short-seq prefill"),
    # non-causal maskless chunks peak wider: c2048 = 154 vs c1024 = 145
    # TF/s (r2 probe_bodycount medians; causal keeps c1024 for the
    # diagonal-aligned bq == bkvc walk)
    TileRule(TileConfig(block_q=1024, block_kv=4096,
                        block_kv_compute=2048),
             causal=False, min_seq=4096, note="non-causal wide chunks"),
    TileRule(TileConfig(block_q=1024, block_kv=4096,
                        block_kv_compute=1024), note="default"),
]

TILE_TABLE = {
    "default": _V5E_RULES,
    "v5 lite": _V5E_RULES,
    "v5e": _V5E_RULES,
    # v5p/v6 inherit the v5e-tuned shapes until measured on hardware
    # (same MXU geometry, larger VMEM/HBM headroom)
    "v5p": _V5E_RULES,
    "v6": _V5E_RULES,
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
      AULE_DECODE_XBATCH   = 0  (disable the cross-batch DMA baton in the
                             paged decode kernels)
      AULE_FLASH_DIAG      = 0  (disable the diagonal-strip causal
                             schedule; AULE_FLASH_DIAG_STRIPS=n,
                             AULE_FLASH_DIAG_PAIR=1 tune it)
      AULE_FLASH_WIN       = 0  (disable the banded window-strip
                             kernel for causal sliding windows;
                             AULE_FLASH_WIN_STRIPS=n tunes it)
      AULE_FLASH_CAUSAL_V3 = 1  (opt IN to the group-batched causal
                             schedule — chip-measured slower than the
                             default; kept for re-evaluation on future
                             generations, see flash._maybe_causal_fwd)

    The kernel-schedule knobs (decode_xbatch, flash_diag*) default to
    None = read the env var LIVE at each trace, so a fallback that flips
    the env (bench.py) still takes effect on fresh traces; setting the
    field pins the value regardless of env.  Note all knobs bind at
    TRACE time — already-jitted shapes keep the kernel they compiled
    with (flash.py's schedule notes).  Debug-only diagnosis knobs
    (AULE_FLASH_DEBUG_FORCE_CLEAN, AULE_FLASH_BODY, AULE_FLASH_PIPELINE,
    AULE_BWD_BKV) stay env-only by design.
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
    # kernel-schedule knobs: None = read the env var live at trace time
    decode_xbatch: Optional[bool] = None      # AULE_DECODE_XBATCH
    flash_diag: Optional[bool] = None         # AULE_FLASH_DIAG
    flash_diag_strips: Optional[int] = None   # AULE_FLASH_DIAG_STRIPS
    flash_diag_pair: Optional[bool] = None    # AULE_FLASH_DIAG_PAIR

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


def _knob_bool(field: Optional[bool], env: str, default: bool) -> bool:
    return _env_bool(env, default) if field is None else field


def decode_xbatch() -> bool:
    """Cross-batch DMA baton in the paged decode kernels (trace-time)."""
    return _knob_bool(get_config().decode_xbatch, "AULE_DECODE_XBATCH",
                      True)


def flash_diag() -> bool:
    """Diagonal-strip causal schedule in flash fwd/bwd (trace-time)."""
    return _knob_bool(get_config().flash_diag, "AULE_FLASH_DIAG", True)


def flash_diag_strips(default: int = 2) -> int:
    """Strip count for the diagonal causal schedule.  Priority:
    AuleConfig field > env var > `default` (the matching TileRule's
    diag_strips when it has an opinion, else the global 2 — the r4
    chip sweep winner; see TileConfig.diag_strips)."""
    cfg = get_config()
    if cfg.flash_diag_strips is not None:
        return cfg.flash_diag_strips
    import os
    return int(os.environ.get("AULE_FLASH_DIAG_STRIPS", str(default)))


def flash_diag_pair() -> bool:
    return _knob_bool(get_config().flash_diag_pair, "AULE_FLASH_DIAG_PAIR",
                      False)


def get_tile_config(device_kind: Optional[str] = None,
                    head_dim: Optional[int] = None,
                    seq: Optional[int] = None,
                    causal: Optional[bool] = None) -> TileConfig:
    """Pick tile sizes for the current (or given) device kind and shape.

    head_dim / seq (seq_k) / causal select a shape-keyed TileRule; omitted
    hints match every rule, so legacy no-hint callers get the device
    default row (the first unbounded rule)."""
    if device_kind is None:
        try:
            import jax

            device_kind = jax.devices()[0].device_kind.lower()
        except Exception:  # pragma: no cover - no devices at all
            device_kind = "default"
    device_kind = device_kind.lower()
    rules = TILE_TABLE["default"]
    for key, dev_rules in TILE_TABLE.items():
        if key != "default" and key in device_kind:
            rules = dev_rules
            break
    if head_dim is None and seq is None and causal is None:
        # legacy callers: the device's unbounded default row
        for rule in rules:
            if rule.min_head_dim == 0 and rule.max_head_dim >= (1 << 30) \
                    and rule.min_seq == 0 and rule.max_seq >= (1 << 30) \
                    and rule.causal is None:
                return rule.tiles
    for rule in rules:
        if rule.matches(head_dim, seq, causal):
            return rule.tiles
    return rules[-1].tiles
