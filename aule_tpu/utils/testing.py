"""Test helpers: seeded fixtures and tolerance comparisons.

Mirrors the reference test strategy (SURVEY.md §4): seeded inputs (seed 42),
maxAbsDiff/meanAbsDiff semantics from src/attention_ref.zig:175-206, and the
per-dtype tolerance ladder (f32 ~1e-4, bf16 ~2e-2 relative, quantized KV
<=5e-3 max-abs per BASELINE.json).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

DEFAULT_SEED = 42

# per-dtype (rtol, atol) against the float64 NumPy oracle
TOLERANCES = {
    "float32": (1e-4, 1e-4),
    "bfloat16": (2e-2, 2e-2),
    "float16": (1e-2, 1e-3),
    "int8kv": (5e-3, 5e-3),
    "fp8kv": (5e-2, 5e-2),
}


def random_qkv(
    batch: int,
    heads_q: int,
    seq_q: int,
    head_dim: int,
    heads_kv: int | None = None,
    seq_k: int | None = None,
    dtype=np.float32,
    seed: int = DEFAULT_SEED,
    scale: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    heads_kv = heads_kv or heads_q
    seq_k = seq_k or seq_q
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((batch, heads_q, seq_q, head_dim)) * scale
    k = rng.standard_normal((batch, heads_kv, seq_k, head_dim)) * scale
    v = rng.standard_normal((batch, heads_kv, seq_k, head_dim)) * scale
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


def max_abs_diff(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.max(np.abs(a - b))) if a.size else 0.0


def mean_abs_diff(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.mean(np.abs(a - b))) if a.size else 0.0


def assert_close(actual, expected, rtol: float, atol: float, label: str = ""):
    actual = np.asarray(actual, dtype=np.float64)
    expected = np.asarray(expected, dtype=np.float64)
    err = np.abs(actual - expected)
    tol = atol + rtol * np.abs(expected)
    bad = err > tol
    if bad.any():
        idx = np.unravel_index(np.argmax(err - tol), err.shape)
        raise AssertionError(
            f"{label}: {bad.sum()}/{bad.size} elements out of tolerance "
            f"(rtol={rtol}, atol={atol}); worst at {idx}: "
            f"actual={actual[idx]:.6g} expected={expected[idx]:.6g} "
            f"maxAbsDiff={err.max():.3e} meanAbsDiff={err.mean():.3e}"
        )
