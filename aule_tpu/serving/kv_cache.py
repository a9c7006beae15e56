"""Paged KV-cache management: page pool, per-sequence tables, allocator.

TPU-native re-design of the reference's BlockPool + BlockTable
(src/block_pool.zig, src/block_table.zig): the *data* (page pools, block
tables, context lengths) are JAX arrays owned by the caller and passed into
the paged kernel, while the *bookkeeping* (free-list, per-sequence page
lists) is host-side.  Differences from the reference, by design:

  * the cache persists across calls (the reference frees every block after
    each paged forward, attention_gpu.zig:647-652 — an MVP quirk);
  * pool growth preserves data (block_pool.zig:116-118 discards it);
  * the allocator is swappable: a pure-Python free list here, and a C++
    implementation (csrc/allocator.cpp via ctypes) for high-rate serving,
    mirroring how the reference keeps its hot bookkeeping native.

Exhaustion raises PagePoolExhausted after growth to max_pages, matching
BlockPoolExhausted semantics (block_pool.zig:75-89).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config


class PagePoolExhausted(RuntimeError):
    """No free pages left and the pool is at max size."""


class PythonPageAllocator:
    """LIFO free-list page allocator (host-side bookkeeping only)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free = list(range(num_pages - 1, -1, -1))

    @property
    def num_free(self) -> int:
        return len(self._free)

    def allocate(self, n: int) -> List[int]:
        if n > len(self._free):
            raise PagePoolExhausted(
                f"requested {n} pages, only {len(self._free)} free")
        pages = [self._free.pop() for _ in range(n)]
        return pages

    def free(self, pages: List[int]) -> None:
        self._free.extend(pages)

    def grow(self, new_num_pages: int) -> None:
        assert new_num_pages >= self.num_pages
        self._free.extend(range(new_num_pages - 1, self.num_pages - 1, -1))
        self.num_pages = new_num_pages

    def free_list(self) -> List[int]:
        return list(self._free)

    def set_free_list(self, pages: List[int]) -> None:
        self._free = list(pages)


def make_allocator(num_pages: int):
    """Prefer the native C++ allocator, fall back to Python."""
    try:
        from .native import NativePageAllocator

        return NativePageAllocator(num_pages)
    except Exception:
        return PythonPageAllocator(num_pages)


@dataclasses.dataclass
class PagedKVCache:
    """Caller-owned paged KV cache + host-side sequence bookkeeping.

    Device state (pytree leaves usable under jit):
      k_pages, v_pages: [Hkv, num_pages, page_size, D]
      (optionally k_scales/v_scales for quantized caches, see ops/quant.py)
    Host state: allocator + per-sequence page lists.
    """

    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    page_size: int
    max_pages_per_seq: int
    allocator: object
    seq_pages: Dict[int, List[int]] = dataclasses.field(default_factory=dict)
    seq_lens: Dict[int, int] = dataclasses.field(default_factory=dict)
    k_scales: Optional[jnp.ndarray] = None
    v_scales: Optional[jnp.ndarray] = None

    # -- construction --------------------------------------------------

    @classmethod
    def create(
        cls,
        num_kv_heads: int,
        head_dim: int,
        *,
        num_pages: Optional[int] = None,
        page_size: Optional[int] = None,
        max_pages_per_seq: Optional[int] = None,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ) -> "PagedKVCache":
        cfg = get_config()
        num_pages = num_pages or cfg.initial_pages
        page_size = page_size or cfg.page_size
        max_pages_per_seq = max_pages_per_seq or cfg.max_pages_per_seq
        shape = (num_kv_heads, num_pages, page_size, head_dim)
        if quantized:
            k_pages = jnp.zeros(shape, jnp.int8)
            v_pages = jnp.zeros(shape, jnp.int8)
            scales = jnp.zeros(shape[:-1], jnp.float32)
            return cls(k_pages, v_pages, page_size, max_pages_per_seq,
                       make_allocator(num_pages),
                       k_scales=scales, v_scales=scales)
        k_pages = jnp.zeros(shape, dtype)
        v_pages = jnp.zeros(shape, dtype)
        return cls(k_pages, v_pages, page_size, max_pages_per_seq,
                   make_allocator(num_pages))

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def num_free_pages(self) -> int:
        return self.allocator.num_free

    # -- sequence lifecycle ---------------------------------------------

    def add_sequence(self, seq_id: int, num_tokens: int = 0) -> None:
        if seq_id in self.seq_pages:
            raise ValueError(f"sequence {seq_id} already present")
        self.seq_pages[seq_id] = []
        self.seq_lens[seq_id] = 0
        if num_tokens:
            self.reserve(seq_id, num_tokens)

    def reserve(self, seq_id: int, num_new_tokens: int) -> None:
        """Ensure pages exist for num_new_tokens more tokens; grows pool
        on demand (preserving data, unlike block_pool.zig:116-118)."""
        cur_len = self.seq_lens[seq_id]
        need_pages = -(-(cur_len + num_new_tokens) // self.page_size)
        have = len(self.seq_pages[seq_id])
        extra = need_pages - have
        if extra <= 0:
            return
        if need_pages > self.max_pages_per_seq:
            raise PagePoolExhausted(
                f"sequence {seq_id} needs {need_pages} pages "
                f"> max_pages_per_seq={self.max_pages_per_seq}")
        if extra > self.allocator.num_free:
            self._grow(extra)
        self.seq_pages[seq_id].extend(self.allocator.allocate(extra))

    def advance(self, seq_id: int, num_tokens: int) -> None:
        self.seq_lens[seq_id] += num_tokens

    def free_sequence(self, seq_id: int) -> None:
        self.allocator.free(self.seq_pages.pop(seq_id))
        self.seq_lens.pop(seq_id)

    def _grow(self, min_extra: int) -> None:
        cfg = get_config()
        target = max(self.num_pages * 2,
                     self.num_pages + min_extra)
        target = min(target, cfg.max_pages)
        if target <= self.num_pages:
            raise PagePoolExhausted(
                f"pool at max ({self.num_pages} pages), "
                f"{self.allocator.num_free} free, need {min_extra}")
        pad = target - self.num_pages
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        self.k_pages = jnp.pad(self.k_pages, widths)
        self.v_pages = jnp.pad(self.v_pages, widths)
        if self.k_scales is not None:
            self.k_scales = jnp.pad(self.k_scales, widths[:-1])
            self.v_scales = jnp.pad(self.v_scales, widths[:-1])
        self.allocator.grow(target)

    # -- batch views for the kernels -------------------------------------

    def batch_views(
        self, seq_ids: List[int]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(block_tables [B, max_pages_per_seq], context_lens [B]) for the
        given sequences, -1 padded (kernel clamps sentinels)."""
        bsz = len(seq_ids)
        bt = np.full((bsz, self.max_pages_per_seq), -1, np.int32)
        lens = np.zeros((bsz,), np.int32)
        for row, sid in enumerate(seq_ids):
            pages = self.seq_pages[sid]
            bt[row, :len(pages)] = pages
            lens[row] = self.seq_lens[sid]
        return jnp.asarray(bt), jnp.asarray(lens)
