"""KV-cache manager tests: allocator, growth, exhaustion, batch views.

Reference analog: tests/test_block_pool.zig (allocate/free/growth/max-limit
+ BlockTable indexing), with two deliberate behavior differences (SURVEY.md
§7 quirks not to replicate): growth preserves pool data, and the cache
persists across calls.
"""

import numpy as np
import pytest

import aule_tpu.config as config
from aule_tpu.serving.kv_cache import (
    PagePoolExhausted,
    PagedKVCache,
    PythonPageAllocator,
)


def test_allocator_basic():
    a = PythonPageAllocator(8)
    p1 = a.allocate(3)
    assert len(set(p1)) == 3 and a.num_free == 5
    a.free(p1)
    assert a.num_free == 8
    with pytest.raises(PagePoolExhausted):
        a.allocate(9)


def test_allocator_grow():
    a = PythonPageAllocator(4)
    a.allocate(4)
    a.grow(8)
    assert a.num_free == 4
    p = a.allocate(4)
    assert all(x >= 4 for x in p)


def test_cache_lifecycle_and_views():
    cache = PagedKVCache.create(2, 64, num_pages=16, page_size=16,
                                max_pages_per_seq=4)
    cache.add_sequence(0)
    cache.reserve(0, 40)  # 3 pages
    cache.advance(0, 40)
    cache.add_sequence(1)
    cache.reserve(1, 10)
    cache.advance(1, 10)
    bt, lens = cache.batch_views([0, 1])
    assert bt.shape == (2, 4) and list(np.asarray(lens)) == [40, 10]
    assert (np.asarray(bt)[0, :3] >= 0).all() and np.asarray(bt)[0, 3] == -1
    # pages must be distinct across sequences
    used = set(np.asarray(bt)[np.asarray(bt) >= 0].tolist())
    assert len(used) == 4
    cache.free_sequence(0)
    assert cache.num_free_pages == 15


def test_cache_growth_preserves_data():
    cache = PagedKVCache.create(1, 8, num_pages=4, page_size=16,
                                max_pages_per_seq=64, dtype=np.float32)
    import jax.numpy as jnp

    cache.k_pages = cache.k_pages.at[0, 1, 0, 0].set(7.0)
    cache.add_sequence(0)
    cache.reserve(0, 16 * 10)  # forces growth past 4 pages
    assert cache.num_pages >= 10
    assert float(cache.k_pages[0, 1, 0, 0]) == 7.0


def test_cache_exhaustion_at_max():
    cfg = config.get_config()
    old = cfg.max_pages
    cfg.max_pages = 8
    try:
        cache = PagedKVCache.create(1, 8, num_pages=8, page_size=16,
                                    max_pages_per_seq=1000)
        cache.add_sequence(0)
        with pytest.raises(PagePoolExhausted):
            cache.reserve(0, 16 * 9)
    finally:
        cfg.max_pages = old


def test_max_pages_per_seq_enforced():
    cache = PagedKVCache.create(1, 8, num_pages=16, page_size=16,
                                max_pages_per_seq=2)
    cache.add_sequence(0)
    with pytest.raises(PagePoolExhausted):
        cache.reserve(0, 16 * 3)
