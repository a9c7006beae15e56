"""Native C++ allocator tests: behavioral parity with the Python allocator.

Analog of tests/test_block_pool.zig, run against the C ABI via ctypes.
"""

import numpy as np
import pytest

from aule_tpu.serving.kv_cache import PagePoolExhausted, PythonPageAllocator

native = pytest.importorskip("aule_tpu.serving.native")

try:
    native._load_library()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="g++ toolchain unavailable")


def test_parity_with_python_allocator():
    """Same operation sequence must yield identical pages and free counts."""
    rng = np.random.default_rng(0)
    py = PythonPageAllocator(32)
    nat = native.NativePageAllocator(32)
    held_py, held_nat = [], []
    for _ in range(200):
        op = rng.integers(0, 3)
        if op == 0:
            n = int(rng.integers(1, 5))
            if n <= py.num_free:
                a = py.allocate(n)
                b = nat.allocate(n)
                assert a == b
                held_py.append(a)
                held_nat.append(b)
            else:
                with pytest.raises(PagePoolExhausted):
                    py.allocate(n)
                with pytest.raises(PagePoolExhausted):
                    nat.allocate(n)
        elif op == 1 and held_py:
            i = int(rng.integers(0, len(held_py)))
            py.free(held_py.pop(i))
            nat.free(held_nat.pop(i))
        elif op == 2 and rng.integers(0, 10) == 0:
            target = py.num_pages + int(rng.integers(1, 8))
            py.grow(target)
            nat.grow(target)
        assert py.num_free == nat.num_free
        assert py.num_pages == nat.num_pages


def test_sequence_manager():
    alloc = native.NativePageAllocator(16)
    mgr = native.NativeSequenceManager(alloc, page_size=16,
                                       max_pages_per_seq=4)
    mgr.add(10)
    mgr.reserve(10, 40)        # 3 pages
    mgr.advance(10, 40)
    assert mgr.length(10) == 40
    mgr.add(11)
    mgr.reserve(11, 10)
    mgr.advance(11, 10)

    bt, lens = mgr.batch_views([10, 11, 999], max_pages=4)
    assert bt.shape == (3, 4)
    assert list(lens) == [40, 10, 0]
    assert (bt[0, :3] >= 0).all() and bt[0, 3] == -1
    assert (bt[2] == -1).all()
    # distinct pages across sequences
    live = bt[bt >= 0]
    assert len(set(live.tolist())) == len(live)

    with pytest.raises(PagePoolExhausted):
        mgr.reserve(10, 16 * 4)  # beyond max_pages_per_seq
    mgr.remove(10)
    assert alloc.num_free == 16 - 1  # only seq 11's page remains

    with pytest.raises(KeyError):
        mgr.advance(12345, 1)


def test_native_is_default_allocator():
    from aule_tpu.serving.kv_cache import make_allocator

    a = make_allocator(8)
    assert isinstance(a, native.NativePageAllocator)
