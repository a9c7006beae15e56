"""Prefix caching: shared-prompt KV page reuse (refcounted, evictable).

Net-new serving depth (vLLM-style automatic prefix caching); correctness
bar: cached serving must produce EXACTLY the tokens of an uncached
engine, while skipping prefill work and pages for shared prefixes.
"""

import jax
import numpy as np
import pytest

from aule_tpu.models import llama
from aule_tpu.serving.engine import ServingEngine

CFG = llama.LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(CFG, jax.random.key(0))


def _engine(params, cache=True, num_pages=64):
    return ServingEngine(params, CFG, max_batch=2, page_size=16,
                         num_pages=num_pages, max_pages_per_seq=8,
                         max_seq_len=256, prefill_chunk=16,
                         enable_prefix_cache=cache)


def test_identical_prompts_hit_and_match(params):
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=37).astype(np.int32)  # 2 full pages

    want = []
    for _ in range(2):
        e = _engine(params, cache=False)
        e.submit(prompt, max_new_tokens=5)
        want.append(e.run()[0].output)

    eng = _engine(params, cache=True)
    eng.submit(prompt, max_new_tokens=5)
    out1 = eng.run()[0].output
    free_before = eng.allocator.num_free
    eng.submit(prompt, max_new_tokens=5)
    out2 = eng.run()[0].output
    assert out1 == want[0] and out2 == want[1], (out1, out2, want)
    # the second request reused 2 cached pages
    assert eng.prefix_cache_hit_tokens == 32
    # retired request returns only its PRIVATE pages; cached stay resident
    assert eng.allocator.num_free <= free_before


def test_partial_prefix_shared(params):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=32).astype(np.int32)  # 2 pages
    a = np.concatenate([base, rng.integers(0, 256, size=9).astype(np.int32)])
    b = np.concatenate([base, rng.integers(0, 256, size=13).astype(np.int32)])

    want = []
    for p in (a, b):
        e = _engine(params, cache=False)
        e.submit(p, max_new_tokens=4)
        want.append(e.run()[0].output)

    eng = _engine(params, cache=True)
    eng.submit(a, max_new_tokens=4)
    out_a = eng.run()[0].output
    eng.submit(b, max_new_tokens=4)
    out_b = eng.run()[0].output
    assert out_a == want[0], (out_a, want[0])
    assert out_b == want[1], (out_b, want[1])
    assert eng.prefix_cache_hit_tokens == 32  # b reused base's 2 pages


def test_concurrent_shared_prefix_decode_safe(params):
    """Two running requests sharing cached pages must not corrupt each
    other (decode appends only ever touch non-shared tail pages)."""
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, size=32).astype(np.int32)
    a = np.concatenate([base, rng.integers(0, 256, size=5).astype(np.int32)])
    b = np.concatenate([base, rng.integers(0, 256, size=7).astype(np.int32)])

    want = []
    for p in (a, b):
        e = _engine(params, cache=False)
        e.submit(p, max_new_tokens=6)
        want.append(e.run()[0].output)

    eng = _engine(params, cache=True)
    eng.submit(a, max_new_tokens=6)
    eng.submit(b, max_new_tokens=6)   # co-scheduled in the same batch
    done = eng.run()
    assert [r.output for r in done] == want, (done, want)


def test_eviction_under_pool_pressure(params):
    """A full cache must not deadlock admission: rc-0 cached pages evict
    when a new request needs pages."""
    rng = np.random.default_rng(3)
    eng = _engine(params, cache=True, num_pages=17)  # 16 usable pages
    outs = []
    for i in range(4):
        prompt = rng.integers(0, 256, size=35).astype(np.int32)
        eng.submit(prompt, max_new_tokens=4)
        outs.append(eng.run()[0].output)
        assert len(outs[-1]) == 4
    # cache never exceeds the pool and stays consistent
    assert len(eng._prefix_cache) == len(eng._page_hash)
    assert all(rc >= 0 for rc in eng._page_rc.values())


def test_checkpoint_resume_preserves_sharing(params):
    """Resume mid-flight with two slots sharing cached pages: retiring
    one must NOT free pages the other still uses (the cache maps persist
    through save/load)."""
    import tempfile

    from aule_tpu.serving.engine import load_engine_state, save_engine_state

    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, size=32).astype(np.int32)
    a = np.concatenate([base, rng.integers(0, 256, size=5).astype(np.int32)])
    b = np.concatenate([base, rng.integers(0, 256, size=7).astype(np.int32)])

    want = []
    for p, mnt in ((a, 3), (b, 8)):
        e = _engine(params, cache=False)
        e.submit(p, max_new_tokens=mnt)
        want.append(e.run()[0].output)

    eng = _engine(params, cache=True)
    eng.submit(a, max_new_tokens=3)   # retires early
    eng.submit(b, max_new_tokens=8)
    for _ in range(2):                # both running, sharing base pages
        eng.step()

    with tempfile.TemporaryDirectory() as td:
        save_engine_state(eng, td + "/ck")
        fresh = _engine(params, cache=True)
        load_engine_state(fresh, td + "/ck")
        done = fresh.run()
    assert sorted(len(r.output) for r in done) == [3, 8]
    outs = {len(r.output): r.output for r in done}
    assert outs[3] == want[0], (outs[3], want[0])
    assert outs[8] == want[1], (outs[8], want[1])


@pytest.mark.slow
def test_resubmitted_prompt_survives_eviction_pressure(params):
    """Regression (ADVICE r2 high): _admit must pin a request's cached
    hit pages BEFORE evicting for the shortfall — otherwise _evict_for
    frees the rc-0 hit pages themselves (KeyError on the rc bump, or
    worse, the same phys page aliased twice in the block table)."""
    rng = np.random.default_rng(11)
    eng = _engine(params, cache=True, num_pages=9)  # 8 usable pages
    a = rng.integers(0, 256, size=35).astype(np.int32)  # 2 full pages

    ref = _engine(params, cache=False, num_pages=64)
    ref.submit(a, max_new_tokens=4)
    want_a = ref.run()[0].output
    ref2 = _engine(params, cache=False, num_pages=64)
    ref2.submit(a, max_new_tokens=45)
    want_a_long = ref2.run()[0].output

    eng.submit(a, max_new_tokens=4)
    assert eng.run()[0].output == want_a
    for i in range(2):  # fill the cache with other prompts (rc 0)
        p = rng.integers(0, 256, size=35).astype(np.int32)
        eng.submit(p, max_new_tokens=4)
        eng.run()
    # 6 cached rc-0 pages, 2 free.  Resubmit `a` needing 5 pages: 2 are
    # cache hits, shortfall 1 forces eviction while the hits are rc 0.
    eng.submit(a, max_new_tokens=45)
    out = eng.run()[0].output
    assert out == want_a_long, (out, want_a_long)
    assert all(rc >= 0 for rc in eng._page_rc.values())
    assert len(eng._prefix_cache) == len(eng._page_hash)
