"""Shape-keyed tile-table selection (config.TileRule).

The reference autotunes 13 Triton configs keyed on head_dim per arch
(/root/reference/python/aule/triton_flash_amd.py:58-85); the TPU analog
keys TileConfig rows on (device_kind, head_dim, seq_k, causal).  These
tests pin the selection semantics, not the tuned values.
"""

from aule_tpu.config import (
    TILE_TABLE,
    TileConfig,
    TileRule,
    get_tile_config,
)


def test_device_default_row_for_hintless_callers():
    tiles = get_tile_config(device_kind="v5e")
    default_rule = next(
        r for r in TILE_TABLE["v5e"]
        if r.min_head_dim == 0 and r.max_head_dim >= (1 << 30)
        and r.min_seq == 0 and r.max_seq >= (1 << 30) and r.causal is None)
    assert tiles is default_rule.tiles


def test_unknown_device_falls_back_to_default_table():
    assert get_tile_config(device_kind="warp-drive-9000") is not None


def test_seq_keyed_rule_wins_over_default():
    short = get_tile_config(device_kind="v5e", head_dim=128, seq=2048)
    assert short.block_kv <= 2048  # short-seq rows shrink the DMA tile


def test_causal_key_selects_causal_row():
    rules = [
        TileRule(TileConfig(block_q=512, block_kv_compute=512),
                 causal=True, note="diag"),
        TileRule(TileConfig(block_q=1024, block_kv_compute=2048),
                 note="default"),
    ]
    TILE_TABLE["testdev"] = rules
    try:
        c = get_tile_config(device_kind="testdev", causal=True)
        nc = get_tile_config(device_kind="testdev", causal=False)
        nohint = get_tile_config(device_kind="testdev")
        assert c.block_q == 512
        assert nc.block_q == 1024       # causal=True row rejected
        assert nohint.block_q == 1024   # hintless -> unbounded default
    finally:
        del TILE_TABLE["testdev"]


def test_head_dim_bounds():
    rules = [
        TileRule(TileConfig(block_q=128), min_head_dim=256, note="wide"),
        TileRule(TileConfig(block_q=1024), note="default"),
    ]
    TILE_TABLE["testdev2"] = rules
    try:
        assert get_tile_config(device_kind="testdev2",
                               head_dim=256).block_q == 128
        assert get_tile_config(device_kind="testdev2",
                               head_dim=128).block_q == 1024
    finally:
        del TILE_TABLE["testdev2"]
