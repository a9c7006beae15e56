"""Serving: KV-cache pool/table management and continuous batching.

Re-exports the user-facing surface; heavy modules import lazily where
possible (engine pulls in the kernels).
"""

from .engine import (  # noqa: F401
    Request,
    ServingEngine,
    load_engine_state,
    save_engine_state,
)
from .kv_cache import PagePoolExhausted, PagedKVCache, make_allocator  # noqa: F401

__all__ = [
    "Request",
    "ServingEngine",
    "load_engine_state",
    "save_engine_state",
    "PagePoolExhausted",
    "PagedKVCache",
    "make_allocator",
]


def __getattr__(name):
    # http_api / multihost import lazily: they pull in threading/socket
    # machinery most engine users never touch
    if name == "ServingHTTPServer":
        from .http_api import ServingHTTPServer
        return ServingHTTPServer
    if name in ("EngineReplicaPool", "MultiProcessServingPool"):
        from . import multihost
        return getattr(multihost, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
