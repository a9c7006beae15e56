"""Backend detection, selection and reporting.

TPU-native analog of the reference's backend machinery: import-time probing
with per-backend error capture (python/aule/__init__.py:39-101), an ordered
auto-selection chain (src/backends/backend.zig:102-115: HIP -> Vulkan -> CPU)
and human-readable reports (`get_backend_info`, __init__.py:474-561).

Our chain is: pallas (Mosaic-TPU kernels) -> xla (fused einsum-softmax,
any jax device) -> numpy (pure CPU oracle).  Forcing works via
AULE_TPU_BACKEND, `install(backend=...)` or the per-call `backend=` argument.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

from .config import get_config

logger = logging.getLogger("aule_tpu")

BACKENDS = ("pallas", "xla", "numpy")

_backend_errors: Dict[str, str] = {}
_probe_done = False
_available: List[str] = []


def _probe() -> None:
    global _probe_done, _available
    if _probe_done:
        return
    avail = []
    # numpy: always available
    avail.append("numpy")
    try:
        import jax

        devices = jax.devices()
        avail.append("xla")
        if any(d.platform == "tpu" for d in devices):
            avail.append("pallas")
        else:
            # Pallas kernels still run in interpreter mode on CPU; treat
            # pallas as available-but-interpreted when forced or when the
            # config requests interpret mode.
            _backend_errors["pallas"] = (
                "no TPU device; pallas runs in interpret mode only "
                f"(devices: {[d.platform for d in devices]})"
            )
            if get_config().interpret:
                avail.append("pallas")
    except Exception as e:  # pragma: no cover - jax is a hard dep here
        _backend_errors["xla"] = repr(e)
        _backend_errors["pallas"] = repr(e)
    _available = avail
    _probe_done = True


def get_available_backends() -> List[str]:
    """Backends usable on this host, in auto-selection priority order."""
    _probe()
    order = [b for b in BACKENDS if b in _available]
    return order


def get_backend_errors() -> Dict[str, str]:
    """Why unavailable backends failed to probe."""
    _probe()
    return dict(_backend_errors)


def select_backend(forced: Optional[str] = None) -> str:
    """Resolve the backend for a call: per-call force > config > auto."""
    _probe()
    cfg = get_config()
    choice = forced or cfg.backend
    if choice is not None:
        choice = choice.lower()
        if choice not in BACKENDS:
            raise ValueError(
                f"unknown backend {choice!r}; expected one of {BACKENDS}"
            )
        if choice not in _available and choice != "pallas":
            raise RuntimeError(
                f"backend {choice!r} unavailable: "
                f"{_backend_errors.get(choice, 'not detected')}"
            )
        return choice
    for b in BACKENDS:
        if b in _available:
            return b
    return "numpy"


def get_backend_info() -> Dict[str, object]:
    """Structured report of devices and backend availability."""
    _probe()
    info: Dict[str, object] = {
        "available": get_available_backends(),
        "errors": get_backend_errors(),
        "selected": select_backend(),
    }
    try:
        import jax

        devs = jax.devices()
        info["devices"] = [
            {"id": d.id, "platform": d.platform, "kind": d.device_kind}
            for d in devs
        ]
        info["device_count"] = len(devs)
        info["process_count"] = jax.process_count()
    except Exception as e:  # pragma: no cover
        info["devices"] = []
        info["device_error"] = repr(e)
    return info


def print_backend_info() -> None:
    info = get_backend_info()
    print("aule-tpu backend report")
    print(f"  selected : {info['selected']}")
    print(f"  available: {', '.join(info['available'])}")
    for d in info.get("devices", []):
        print(f"  device   : [{d['id']}] {d['platform']} ({d['kind']})")
    for name, err in info.get("errors", {}).items():
        print(f"  {name}: unavailable ({err})")
