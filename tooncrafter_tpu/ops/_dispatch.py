"""Shared backend check for the Pallas-kernel dispatch predicates.

Every kernel module (flash_attention, fused_norms, temporal_attention,
spatial_conv, temporal_conv) gates its TPU kernel on this one function —
call it as ``_dispatch.on_tpu()`` (attribute lookup at call time) so a
single monkeypatch point covers all kernels in tests.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False
