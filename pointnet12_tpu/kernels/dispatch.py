"""Kernel dispatch policy: Pallas fast path vs jnp reference path.

``impl="auto"`` on the public ops resolves here: Pallas kernels are used when
(a) they are not disabled via ``POINTNET12_TPU_PALLAS=0`` / :func:`set_pallas`
and (b) the default JAX backend is a TPU. On CPU the jnp path is used (the
kernels still run there in interpreter mode for tests, but interpretation is
far too slow to be a default).
"""

import os

import jax

_FORCED: dict = {"value": None}  # None = follow env/backend; True/False = forced


def set_pallas(enabled) -> None:
    """Force-enable/disable the Pallas path (None restores auto)."""
    _FORCED["value"] = enabled


def pallas_enabled() -> bool:
    if _FORCED["value"] is not None:
        return bool(_FORCED["value"])
    if os.environ.get("POINTNET12_TPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
