"""Backend selection: Pallas kernels vs plain-XLA limb code.

Default: Pallas on TPU (the XLA elementwise path leaves ~12x on the table —
see kernels/pallas_field.py), XLA on CPU (Pallas interpret mode is far slower
to execute; the XLA path is the reference implementation the kernels are
tested against).  Override with LINEA_TPU_BACKEND=pallas|xla.
"""

from __future__ import annotations

import os


def _platform() -> str:
    import jax

    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return "cpu"


def use_pallas() -> bool:
    env = os.environ.get("LINEA_TPU_BACKEND")
    if env == "pallas":
        return True
    if env == "xla":
        return False
    return _platform() in ("tpu", "axon")
