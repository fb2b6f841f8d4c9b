"""Utilities: CBOR codec, bit tricks, span-tree timing, global fetches."""


def fetch_global(x) -> "np.ndarray":
    """Device -> host fetch that works for multi-process global arrays.

    In a ``jax.distributed`` run a row-sharded array spans devices of OTHER
    processes; ``np.asarray`` refuses those.  ``process_allgather`` pulls the
    full global value to every host (the host-side transcript needs identical
    values everywhere anyway).  Single-process arrays take the direct path.
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
