import os

# Tests always run on a simulated 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware (SURVEY.md §4).  The axon
# sitecustomize registers the TPU backend at interpreter start and overrides
# JAX_PLATFORMS, so we must force the platform via jax.config *before any
# test imports jax functionality*.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # Pinning the CPU ISA makes persistent-cache entries loadable across
    # processes (feature-mismatched AOT entries segfault on load).
    # opt level 0 ~halves XLA CPU compile time; tests value compile speed
    # over runtime.
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_force_host_platform_device_count=8 --xla_cpu_max_isa=AVX2"
        + " --xla_backend_optimization_level=0"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are wide and XLA
# CPU compiles them slowly; cache once, reuse across test runs.  The dir is
# suffixed with a digest of the XLA flags so processes compiled under
# different ISA/opt settings never share entries — a feature-mismatched AOT
# entry segfaults at load/run (the round-4 "fast tier dies at ~85%" crash,
# VERDICT weak #5, struck in eagerly executed scans whose cache slot mixed
# processes).
import hashlib as _hl

_sig = _hl.sha256(os.environ["XLA_FLAGS"].encode()).hexdigest()[:8]
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", f".jax_cache-{_sig}"),
)
# Admission threshold 5 s: the round-4/5 in-process segfaults (RC=139) die
# in XLA-CPU's `backend.deserialize_executable` while LOADING a cached
# executable of a small eagerly-dispatched program (scan primitives) — even
# from a freshly rebuilt cache, so it is an XLA deserialize bug, not
# corruption.  Keeping quick-compiling programs out of the cache sidesteps
# the fragile entries while the expensive fused programs (minutes of
# XLA-CPU compile each) still ride the cache.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop in-memory executable caches at module boundaries: one process
    accumulates hundreds of CPU executables across the tier, and the
    round-4 segfault reproduced only deep into a single-process run."""
    yield
    jax.clear_caches()
