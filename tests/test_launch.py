"""Multi-process runtime smoke tests (dist/launch.py, SURVEY.md §5.8).

Spawns REAL separate processes on localhost that form a
``jax.distributed.initialize`` group over the CPU backend — the same
machinery a multi-host TPU pod launch uses, minus the ICI.  The round-3
verdict flagged that the launcher had never executed with >1 process.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 --xla_cpu_max_isa=AVX2"
    " --xla_backend_optimization_level=0"
)
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num, process_id=pid
)
assert jax.process_count() == num, jax.process_count()
assert len(jax.devices()) == num * 2, jax.devices()

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.multihost_utils import process_allgather

# global 1-D mesh over every device of every process
mesh = Mesh(jax.devices(), ("rows",))

# each process contributes its local slice of a row-sharded global array
global_shape = (num * 2 * 4,)
sharding = NamedSharding(mesh, P("rows"))
local = jnp.arange(pid * 8, pid * 8 + 8, dtype=jnp.int32).reshape(2, 4)
arr = jax.make_array_from_single_device_arrays(
    global_shape,
    sharding,
    [jax.device_put(local[i], d) for i, d in enumerate(jax.local_devices())],
)

# cross-process reduction: jit with a replicated out-sharding (eager sum
# cannot read non-addressable shards)
summed = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
total = int(jax.device_get(summed.addressable_data(0)))
expect = sum(range(num * 2 * 4))
assert total == expect, (total, expect)

# every process agrees on the reduced value (host-level allgather)
gathered = process_allgather(jnp.asarray([total]))
assert all(int(v) == expect for v in gathered.ravel())
print(f"proc {pid}: sum={total} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(script, args, env_extra=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", script, *map(str, args)],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def test_two_process_group_forms_and_reduces():
    """2 localhost processes × 2 virtual CPU devices = a 4-device global
    mesh; a row-sharded global array reduces to the same value in both."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_spawn(_WORKER, [coord, 2, pid]) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: sum=120 OK" in out, out  # sum(range(16))


_PROVE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 --xla_cpu_max_isa=AVX2"
    " --xla_backend_optimization_level=0"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
coordinator, num, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num, process_id=pid
)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linea_stark_tpu.challenger import HashChallenger
from linea_stark_tpu.config import FriConfig, StarkConfig
from linea_stark_tpu.dist.mesh import ROWS_AXIS
from linea_stark_tpu.dist.prove import prove_sharded
from linea_stark_tpu.prover import verify
from linea_stark_tpu.trace import build_trace, gen_permutation_trace

cfg = StarkConfig(fri=FriConfig(log_blowup=2, log_final_poly_len=0,
                                num_queries=4, proof_of_work_bits=0))
alpha, delta = 12345, 67890
raw = gen_permutation_trace(width=2, height=64, seed=3)
built = build_trace([raw], [], alpha, delta, check=False)

mesh = Mesh(jax.devices(), (ROWS_AXIS,))
trace = jax.device_put(
    built.matrix, NamedSharding(mesh, P(None, None, ROWS_AXIS))
)
proof = prove_sharded(cfg, built.air, trace, [alpha, delta],
                      HashChallenger(), mesh)
verify(cfg, built.air, proof, [alpha, delta], HashChallenger())
print(f"proc {pid}: root={proof.trace_root} verified OK", flush=True)
"""


@pytest.mark.slow  # full sharded prove compile in two fresh processes
def test_two_process_sharded_prove():
    """The headline multi-host claim: a row-sharded prove executes SPMD
    across 2 real processes and the proof verifies on the host."""
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_spawn(_PROVE_WORKER, [coord, 2, pid]) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3000)
        outs.append(out)
    roots = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if "verified OK" in l]
        assert line, out[-2000:]
        roots.append(line[0].split("root=")[1].split()[0])
    assert roots[0] == roots[1], roots
