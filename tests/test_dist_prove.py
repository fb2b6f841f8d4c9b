"""Full 8-device row-sharded prove -> host verify (SURVEY.md §7 layer 11).

The proof produced by the sharded prover must be transcript-identical to the
single-chip prover's and verify under the ordinary host verifier.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # sharded CPU-mesh compiles exceed the fast-tier budget
from jax.sharding import NamedSharding, PartitionSpec as P

from linea_stark_tpu.challenger import HashChallenger
from linea_stark_tpu.config import FriConfig, StarkConfig
from linea_stark_tpu.dist import make_mesh
from linea_stark_tpu.dist.mesh import ROWS_AXIS
from linea_stark_tpu.dist.prove import prove_sharded
from linea_stark_tpu.field.constants import R_MOD
from linea_stark_tpu.prover import verify
from linea_stark_tpu.trace import build_trace, gen_permutation_trace

rng = random.Random(33)


def test_sharded_prove_verifies_on_host():
    assert len(jax.devices()) >= 8
    mesh = make_mesh(8)
    n, w = 256, 2
    alpha, delta = rng.randrange(R_MOD), rng.randrange(R_MOD)
    raw = gen_permutation_trace(w, n, seed=9)
    built = build_trace([raw], [], alpha, delta, check=False)
    cfg = StarkConfig(
        fri=FriConfig(
            log_blowup=2, log_final_poly_len=0, num_queries=4, proof_of_work_bits=0
        )
    )
    trace = jax.device_put(
        built.matrix, NamedSharding(mesh, P(None, None, ROWS_AXIS))
    )
    proof = prove_sharded(
        cfg, built.air, trace, [alpha, delta], HashChallenger(), mesh,
        host_tail=64,
    )
    # at least two committed FRI levels were built by the sharded path
    assert len(proof.fri.commit_roots) >= 2
    verify(cfg, built.air, proof, [alpha, delta], HashChallenger())
