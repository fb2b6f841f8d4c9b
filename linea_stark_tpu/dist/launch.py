"""Multi-process / multi-host launcher.

The reference is strictly single-process (SURVEY.md §2d: no launcher, no
RPC, no comm crate anywhere); this is the TPU framework's multi-host runtime
entry (§5.8): ``jax.distributed.initialize`` forms the process group, a
global 1-D mesh spans every chip of every host, and the row-sharded prover
(dist/prove.py) runs SPMD — its all_to_all / all_gather / ppermute
collectives ride ICI within a slice and DCN across slices, inserted by XLA
from the shardings, never hand-written transport.

One process per host, identical command line everywhere:

    python -m linea_stark_tpu.dist.launch \
        --coordinator 10.0.0.1:9999 --num-processes 4 --process-id $RANK \
        -- --synthetic-perm 3x524288 --queries 33

Everything after ``--`` is forwarded to the ordinary CLI argument parser;
the trace is built on process 0's host data seed so all processes assemble
identical inputs (synthetic generators are seed-deterministic), then
device_put row-shards it over the global mesh.

On a single host this degrades gracefully: omit the coordinator flags and it
is equivalent to ``cli.py --mesh <all devices>``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="linea-stark-tpu-launch")
    p.add_argument("--coordinator", metavar="HOST:PORT", default=None,
                   help="coordinator address (process 0's host)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("rest", nargs=argparse.REMAINDER,
                   help="-- followed by cli.py arguments")
    args = p.parse_args(argv)

    if args.coordinator is not None:
        import jax

        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax

    n = len(jax.devices())
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    from ..cli import main as cli_main

    # a seed is required so every process draws identical challenges/traces
    if "--seed" not in rest:
        rest = ["--seed", "0"] + rest
    return cli_main(rest + ["--mesh", str(n)])


if __name__ == "__main__":
    sys.exit(main())
