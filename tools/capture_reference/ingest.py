#!/usr/bin/env python
"""Convert a captured reference run log into a tests/vectors/ directory.

Scans the log for large integers (the Poseidon2 round constants in the
fork's sampling order), remaps them into this framework's schedule order
(hash/poseidon2.py::Poseidon2Params: initial-external rounds ×3, internal
×1, terminal-external ×3), and writes ``constants.json`` consumable by
``Poseidon2Params.from_json`` / the CLI's ``--hash-constants``.

Usage:
    python ingest.py run.log --order initial,terminal,internal --out DIR

``--order``: the order the 46 constants appear in the log —
``initial`` = first rounds_f/2 external rounds (12 values),
``terminal`` = last rounds_f/2 external rounds (12),
``internal`` = internal rounds (22).  Upstream p3-poseidon2's
``new_from_rng`` samples initial, terminal, internal; a Debug dump of the
built object typically *prints* them in struct-field order, which may
differ — check the dump's field names and adjust.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

ROUNDS_F = 8
ROUNDS_P = 22
WIDTH = 3
R_MOD = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001

N_EXT_HALF = (ROUNDS_F // 2) * WIDTH  # 12
N_TOTAL = ROUNDS_F * WIDTH + ROUNDS_P  # 46


def extract_ints(text: str) -> list:
    """All integers ≥ 2^64 in the text, in order (decimal or 0x hex) —
    small numbers (round counts, timings) never reach that size, field
    elements essentially always do (a uniform Fr is < 2^64 with p ~2^-189).
    """
    out = []
    for m in re.finditer(r"0x[0-9a-fA-F]+|\d+", text):
        s = m.group(0)
        v = int(s, 16) if s.startswith("0x") else int(s)
        if v >= 1 << 64:
            out.append(v % R_MOD)
    return out


def remap(vals: list, order: str) -> list:
    groups = {}
    pos = 0
    for name in order.split(","):
        n = {"initial": N_EXT_HALF, "terminal": N_EXT_HALF, "internal": ROUNDS_P}[
            name.strip()
        ]
        groups[name.strip()] = vals[pos : pos + n]
        pos += n
    assert pos == N_TOTAL
    return groups["initial"] + groups["internal"] + groups["terminal"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--order", default="initial,terminal,internal")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--skip", type=int, default=2,
        help="log integers to skip before the constants (default 2: the "
        "printed alpha/delta challenge lines precede the constant dump)",
    )
    args = ap.parse_args()

    with open(args.log) as f:
        text = f.read()
    ints = extract_ints(text)
    if len(ints) < args.skip + N_TOTAL:
        print(
            f"found only {len(ints)} large integers; need "
            f"{args.skip + N_TOTAL} (alpha, delta, then 46 constants)",
            file=sys.stderr,
        )
        return 1
    alpha, delta = ints[0], ints[1]
    consts = remap(ints[args.skip : args.skip + N_TOTAL], args.order)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "constants.json"), "w") as f:
        json.dump(
            {
                "rounds_f": ROUNDS_F,
                "rounds_p": ROUNDS_P,
                "alpha": 11,
                "constants": [str(c) for c in consts],
            },
            f,
            indent=1,
        )
    with open(os.path.join(args.out, "challenges.json"), "w") as f:
        json.dump({"alpha": str(alpha), "delta": str(delta)}, f, indent=1)
    print(f"wrote {args.out}/constants.json and challenges.json")
    print("copy proof.bin + trace.bin there and fill meta.json "
          '({"log_blowup": 3, "num_queries": 33, "pow_bits": 0, '
          '"workload": "lookup"})')
    return 0


if __name__ == "__main__":
    sys.exit(main())
