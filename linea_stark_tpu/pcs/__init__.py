"""Polynomial commitment scheme layer (p3-commit analog).

The reference binds DFT + Merkle MMCS + FRI into a swappable PCS type alias
(``TwoAdicFriPcs`` at bin/src/config.rs:19-24, bin/src/main.rs:66); here the
same seam is a runtime object constructed from :class:`~linea_stark_tpu.config.StarkConfig`.
``prover.uni_stark`` talks to the PCS exclusively through
``commit_trace`` / ``commit_quotient`` / ``open`` / ``verify`` — it holds no
MMCS or FRI internals.

Two transcript modes ride the same object (config.transcript):

* ``"native"`` — this framework's order (prover/uni_stark.py docstring):
  natural-order FRI codewords, fold-then-commit levels, +/-x input openings.
* ``"p3"``     — upstream p3-uni-stark / p3-fri order: bit-reversed
  evaluation indexing, commit-then-fold levels (every fold committed),
  single-index input openings with commit-phase sibling values
  (PARITY.md §3).
"""

from .two_adic_fri import PcsData, TwoAdicFriPcs, VerificationError


def make_pcs(config) -> TwoAdicFriPcs:
    """Construct the PCS from a StarkConfig (the bin/src/main.rs:66 moment)."""
    return TwoAdicFriPcs(
        fri=config.fri,
        hasher=config.mmcs_hasher(),
        shift=config.coset_shift,
        transcript=config.transcript,
        check_low_degree=config.check_trace,
    )


__all__ = ["PcsData", "TwoAdicFriPcs", "VerificationError", "make_pcs"]
