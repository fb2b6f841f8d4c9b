"""Dual-backend algebra for AIR constraint evaluation.

The reference evaluates the same ``Air::eval`` gadget code in two contexts
(SURVEY.md §3.5): vectorized over the whole LDE domain inside quotient
computation, and at a single opened point inside the verifier.  We keep that
property with two interchangeable algebra objects; gadget code is written
against this minimal interface only.
"""

from __future__ import annotations

import jax

from ..field import fr, oracle
from ..field.constants import R_MOD


class VectorAlgebra:
    """Limb-array backend: elements are (16, N) uint32 Montgomery arrays.

    Ops dispatch through fr_ops (Pallas kernels on TPU, XLA on CPU)."""

    def __init__(self, batch_shape):
        self.batch_shape = tuple(batch_shape)

    def add(self, a, b):
        from .. import fr_ops as fo

        return fo.add(a, b)

    def sub(self, a, b):
        from .. import fr_ops as fo

        return fo.sub(a, b)

    def mul(self, a, b):
        from .. import fr_ops as fo

        return fo.mul(a, b)

    @property
    def one(self):
        return fr.ones(self.batch_shape)

    @property
    def zero(self):
        return fr.zeros(self.batch_shape)

    def constant(self, v: int):
        return fr.full(self.batch_shape, v)


class ScalarAlgebra:
    """Python-int backend: elements are canonical residues (verifier path)."""

    def add(self, a, b):
        return oracle.add(a, b)

    def sub(self, a, b):
        return oracle.sub(a, b)

    def mul(self, a, b):
        return oracle.mul(a, b)

    one = 1
    zero = 0

    def constant(self, v: int):
        return v % R_MOD


def horner(alg, alpha, values):
    """Σ values[j]·alpha^(W-1-j) — the row compression used by both gadgets
    (air/src/lib.rs:129-137: ``comb = comb*alpha + col``)."""
    acc = alg.zero
    for v in values:
        acc = alg.add(alg.mul(acc, alpha), v)
    return acc
