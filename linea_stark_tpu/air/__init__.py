"""AIR layer: constraint gadgets with dual (vector/scalar) backends."""

from .algebra import ScalarAlgebra, VectorAlgebra, horner
from .gadgets import (
    LineaAir,
    LookupAirConfig,
    PermutationAirConfig,
    Sel,
    eval_lookup,
    eval_permutation,
)

__all__ = [
    "LineaAir",
    "LookupAirConfig",
    "PermutationAirConfig",
    "ScalarAlgebra",
    "Sel",
    "VectorAlgebra",
    "eval_lookup",
    "eval_permutation",
    "horner",
]
