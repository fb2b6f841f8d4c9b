"""NTT / low-degree-extension layer (p3-dft equivalent)."""

from .ntt import (
    bit_reverse,
    bit_reverse_indices,
    coeffs_bitrev_to_evals,
    coset_lde,
    evals_to_coeffs_bitrev,
    intt,
    ntt,
    ntt_dif,
    ntt_dit,
    pad_coeffs_bitrev,
    root_of_unity,
)

__all__ = [
    "bit_reverse",
    "bit_reverse_indices",
    "coeffs_bitrev_to_evals",
    "coset_lde",
    "evals_to_coeffs_bitrev",
    "intt",
    "ntt",
    "ntt_dif",
    "ntt_dit",
    "pad_coeffs_bitrev",
    "root_of_unity",
]
