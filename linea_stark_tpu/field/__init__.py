"""Fr (BLS12-377 scalar field) arithmetic: limb-packed JAX kernels + oracle."""

from . import constants, fr, oracle
from .codec import decode_be_bytes_mod_order, encode_be_bytes

__all__ = [
    "constants",
    "fr",
    "oracle",
    "decode_be_bytes_mod_order",
    "encode_be_bytes",
]
