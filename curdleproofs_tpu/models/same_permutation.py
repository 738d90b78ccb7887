"""Compatibility alias — implementation: protocol/products.py."""
from curdleproofs_tpu.protocol.products import (  # noqa: F401
    SamePermutationProof,
    get_permutation,
)
