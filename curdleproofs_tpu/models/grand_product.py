"""Compatibility alias — implementation: protocol/products.py."""
from curdleproofs_tpu.protocol.products import GrandProductProof  # noqa: F401
