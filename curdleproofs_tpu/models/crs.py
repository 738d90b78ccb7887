"""Compatibility alias — implementation: protocol/primitives.py."""
from curdleproofs_tpu.protocol.primitives import CurdleproofsCrs  # noqa: F401
