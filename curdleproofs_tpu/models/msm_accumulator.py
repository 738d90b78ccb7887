"""Compatibility alias — implementation: protocol/primitives.py."""
from curdleproofs_tpu.protocol.primitives import MSMAccumulator  # noqa: F401
