"""Compatibility alias — implementation: protocol/primitives.py."""
from curdleproofs_tpu.protocol.primitives import GroupCommitment  # noqa: F401
