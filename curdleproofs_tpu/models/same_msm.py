"""Compatibility alias — implementation: protocol/folding.py."""
from curdleproofs_tpu.protocol.folding import SameMSMProof  # noqa: F401
