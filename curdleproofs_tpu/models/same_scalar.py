"""Compatibility alias — implementation: protocol/sigma.py."""
from curdleproofs_tpu.protocol.sigma import SameScalarProof  # noqa: F401
