"""Compatibility alias — implementation: protocol/sigma.py."""
from curdleproofs_tpu.protocol.sigma import TrackerOpeningProof  # noqa: F401
