"""Compatibility alias — implementation: transcript/oracle.py."""
from curdleproofs_tpu.transcript.oracle import (  # noqa: F401
    CurdleproofsTranscript,
    Transcript,
)
