from curdleproofs_tpu.transcript.keccak import keccak_f1600
from curdleproofs_tpu.transcript.strobe import Strobe128
from curdleproofs_tpu.transcript.merlin import MerlinTranscript
from curdleproofs_tpu.transcript.fiat_shamir import CurdleproofsTranscript

__all__ = [
    "keccak_f1600",
    "Strobe128",
    "MerlinTranscript",
    "CurdleproofsTranscript",
]
