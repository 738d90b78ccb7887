from curdleproofs_tpu.utils.errors import ProofError, SerdeError, VerificationError
from curdleproofs_tpu.utils.serde import BufReader
from curdleproofs_tpu.utils.rng import ProofRng, default_rng

__all__ = [
    "ProofError",
    "SerdeError",
    "VerificationError",
    "BufReader",
    "ProofRng",
    "default_rng",
]
