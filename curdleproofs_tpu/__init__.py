"""curdleproofs_tpu — TPU-native Curdleproofs zero-knowledge shuffle argument.

A from-scratch JAX/XLA/Pallas implementation of the Curdleproofs shuffle
argument (Ethereum Whisk), with BLS12-381 limb arithmetic, G1 kernels, and
Pippenger MSM running on TPU, and a bit-exact Merlin/STROBE Fiat–Shamir
transcript on host. Public API mirrors the reference package facade
(curdleproofs/__init__.py:1-15).
"""

from curdleproofs_tpu.fields import Fr, CURVE_ORDER, FR_MOD, FQ_MOD
from curdleproofs_tpu.curve import G1, G1_GENERATOR, G1_IDENTITY

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy re-exports of the protocol layer to keep bare field/curve imports
    # light (jax only loads when ops/models are touched).
    from curdleproofs_tpu.models import api

    try:
        return getattr(api, name)
    except AttributeError:
        raise AttributeError(f"module 'curdleproofs_tpu' has no attribute {name!r}")
