"""Build script for the native extensions.

    python setup.py build_ext --inplace

Two extensions, both optional (pure-Python fallbacks exist):
  * _keccak_native (csrc/keccak.c): Keccak-f[1600] for Fiat-Shamir
    transcript hashing (~100x over the Python permutation).
  * _g1_native (csrc/g1.c): host BLS12-381 Fq/G1 backend — Montgomery
    limb arithmetic, Jacobian point ops, Pippenger MSM, batched
    compressed serde. Owns latency-critical small batches; the TPU
    Pallas kernels own throughput-critical large MSMs.
"""
from setuptools import Extension, setup

setup(
    name="curdleproofs-tpu-native",
    ext_modules=[
        Extension(
            "curdleproofs_tpu._keccak_native",
            sources=["csrc/keccak.c"],
            extra_compile_args=["-O3", "-march=native", "-funroll-loops"],
        ),
        Extension(
            "curdleproofs_tpu._g1_native",
            sources=["csrc/g1.c"],
            extra_compile_args=[
                "-O3",
                "-march=native",
                "-funroll-loops",
                "-fopenmp",
            ],
            extra_link_args=["-fopenmp"],
        ),
        Extension(
            "curdleproofs_tpu._route_native",
            sources=["csrc/route.c"],
            extra_compile_args=["-O3", "-march=native"],
        ),
    ],
)
