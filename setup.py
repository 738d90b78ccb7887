"""Build script for the native extensions (C Keccak-f[1600]).

    python setup.py build_ext --inplace

The package works without the extension (pure-Python fallback in
transcript/keccak.py); building it accelerates Fiat-Shamir transcript
hashing ~100x.
"""
from setuptools import Extension, setup

setup(
    name="curdleproofs-tpu-native",
    ext_modules=[
        Extension(
            "curdleproofs_tpu._keccak_native",
            sources=["csrc/keccak.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
