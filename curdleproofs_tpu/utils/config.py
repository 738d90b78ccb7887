"""Framework configuration knobs (environment variables).

Protocol constants (N_BLINDERS, curve order, STROBE rate, transcript labels)
are FROZEN — they define wire compatibility with the reference. Everything
here only tunes execution.

  CURDLEPROOFS_PALLAS        "auto" (default: on for TPU), "1" force on
                             (interpreter mode off-TPU), "0" force off.
  CURDLEPROOFS_LIMB_UNROLL   "1" = fully unrolled XLA limb graphs (bigger
                             compiles, faster off-Pallas execution);
                             default "0" = lax loops (fast compiles).
  CURDLEPROOFS_JAX_CACHE     persistent compilation cache directory
                             (default <repo>/.jax_cache).
  BENCH_N / BENCH_C / BENCH_REPS / BENCH_METHOD / BENCH_UNROLL
                             bench.py inputs (see bench.py docstring).
"""
from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class RuntimeConfig:
    pallas_mode: str
    limb_unroll: bool
    cache_dir: str


def current() -> RuntimeConfig:
    from curdleproofs_tpu.ops import _cache_dir

    return RuntimeConfig(
        pallas_mode=os.environ.get("CURDLEPROOFS_PALLAS", "auto"),
        limb_unroll=os.environ.get("CURDLEPROOFS_LIMB_UNROLL", "0") == "1",
        cache_dir=_cache_dir,
    )
