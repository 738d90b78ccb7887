"""Device compute kernels (field limb arithmetic, G1 group ops, MSM).

Importing this package enables JAX's persistent compilation cache (repo-local
.jax_cache) so the large jitted field/point graphs compile once per machine.
"""
import os

import jax

_cache_dir = os.environ.get(
    "CURDLEPROOFS_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without these options
    pass
