"""Numerical sanitizers (SURVEY.md section 5: race-detection analog).

The reference is single-threaded with no checks; the TPU build's failure
modes are numerical (NaN/Inf propagation, silent fallback) and layout-level
(bad gathers).  Tools here:

* ``nan_guard()`` — scoped ``jax_debug_nans``: any NaN produced under jit
  raises at the producing op.
* ``checkified(fn)`` — ``jax.experimental.checkify`` wrapper with float and
  index checks; returns (error, value) so tests and long campaigns can
  assert cleanliness without crashing the run.
* Determinism note: assembly uses static slice-adds (no ``segment_sum`` on
  dynamic indices), so single-device results are bitwise reproducible run
  to run; the sharded SPIKE solve fixes its reduction order by
  construction (tests/test_sharded.py asserts cross-layout agreement).
"""

from __future__ import annotations

import contextlib

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def nan_guard():
    """Raise at the eager/jit op that first produces a NaN."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkified(fn, errors=checkify.float_checks | checkify.index_checks):
    """checkify-wrap ``fn``: returns a callable producing (error, value)."""
    return checkify.checkify(fn, errors=errors)


def require_x64(dtype, context: str):
    """Fail loudly when float64 is requested without ``jax_enable_x64``.

    JAX otherwise TRUNCATES the request to float32 with only a UserWarning
    — observed end-to-end: a ``fem_dtype='float64'`` sharded solve on TPU
    silently returned linf 2.45e-1 (vs 5e-6 healthy) because every f64
    cast quietly became f32.  Call this wherever a config-requested f64
    dtype is consumed."""
    import jax.numpy as jnp

    if jnp.dtype(dtype) == jnp.float64 and not jax.config.jax_enable_x64:
        raise ValueError(
            f"{context} requests float64 but jax_enable_x64 is disabled; "
            "JAX would silently truncate every cast to float32 and the "
            "solve returns garbage. Set jax.config.update("
            "'jax_enable_x64', True) (TPU-emulated f64 is supported — "
            "see docs/NUMERICS.md) or drop the float64 request."
        )
