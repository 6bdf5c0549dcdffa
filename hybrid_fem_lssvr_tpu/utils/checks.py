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
