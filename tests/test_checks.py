"""Sanitizer tests: NaN guard, checkify, fault injection through the facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.models import hybrid as H
from hybrid_fem_lssvr_tpu.utils import checks


def test_checkify_clean_solve():
    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=17)
    nodes = H.uniform_nodes(p, cfg.num_nodes, cfg.jnp_dtype())

    fn = checks.checkified(lambda n: H.hybrid_solve(p, cfg, n).coeffs)
    err, coeffs = fn(nodes)
    err.throw()  # clean run: no error
    assert np.isfinite(np.asarray(coeffs)).all()


def test_fault_injection_masked_not_propagated():
    """Corrupt one element's FEM value: only that element (and its
    neighbour sharing the node) fall back; the rest of the solution is
    untouched — the reference's graceful per-element degradation
    (Hybrid-FEM-LSSVR.py:171-176) as a mask."""
    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=33)
    nodes = H.uniform_nodes(p, cfg.num_nodes, cfg.jnp_dtype())
    fem = H.fem_solve(p, nodes, cfg)
    fem_bad = fem.at[10].set(jnp.nan)
    w, diags = H.lssvr_enhance(p, nodes, fem_bad, cfg, shared_ops=None)
    ok = np.asarray(diags.solve_ok)
    assert not ok[9] and not ok[10]  # elements touching node 10
    assert ok[[0, 1, 2, 20, 31]].all()
    # fallback output still finite where the bc data itself was finite
    assert np.isfinite(np.asarray(w)[:9]).all()
    assert np.isfinite(np.asarray(w)[11:]).all()


def test_nan_guard_scoped():
    prev = jax.config.jax_debug_nans
    with checks.nan_guard():
        assert jax.config.jax_debug_nans
    assert jax.config.jax_debug_nans == prev


def test_require_x64_guard():
    """fem_dtype='float64' without jax_enable_x64 must raise, not silently
    truncate to f32 (observed: sharded solve returned linf 2.45e-1 with
    only a UserWarning before the guard existed)."""
    import pytest

    from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
    from hybrid_fem_lssvr_tpu.parallel.sharded import make_sharded_solve

    checks.require_x64("float64", "ctx")  # x64 on (conftest): no raise
    checks.require_x64("float32", "ctx")  # f32 never raises
    try:
        jax.config.update("jax_enable_x64", False)
        with pytest.raises(ValueError, match="float64"):
            checks.require_x64("float64", "ctx")
        p = problems.poisson_1d()
        cfg = SolverConfig(num_nodes=101, dtype="float32",
                           fem_dtype="float64")
        with pytest.raises(ValueError, match="float64"):
            make_sharded_solve(p, cfg, pmesh.element_mesh(2))
    finally:
        jax.config.update("jax_enable_x64", True)
