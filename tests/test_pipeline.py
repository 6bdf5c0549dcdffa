"""Device-level two-stage pipeline (SURVEY.md 2.3 PP row).

The pipelined sweep must equal the vmapped reference path
(``models.batched.solve_family``) exactly — same fem_solve/lssvr_enhance
code runs in both, only the schedule differs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models import batched
from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.parallel import pipeline


def test_pipeline_schedule():
    ticks, bubble = pipeline.pipeline_schedule(9, 2)
    assert ticks == 10
    assert bubble == pytest.approx(0.1)


@pytest.mark.parametrize("B", [1, 4, 7])
def test_pipelined_helmholtz_sweep_matches_vmapped(B):
    """k-sweep over the Helmholtz family: pipelined == one vmapped batch,
    coefficients, fem values, and diagnostics alike."""
    family = batched.helmholtz_family()
    cfg = SolverConfig(num_nodes=17, M=6, gamma=1e4)
    thetas = jnp.linspace(0.5, 2.0, B)
    ref = batched.solve_family(family, cfg, thetas)
    mesh = pipeline.stage_mesh(2)
    sol = pipeline.pipelined_family_solve(family, cfg, mesh, thetas)
    np.testing.assert_allclose(np.asarray(sol.fem_values),
                               np.asarray(ref.fem_values), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.coeffs),
                               np.asarray(ref.coeffs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.max_slack),
                               np.asarray(ref.max_slack), atol=1e-9)
    np.testing.assert_array_equal(np.asarray(sol.solve_ok),
                                  np.asarray(ref.solve_ok))
    assert bool(jnp.all(sol.solve_ok))


def test_pipelined_advdiff_sweep_matches_vmapped():
    """Vector-theta family (eps, beta) through the same pipeline."""
    family = batched.advdiff_family()
    cfg = SolverConfig(num_nodes=17, M=6, gamma=1e4)
    rng = np.random.default_rng(3)
    thetas = jnp.asarray(np.column_stack([rng.uniform(0.5, 1.5, 5),
                                          rng.uniform(-0.5, 0.5, 5)]))
    ref = batched.solve_family(family, cfg, thetas)
    mesh = pipeline.stage_mesh(2)
    sol = pipeline.pipelined_family_solve(family, cfg, mesh, thetas)
    np.testing.assert_allclose(np.asarray(sol.coeffs),
                               np.asarray(ref.coeffs), atol=1e-9)
    assert bool(jnp.all(sol.solve_ok))


@pytest.mark.parametrize("n_data", [2, 4])
def test_data_parallel_pipelines_match_vmapped(n_data):
    """DP x PP composition: a ('data', 'stage') mesh runs n_data
    independent 2-stage pipelines, each streaming its contiguous shard of
    the load-case batch; results equal the single vmapped batch."""
    family = batched.helmholtz_family()
    cfg = SolverConfig(num_nodes=17, M=6, gamma=1e4)
    thetas = jnp.linspace(0.5, 2.0, 2 * n_data)
    ref = batched.solve_family(family, cfg, thetas)
    mesh = pipeline.data_stage_mesh(n_data, 2)
    sol = pipeline.pipelined_family_solve(family, cfg, mesh, thetas)
    np.testing.assert_allclose(np.asarray(sol.coeffs),
                               np.asarray(ref.coeffs), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.fem_values),
                               np.asarray(ref.fem_values), atol=1e-12)
    assert bool(jnp.all(sol.solve_ok))

    with pytest.raises(ValueError, match="divide"):
        pipeline.pipelined_family_solve(family, cfg, mesh,
                                        jnp.linspace(0.5, 2.0,
                                                     2 * n_data + 1))


def test_pipeline_stage_isolation():
    """The schedule genuinely splits the work: with the enhancement
    stage's device removed from the mesh (1-stage mesh), the pipeline
    cannot produce enhancement output — guards against a silent fallback
    to replicated execution."""
    family = batched.helmholtz_family()
    cfg = SolverConfig(num_nodes=17, M=6, gamma=1e4)
    thetas = jnp.linspace(0.5, 2.0, 3)
    with pytest.raises(ValueError, match="2 stages"):
        bad = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("stage",))
        pipeline.pipelined_family_solve(family, cfg, bad, thetas)
