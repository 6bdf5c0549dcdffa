"""Test harness: 8 virtual CPU devices + float64 (SURVEY.md section 4 #5).

Sharding/collective tests run against fake CPU devices via
``--xla_force_host_platform_device_count=8``; the same tests run unmodified
on real TPU slices.  x64 is the correctness-oracle precision.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config route
# does force the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.device_count() == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-program caches after each test module.

    The full suite (300+ tests, hundreds of XLA CPU compilations in one
    process) segfaulted inside ``backend_compile`` three times in round 3
    at ~60-75% through — every implicated test passes standalone, so the
    crash tracks CUMULATIVE compile state, not any test.  Cross-module
    jit reuse is minimal (each module jits its own closures), so clearing
    between modules is cheap insurance."""
    yield
    jax.clear_caches()

# Fast core subset (CLAUDE.md: `pytest -m fast`, ~8-10 min on a loaded box
# vs ~45 for the full suite): whole modules covering the numerical core
# (kkt/legendre/tridiag), end-to-end 1D parity, problem families, checks,
# aux subsystems — plus one sharded-equality and one Pallas-interpret
# equality test.  Marked centrally here so the list is auditable in one
# place and modules stay marker-free.
_FAST_MODULES = {
    "test_kkt.py", "test_legendre.py", "test_tridiag.py",
    "test_poisson1d.py", "test_problems.py", "test_checks.py",
    "test_aux.py", "test_pipeline.py", "test_transient.py",
    "test_nonlinear.py",
}
_FAST_TESTS = {
    "test_goal.py::test_dwr_effectivity_near_one",
    "test_sharded.py::test_sharded_matches_single_device",
    "test_pallas.py::test_fused_matches_jnp_path",
    "test_pallas.py::test_fused_varcoeff_matches_xla_lse_path",
    "test_pallas.py::test_fused_stacked_3d_matches_xla_path",
    "test_graded3d.py::test_reference_parts_identity_3d",
    "test_eigen.py::test_enhanced_eigenvalues_hit_f64_floor",
    "test_eigen.py::test_lift_weights_reproduce_polynomials",
    # Vector (elasticity) family regression gate (round-3 VERDICT Weak
    # #1): block-operator algebra, stress readout, one distributed==local
    # equality per dimension.
    "test_elastic.py::test_block_operator_spd",
    "test_elastic.py::test_stress_readout",
    "test_elastic.py::test_richardson_nodal_fourth_order",
    "test_sharded_elastic.py::test_sharded_elastic_2d_matches_single_device",
    "test_sharded_elastic.py::test_sharded_elastic_3d_matches_single_device",
    # Composed-family distributed gates (round 4).
    "test_sharded_families.py::test_sharded_biharmonic_1d_hits_hybrid_floor",
    "test_sharded_families.py::test_sharded_semilinear_matches_single_device",
    "test_sharded2d.py::test_sharded_2d_compact_lift_matches_single_device",
    # Round-5 gates: one distributed wave march, one up-dimensioned
    # composed family (compile-once eigen), grid compact, clamped plate.
    "test_sharded_wave.py::test_sharded_wave_2d_matches_single_device",
    "test_sharded_families.py::"
    "test_sharded_eigensolve_2d_matches_single_device_compile_once",
    "test_sharded2d.py::"
    "test_grid_sharded_2d_compact_lift_matches_single_device",
    "test_biharmonic.py::test_clamped_plate_fourth_order",
    "test_biharmonic.py::test_shared_lse_rank_deficient_svd_route",
}
# Individually excluded from fast modules (3D mesh-sweep / long-march
# cost).
_FAST_EXCLUDE = {
    "test_nonlinear.py::test_semilinear_3d_converges",
    "test_nonlinear.py::test_semilinear_3d_numerov_lift_fourth_order",
    "test_transient.py::test_hybrid_wave_march_2d_trace_lift_rides_nodal_floor",
    "test_transient.py::test_hybrid_wave_march_3d_trace_lift",
    "test_transient.py::test_sharded_semilinear_march_3d_matches_single_device",
    "test_transient.py::test_semilinear_hybrid_march_3d_smoke",
    "test_transient.py::test_hybrid_march_2d_trace_lift_fourth_order",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "fast: core subset (~8 min); run with -m fast"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = os.path.basename(str(item.fspath))
        base = item.nodeid.split("::")[1].split("[")[0] \
            if "::" in item.nodeid else ""
        key = f"{mod}::{base}"
        if (mod in _FAST_MODULES or key in _FAST_TESTS) \
                and key not in _FAST_EXCLUDE:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
