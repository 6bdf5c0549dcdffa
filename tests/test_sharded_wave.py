"""Distributed wave marches == single-device (round-4 VERDICT task 1).

The Newmark (u, v, a) carry rides the same slab halo-CG machinery as the
heat marches; the enhanced variants add the per-step shared-LSE
acceleration solve with trace pinning transferred to the acceleration.
Every factory must reproduce the single-device march (models/transient.py
wave marches, models/elastic_wave.py) to solver tolerance on the
8-virtual-device CPU mesh, and compose with checkpoint/resume.
"""

import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig
from hybrid_fem_lssvr_tpu.models.hybrid3d import Solver3DConfig
from hybrid_fem_lssvr_tpu.models.transient import TransientConfig
from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
from hybrid_fem_lssvr_tpu.parallel.wave import (
    make_sharded_elastic_wave_2d, make_sharded_elastic_wave_3d,
    make_sharded_wave_2d, make_sharded_wave_3d,
)


def _stitch(slabs):
    """Overlapping [n_dev, nloc+1, ...] slabs -> full grid."""
    fl = np.asarray(slabs)
    n_dev, nloc1 = fl.shape[0], fl.shape[1]
    nloc = nloc1 - 1
    grid = np.zeros((n_dev * nloc + 1,) + fl.shape[2:])
    for dd in range(n_dev):
        grid[dd * nloc:(dd + 1) * nloc + 1] = fl[dd]
    return grid


@pytest.mark.parametrize("enhanced", [False, True])
def test_sharded_wave_2d_matches_single_device(enhanced):
    from hybrid_fem_lssvr_tpu.models.transient import (hybrid_wave_march_2d,
                                                       wave_2d,
                                                       wave_march_2d)

    p = wave_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4)
    tc = TransientConfig(t_final=0.25, n_steps=16)
    if enhanced:
        single, v_single = hybrid_wave_march_2d(p, cfg, tc)
    else:
        single, v_single = wave_march_2d(p, cfg, tc)
    out, v_out = make_sharded_wave_2d(p, cfg, tc, pmesh.element_mesh(4),
                                      enhanced=enhanced)()
    np.testing.assert_allclose(_stitch(out.fem_values),
                               np.asarray(single.fem_values),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(_stitch(v_out), np.asarray(v_single),
                               rtol=0, atol=1e-12)
    if enhanced:
        np.testing.assert_allclose(np.asarray(out.coeffs),
                                   np.asarray(single.coeffs),
                                   rtol=0, atol=1e-12)


def test_sharded_wave_2d_trace_lift_matches_single_device():
    """The gathered-grid tangential lift == the single-device trace_lift
    path (numerov mass: the O(h^4) configuration the lift exists for)."""
    from hybrid_fem_lssvr_tpu.models.transient import (hybrid_wave_march_2d,
                                                       wave_2d)

    p = wave_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4)
    tc = TransientConfig(t_final=0.25, n_steps=8, mass="numerov")
    single, _ = hybrid_wave_march_2d(p, cfg, tc, trace_lift=4)
    out, _ = make_sharded_wave_2d(p, cfg, tc, pmesh.element_mesh(4),
                                  enhanced=True, trace_lift=4)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs),
                               rtol=0, atol=1e-12)


@pytest.mark.parametrize("enhanced", [False, True])
def test_sharded_wave_3d_matches_single_device(enhanced):
    from hybrid_fem_lssvr_tpu.models.transient import (hybrid_wave_march_3d,
                                                       wave_3d,
                                                       wave_march_3d)

    p = wave_3d()
    cfg = Solver3DConfig(nx=6, ny=6, nz=8, M=4, n_colloc=4)
    tc = TransientConfig(t_final=0.2, n_steps=8)
    if enhanced:
        single, v_single = hybrid_wave_march_3d(p, cfg, tc)
    else:
        single, v_single = wave_march_3d(p, cfg, tc)
    out, v_out = make_sharded_wave_3d(p, cfg, tc, pmesh.element_mesh(4),
                                      enhanced=enhanced)()
    np.testing.assert_allclose(_stitch(out.fem_values),
                               np.asarray(single.fem_values),
                               rtol=0, atol=1e-12)
    if enhanced:
        np.testing.assert_allclose(np.asarray(out.coeffs),
                                   np.asarray(single.coeffs),
                                   rtol=0, atol=1e-12)


@pytest.mark.parametrize("enhanced", [False, True])
def test_sharded_elastic_wave_2d_matches_single_device(enhanced):
    from hybrid_fem_lssvr_tpu.models.elastic import ElasticConfig2D
    from hybrid_fem_lssvr_tpu.models.elastic_wave import (
        elastic_wave_2d, elastic_wave_march_2d,
        hybrid_elastic_wave_march_2d,
    )

    p = elastic_wave_2d()
    cfg = ElasticConfig2D(nx=8, ny=8, M=4, n_colloc=4, dtype="float64",
                          precond="jacobi")
    tc = TransientConfig(t_final=0.25, n_steps=8)
    single = (hybrid_elastic_wave_march_2d if enhanced
              else elastic_wave_march_2d)(p, cfg, tc)
    out = make_sharded_elastic_wave_2d(p, cfg, tc, pmesh.element_mesh(4),
                                       enhanced=enhanced)()
    np.testing.assert_allclose(out.assemble_fem_grid("u"),
                               np.asarray(single.fem_values),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(out.assemble_fem_grid("v"),
                               np.asarray(single.velocity),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(float(out.energy0), float(single.energy0),
                               rtol=1e-12)
    np.testing.assert_allclose(float(out.energyN), float(single.energyN),
                               rtol=1e-10)
    if enhanced:
        np.testing.assert_allclose(np.asarray(out.coeffs),
                                   np.asarray(single.coeffs),
                                   rtol=0, atol=1e-11)


def test_sharded_elastic_wave_energy_conserved():
    """Unforced release on 2 devices: Newmark (1/4, 1/2) conserves the
    psum-assembled discrete energy (the distributed version of the
    single-device conservation gate)."""
    from hybrid_fem_lssvr_tpu.models.elastic import ElasticConfig2D
    from hybrid_fem_lssvr_tpu.models.elastic_wave import (
        elastic_free_vibration_2d,
    )

    p = elastic_free_vibration_2d()
    cfg = ElasticConfig2D(nx=8, ny=8, M=4, n_colloc=4, dtype="float64",
                          precond="jacobi")
    tc = TransientConfig(t_final=0.5, n_steps=16)
    out = make_sharded_elastic_wave_2d(p, cfg, tc, pmesh.element_mesh(2),
                                       enhanced=False)()
    e0, eN = float(out.energy0), float(out.energyN)
    assert abs(eN - e0) <= 1e-10 * abs(e0)


def test_sharded_elastic_wave_3d_matches_single_device():
    from hybrid_fem_lssvr_tpu.models.elastic3d import ElasticConfig3D
    from hybrid_fem_lssvr_tpu.models.elastic_wave import (
        elastic_wave_3d, hybrid_elastic_wave_march_3d,
    )

    p = elastic_wave_3d()
    cfg = ElasticConfig3D(nx=4, ny=4, nz=4, M=4, n_colloc=4,
                          dtype="float64", precond="jacobi")
    tc = TransientConfig(t_final=0.2, n_steps=4)
    single = hybrid_elastic_wave_march_3d(p, cfg, tc)
    out = make_sharded_elastic_wave_3d(p, cfg, tc, pmesh.element_mesh(2),
                                       enhanced=True)()
    np.testing.assert_allclose(np.asarray(out.coeffs),
                               np.asarray(single.coeffs),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(float(out.energyN), float(single.energyN),
                               rtol=1e-10)


def test_sharded_wave_checkpoint_resume_bitwise(tmp_path):
    """Kill-and-resume for a distributed wave march: final (u, v, w)
    bitwise equal to the uninterrupted chunked run."""
    import shutil

    import pytest as _pytest

    from hybrid_fem_lssvr_tpu.models.transient import wave_2d
    from hybrid_fem_lssvr_tpu.utils import checkpoint as CK

    p = wave_2d()
    cfg = Solver2DConfig(nx=8, ny=8, M=4, n_colloc=4)
    tc = TransientConfig(t_final=0.25, n_steps=16,
                         checkpoint=str(tmp_path / "wm"),
                         checkpoint_chunk=4)
    run = make_sharded_wave_2d(p, cfg, tc, pmesh.element_mesh(4))
    ref, v_ref = run()

    shutil.rmtree(tmp_path / "wm")
    orig = CK._write_march
    calls = {"n": 0}

    def bomb(*a, **k):
        orig(*a, **k)
        calls["n"] += 1
        if calls["n"] == 2:
            raise KeyboardInterrupt

    CK._write_march = bomb
    try:
        with _pytest.raises(KeyboardInterrupt):
            run()
    finally:
        CK._write_march = orig
    res, v_res = run()  # resumes at step 8
    np.testing.assert_array_equal(np.asarray(res.coeffs),
                                  np.asarray(ref.coeffs))
    np.testing.assert_array_equal(np.asarray(v_res), np.asarray(v_ref))


def test_cli_wave_2d_slab(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["transient", "--dim", "2", "--problem", "wave_2d",
              "--nx", "8", "--ny", "8", "--M", "4", "--n-steps", "16",
              "--t-final", "0.25", "--enhanced", "--mesh", "slab",
              "--x64", "--eval-points", "200"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "wave_march_2d"
    assert rec["devices"] >= 2
    assert rec["nodal_linf"] < 5e-2


def test_cli_elastic_wave_slab(capsys):
    import json

    from hybrid_fem_lssvr_tpu import cli

    cli.main(["elastic", "--wave", "--nx", "8", "--ny", "8",
              "--M2", "4", "--n-steps", "8", "--t-final", "0.25",
              "--mesh", "slab", "--x64", "--eval-points", "100"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "elastic_wave_march"
    assert rec["devices"] >= 2
    assert rec["linf_error"] < 0.3  # coarse 8^2 M=4, 8 steps


def test_cli_transient_slab_gates_1d():
    import pytest as _pytest

    from hybrid_fem_lssvr_tpu import cli

    with _pytest.raises(SystemExit, match="single-device"):
        cli.main(["transient", "--problem", "heat_1d", "--mesh", "slab"])
