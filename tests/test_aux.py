"""Auxiliary subsystems: checkpoint/resume, CLI, metrics, profiling hooks."""

import io
import json
import os

import numpy as np
import pytest

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems
from hybrid_fem_lssvr_tpu.models.hybrid import Solution
from hybrid_fem_lssvr_tpu.utils import checkpoint as ckpt
from hybrid_fem_lssvr_tpu.utils import metrics as M


def test_checkpoint_roundtrip(tmp_path):
    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=17)
    s = HybridSolver(p, cfg)
    sol, resumed = ckpt.load_or_solve(str(tmp_path / "ck"), s)
    assert not resumed
    # Second run resumes without solving
    s2 = HybridSolver(p, cfg)
    sol2, resumed2 = ckpt.load_or_solve(str(tmp_path / "ck"), s2)
    assert resumed2
    np.testing.assert_array_equal(np.asarray(sol.coeffs),
                                  np.asarray(sol2.coeffs))
    # Resumed solver evaluates correctly
    x = np.linspace(-1, 1, 51)
    linf, _ = s2.errors(x)
    assert float(linf) < 1e-6


def test_checkpoint_fingerprint_mismatch(tmp_path):
    p = problems.poisson_1d()
    s = HybridSolver(p, SolverConfig(num_nodes=17))
    ckpt.load_or_solve(str(tmp_path / "ck"), s)
    # Different config -> no resume
    s2 = HybridSolver(p, SolverConfig(num_nodes=33))
    sol2, resumed = ckpt.load_or_solve(str(tmp_path / "ck"), s2)
    assert not resumed
    assert sol2.coeffs.shape[0] == 32


def test_checkpoint_roundtrip_2d(tmp_path):
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        HybridSolver2D, Solver2DConfig, poisson_2d,
    )

    cfg = Solver2DConfig(nx=6, ny=6, M=4, n_colloc=4)
    s = HybridSolver2D(poisson_2d(), cfg)
    sol, resumed = ckpt.load_or_solve(str(tmp_path / "ck2d"), s)
    assert not resumed
    s2 = HybridSolver2D(poisson_2d(), cfg)
    sol2, resumed2 = ckpt.load_or_solve(str(tmp_path / "ck2d"), s2)
    assert resumed2
    np.testing.assert_array_equal(np.asarray(sol.coeffs),
                                  np.asarray(sol2.coeffs))
    u = s2.evaluate_solution(np.array([0.1]), np.array([-0.2]))
    assert np.isfinite(np.asarray(u)).all()


def test_config_validation():
    with pytest.raises(ValueError, match="num_nodes"):
        SolverConfig(num_nodes=1)
    with pytest.raises(ValueError, match="under-determines"):
        SolverConfig(M=10, n_colloc=4)
    with pytest.raises(ValueError, match="formulation"):
        SolverConfig(formulation="primel")
    with pytest.raises(ValueError, match="gamma"):
        SolverConfig(gamma=0.0)
    with pytest.raises(ValueError, match="tridiag_method"):
        SolverConfig(tridiag_method="thomaz")
    SolverConfig()  # defaults valid


def test_metrics_emitter_json_lines():
    buf = io.StringIO()
    em = M.MetricsEmitter(stream=buf, run_id="r1")
    em.emit("stage_a", foo=1.5, bar="x")
    rec = json.loads(buf.getvalue())
    assert rec["stage"] == "stage_a" and rec["foo"] == 1.5
    assert rec["run_id"] == "r1"


def test_cli_run_and_sweep(capsys):
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["run", "--problem", "poisson_1d", "--num-nodes", "17"])
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["stage"] == "hybrid_solve"
    assert rec["linf_error"] < 1e-5
    assert rec["n_fallback"] == 0

    cli.main(["sweep", "--elements", "8", "16", "32",
              "--fem-quad-order", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    summary = json.loads(out[-1])
    assert summary["stage"] == "sweep_summary"
    assert 3.5 < summary["convergence_order"] < 4.8


def test_cli_run2d(capsys):
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["run2d", "--nx", "8", "--ny", "8"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_2d"
    assert rec["linf_error"] < 0.1


def test_cli_checkpoint_resume(tmp_path, capsys):
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck")
    cli.main(["run", "--num-nodes", "17", "--checkpoint", ck])
    rec1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not rec1["resumed"]
    cli.main(["run", "--num-nodes", "17", "--checkpoint", ck])
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"]
    assert rec2["linf_error"] == pytest.approx(rec1["linf_error"], abs=1e-12)
