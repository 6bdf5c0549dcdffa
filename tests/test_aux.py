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


def test_async_checkpoint_nonblocking_and_durable(tmp_path):
    """The async save must return without doing the IO (so the next
    dispatch is never blocked on checkpoint writes at >= 1M-element sizes)
    and the written checkpoint must be bitwise-identical to a sync save."""
    import time

    import jax.numpy as jnp

    E = 1 << 20
    rng = np.random.default_rng(0)
    sol = Solution(
        nodes=jnp.asarray(rng.normal(size=E + 1), jnp.float32),
        fem_values=jnp.asarray(rng.normal(size=E + 1), jnp.float32),
        coeffs=jnp.asarray(rng.normal(size=(E, 8)), jnp.float32),
        max_slack=jnp.zeros(E, jnp.float32),
        bc_violation=jnp.zeros(E, jnp.float32),
        solve_ok=jnp.ones(E, bool),
    )
    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=E + 1)

    t0 = time.perf_counter()
    ckpt.save_solution(str(tmp_path / "sync"), p.name, cfg, sol)
    sync_s = time.perf_counter() - t0

    with ckpt.AsyncCheckpointer() as cp:
        t0 = time.perf_counter()
        cp.save(str(tmp_path / "async"), p.name, cfg, sol)
        enqueue_s = time.perf_counter() - t0
        cp.wait()
    # Enqueue must be far cheaper than the actual write (generous margin
    # for CI jitter; typical ratio is ~1000x).
    assert enqueue_s < max(0.25 * sync_s, 0.02), (enqueue_s, sync_s)

    restored = ckpt.load_solution(str(tmp_path / "async"), p.name, cfg,
                                  Solution)
    assert restored is not None
    for a, b in zip(sol, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointer_surfaces_writer_errors(tmp_path):
    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=5)
    s = HybridSolver(p, cfg)
    sol = s.solve()
    cp = ckpt.AsyncCheckpointer()
    target = tmp_path / "blocked"
    target.write_text("a file where the checkpoint dir should go")
    cp.save(str(target), p.name, cfg, sol)
    with pytest.raises(Exception):
        cp.wait()
    cp.close()


def test_load_or_run_sharded(tmp_path):
    """Sharded (multi-chip) solves checkpoint through the facade-free
    ``load_or_run`` helper."""
    import jax

    from hybrid_fem_lssvr_tpu.parallel import mesh as pmesh
    from hybrid_fem_lssvr_tpu.parallel.sharded import (
        ShardedSolution, make_sharded_solve,
    )

    p = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=17, M=6, dtype="float32")
    mesh = pmesh.element_mesh(devices=jax.devices("cpu")[:4])
    run = make_sharded_solve(p, cfg, mesh)
    calls = []

    def counted_run():
        calls.append(1)
        return run()

    path = str(tmp_path / "ck_sharded")
    sol, resumed = ckpt.load_or_run(path, p.name, cfg, counted_run,
                                    ShardedSolution)
    assert not resumed and len(calls) == 1
    sol2, resumed2 = ckpt.load_or_run(path, p.name, cfg, counted_run,
                                      ShardedSolution)
    assert resumed2 and len(calls) == 1
    np.testing.assert_array_equal(np.asarray(sol.coeffs),
                                  np.asarray(sol2.coeffs))


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


def test_cli_run3d(tmp_path, capsys):
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck3d_single")
    args = ["run3d", "--nx", "8", "--ny", "8", "--nz", "8",
            "--checkpoint", ck]
    cli.main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_3d"
    assert rec["linf_error"] < 0.1
    assert rec["n_fallback"] == 0
    # resume skips the solve and reproduces the same error norms
    cli.main(args)
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["linf_error"] == rec["linf_error"]


def test_cli_run3d_sharded_with_resume(tmp_path, capsys):
    """run3d --mesh slab on the virtual devices: JSON metrics, distributed
    read path, load_or_run resume."""
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck3d")
    args = ["run3d", "--nx", "8", "--ny", "8", "--nz", "8", "--M", "4",
            "--mesh", "slab", "--devices", "4", "--checkpoint", ck,
            "--eval-points", "500"]
    cli.main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_3d_sharded"
    assert rec["mesh"] == "slab:4"
    assert rec["linf_error"] < 0.1
    assert rec["n_fallback"] == 0
    assert rec["resumed"] is False
    cli.main(args)
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"] is True
    assert rec2["linf_error"] < 0.1


def test_cli_run3d_grid_mesh(tmp_path, capsys):
    """run3d --mesh grid: (z, y) block sharding with the grid read path
    and load_or_run resume."""
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck3dg")
    args = ["run3d", "--nx", "8", "--ny", "8", "--nz", "8", "--M", "4",
            "--mesh", "grid", "--mesh-shape", "2", "4",
            "--checkpoint", ck, "--eval-points", "500"]
    cli.main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_3d_sharded"
    assert rec["mesh"] == "grid:2x4"
    assert rec["linf_error"] < 0.1
    assert rec["n_fallback"] == 0
    assert rec["resumed"] is False
    cli.main(args)
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"] is True
    assert rec2["linf_error"] < 0.1


def test_cli_runsharded_with_resume(tmp_path, capsys):
    """Multi-chip 1D CLI on the 8 virtual devices: JSON metrics + error
    norms through the distributed read path; second invocation resumes
    from the checkpoint and skips recompute."""
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck1d")
    cli.main(["runsharded", "--problem", "poisson_1d", "--num-nodes", "33",
              "--checkpoint", ck])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_sharded"
    assert rec["devices"] == 8
    assert rec["linf_error"] < 1e-5
    assert rec["resumed"] is False
    cli.main(["runsharded", "--problem", "poisson_1d", "--num-nodes", "33",
              "--checkpoint", ck])
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"] is True
    assert rec2["linf_error"] < 1e-5


def test_cli_run2d_sharded_slab_and_grid(tmp_path, capsys):
    """run2d --mesh slab|grid on the virtual devices: same JSON metrics,
    load_or_run resume on the grid path."""
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["run2d", "--nx", "8", "--ny", "8", "--M", "4",
              "--mesh", "slab", "--devices", "4", "--eval-points", "500"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_2d_sharded"
    assert rec["mesh"] == "slab:4"
    assert rec["linf_error"] < 0.1
    assert rec["n_fallback"] == 0

    ck = str(tmp_path / "ck2d")
    args = ["run2d", "--nx", "8", "--ny", "8", "--M", "4",
            "--mesh", "grid", "--mesh-shape", "2", "4",
            "--checkpoint", ck, "--eval-points", "500"]
    cli.main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_2d_sharded"
    assert rec["mesh"] == "grid:2x4"
    assert rec["linf_error"] < 0.1
    assert rec["resumed"] is False
    cli.main(args)
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"] is True
    assert rec2["linf_error"] < 0.1


def test_cli_run2d_graded_single_and_sharded(capsys):
    """run2d --grading routes to the graded solvers (README roadmap:
    distributed graded CLI); the slab-sharded variant reproduces the
    single-device error norms."""
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["run2d", "--nx", "8", "--ny", "8", "--M", "4",
              "--grading", "1.5", "--eval-points", "500"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_2d_graded"
    assert rec["grading"] == 1.5
    assert rec["n_fallback"] == 0

    cli.main(["run2d", "--nx", "8", "--ny", "8", "--M", "4",
              "--grading", "1.5", "--mesh", "slab", "--devices", "4",
              "--eval-points", "500"])
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["stage"] == "hybrid_solve_2d_sharded_graded"
    assert rec2["mesh"] == "slab:4"
    assert rec2["n_fallback"] == 0
    assert abs(rec2["linf_error"] - rec["linf_error"]) < 1e-5


def test_cli_run3d_graded_sharded_with_resume(tmp_path, capsys):
    """run3d --grading --mesh slab: distributed graded hex solve through
    the CLI with load_or_run resume."""
    from hybrid_fem_lssvr_tpu import cli

    ck = str(tmp_path / "ck3dgr")
    args = ["run3d", "--nx", "6", "--ny", "6", "--nz", "8", "--M", "4",
            "--grading", "1.5", "--mesh", "slab", "--devices", "4",
            "--checkpoint", ck, "--eval-points", "500"]
    cli.main(args)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["stage"] == "hybrid_solve_3d_sharded_graded"
    assert rec["mesh"] == "slab:4"
    assert rec["n_fallback"] == 0
    assert rec["resumed"] is False
    cli.main(args)
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2["resumed"] is True
    assert rec2["linf_error"] == rec["linf_error"]


def test_cli_adaptive2d(capsys):
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["adaptive2d", "--nx", "6", "--ny", "6", "--M", "4",
              "--rounds", "1", "--eval-points", "500"])
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(ln) for ln in lines
            if '"adaptive2d_round"' in ln]
    assert len(recs) == 2
    assert recs[1]["elements"] > recs[0]["elements"]
    assert recs[1]["linf"] < 0.2


def test_cli_adaptive3d(capsys):
    from hybrid_fem_lssvr_tpu import cli

    cli.main(["adaptive3d", "--nx", "4", "--ny", "4", "--nz", "4",
              "--M", "4", "--rounds", "1", "--eval-points", "300"])
    lines = capsys.readouterr().out.strip().splitlines()
    recs = [json.loads(ln) for ln in lines
            if '"adaptive3d_round"' in ln]
    assert len(recs) == 2
    assert recs[1]["elements"] > recs[0]["elements"]
    assert recs[1]["linf"] < recs[0]["linf"]


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


def test_chunked_scan_structured_ys_full_resume(tmp_path):
    """Round-5 review fix: a fully-resumed chunked_scan (start == n) must
    return ys with its ORIGINAL pytree structure (recovered abstractly
    via eval_shape), not a bare tuple/array."""
    import jax
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.utils import checkpoint as CK

    def step(c, t):
        c = c + t
        return c, {"u": c, "v": 2.0 * c}  # dict-structured ys

    scan = jax.jit(lambda c, ts: jax.lax.scan(step, c, ts))
    ts = jnp.arange(8, dtype=jnp.float32)
    c0 = jnp.zeros((3,), jnp.float32)
    path = str(tmp_path / "m")
    c1, ys1 = CK.chunked_scan(scan, c0, ts, path=path, chunk=3,
                              fingerprint="fp")
    assert isinstance(ys1, dict) and set(ys1) == {"u", "v"}
    # full resume: same structure, bitwise values
    c2, ys2 = CK.chunked_scan(scan, c0, ts, path=path, chunk=3,
                              fingerprint="fp")
    assert isinstance(ys2, dict) and set(ys2) == {"u", "v"}
    np.testing.assert_array_equal(np.asarray(ys1["u"]),
                                  np.asarray(ys2["u"]))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_chunked_scan_lazy_carry0_callable(tmp_path):
    """carry0 may be a zero-argument callable; resume recovers the carry
    structure abstractly and loads the state (bitwise vs eager)."""
    import jax
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.utils import checkpoint as CK

    def step(c, t):
        return c * 1.5 + t, c

    scan = jax.jit(lambda c, ts: jax.lax.scan(step, c, ts))
    ts = jnp.arange(6, dtype=jnp.float32)
    path = str(tmp_path / "m")
    c_eager, ys_eager = CK.chunked_scan(
        scan, jnp.ones((2,), jnp.float32), ts, path=path, chunk=2,
        fingerprint="fp")
    c_lazy, ys_lazy = CK.chunked_scan(
        scan, lambda: jnp.ones((2,), jnp.float32), ts, path=path,
        chunk=2, fingerprint="fp")  # full resume through the thunk path
    np.testing.assert_array_equal(np.asarray(c_eager),
                                  np.asarray(c_lazy))
    np.testing.assert_array_equal(np.asarray(ys_eager),
                                  np.asarray(ys_lazy))


def test_march_state_missing_ys_file_restarts_cleanly(tmp_path):
    """A manifest listing a never-written ys file (crashed async writer)
    must invalidate the state (clean restart), not crash the resume."""
    import os
    import warnings

    import jax
    import jax.numpy as jnp

    from hybrid_fem_lssvr_tpu.utils import checkpoint as CK

    def step(c, t):
        return c + t, c

    scan = jax.jit(lambda c, ts: jax.lax.scan(step, c, ts))
    ts = jnp.arange(8, dtype=jnp.float32)
    c0 = jnp.zeros((2,), jnp.float32)
    path = str(tmp_path / "m")
    c1, ys1 = CK.chunked_scan(scan, c0, ts, path=path, chunk=2,
                              fingerprint="fp")
    # simulate the crashed async write: delete a listed ys file
    os.remove(os.path.join(path, CK._ys_filename(1)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        assert CK.load_march_state(path, "fp") is None
        c2, ys2 = CK.chunked_scan(scan, c0, ts, path=path, chunk=2,
                                  fingerprint="fp")  # restarted from 0
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(ys1), np.asarray(ys2))
