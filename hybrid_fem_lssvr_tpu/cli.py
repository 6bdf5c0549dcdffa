"""Command-line interface: run / sweep / 2D workloads with JSON-line metrics.

The reference's only driver is an if-__main__ block that plots a figure and
prints no error norm (``Hybrid-FEM-LSSVR.py:214-237``, SURVEY.md 3.5).  This
CLI runs every BASELINE.json workload config and emits structured metrics.

Examples:
  python -m hybrid_fem_lssvr_tpu.cli run --problem poisson_1d \
      --num-nodes 25 --M 8 --gamma 1e4
  python -m hybrid_fem_lssvr_tpu.cli sweep --problem poisson_1d \
      --elements 10 100 1000 10000 --formulation dual
  python -m hybrid_fem_lssvr_tpu.cli psweep --M-values 2 3 4 6 8 10
  python -m hybrid_fem_lssvr_tpu.cli run2d --nx 32 --ny 32
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import HybridSolver, SolverConfig, problems
from .models.hybrid2d import (HybridSolver2D, Solver2DConfig,
                              get_problem_2d, poisson_2d)
from .utils import checkpoint as ckpt
from .utils import metrics as M
from .utils import profiling


def _cfg_from_args(args) -> SolverConfig:
    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    return SolverConfig(
        num_nodes=args.num_nodes,
        M=args.M,
        gamma=args.gamma,
        n_colloc=args.n_colloc,
        formulation=args.formulation,
        fem_quad_order=args.fem_quad_order,
        tridiag_method=args.tridiag_method,
        dtype=args.dtype,
        fem_dtype=args.fem_dtype,
        backend=getattr(args, "backend", "auto"),
        diagnostics=not getattr(args, "no_diagnostics", False),
    )


def _run_one(problem, cfg, em: M.MetricsEmitter, eval_points: int,
             checkpoint_dir=None):
    solver = HybridSolver(problem, cfg)
    rec = {}
    with profiling.timed(rec, "compile_sec"):
        sol, resumed = ckpt.load_or_solve(checkpoint_dir, solver)
        jax.block_until_ready(sol.coeffs)
    # Steady-state timing (jit cache warm); resume path skips recompute.
    with profiling.timed(rec, "solve_sec"):
        if not resumed:
            sol = solver.solve()
        jax.block_until_ready(sol.coeffs)
    E = sol.coeffs.shape[0]
    fields = dict(
        problem=problem.name,
        formulation=cfg.formulation,
        elements=E,
        M=cfg.M,
        gamma=cfg.gamma,
        compile_sec=rec["compile_sec"],
        solve_sec=rec["solve_sec"],
        elements_per_sec=E / max(rec["solve_sec"], 1e-12),
        resumed=resumed,
        max_slack=float(jnp.max(sol.max_slack)),
        bc_violation=float(jnp.max(sol.bc_violation)),
        n_fallback=int(jnp.sum(~sol.solve_ok)),
    )
    if sol.cond_estimate is not None:
        fields["cond_estimate"] = float(jnp.max(sol.cond_estimate))
    if problem.exact is not None:
        x = np.linspace(*problem.domain, eval_points)
        linf, l2 = solver.errors(x)
        fields["linf_error"] = float(linf)
        fields["l2_error"] = float(l2)
    em.emit("hybrid_solve", **fields)
    return solver


def cmd_run(args):
    em = M.MetricsEmitter()
    problem = problems.get(args.problem)
    cfg = _cfg_from_args(args)
    if args.profile:
        with profiling.trace_to(args.profile):
            _run_one(problem, cfg, em, args.eval_points, args.checkpoint)
    else:
        _run_one(problem, cfg, em, args.eval_points, args.checkpoint)


def _force(sols):
    """Block on every in-flight solution via a tiny scalar fetch (the
    tunnel's block_until_ready has been observed returning early)."""
    return [float(jnp.max(s.bc_violation)) for s in sols]


def cmd_sweep(args):
    """h-refinement sweep (BASELINE.json config 2: 10 -> 1e4 elements),
    pipelined: all configs are dispatched without blocking in between
    (SURVEY.md section 2.3 PP row — JAX async dispatch + buffer donation),
    so config k+1's host-side assembly/dispatch overlaps config k's device
    execution.  A sequential (block-between-configs) pass is timed for
    comparison and the overlap is emitted in the summary."""
    from .models import hybrid as H

    em = M.MetricsEmitter()
    problem = problems.get(args.problem)
    cfgs = [dataclasses.replace(_cfg_from_args(args), num_nodes=E + 1)
            for E in args.elements]
    rec = {}
    with profiling.timed(rec, "compile_sec"):
        _force(H.sweep_solve(problem, cfgs))
    with profiling.timed(rec, "pipelined_sec"):
        sols = H.sweep_solve(problem, cfgs)
        _force(sols)
    with profiling.timed(rec, "sequential_sec"):
        for cfg in cfgs:
            shared = H.prepare_shared_host(problem, cfg)
            nodes = H.uniform_nodes(problem, cfg.num_nodes, cfg.jnp_dtype())
            _force([H.hybrid_solve_donating(problem, cfg, nodes, shared,
                                            uniform=True)])
    errs, hs = [], []
    for cfg, sol in zip(cfgs, sols):
        E = sol.coeffs.shape[0]
        fields = dict(problem=problem.name, formulation=cfg.formulation,
                      elements=E, M=cfg.M, gamma=cfg.gamma,
                      max_slack=float(jnp.max(sol.max_slack)),
                      bc_violation=float(jnp.max(sol.bc_violation)),
                      n_fallback=int(jnp.sum(~sol.solve_ok)))
        if problem.exact is not None:
            from .ops import eval as ops_eval
            from .utils import metrics as _m

            x = jnp.asarray(np.linspace(*problem.domain, args.eval_points),
                            sol.nodes.dtype)
            x0, x1 = problem.domain
            u = ops_eval.evaluate_uniform(x0, (x1 - x0) / E, sol.coeffs, x)
            ue = problem.exact(x)
            linf = float(_m.linf_error(u, ue))
            fields["linf_error"] = linf
            fields["l2_error"] = float(_m.l2_error(u, ue))
            errs.append(linf)
            hs.append((x1 - x0) / E)
        em.emit("hybrid_solve", **fields)
    summary = dict(problem=problem.name, compile_sec=rec["compile_sec"],
                   pipelined_sec=rec["pipelined_sec"],
                   sequential_sec=rec["sequential_sec"],
                   pipeline_speedup=rec["sequential_sec"]
                   / max(rec["pipelined_sec"], 1e-12))
    if len(errs) >= 2:
        summary["convergence_order"] = M.convergence_order(hs, errs)
        summary["errors"] = errs
    em.emit("sweep_summary", **summary)


def cmd_psweep(args):
    """Kernel-degree sweep p = M-1 (BASELINE.json config 2)."""
    em = M.MetricsEmitter()
    problem = problems.get(args.problem)
    for Mi in args.M_values:
        cfg = dataclasses.replace(_cfg_from_args(args), M=Mi)
        _run_one(problem, cfg, em, args.eval_points)


def cmd_adaptive(args):
    from .models.adaptive import adaptive_solve

    em = M.MetricsEmitter()
    problem = problems.get(args.problem)
    cfg = _cfg_from_args(args)
    if getattr(args, "goal_center", None) is not None:
        from .models.goal import goal_adaptive_solve

        x0, s = args.goal_center, args.goal_width
        j = lambda x: jnp.exp(-0.5 * ((x - x0) / s) ** 2)  # noqa: E731
        exact_goal = None
        if problem.exact is not None:
            tq, wq = np.polynomial.legendre.leggauss(400)
            a, b = problem.domain
            xg = 0.5 * (b - a) * tq + 0.5 * (a + b)
            ue = np.asarray(problem.exact(jnp.asarray(xg, jnp.float64)))
            exact_goal = float(0.5 * (b - a) * np.sum(
                wq * ue * np.exp(-0.5 * ((xg - x0) / s) ** 2)))
        res = goal_adaptive_solve(problem, j, cfg, rounds=args.rounds,
                                  refine_frac=args.refine_frac,
                                  exact_goal=exact_goal)
        for rec in res.history:
            em.emit("goal_adaptive_round", problem=problem.name, **rec)
        return
    xq = np.linspace(*problem.domain, args.eval_points) \
        if problem.exact is not None else None
    res = adaptive_solve(problem, cfg, rounds=args.rounds,
                         refine_frac=args.refine_frac, eval_points=xq)
    for rec in res.history:
        em.emit("adaptive_round", problem=problem.name, **rec)


def cmd_adaptive2d(args):
    from .models.hybrid2d_graded import adaptive_solve_2d

    em = M.MetricsEmitter()
    problem = get_problem_2d(getattr(args, "problem", "poisson_2d"))
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M,
                         gamma=args.gamma, dtype=args.dtype,
                         precond="jacobi")
    if getattr(args, "goal_center", None) is not None:
        from .models.goal import goal_adaptive_solve_2d

        x0, s = args.goal_center, args.goal_width
        j = lambda x, y: jnp.exp(  # noqa: E731
            -0.5 * (((x - x0) / s) ** 2 + ((y - x0) / s) ** 2))
        exact_goal = None
        if problem.exact is not None:
            tq, wq = np.polynomial.legendre.leggauss(200)
            a, b, c, d = problem.domain
            xg = 0.5 * (b - a) * tq + 0.5 * (a + b)
            yg = 0.5 * (d - c) * tq + 0.5 * (c + d)
            X, Y = np.meshgrid(xg, yg)
            W = np.outer(wq, wq) * 0.25 * (b - a) * (d - c)
            ue = np.asarray(problem.exact(jnp.asarray(X), jnp.asarray(Y)))
            exact_goal = float(np.sum(W * ue * np.asarray(j(X, Y))))
        res = goal_adaptive_solve_2d(
            problem, j, cfg, rounds=args.rounds,
            refine_frac=args.refine_frac, exact_goal=exact_goal,
            adjoint_zoom=args.adjoint_zoom)
        for rec in res.history:
            em.emit("goal_adaptive2d_round", problem=problem.name, **rec)
        return
    ep = None
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        ep = (rng.uniform(problem.domain[0], problem.domain[1],
                          args.eval_points),
              rng.uniform(problem.domain[2], problem.domain[3],
                          args.eval_points))
    res = adaptive_solve_2d(problem, cfg, rounds=args.rounds,
                            refine_frac=args.refine_frac, eval_points=ep)
    for rec in res.history:
        em.emit("adaptive2d_round", problem=problem.name, **rec)


def cmd_adaptive3d(args):
    from .models.hybrid3d import Solver3DConfig, get_problem_3d
    from .models.hybrid3d_graded import adaptive_solve_3d

    em = M.MetricsEmitter()
    problem = get_problem_3d(getattr(args, "problem", "poisson_3d"))
    cfg = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz, M=args.M,
                         n_colloc=args.M, gamma=args.gamma,
                         dtype=args.dtype, precond="jacobi",
                         backend="xla")
    if getattr(args, "goal_center", None) is not None:
        from .models.goal import goal_adaptive_solve_3d

        x0, s = args.goal_center, args.goal_width
        j = lambda x, y, z: jnp.exp(  # noqa: E731
            -0.5 * (((x - x0) ** 2 + (y - x0) ** 2 + (z - x0) ** 2)
                    / s ** 2))
        exact_goal = None
        if problem.exact is not None:
            tq, wq = np.polynomial.legendre.leggauss(80)
            d = problem.domain
            gs = [0.5 * (d[2 * i + 1] - d[2 * i]) * tq
                  + 0.5 * (d[2 * i] + d[2 * i + 1]) for i in range(3)]
            X, Y, Z = np.meshgrid(*gs, indexing="ij")
            W = (wq[:, None, None] * wq[None, :, None] * wq[None, None, :]
                 * 0.125 * (d[1] - d[0]) * (d[3] - d[2]) * (d[5] - d[4]))
            ue = np.asarray(problem.exact(jnp.asarray(X), jnp.asarray(Y),
                                          jnp.asarray(Z)))
            exact_goal = float(np.sum(W * ue * np.asarray(j(X, Y, Z))))
        res = goal_adaptive_solve_3d(
            problem, j, cfg, rounds=args.rounds,
            refine_frac=args.refine_frac, exact_goal=exact_goal,
            adjoint_zoom=args.adjoint_zoom)
        for rec in res.history:
            em.emit("goal_adaptive3d_round", problem=problem.name, **rec)
        return
    ep = None
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        ep = (rng.uniform(d[0], d[1], args.eval_points),
              rng.uniform(d[2], d[3], args.eval_points),
              rng.uniform(d[4], d[5], args.eval_points))
    res = adaptive_solve_3d(problem, cfg, rounds=args.rounds,
                            refine_frac=args.refine_frac, eval_points=ep)
    for rec in res.history:
        em.emit("adaptive3d_round", problem=problem.name, **rec)


def cmd_campaign(args):
    """Run every BASELINE.json workload config and emit one JSON line each:
    1) 1D Poisson primal (reference __main__ config),
    2) dual + h-sweep + kernel-degree points,
    3) variable-coefficient elliptic,
    4) Helmholtz and advection-diffusion,
    5) 2D Poisson on structured quads."""
    em = M.MetricsEmitter()
    base = dict(n_colloc=args.n_colloc, fem_quad_order=args.fem_quad_order,
                tridiag_method=args.tridiag_method, dtype=args.dtype,
                fem_dtype=args.fem_dtype)
    # config 1: reference __main__
    _run_one(problems.poisson_1d(),
             SolverConfig(num_nodes=25, M=8, gamma=1e4, **base),
             em, args.eval_points)
    # config 2: dual + sweeps
    for E in (10, 100, 1000):
        _run_one(problems.poisson_1d(),
                 SolverConfig(num_nodes=E + 1, M=8, formulation="dual",
                              **base),
                 em, args.eval_points)
    for Mi in (4, 8, 10):
        _run_one(problems.poisson_1d(),
                 SolverConfig(num_nodes=101, M=Mi, **base),
                 em, args.eval_points)
    # configs 3-4 (+ mixed-BC breadth rows)
    for name in ("variable_coeff_elliptic", "helmholtz_1d",
                 "advection_diffusion_1d", "poisson_neumann", "robin_1d"):
        _run_one(problems.get(name), SolverConfig(num_nodes=65, **base),
                 em, args.eval_points)
    # config 5: 2D — Poisson plus the generalized constant-coefficient
    # families (Helmholtz, advection-diffusion) on the same pipeline
    for name2d in ("poisson_2d", "helmholtz_2d", "advection_diffusion_2d",
                   "variable_coeff_elliptic_2d", "poisson_2d_neumann",
                   "robin_2d"):
        ns = argparse.Namespace(nx=32, ny=32, M=6, gamma=1e4,
                                dtype=args.dtype, eval_points=2000,
                                problem=name2d)
        cmd_run2d(ns)
    # beyond-BASELINE breadth: the 3D hex families on the same pipeline
    for name3d in ("poisson_3d", "helmholtz_3d",
                   "variable_coeff_elliptic_3d"):
        ns = argparse.Namespace(nx=16, ny=16, nz=16, M=4,
                                dtype=args.dtype, eval_points=2000,
                                problem=name3d)
        cmd_run3d(ns)
    # transient breadth: the enhanced 1D CN march (Numerov traces)
    ns = argparse.Namespace(dim=1, problem="heat_1d", num_nodes=33, M=8,
                            gamma=1e4, t_final=0.5, n_steps=256,
                            theta=0.5, mass="numerov", enhanced=True,
                            dtype=args.dtype, eval_points=401)
    cmd_transient(ns)
    # round-3 families: trace-lifted 2D enhanced march, semilinear
    # (steady Newton + IMEX march), goal-oriented DWR refinement
    ns = argparse.Namespace(dim=2, problem="heat_2d", nx=16, ny=16, M=6,
                            gamma=1e4, t_final=0.5, n_steps=128,
                            theta=0.5, mass="numerov", enhanced=True,
                            trace_lift=6, dtype=args.dtype,
                            eval_points=1000)
    cmd_transient(ns)
    ns = argparse.Namespace(dim=1, problem="semilinear_heat_1d",
                            num_nodes=17, M=8, gamma=1e4, t_final=1.0,
                            n_steps=128, theta=0.5, mass="numerov",
                            enhanced=True, dtype=args.dtype,
                            eval_points=401)
    cmd_transient(ns)
    ns = argparse.Namespace(problem="cubic_1d", num_nodes=17, M=8,
                            M2=6, M3=4, nx=16, ny=16, nz=8, gamma=1e4,
                            scheme="numerov", trace_lift=0,
                            dtype=args.dtype, x64=False,
                            eval_points=1000)
    cmd_nonlinear(ns)
    ns = argparse.Namespace(problem="poisson_1d", num_nodes=9, M=8,
                            gamma=1e4, rounds=3, refine_frac=0.3,
                            goal_center=0.3, goal_width=0.15,
                            formulation="primal",
                            eval_points=401, n_colloc=args.n_colloc,
                            fem_quad_order=args.fem_quad_order,
                            tridiag_method=args.tridiag_method,
                            dtype=args.dtype, fem_dtype=args.fem_dtype)
    cmd_adaptive(ns)


def _stitch_slabs(fl):
    """Overlapping [n_dev, nloc+1, ...] device slabs -> the full grid
    (node rows at slab seams are shared, so overlap-write is exact)."""
    fl = np.asarray(fl)
    n_dev, nloc1 = fl.shape[0], fl.shape[1]
    nloc = nloc1 - 1
    grid = np.zeros((n_dev * nloc + 1,) + fl.shape[2:], fl.dtype)
    for dd in range(n_dev):
        grid[dd * nloc:(dd + 1) * nloc + 1] = fl[dd]
    return jnp.asarray(grid)


def _wave_2d(args, em, tcfg):
    from .models import transient as TR

    problem = TR.wave_2d()
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M,
                         gamma=args.gamma, dtype=args.dtype)
    rec = {}
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.wave import make_sharded_wave_2d

        m = pmesh.element_mesh()
        rec["devices"] = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            sol, vN = make_sharded_wave_2d(
                problem, cfg, tcfg, m, enhanced=args.enhanced,
                trace_lift=getattr(args, "trace_lift", 0))()
            jax.block_until_ready(sol.fem_values)
        sol = sol._replace(fem_values=_stitch_slabs(sol.fem_values))
    else:
        with profiling.timed(rec, "solve_sec"):
            if args.enhanced:
                sol, vN = TR.hybrid_wave_march_2d(
                    problem, cfg, tcfg,
                    trace_lift=getattr(args, "trace_lift", 0))
            else:
                sol, vN = TR.wave_march_2d(problem, cfg, tcfg)
            jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name, mass=tcfg.mass, enhanced=args.enhanced,
        elements=cfg.nx * cfg.ny, n_steps=tcfg.n_steps,
        t_final=tcfg.t_final, solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
    )
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    if problem.exact is not None:
        X, Y = jnp.meshgrid(sol.xs, sol.ys)
        fields["nodal_linf"] = float(jnp.max(jnp.abs(
            sol.fem_values - problem.exact(X, Y, tcfg.t_final))))
        if args.enhanced:
            from .models.hybrid2d import Solution2D, evaluate_2d

            rng = np.random.default_rng(0)
            d = problem.elliptic.domain
            xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points),
                             sol.fem_values.dtype)
            yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points),
                             sol.fem_values.dtype)
            s2 = Solution2D(sol.xs, sol.ys, sol.fem_values, sol.coeffs,
                            sol.cg_iters, 0.0, None, None, None)
            u = evaluate_2d(s2, xq, yq)
            ue = problem.exact(xq, yq, tcfg.t_final)
            fields["linf_error"] = float(M.linf_error(u, ue))
    em.emit("wave_march_2d", **fields)


def _transient_2d(args, em, tcfg):
    from .models import transient as TR
    from .models.hybrid2d import Solution2D, evaluate_2d

    if args.problem == "wave_2d":
        return _wave_2d(args, em, tcfg)
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M,
                         gamma=args.gamma, dtype=args.dtype)
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.transient2d import make_sharded_transient_2d

        problem = (TR.semilinear_heat_2d()
                   if args.problem == "semilinear_heat_2d"
                   else TR.heat_2d())
        n_dev = len(jax.devices())
        rec = {}
        with profiling.timed(rec, "solve_sec"):
            sol = make_sharded_transient_2d(
                problem, cfg, tcfg, pmesh.element_mesh(n_dev),
                enhanced=args.enhanced)()
            jax.block_until_ready(sol.fem_values)
        em.emit("transient_march_2d_sharded", problem=problem.name,
                devices=n_dev, enhanced=args.enhanced, mass=tcfg.mass,
                elements=cfg.nx * cfg.ny, n_steps=tcfg.n_steps,
                solve_sec=rec["solve_sec"], cg_iters=int(sol.cg_iters))
        return
    if args.problem == "semilinear_heat_2d":
        problem = TR.semilinear_heat_2d()
        march = (TR.hybrid_march_semilinear_2d if args.enhanced
                 else TR.fem_march_semilinear_2d)
    else:
        problem = TR.heat_2d()
        march = TR.hybrid_march_2d if args.enhanced else TR.fem_march_2d
    if args.enhanced and getattr(args, "trace_lift", 0):
        import functools

        march = functools.partial(march, trace_lift=args.trace_lift)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = march(problem, cfg, tcfg)
        jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name,
        enhanced=args.enhanced,
        mass=tcfg.mass,
        elements=cfg.nx * cfg.ny,
        n_steps=tcfg.n_steps,
        t_final=tcfg.t_final,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
    )
    if problem.exact is not None:
        d = problem.elliptic.domain
        rng = np.random.default_rng(0)
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points),
                         sol.fem_values.dtype)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points),
                         sol.fem_values.dtype)
        ue = problem.exact(xq, yq, tcfg.t_final)
        if args.enhanced:
            s2 = Solution2D(sol.xs, sol.ys, sol.fem_values, sol.coeffs,
                            sol.cg_iters, 0.0, None, None, None)
            u = evaluate_2d(s2, xq, yq)
        else:
            from .models.hybrid2d import _bilinear_fallback_coeffs

            c = _bilinear_fallback_coeffs(
                sol.fem_values[:-1, :-1], sol.fem_values[:-1, 1:],
                sol.fem_values[1:, :-1], sol.fem_values[1:, 1:], 2)
            s2 = Solution2D(sol.xs, sol.ys, sol.fem_values, c,
                            sol.cg_iters, 0.0, None, None, None)
            u = evaluate_2d(s2, xq, yq)
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
        X, Y = jnp.meshgrid(sol.xs, sol.ys)
        fields["nodal_linf"] = float(jnp.max(jnp.abs(
            sol.fem_values - problem.exact(X, Y, tcfg.t_final))))
    em.emit("transient_march_2d", **fields)


def _wave_3d(args, em, tcfg):
    from .models import transient as TR
    from .models.hybrid3d import Solution3D, Solver3DConfig, evaluate_3d

    problem = TR.wave_3d()
    cfg = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz, M=args.M,
                         n_colloc=args.M, gamma=args.gamma,
                         dtype=args.dtype)
    rec = {}
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.wave import make_sharded_wave_3d

        m = pmesh.element_mesh()
        rec["devices"] = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            sol, vN = make_sharded_wave_3d(
                problem, cfg, tcfg, m, enhanced=args.enhanced,
                trace_lift=getattr(args, "trace_lift", 0))()
            jax.block_until_ready(sol.fem_values)
        sol = sol._replace(fem_values=_stitch_slabs(sol.fem_values))
    else:
        with profiling.timed(rec, "solve_sec"):
            if args.enhanced:
                sol, vN = TR.hybrid_wave_march_3d(
                    problem, cfg, tcfg,
                    trace_lift=getattr(args, "trace_lift", 0))
            else:
                sol, vN = TR.wave_march_3d(problem, cfg, tcfg)
            jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name, mass=tcfg.mass, enhanced=args.enhanced,
        elements=cfg.nx * cfg.ny * cfg.nz, n_steps=tcfg.n_steps,
        t_final=tcfg.t_final, solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
    )
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    if problem.exact is not None:
        X = sol.xs[None, None, :]
        Y = sol.ys[None, :, None]
        Z = sol.zs[:, None, None]
        fields["nodal_linf"] = float(jnp.max(jnp.abs(
            sol.fem_values - problem.exact(X, Y, Z, tcfg.t_final))))
        if args.enhanced:
            rng = np.random.default_rng(0)
            d = problem.elliptic.domain
            dt_ = sol.fem_values.dtype
            xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points),
                             dt_)
            yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points),
                             dt_)
            zq = jnp.asarray(rng.uniform(d[4], d[5], args.eval_points),
                             dt_)
            s3 = Solution3D(sol.xs, sol.ys, sol.zs, sol.fem_values,
                            sol.coeffs, sol.cg_iters, 0.0, None, None,
                            None)
            u = evaluate_3d(s3, xq, yq, zq)
            ue = problem.exact(xq, yq, zq, tcfg.t_final)
            fields["linf_error"] = float(M.linf_error(u, ue))
    em.emit("wave_march_3d", **fields)


def _transient_3d(args, em, tcfg):
    from .models import transient as TR
    from .models.hybrid3d import Solution3D, Solver3DConfig, evaluate_3d

    if args.problem == "wave_3d":
        return _wave_3d(args, em, tcfg)
    cfg = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz, M=args.M,
                         n_colloc=args.M, dtype=args.dtype)
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.transient3d import make_sharded_transient_3d

        problem = (TR.semilinear_heat_3d()
                   if args.problem == "semilinear_heat_3d"
                   else TR.heat_3d())
        n_dev = len(jax.devices())
        rec = {}
        with profiling.timed(rec, "solve_sec"):
            sol = make_sharded_transient_3d(
                problem, cfg, tcfg, pmesh.element_mesh(n_dev),
                enhanced=args.enhanced)()
            jax.block_until_ready(sol.fem_values)
        em.emit("transient_march_3d_sharded", problem=problem.name,
                devices=n_dev, enhanced=args.enhanced, mass=tcfg.mass,
                elements=cfg.nx * cfg.ny * cfg.nz, n_steps=tcfg.n_steps,
                solve_sec=rec["solve_sec"], cg_iters=int(sol.cg_iters))
        return
    if args.problem == "semilinear_heat_3d":
        problem = TR.semilinear_heat_3d()
        march = (TR.hybrid_march_semilinear_3d if args.enhanced
                 else TR.fem_march_semilinear_3d)
    else:
        problem = TR.heat_3d()
        march = TR.hybrid_march_3d if args.enhanced else TR.fem_march_3d
    if args.enhanced and getattr(args, "trace_lift", 0):
        import functools

        march = functools.partial(march, trace_lift=args.trace_lift)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = march(problem, cfg, tcfg)
        jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name,
        enhanced=args.enhanced,
        mass=tcfg.mass,
        elements=cfg.nx * cfg.ny * cfg.nz,
        n_steps=tcfg.n_steps,
        t_final=tcfg.t_final,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
    )
    if problem.exact is not None:
        d = problem.elliptic.domain
        rng = np.random.default_rng(0)
        dt_ = sol.fem_values.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt_)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt_)
        zq = jnp.asarray(rng.uniform(d[4], d[5], args.eval_points), dt_)
        ue = problem.exact(xq, yq, zq, tcfg.t_final)
        if args.enhanced:
            s3 = Solution3D(sol.xs, sol.ys, sol.zs, sol.fem_values,
                            sol.coeffs, sol.cg_iters, 0.0, None, None,
                            None)
            u = evaluate_3d(s3, xq, yq, zq)
            fields["linf_error"] = float(M.linf_error(u, ue))
            fields["l2_error"] = float(M.l2_error(u, ue))
        X = sol.xs[None, None, :]
        Y = sol.ys[None, :, None]
        Z = sol.zs[:, None, None]
        fields["nodal_linf"] = float(jnp.max(jnp.abs(
            sol.fem_values - problem.exact(X, Y, Z, tcfg.t_final))))
    em.emit("transient_march_3d", **fields)


def _wave_1d(args, em, tcfg):
    from .models import transient as TR

    problem = TR.wave_1d()
    cfg = SolverConfig(num_nodes=args.num_nodes, M=args.M,
                       gamma=args.gamma, dtype=args.dtype)
    march = TR.hybrid_wave_march if args.enhanced else TR.wave_march
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, vN = march(problem, cfg, tcfg)
        jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name,
        enhanced=args.enhanced,
        mass=tcfg.mass,
        elements=cfg.num_nodes - 1,
        n_steps=tcfg.n_steps,
        t_final=tcfg.t_final,
        solve_sec=rec["solve_sec"],
    )
    if problem.exact is not None:
        x = jnp.linspace(problem.elliptic.domain[0],
                         problem.elliptic.domain[1], args.eval_points,
                         dtype=sol.fem_values.dtype)
        ue = problem.exact(x, tcfg.t_final)
        if args.enhanced:
            from .ops import eval as ev

            u = ev.evaluate(sol.nodes, sol.coeffs, x)
        else:
            u = jnp.interp(x, sol.nodes, sol.fem_values)
        fields["linf_error"] = float(M.linf_error(u, ue))
        ue_n = problem.exact(sol.nodes, tcfg.t_final)
        fields["nodal_linf"] = float(
            jnp.max(jnp.abs(sol.fem_values - ue_n)))
    em.emit("wave_march", **fields)


def cmd_transient(args):
    """Parabolic march (u_t + L u = f): theta-scheme P1/Q1 or the
    LSSVR-enhanced Crank-Nicolson march, one lax.scan on device."""
    from .models import transient as TR

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    tcfg = TR.TransientConfig(
        t_final=args.t_final, n_steps=args.n_steps, theta=args.theta,
        mass=args.mass, checkpoint=getattr(args, "checkpoint", None),
        checkpoint_chunk=getattr(args, "checkpoint_chunk", 0))
    if args.dim == 3:
        return _transient_3d(args, em, tcfg)
    if args.dim == 2:
        return _transient_2d(args, em, tcfg)
    if getattr(args, "mesh", None) == "slab":
        raise SystemExit(
            "--mesh slab distributes the 2D/3D marches (y-/z-slabs); "
            "the 1D marches run single-device — drop --mesh or use "
            "--dim 2|3 (fail-loudly: a silent single-device fallback "
            "would misreport the topology)")
    if args.problem == "wave_1d":
        return _wave_1d(args, em, tcfg)
    problem = TR.TRANSIENT_REGISTRY[args.problem]()
    cfg = SolverConfig(num_nodes=args.num_nodes, M=args.M,
                       gamma=args.gamma, dtype=args.dtype)
    if getattr(args, "adaptive_tol", None) is not None:
        if args.enhanced or isinstance(
                problem, TR.SemilinearTransientProblem1D):
            raise SystemExit("--adaptive-tol drives the plain 1D linear "
                             "theta march (no --enhanced/semilinear)")
        rec = {}
        with profiling.timed(rec, "solve_sec"):
            res = TR.fem_march_adaptive(problem, cfg,
                                        t_final=args.t_final,
                                        tol=args.adaptive_tol,
                                        max_attempts=args.n_steps)
            jax.block_until_ready(res.solution.fem_values)
        fields = dict(problem=problem.name, adaptive=True,
                      tol=args.adaptive_tol,
                      t_reached=float(res.t_reached),
                      accepted=int(res.accepted),
                      rejected=int(res.rejected),
                      max_err_est=float(res.max_err),
                      solve_sec=rec["solve_sec"])
        if problem.exact is not None:
            sol = res.solution
            ue = problem.exact(sol.nodes, float(res.t_reached))
            fields["nodal_linf"] = float(
                jnp.max(jnp.abs(sol.fem_values - ue)))
        em.emit("transient_adaptive", **fields)
        return
    if isinstance(problem, TR.SemilinearTransientProblem1D):
        march = (TR.hybrid_march_semilinear if args.enhanced
                 else TR.fem_march_semilinear)
    else:
        march = TR.hybrid_march if args.enhanced else TR.fem_march
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = march(problem, cfg, tcfg)
        jax.block_until_ready(sol.fem_values)
    fields = dict(
        problem=problem.name,
        enhanced=args.enhanced,
        mass=args.mass,
        theta=args.theta,
        elements=cfg.num_nodes - 1,
        n_steps=args.n_steps,
        t_final=args.t_final,
        solve_sec=rec["solve_sec"],
        steps_per_sec=args.n_steps / max(rec["solve_sec"], 1e-12),
    )
    if problem.exact is not None:
        x = jnp.linspace(problem.elliptic.domain[0],
                         problem.elliptic.domain[1], args.eval_points,
                         dtype=sol.fem_values.dtype)
        ue = problem.exact(x, tcfg.t_final)
        if args.enhanced:
            from .ops import eval as ev

            u = ev.evaluate(sol.nodes, sol.coeffs, x)
        else:
            u = jnp.interp(x, sol.nodes, sol.fem_values)
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
        ue_n = problem.exact(sol.nodes, tcfg.t_final)
        fields["nodal_linf"] = float(
            jnp.max(jnp.abs(sol.fem_values - ue_n)))
    em.emit("transient_march", **fields)


def cmd_nonlinear(args):
    """Semilinear elliptic solve -a0 u'' + s(u) = f: Newton at the FEM
    level and at the element-polynomial level (models/nonlinear.py)."""
    from .models import nonlinear as NL

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    rec = {}
    if args.problem.endswith("_2d"):
        problem = {"cubic_2d": NL.cubic_2d}[args.problem]()
        cfg2 = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M2,
                              n_colloc=args.M2, gamma=args.gamma,
                              dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_solve_semilinear_2d,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_solve_semilinear_2d(
                    problem, cfg2, m, scheme=args.scheme,
                    trace_lift=getattr(args, "trace_lift", 0))()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = NL.hybrid_solve_semilinear_2d(
                    problem, cfg2, scheme=args.scheme,
                    trace_lift=getattr(args, "trace_lift", 0))
                jax.block_until_ready(sol.coeffs)
        elements, M_basis = cfg2.nx * cfg2.ny, cfg2.M
    elif args.problem.endswith("_3d"):
        from .models.hybrid3d import Solver3DConfig

        problem = {"cubic_3d": NL.cubic_3d}[args.problem]()
        cfg3 = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz,
                              M=args.M3, n_colloc=args.M3,
                              gamma=args.gamma, dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_solve_semilinear_3d,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_solve_semilinear_3d(
                    problem, cfg3, m, scheme=args.scheme,
                    trace_lift=getattr(args, "trace_lift", 0))()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = NL.hybrid_solve_semilinear_3d(
                    problem, cfg3, scheme=args.scheme,
                    trace_lift=getattr(args, "trace_lift", 0))
                jax.block_until_ready(sol.coeffs)
        elements, M_basis = cfg3.nx * cfg3.ny * cfg3.nz, cfg3.M
    else:
        problem = {"cubic_1d": NL.cubic_1d,
                   "bratu_1d": NL.bratu_1d}[args.problem]()
        cfg = SolverConfig(num_nodes=args.num_nodes, M=args.M,
                           gamma=args.gamma, dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_solve_semilinear,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_solve_semilinear(
                    problem, cfg, m, scheme=args.scheme)()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = NL.hybrid_solve_semilinear(problem, cfg,
                                                 scheme=args.scheme)
                jax.block_until_ready(sol.coeffs)
        elements, M_basis = cfg.num_nodes - 1, cfg.M
    fields = dict(
        problem=problem.name,
        scheme=args.scheme,
        elements=elements,
        M=M_basis,
        solve_sec=rec["solve_sec"],
        newton_residual=float(sol.newton_residuals[-1]),
        colloc_residual=float(sol.colloc_residual),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    if problem.exact is not None:
        dt = sol.fem_values.dtype
        if args.problem.endswith("_2d"):
            q = jnp.linspace(problem.domain[0], problem.domain[1],
                             args.eval_points, dtype=dt)
            X, Y = jnp.meshgrid(q, q)
            u = NL.evaluate_semilinear_2d(sol, X.ravel(), Y.ravel())
            ue = problem.exact(X.ravel(), Y.ravel())
        elif args.problem.endswith("_3d"):
            q = jnp.linspace(problem.domain[0], problem.domain[1],
                             min(args.eval_points, 33), dtype=dt)
            X, Y, Z = jnp.meshgrid(q, q, q)
            u = NL.evaluate_semilinear_3d(sol, X.ravel(), Y.ravel(),
                                          Z.ravel())
            ue = problem.exact(X.ravel(), Y.ravel(), Z.ravel())
        else:
            x = jnp.linspace(problem.domain[0], problem.domain[1],
                             args.eval_points, dtype=dt)
            u = NL.evaluate_semilinear(sol, x)
            ue = problem.exact(x)
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("semilinear_solve", **fields)


def cmd_eig(args):
    """Sturm-Liouville eigenpairs: FEM inverse subspace iteration +
    LSSVR-enhanced eigenfunctions with Rayleigh-quotient eigenvalues
    (models/eigen.py — beyond the reference's source-problem-only scope)."""
    from .models import eigen as EIG

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    if getattr(args, "mixed", False):
        if getattr(args, "mesh", None) == "slab":
            raise SystemExit(
                "--mixed is single-device (the sharded eigensolves run "
                "the f64 route) — drop --mesh or --mixed")
        if args.dim == 1:
            raise SystemExit(
                "--mixed is for --dim 2|3 (the 1D path is not f32-gated "
                "— run it directly with --dtype float32)")
    ecfg = EIG.EigenConfig(k=args.k, iters=args.iters, mass=args.mass,
                           rq_iters=args.rq_iters)
    rec = {}
    if args.dim == 3:
        from .models.hybrid3d import Solver3DConfig, get_problem_3d

        name = ("poisson_3d" if args.problem == "poisson_1d"
                else args.problem)  # dim-appropriate default
        problem = get_problem_3d(name)
        cfg = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz,
                             M=args.M3, n_colloc=args.M3,
                             gamma=args.gamma, dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_eigensolve_3d,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_eigensolve_3d(problem, cfg, m, ecfg)()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        elif getattr(args, "mixed", False):
            jax.config.update("jax_enable_x64", True)
            cfg = dataclasses.replace(cfg, dtype="float32")
            with profiling.timed(rec, "solve_sec"):
                sol = EIG.hybrid_eigensolve_3d_mixed(problem, cfg, ecfg)
                jax.block_until_ready(sol.coeffs)
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = EIG.hybrid_eigensolve_3d(problem, cfg, ecfg)
                jax.block_until_ready(sol.coeffs)
        elements = cfg.nx * cfg.ny * cfg.nz
        exact = EIG.exact_eigenvalues_3d(problem, args.k)
    elif args.dim == 2:
        name = ("poisson_2d" if args.problem == "poisson_1d"
                else args.problem)  # dim-appropriate default
        problem = get_problem_2d(name)
        cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M2,
                             gamma=args.gamma, dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_eigensolve_2d,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_eigensolve_2d(problem, cfg, m, ecfg)()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        elif getattr(args, "mixed", False):
            jax.config.update("jax_enable_x64", True)
            cfg = dataclasses.replace(cfg, dtype="float32")
            with profiling.timed(rec, "solve_sec"):
                sol = EIG.hybrid_eigensolve_2d_mixed(problem, cfg, ecfg)
                jax.block_until_ready(sol.coeffs)
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = EIG.hybrid_eigensolve_2d(problem, cfg, ecfg)
                jax.block_until_ready(sol.coeffs)
        elements = cfg.nx * cfg.ny
        exact = EIG.exact_eigenvalues_2d(problem, args.k)
    else:
        problem = problems.get(args.problem)
        cfg = SolverConfig(num_nodes=args.num_nodes, M=args.M,
                           gamma=args.gamma, dtype=args.dtype)
        if getattr(args, "mesh", None) == "slab":
            from .parallel import mesh as pmesh
            from .parallel.sharded_families import (
                make_sharded_eigensolve,
            )

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                sol = make_sharded_eigensolve(problem, cfg, m, ecfg)()
                jax.block_until_ready(sol.coeffs)
            sol = sol._replace(
                coeffs=jnp.asarray(np.asarray(sol.coeffs)))
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = EIG.hybrid_eigensolve(problem, cfg, ecfg)
                jax.block_until_ready(sol.coeffs)
        elements = cfg.num_nodes - 1
        exact = (None if args.exact_c0 is None
                 else EIG.exact_eigenvalues(problem, args.k,
                                            c0=args.exact_c0))
    fields = dict(
        problem=problem.name,
        dim=args.dim,
        elements=elements,
        k=args.k,
        mass=args.mass,
        solve_sec=rec["solve_sec"],
        fem_lams=[float(v) for v in np.asarray(sol.fem.lams)],
        enhanced_lams=[float(v) for v in np.asarray(sol.lams)],
        max_residual=float(jnp.max(sol.fem.residuals)),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    if exact is not None:
        fields["fem_lam_err"] = [
            float(v) for v in np.abs(np.asarray(sol.fem.lams) - exact)]
        fields["enhanced_lam_err"] = [
            float(v) for v in np.abs(np.asarray(sol.lams) - exact)]
    em.emit("eigensolve", **fields)


def cmd_biharmonic(args):
    """Fourth-order d4u/dx4 = f via two chained hybrid solves
    (models/biharmonic.py)."""
    from .models.biharmonic import sin_biharmonic_1d, solve_biharmonic_1d
    from .ops import eval as ev

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    if getattr(args, "clamped", False):
        if getattr(args, "dim", 1) == 3:
            raise SystemExit(
                "--clamped is 1D (Hermite beam) or 2D (BFS plate); the "
                "3D C^1 tensor trace space is out of scope "
                "(docs/NUMERICS.md)"
            )
        if (getattr(args, "mesh", None) == "slab"
                and getattr(args, "dim", 1) != 2):
            raise SystemExit(
                "--clamped --mesh slab is 2D only (the plate's y-slab "
                "enhancement; the 1D beam runs single-device) — drop "
                "--mesh or use --dim 2")
        if getattr(args, "dim", 1) == 2:
            return _biharmonic_clamped_2d(args, em)
        return _biharmonic_clamped(args, em)
    if getattr(args, "dim", 1) == 2:
        return _biharmonic_2d(args, em)
    if getattr(args, "dim", 1) == 3:
        return _biharmonic_3d(args, em)
    problem = sin_biharmonic_1d()
    cfg = SolverConfig(num_nodes=args.num_nodes, M=args.M,
                       gamma=args.gamma, dtype=args.dtype)
    rec = {}
    devices = None
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.sharded_families import (
            make_sharded_solve_biharmonic_1d,
        )

        m = pmesh.element_mesh()
        devices = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            sol = make_sharded_solve_biharmonic_1d(problem, cfg, m)()
            jax.block_until_ready(sol.u.coeffs)
        nodes = jnp.linspace(*problem.domain, cfg.num_nodes,
                             dtype=sol.u.coeffs.dtype)
        u_c = jnp.asarray(np.asarray(sol.u.coeffs))
        v_c = jnp.asarray(np.asarray(sol.v.coeffs))
    else:
        with profiling.timed(rec, "solve_sec"):
            sol = solve_biharmonic_1d(problem, cfg)
            jax.block_until_ready(sol.u.coeffs)
        nodes, u_c, v_c = sol.u.nodes, sol.u.coeffs, sol.v.coeffs
    fields = dict(problem=problem.name, elements=cfg.num_nodes - 1,
                  M=cfg.M, solve_sec=rec["solve_sec"],
                  n_fallback=int((~sol.u.solve_ok).sum())
                  + int((~sol.v.solve_ok).sum()))
    if devices is not None:
        fields["devices"] = devices
    if problem.exact is not None:
        x = jnp.linspace(*problem.domain, args.eval_points,
                         dtype=u_c.dtype)
        u = ev.evaluate(nodes, u_c, x)
        fields["linf_error"] = float(M.linf_error(u, problem.exact(x)))
        v = ev.evaluate(nodes, v_c, x)
        fields["moment_linf_error"] = float(
            M.linf_error(v, problem.exact_d2(x)))
    em.emit("biharmonic_solve", **fields)


def _biharmonic_clamped(args, em):
    """Clamped beam u = u' = 0: direct Hermite-coarse + fourth-order
    enhancement (models/biharmonic.py clamped section)."""
    from .models.biharmonic import (clamped_sin2_1d, clamped_sin_slope_1d,
                                    solve_clamped_biharmonic_1d)
    from .ops import eval as ev

    problem = (clamped_sin_slope_1d() if args.clamped == "sin_slope"
               else clamped_sin2_1d())
    # f64-only family (the solver raises on f32 — the (2/h)^4 scaling is
    # beyond f32); the CLI enables x64 unconditionally here.
    jax.config.update("jax_enable_x64", True)
    cfg = SolverConfig(num_nodes=args.num_nodes, M=max(args.M, 6),
                       n_colloc=max(args.M, 6) + 2, gamma=args.gamma,
                       dtype="float64")
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = solve_clamped_biharmonic_1d(problem, cfg)
        jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name, elements=cfg.num_nodes - 1,
                  M=cfg.M, solve_sec=rec["solve_sec"],
                  n_fallback=int((~sol.solve_ok).sum()))
    x = jnp.linspace(*problem.domain, args.eval_points,
                     dtype=sol.coeffs.dtype)
    u = ev.evaluate(sol.nodes, sol.coeffs, x)
    fields["linf_error"] = float(M.linf_error(u, problem.exact(x)))
    fields["nodal_linf"] = float(
        M.linf_error(sol.u_nodal, problem.exact(sol.nodes)))
    em.emit("biharmonic_clamped_solve", **fields)


def _biharmonic_clamped_2d(args, em):
    """Clamped plate u = du/dn = 0: C^1 Bogner-Fox-Schmit coarse stage +
    fourth-order shared-LSE enhancement (models/biharmonic.py clamped-2D
    section; O(h^4), trace-limited)."""
    from .models.biharmonic import (clamped_sin2_2d, evaluate_clamped_2d,
                                    solve_clamped_biharmonic_2d)

    problem = clamped_sin2_2d()
    # f64-only family (same gate as the beam); x64 enabled
    # unconditionally here.
    jax.config.update("jax_enable_x64", True)
    # The biharmonic parser's --M2 default (6) is the simply-supported
    # plate's; the clamped enhancement fits over the (M-4)^2 bubbles and
    # needs M >= ~10 (NUMERICS.md 32).  Default up-resolves; an EXPLICIT
    # sub-10 request fails loudly instead of being silently overridden.
    M2 = 10 if args.M2 == 6 else args.M2
    if M2 < 10:
        raise SystemExit(
            "--clamped --dim 2 needs --M2 >= 10: the value+normal-slope "
            "trace rows leave only (M-4)^2 free fit dofs (NUMERICS.md "
            "32; measured floors need M >= 10)")
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=M2, n_colloc=M2,
                         gamma=args.gamma, dtype="float64")
    rec = {}
    if getattr(args, "mesh", None) == "slab":
        from .parallel import mesh as pmesh
        from .parallel.sharded_families import (
            make_sharded_solve_clamped_2d,
        )

        m = pmesh.element_mesh()
        rec["devices"] = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            sol = make_sharded_solve_clamped_2d(problem, cfg, m)()
            jax.block_until_ready(sol.coeffs)
        sol = sol._replace(coeffs=jnp.asarray(np.asarray(sol.coeffs)))
    else:
        with profiling.timed(rec, "solve_sec"):
            sol = solve_clamped_biharmonic_2d(problem, cfg)
            jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name, elements=args.nx * args.ny,
                  M=M2, solve_sec=rec["solve_sec"],
                  cg_iters=int(sol.cg_iters),
                  n_fallback=int((~sol.solve_ok).sum()))
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    rng = np.random.default_rng(0)
    d = problem.domain
    xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points),
                     sol.coeffs.dtype)
    yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points),
                     sol.coeffs.dtype)
    u = evaluate_clamped_2d(sol, xq, yq)
    fields["linf_error"] = float(
        M.linf_error(u, problem.exact(xq, yq)))
    em.emit("biharmonic_clamped_solve_2d", **fields)


def _biharmonic_2d(args, em):
    from .models.biharmonic import sin_biharmonic_2d, solve_biharmonic_2d
    from .models.hybrid2d import evaluate_2d

    problem = sin_biharmonic_2d()
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M2,
                         n_colloc=args.M2, gamma=args.gamma,
                         dtype=args.dtype, precond="jacobi",
                         coarse=args.coarse, trace_lift=args.trace_lift)
    rec = {}
    devices = None
    if getattr(args, "mesh", None) == "slab":
        from .models.hybrid2d import Solution2D
        from .parallel import mesh as pmesh
        from .parallel.sharded_families import (
            make_sharded_solve_biharmonic_2d,
        )

        m = pmesh.element_mesh()
        devices = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            out = make_sharded_solve_biharmonic_2d(problem, cfg, m)()
            jax.block_until_ready(out.u.coeffs)
        d = problem.domain
        dt = out.u.coeffs.dtype
        xs = jnp.linspace(d[0], d[1], cfg.nx + 1, dtype=dt)
        ys = jnp.linspace(d[2], d[3], cfg.ny + 1, dtype=dt)

        def _full(s):
            return Solution2D(xs, ys, None,
                              jnp.asarray(np.asarray(s.coeffs)),
                              0, 0.0, None, None, s.solve_ok)

        sol_u = _full(out.u)
        ok_u, ok_v = out.u.solve_ok, out.v.solve_ok
    else:
        with profiling.timed(rec, "solve_sec"):
            sol = solve_biharmonic_2d(problem, cfg)
            jax.block_until_ready(sol.u.coeffs)
        sol_u = sol.u
        ok_u, ok_v = sol.u.solve_ok, sol.v.solve_ok
    fields = dict(problem=problem.name, elements=args.nx * args.ny,
                  M=args.M2, coarse=args.coarse,
                  trace_lift=args.trace_lift,
                  solve_sec=rec["solve_sec"],
                  n_fallback=int((~ok_u).sum()) + int((~ok_v).sum()))
    if devices is not None:
        fields["devices"] = devices
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points),
                         sol_u.coeffs.dtype)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points),
                         sol_u.coeffs.dtype)
        u = evaluate_2d(sol_u, xq, yq)
        fields["linf_error"] = float(
            M.linf_error(u, problem.exact(xq, yq)))
    em.emit("biharmonic_solve_2d", **fields)


def _biharmonic_3d(args, em):
    from .models.biharmonic import sin_biharmonic_3d, solve_biharmonic_3d
    from .models.hybrid3d import Solver3DConfig, evaluate_3d

    problem = sin_biharmonic_3d()
    n = args.nx
    cfg = Solver3DConfig(nx=n, ny=n, nz=n, M=args.M3, n_colloc=args.M3,
                         gamma=args.gamma, dtype=args.dtype,
                         precond="jacobi", coarse=args.coarse,
                         trace_lift=args.trace_lift)
    rec = {}
    devices = None
    if getattr(args, "mesh", None) == "slab":
        from .models.hybrid3d import Solution3D
        from .parallel import mesh as pmesh
        from .parallel.sharded_families import (
            make_sharded_solve_biharmonic_3d,
        )

        m = pmesh.element_mesh()
        devices = m.devices.size
        with profiling.timed(rec, "solve_sec"):
            out = make_sharded_solve_biharmonic_3d(problem, cfg, m)()
            jax.block_until_ready(out.u.coeffs)
        d = problem.domain
        dt = out.u.coeffs.dtype
        xs = jnp.linspace(d[0], d[1], cfg.nx + 1, dtype=dt)
        ys = jnp.linspace(d[2], d[3], cfg.ny + 1, dtype=dt)
        zs = jnp.linspace(d[4], d[5], cfg.nz + 1, dtype=dt)
        sol_u = Solution3D(xs, ys, zs, None,
                           jnp.asarray(np.asarray(out.u.coeffs)),
                           0, 0.0, None, None, out.u.solve_ok)
        ok_u, ok_v = out.u.solve_ok, out.v.solve_ok
    else:
        with profiling.timed(rec, "solve_sec"):
            sol = solve_biharmonic_3d(problem, cfg)
            jax.block_until_ready(sol.u.coeffs)
        sol_u = sol.u
        ok_u, ok_v = sol.u.solve_ok, sol.v.solve_ok
    fields = dict(problem=problem.name, elements=n ** 3, M=args.M3,
                  coarse=args.coarse, trace_lift=args.trace_lift,
                  solve_sec=rec["solve_sec"],
                  n_fallback=int((~ok_u).sum()) + int((~ok_v).sum()))
    if devices is not None:
        fields["devices"] = devices
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        dt = sol_u.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        zq = jnp.asarray(rng.uniform(d[4], d[5], args.eval_points), dt)
        u = evaluate_3d(sol_u, xq, yq, zq)
        fields["linf_error"] = float(
            M.linf_error(u, problem.exact(xq, yq, zq)))
    em.emit("biharmonic_solve_3d", **fields)


def cmd_elastic(args):
    """Linear elasticity -div sigma(u) = f: the vector-valued family —
    block Q1 coarse stage + coupled per-element vector enhancement
    (2D plane strain, models/elastic.py; --dim 3 hexes,
    models/elastic3d.py)."""
    from .models import elastic as EL

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    if getattr(args, "wave", False):
        if args.problem != "sin_elastic_2d":
            raise SystemExit(
                "--wave runs its own manufactured elastodynamics problem "
                "(elastic_wave_2d/3d); --problem selects only the STEADY "
                "elastic problem — drop --problem or drop --wave"
            )
        return _cmd_elastic_wave(args)
    if args.dim == 3:
        return _cmd_elastic3d(args)
    em = M.MetricsEmitter()
    problem = EL.get_elastic_problem(args.problem, lam=args.lam,
                                     mu=args.mu)
    cfg = EL.ElasticConfig2D(nx=args.nx, ny=args.ny, M=args.M2,
                             n_colloc=args.M2, dtype=args.dtype,
                             precond=args.precond,
                             coarse=getattr(args, "coarse", "q1"),
                             trace_lift=getattr(args, "trace_lift", 0))
    if getattr(args, "mesh", None) == "slab":
        return _cmd_elastic_sharded(args, em, problem, cfg)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        solver = EL.ElasticSolver2D(problem, cfg)
        sol = solver.solve()
        jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name, elements=cfg.nx * cfg.ny,
                  M=cfg.M, lam=problem.lam, mu=problem.mu,
                  solve_sec=rec["solve_sec"],
                  cg_iters=int(sol.cg_iters),
                  cg_residual=float(sol.cg_residual),
                  max_slack=float(jnp.max(sol.max_slack)),
                  n_fallback=int(jnp.sum(~sol.solve_ok)))
    if problem.exact1 is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        dt = sol.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        linf, l2 = solver.errors(xq, yq)
        fields["linf_error"] = float(linf)
        fields["l2_error"] = float(l2)
    em.emit("elastic_solve", **fields)


def _cmd_elastic_sharded(args, em, problem, cfg):
    """Distributed y-slab 2D elasticity over all available devices
    (parallel/sharded_elastic.py); the vector analog of run2d --mesh."""
    from .parallel import mesh as pmesh
    from .parallel.sharded_elastic import (
        make_sharded_evaluate_elastic_2d, make_sharded_solve_elastic_2d,
    )

    mesh = pmesh.element_mesh()
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = make_sharded_solve_elastic_2d(problem, cfg, mesh)()
        jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name, elements=cfg.nx * cfg.ny,
                  M=cfg.M, devices=mesh.devices.size,
                  solve_sec=rec["solve_sec"],
                  cg_iters=int(jnp.max(sol.cg_iters)),
                  cg_residual=float(jnp.max(sol.cg_residual)),
                  n_fallback=int(jnp.sum(~sol.solve_ok)))
    if problem.exact1 is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        dt = sol.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        ev = make_sharded_evaluate_elastic_2d(problem, cfg, mesh)
        u1, u2 = ev(sol.coeffs, xq, yq)
        e1 = jnp.max(jnp.abs(u1 - problem.exact1(xq, yq)))
        e2 = jnp.max(jnp.abs(u2 - problem.exact2(xq, yq)))
        fields["linf_error"] = float(jnp.maximum(e1, e2))
    em.emit("elastic_solve_sharded", **fields)


def _cmd_elastic3d_sharded(args, em, problem, cfg):
    """Distributed z-slab 3D elasticity over all available devices
    (parallel/sharded_elastic.py); the hex mirror of the 2D branch."""
    from .parallel import mesh as pmesh
    from .parallel.sharded_elastic import (
        make_sharded_evaluate_elastic_3d, make_sharded_solve_elastic_3d,
    )

    mesh = pmesh.element_mesh()
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = make_sharded_solve_elastic_3d(problem, cfg, mesh)()
        jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name,
                  elements=cfg.nx * cfg.ny * cfg.nz,
                  M=cfg.M, devices=mesh.devices.size,
                  solve_sec=rec["solve_sec"],
                  cg_iters=int(jnp.max(sol.cg_iters)),
                  cg_residual=float(jnp.max(sol.cg_residual)),
                  n_fallback=int(jnp.sum(~sol.solve_ok)))
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        dt = sol.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        zq = jnp.asarray(rng.uniform(d[4], d[5], args.eval_points), dt)
        ev = make_sharded_evaluate_elastic_3d(problem, cfg, mesh)
        u = ev(sol.coeffs, xq, yq, zq)
        fields["linf_error"] = float(max(
            jnp.max(jnp.abs(u[c] - problem.exact[c](xq, yq, zq)))
            for c in range(3)))
    em.emit("elastic_solve_3d_sharded", **fields)


def _cmd_elastic_wave(args):
    """Elastodynamics branch of ``elastic``: enhanced Newmark-beta march
    of rho u_tt - div sigma(u) = f with per-element vector (u, v, a)
    coefficient triples (models/elastic_wave.py; --dim 3 hexes)."""
    from .models import elastic_wave as EW
    from .models.transient import TransientConfig

    em = M.MetricsEmitter()
    tcfg = TransientConfig(
        t_final=args.t_final, n_steps=args.n_steps,
        checkpoint=getattr(args, "checkpoint", None),
        checkpoint_chunk=getattr(args, "checkpoint_chunk", 0))
    precond = "jacobi" if args.precond == "auto" else args.precond
    rng = np.random.default_rng(0)
    rec = {}
    slab = getattr(args, "mesh", None) == "slab"
    if args.dim == 3:
        from .models.elastic3d import ElasticConfig3D

        problem = EW.elastic_wave_3d(lam=args.lam, mu=args.mu,
                                     rho=args.rho)
        cfg = ElasticConfig3D(nx=args.nx, ny=args.ny, nz=args.nz,
                              M=args.M3, n_colloc=args.M3,
                              dtype=args.dtype, precond=precond)
        if slab:
            from .parallel import mesh as pmesh
            from .parallel.wave import make_sharded_elastic_wave_3d

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                out = make_sharded_elastic_wave_3d(problem, cfg, tcfg,
                                                   m)()
                jax.block_until_ready(out.coeffs)
            sol = _elastic_wave_3d_from_sharded(EW, out)
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = EW.hybrid_elastic_wave_march_3d(problem, cfg,
                                                      tcfg)
                jax.block_until_ready(sol.coeffs)
        elements = cfg.nx * cfg.ny * cfg.nz
        d = problem.elastic.domain
        dt = sol.coeffs.dtype
        q = [jnp.asarray(rng.uniform(d[2 * i], d[2 * i + 1],
                                     args.eval_points), dt)
             for i in range(3)]
        u = EW.evaluate_elastic_wave_3d(sol, *q)
        linf = max(
            float(jnp.max(jnp.abs(u[c] - problem.exact[c](
                *q, tcfg.t_final)))) for c in range(3))
        Mb = cfg.M
    else:
        from .models.elastic import ElasticConfig2D

        problem = EW.elastic_wave_2d(lam=args.lam, mu=args.mu,
                                     rho=args.rho)
        cfg = ElasticConfig2D(nx=args.nx, ny=args.ny, M=args.M2,
                              n_colloc=args.M2, dtype=args.dtype,
                              precond=precond)
        if slab:
            from .parallel import mesh as pmesh
            from .parallel.wave import make_sharded_elastic_wave_2d

            m = pmesh.element_mesh()
            rec["devices"] = m.devices.size
            with profiling.timed(rec, "solve_sec"):
                out = make_sharded_elastic_wave_2d(problem, cfg, tcfg,
                                                   m)()
                jax.block_until_ready(out.coeffs)
            sol = EW.ElasticWaveSolution2D(
                out.xs, out.ys,
                jnp.asarray(out.assemble_fem_grid("u")),
                jnp.asarray(out.assemble_fem_grid("v")),
                jnp.asarray(np.asarray(out.coeffs)), out.t_final,
                out.cg_iters, out.energy0, out.energyN, out.lam,
                out.mu)
        else:
            with profiling.timed(rec, "solve_sec"):
                sol = EW.hybrid_elastic_wave_march_2d(problem, cfg,
                                                      tcfg)
                jax.block_until_ready(sol.coeffs)
        elements = cfg.nx * cfg.ny
        d = problem.elastic.domain
        dt = sol.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        u1, u2 = EW.evaluate_elastic_wave_2d(sol, xq, yq)
        linf = max(
            float(jnp.max(jnp.abs(
                u1 - problem.exact1(xq, yq, tcfg.t_final)))),
            float(jnp.max(jnp.abs(
                u2 - problem.exact2(xq, yq, tcfg.t_final)))))
        Mb = cfg.M
    fields = dict(problem=problem.name,
                  elements=elements, M=Mb, lam=args.lam, mu=args.mu,
                  rho=args.rho, t_final=tcfg.t_final,
                  n_steps=tcfg.n_steps, solve_sec=rec["solve_sec"],
                  cg_iters=int(sol.cg_iters),
                  # an invariant only when f = 0 (free vibration)
                  energy_change=abs(float(sol.energyN - sol.energy0)),
                  linf_error=linf)
    if "devices" in rec:
        fields["devices"] = rec.pop("devices")
    em.emit("elastic_wave_march", **fields)


def _elastic_wave_3d_from_sharded(EW, out):
    """Stitch a ShardedElasticWaveSolution3D's overlapping z-slabs into
    the single-device ElasticWaveSolution3D layout (the 3D analog of the
    2D ``assemble_fem_grid`` adapter) so the evaluation/readout path is
    shared."""
    def stitch(src):
        fl = np.asarray(src)
        n_dev, nc, nloc1 = fl.shape[0], fl.shape[1], fl.shape[2]
        nz_loc = nloc1 - 1
        grid = np.zeros((nc, n_dev * nz_loc + 1) + fl.shape[3:],
                        fl.dtype)
        for dd in range(n_dev):
            grid[:, dd * nz_loc:(dd + 1) * nz_loc + 1] = fl[dd]
        return jnp.asarray(grid)

    return EW.ElasticWaveSolution3D(
        out.xs, out.ys, out.zs, stitch(out.fem_local),
        stitch(out.velocity_local), jnp.asarray(np.asarray(out.coeffs)),
        out.t_final, out.cg_iters, out.energy0, out.energyN, out.lam,
        out.mu)


def _cmd_elastic3d(args):
    """3D branch of ``elastic``: structured hexes, block vector CG with
    anisotropic-block V-cycles, stress readout (models/elastic3d.py)."""
    from .models import elastic3d as EL3

    em = M.MetricsEmitter()
    name = args.problem
    if name.endswith("_2d"):  # default carried over from the 2D parser
        name = name[:-3] + "_3d"
    problem = EL3.get_elastic_problem_3d(name, lam=args.lam, mu=args.mu)
    cfg = EL3.ElasticConfig3D(nx=args.nx, ny=args.ny, nz=args.nz,
                              M=args.M3, n_colloc=args.M3,
                              dtype=args.dtype, precond=args.precond)
    if getattr(args, "mesh", None) == "slab":
        return _cmd_elastic3d_sharded(args, em, problem, cfg)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        solver = EL3.ElasticSolver3D(problem, cfg)
        sol = solver.solve()
        jax.block_until_ready(sol.coeffs)
    fields = dict(problem=problem.name,
                  elements=cfg.nx * cfg.ny * cfg.nz, M=cfg.M,
                  lam=problem.lam, mu=problem.mu,
                  solve_sec=rec["solve_sec"],
                  cg_iters=int(sol.cg_iters),
                  cg_residual=float(sol.cg_residual),
                  max_slack=float(jnp.max(sol.max_slack)),
                  n_fallback=int(jnp.sum(~sol.solve_ok)))
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        d = problem.domain
        dt = sol.coeffs.dtype
        xq = jnp.asarray(rng.uniform(d[0], d[1], args.eval_points), dt)
        yq = jnp.asarray(rng.uniform(d[2], d[3], args.eval_points), dt)
        zq = jnp.asarray(rng.uniform(d[4], d[5], args.eval_points), dt)
        linf, l2 = solver.errors(xq, yq, zq)
        fields["linf_error"] = float(linf)
        fields["l2_error"] = float(l2)
    em.emit("elastic_solve_3d", **fields)


def cmd_runsharded(args):
    """Multi-chip 1D solve over the element mesh (SURVEY.md 2.3 DP/SP row),
    wired through ``load_or_run`` checkpointing so interrupted campaigns
    resume without recompute."""
    em = M.MetricsEmitter()
    problem = problems.get(args.problem)
    cfg = _cfg_from_args(args)
    from .parallel import mesh as pmesh
    from .parallel.sharded import (ShardedSolution, make_sharded_evaluate,
                                   make_sharded_solve)

    n_dev = args.devices or len(jax.devices())
    m = pmesh.element_mesh(n_dev)
    run = make_sharded_solve(problem, cfg, m)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_run(args.checkpoint, problem.name, cfg,
                                        run, ShardedSolution)
        jax.block_until_ready(sol.coeffs)
    E = sol.coeffs.shape[0]
    fields = dict(
        problem=problem.name,
        formulation=cfg.formulation,
        devices=n_dev,
        elements=E,
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        elements_per_sec=E / max(rec["solve_sec"], 1e-12),
        resumed=resumed,
        max_slack=float(jnp.max(sol.max_slack)),
        bc_violation=float(jnp.max(sol.bc_violation)),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if problem.exact is not None:
        ev = make_sharded_evaluate(problem, cfg, m)
        x = np.linspace(*problem.domain, args.eval_points)
        u = ev(jnp.asarray(sol.coeffs), x)
        ue = problem.exact(jnp.asarray(x, u.dtype))
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("hybrid_solve_sharded", **fields)


def _graded_axis_nodes(n: int, d0: float, d1: float, power: float):
    """Power-law stretched node array on [d0, d1]: nodes cluster toward
    the domain center for power > 1 (the RESULTS.md 'x^power-stretched'
    family; power == 1 recovers linspace)."""
    s = np.linspace(-1.0, 1.0, n + 1)
    t = np.sign(s) * np.abs(s) ** power
    return d0 + 0.5 * (t + 1.0) * (d1 - d0)


def _run2d_graded(problem, cfg, args, em, xs, ys):
    """Single-device graded-mesh 2D run (CLI mirror of
    HybridSolver2DGraded; the sharded variant is _run2d_sharded_graded)."""
    from .models.hybrid2d_graded import HybridSolver2DGraded

    solver = HybridSolver2DGraded(problem, cfg, xs, ys)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = solver.solve()
        jax.block_until_ready(sol.coeffs)
    rng = np.random.default_rng(0)
    xq = rng.uniform(problem.domain[0], problem.domain[1], args.eval_points)
    yq = rng.uniform(problem.domain[2], problem.domain[3], args.eval_points)
    linf, l2 = solver.errors(xq, yq)
    em.emit(
        "hybrid_solve_2d_graded",
        problem=problem.name,
        grading=args.grading,
        elements=(len(xs) - 1) * (len(ys) - 1),
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
        linf_error=float(linf),
        l2_error=float(l2),
        n_fallback=int(jnp.sum(~sol.solve_ok)),
    )


def _run2d_sharded_graded(problem, cfg, args, em, xs, ys):
    """Multi-chip graded 2D run: y-slab sharding of the non-uniform
    tensor-product mesh (README roadmap: distributed graded CLI), wired
    through load_or_run checkpointing.  Error norms come from the
    DISTRIBUTED graded read path (searchsorted on the replicated node
    arrays, local-slab evaluation, psum)."""
    from .parallel import mesh as pmesh
    from .parallel.sharded2d import (ShardedSolution2D,
                                     make_sharded_solve_2d_graded)

    n_dev = args.devices or len(jax.devices())
    m = pmesh.element_mesh(n_dev)
    run = make_sharded_solve_2d_graded(problem, cfg, m, xs, ys)
    name = f"{problem.name}-graded{args.grading:g}"
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_run(
            getattr(args, "checkpoint", None), name, cfg, run,
            ShardedSolution2D,
        )
        jax.block_until_ready(sol.coeffs)
    fields = dict(
        problem=problem.name,
        mesh=f"slab:{n_dev}",
        grading=args.grading,
        elements=(len(xs) - 1) * (len(ys) - 1),
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        resumed=resumed,
        cg_iters=int(jnp.max(jnp.asarray(sol.cg_iters))),
        max_slack=float(jnp.max(jnp.asarray(sol.max_slack))),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if problem.exact is not None:
        from .parallel.sharded2d import make_sharded_evaluate_2d_graded

        rng = np.random.default_rng(0)
        xq = rng.uniform(problem.domain[0], problem.domain[1],
                         args.eval_points)
        yq = rng.uniform(problem.domain[2], problem.domain[3],
                         args.eval_points)
        ev = make_sharded_evaluate_2d_graded(cfg, m, xs, ys)
        u = ev(jnp.asarray(np.asarray(sol.coeffs)), xq, yq)
        ue = problem.exact(jnp.asarray(xq, u.dtype),
                           jnp.asarray(yq, u.dtype))
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("hybrid_solve_2d_sharded_graded", **fields)


def _run2d_sharded(problem, cfg, args, em):
    """2D multi-chip solve: y-slab or 2-axis grid mesh, load_or_run
    checkpointing, distributed read path for the error norms."""
    from .parallel import mesh as pmesh
    from .parallel.sharded2d import (
        ShardedSolution2D, ShardedSolution2DGrid, make_sharded_evaluate_2d,
        make_sharded_evaluate_2d_grid, make_sharded_solve_2d,
        make_sharded_solve_2d_grid,
    )

    if args.mesh == "slab":
        n_dev = args.devices or len(jax.devices())
        m = pmesh.element_mesh(n_dev)
        run = make_sharded_solve_2d(problem, cfg, m)
        cls = ShardedSolution2D
        ev = make_sharded_evaluate_2d(problem, cfg, m)
        mesh_desc = f"slab:{n_dev}"
    else:
        dy, dx = args.mesh_shape
        m = pmesh.grid_mesh(dy, dx)
        run = make_sharded_solve_2d_grid(problem, cfg, m)
        cls = ShardedSolution2DGrid
        ev = make_sharded_evaluate_2d_grid(problem, cfg, m)
        mesh_desc = f"grid:{dy}x{dx}"
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_run(
            getattr(args, "checkpoint", None), problem.name, cfg, run, cls
        )
        jax.block_until_ready(sol.coeffs)
    fields = dict(
        problem=problem.name,
        mesh=mesh_desc,
        elements=cfg.nx * cfg.ny,
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        resumed=resumed,
        cg_iters=int(jnp.max(jnp.asarray(sol.cg_iters))),
        max_slack=float(jnp.max(jnp.asarray(sol.max_slack))),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if problem.exact is not None:
        rng = np.random.default_rng(0)
        xq = rng.uniform(problem.domain[0], problem.domain[1],
                         args.eval_points)
        yq = rng.uniform(problem.domain[2], problem.domain[3],
                         args.eval_points)
        u = ev(jnp.asarray(sol.coeffs), xq, yq)
        ue = problem.exact(jnp.asarray(xq, u.dtype),
                           jnp.asarray(yq, u.dtype))
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("hybrid_solve_2d_sharded", **fields)


def cmd_run2d(args):
    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    problem = get_problem_2d(getattr(args, "problem", "poisson_2d"))
    cfg = Solver2DConfig(nx=args.nx, ny=args.ny, M=args.M,
                         gamma=args.gamma, dtype=args.dtype,
                         precond=getattr(args, "precond", "auto"),
                         fem_dtype=getattr(args, "fem_dtype", None),
                         varcoeff_method=getattr(args, "varcoeff_method",
                                                 "sne"),
                         coarse=getattr(args, "coarse", "q1"),
                         trace_lift=getattr(args, "trace_lift", 0))
    grading = getattr(args, "grading", 1.0)
    mesh = getattr(args, "mesh", "none")
    if grading != 1.0:
        if mesh == "grid":
            raise SystemExit(
                "--grading is supported with --mesh none|slab (graded "
                "sharding is y-slab only)")
        d = problem.domain
        xs = _graded_axis_nodes(cfg.nx, d[0], d[1], grading)
        ys = _graded_axis_nodes(cfg.ny, d[2], d[3], grading)
        if mesh == "slab":
            return _run2d_sharded_graded(problem, cfg, args, em, xs, ys)
        return _run2d_graded(problem, cfg, args, em, xs, ys)
    if mesh != "none":
        return _run2d_sharded(problem, cfg, args, em)
    solver = HybridSolver2D(problem, cfg)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_solve(
            getattr(args, "checkpoint", None), solver
        )
        jax.block_until_ready(sol.coeffs)
    rng = np.random.default_rng(0)
    xq = rng.uniform(problem.domain[0], problem.domain[1], args.eval_points)
    yq = rng.uniform(problem.domain[2], problem.domain[3], args.eval_points)
    linf, l2 = solver.errors(xq, yq)
    em.emit(
        "hybrid_solve_2d",
        problem=problem.name,
        elements=cfg.nx * cfg.ny,
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
        linf_error=float(linf),
        l2_error=float(l2),
        n_fallback=int(jnp.sum(~sol.solve_ok)),
    )


def _run3d_graded(problem, cfg, args, em, xs, ys, zs):
    """Single-device graded hex-mesh 3D run (CLI mirror of
    HybridSolver3DGraded)."""
    from .models.hybrid3d_graded import HybridSolver3DGraded

    solver = HybridSolver3DGraded(problem, cfg, xs, ys, zs)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol = solver.solve()
        jax.block_until_ready(sol.coeffs)
    rng = np.random.default_rng(0)
    d = problem.domain
    xq = rng.uniform(d[0], d[1], args.eval_points)
    yq = rng.uniform(d[2], d[3], args.eval_points)
    zq = rng.uniform(d[4], d[5], args.eval_points)
    linf, l2 = solver.errors(xq, yq, zq)
    em.emit(
        "hybrid_solve_3d_graded",
        problem=problem.name,
        grading=args.grading,
        elements=(len(xs) - 1) * (len(ys) - 1) * (len(zs) - 1),
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
        linf_error=float(linf),
        l2_error=float(l2),
        n_fallback=int(jnp.sum(~sol.solve_ok)),
    )


def _run3d_sharded_graded(problem, cfg, args, em, xs, ys, zs):
    """Multi-chip graded 3D run: z-slab sharding of the non-uniform hex
    mesh (README roadmap: distributed graded CLI) with load_or_run
    checkpointing; error norms via the distributed graded read path."""
    from .parallel import mesh as pmesh
    from .parallel.sharded3d import (ShardedSolution3D,
                                     make_sharded_solve_3d_graded)

    n_dev = args.devices or len(jax.devices())
    m = pmesh.element_mesh(n_dev)
    run = make_sharded_solve_3d_graded(problem, cfg, m, np.asarray(xs),
                                       np.asarray(ys), np.asarray(zs))
    name = f"{problem.name}-graded{args.grading:g}"
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_run(
            getattr(args, "checkpoint", None), name, cfg, run,
            ShardedSolution3D,
        )
        jax.block_until_ready(sol.coeffs)
    fields = dict(
        problem=problem.name,
        mesh=f"slab:{n_dev}",
        grading=args.grading,
        elements=(len(xs) - 1) * (len(ys) - 1) * (len(zs) - 1),
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        resumed=resumed,
        cg_iters=int(jnp.max(jnp.asarray(sol.cg_iters))),
        max_slack=float(jnp.max(jnp.asarray(sol.max_slack))),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if problem.exact is not None:
        from .parallel.sharded3d import make_sharded_evaluate_3d_graded

        rng = np.random.default_rng(0)
        d = problem.domain
        xq = rng.uniform(d[0], d[1], args.eval_points)
        yq = rng.uniform(d[2], d[3], args.eval_points)
        zq = rng.uniform(d[4], d[5], args.eval_points)
        ev = make_sharded_evaluate_3d_graded(cfg, m, np.asarray(xs),
                                             np.asarray(ys),
                                             np.asarray(zs))
        u = ev(jnp.asarray(np.asarray(sol.coeffs)), xq, yq, zq)
        ue = problem.exact(jnp.asarray(xq, u.dtype),
                           jnp.asarray(yq, u.dtype),
                           jnp.asarray(zq, u.dtype))
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("hybrid_solve_3d_sharded_graded", **fields)


def _run3d_sharded(problem, cfg, args, em):
    """3D multi-chip solve: z-slab or (z, y) grid mesh, load_or_run
    checkpointing, distributed read path for the error norms."""
    from .parallel import mesh as pmesh
    from .parallel.sharded3d import (
        ShardedSolution3D, ShardedSolution3DGrid, make_sharded_evaluate_3d,
        make_sharded_evaluate_3d_grid, make_sharded_solve_3d,
        make_sharded_solve_3d_grid,
    )

    if args.mesh == "slab":
        n_dev = args.devices or len(jax.devices())
        m = pmesh.element_mesh(n_dev)
        run = make_sharded_solve_3d(problem, cfg, m)
        cls = ShardedSolution3D
        make_ev = make_sharded_evaluate_3d
        mesh_desc = f"slab:{n_dev}"
    else:
        dzm, dym = args.mesh_shape
        m = pmesh.grid_mesh_3d(dzm, dym)
        run = make_sharded_solve_3d_grid(problem, cfg, m)
        cls = ShardedSolution3DGrid
        make_ev = make_sharded_evaluate_3d_grid
        mesh_desc = f"grid:{dzm}x{dym}"
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, resumed = ckpt.load_or_run(
            getattr(args, "checkpoint", None), problem.name, cfg, run, cls
        )
        jax.block_until_ready(sol.coeffs)
    fields = dict(
        problem=problem.name,
        mesh=mesh_desc,
        elements=cfg.nx * cfg.ny * cfg.nz,
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        resumed=resumed,
        cg_iters=int(jnp.max(jnp.asarray(sol.cg_iters))),
        max_slack=float(jnp.max(jnp.asarray(sol.max_slack))),
        n_fallback=int(jnp.sum(~jnp.asarray(sol.solve_ok))),
    )
    if problem.exact is not None:
        ev = make_ev(problem, cfg, m)
        rng = np.random.default_rng(0)
        d = problem.domain
        xq = rng.uniform(d[0], d[1], args.eval_points)
        yq = rng.uniform(d[2], d[3], args.eval_points)
        zq = rng.uniform(d[4], d[5], args.eval_points)
        u = ev(jnp.asarray(sol.coeffs), xq, yq, zq)
        ue = problem.exact(jnp.asarray(xq, u.dtype),
                           jnp.asarray(yq, u.dtype),
                           jnp.asarray(zq, u.dtype))
        fields["linf_error"] = float(M.linf_error(u, ue))
        fields["l2_error"] = float(M.l2_error(u, ue))
    em.emit("hybrid_solve_3d_sharded", **fields)


def cmd_run3d(args):
    from .models.hybrid3d import (
        HybridSolver3D, Solver3DConfig, get_problem_3d,
    )

    if getattr(args, "x64", False):
        jax.config.update("jax_enable_x64", True)
    em = M.MetricsEmitter()
    problem = get_problem_3d(getattr(args, "problem", "poisson_3d"))
    cfg = Solver3DConfig(nx=args.nx, ny=args.ny, nz=args.nz, M=args.M,
                         n_colloc=args.M, dtype=args.dtype,
                         precond=getattr(args, "precond", "auto"),
                         fem_dtype=getattr(args, "fem_dtype", None),
                         coarse=getattr(args, "coarse", "q1"),
                         trace_lift=getattr(args, "trace_lift", 0))
    grading = getattr(args, "grading", 1.0)
    mesh = getattr(args, "mesh", "none")
    if grading != 1.0:
        if mesh == "grid":
            raise SystemExit(
                "--grading is supported with --mesh none|slab (graded "
                "sharding is z-slab only)")
        d = problem.domain
        xs = _graded_axis_nodes(cfg.nx, d[0], d[1], grading)
        ys = _graded_axis_nodes(cfg.ny, d[2], d[3], grading)
        zs = _graded_axis_nodes(cfg.nz, d[4], d[5], grading)
        if mesh == "slab":
            return _run3d_sharded_graded(problem, cfg, args, em, xs, ys, zs)
        return _run3d_graded(problem, cfg, args, em, xs, ys, zs)
    if mesh != "none":
        return _run3d_sharded(problem, cfg, args, em)
    solver = HybridSolver3D(problem, cfg)
    rec = {}
    with profiling.timed(rec, "solve_sec"):
        sol, _resumed = ckpt.load_or_solve(
            getattr(args, "checkpoint", None), solver
        )
        jax.block_until_ready(sol.coeffs)
    rng = np.random.default_rng(0)
    d = problem.domain
    xq = rng.uniform(d[0], d[1], args.eval_points)
    yq = rng.uniform(d[2], d[3], args.eval_points)
    zq = rng.uniform(d[4], d[5], args.eval_points)
    linf, l2 = solver.errors(xq, yq, zq)
    em.emit(
        "hybrid_solve_3d",
        problem=problem.name,
        elements=cfg.nx * cfg.ny * cfg.nz,
        M=cfg.M,
        solve_sec=rec["solve_sec"],
        cg_iters=int(sol.cg_iters),
        linf_error=float(linf),
        l2_error=float(l2),
        n_fallback=int(jnp.sum(~sol.solve_ok)),
    )


def build_parser():
    p = argparse.ArgumentParser(prog="hybrid_fem_lssvr_tpu")
    p.add_argument(
        "--compile-cache", default=None, metavar="DIR",
        help="persistent XLA compilation cache directory (round-4 "
        "VERDICT Weak #3: first TPU compiles run 20-100+ s per program; "
        "the cache amortises them across CLI invocations), e.g. "
        "--compile-cache ~/.cache/hybrid_fem_lssvr_tpu/xla.  DIR is "
        "required: a bare flag would make argparse swallow the "
        "subcommand name as the directory")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--problem", default="poisson_1d",
                        choices=sorted(problems.REGISTRY))
        sp.add_argument("--num-nodes", type=int, default=25)
        sp.add_argument("--M", type=int, default=8)
        sp.add_argument("--gamma", type=float, default=1e4)
        sp.add_argument("--n-colloc", type=int, default=12)
        sp.add_argument("--formulation", default="primal",
                        choices=["primal", "dual"])
        sp.add_argument("--fem-quad-order", type=int, default=3)
        sp.add_argument("--tridiag-method", default="auto",
                        choices=["auto", "thomas", "pcr", "spike", "dense"])
        sp.add_argument("--dtype", default=None,
                        choices=[None, "float32", "float64"])
        sp.add_argument("--fem-dtype", default=None,
                        choices=[None, "float32", "float64"])
        sp.add_argument("--x64", action="store_true",
                        help="enable jax_enable_x64 (needed for f64 on TPU)")
        sp.add_argument("--eval-points", type=int, default=201)
        sp.add_argument("--backend", default="auto",
                        choices=["auto", "xla", "pallas"])
        sp.add_argument("--no-diagnostics", action="store_true",
                        help="skip slack/bc residual outputs (~32% faster)")

    sp = sub.add_parser("run", help="single hybrid solve")
    common(sp)
    sp.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    sp.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (resume if fingerprint matches)")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("sweep", help="h-refinement sweep")
    common(sp)
    sp.add_argument("--elements", type=int, nargs="+",
                    default=[10, 100, 1000, 10000])
    sp.set_defaults(fn=cmd_sweep)

    sp = sub.add_parser("psweep", help="kernel-degree sweep")
    common(sp)
    sp.add_argument("--M-values", type=int, nargs="+",
                    default=[2, 3, 4, 6, 8, 10])
    sp.set_defaults(fn=cmd_psweep)

    sp = sub.add_parser("campaign",
                        help="run every BASELINE workload config")
    common(sp)
    sp.set_defaults(fn=cmd_campaign)

    sp = sub.add_parser("adaptive", help="slack-driven adaptive refinement "
                        "(goal-oriented DWR with --goal-center)")
    common(sp)
    sp.add_argument("--rounds", type=int, default=4)
    sp.add_argument("--refine-frac", type=float, default=0.3)
    sp.add_argument("--goal-center", type=float, default=None,
                    help="switch to goal-oriented (DWR) refinement for "
                    "J(u) = int j u with j a Gaussian at this center")
    sp.add_argument("--goal-width", type=float, default=0.15,
                    help="Gaussian width of the goal weight j")
    sp.set_defaults(fn=cmd_adaptive)

    sp = sub.add_parser(
        "adaptive2d",
        help="2D slack-driven tensor-product adaptivity (graded meshes)")
    sp.add_argument("--problem", default="poisson_2d",
                    choices=["poisson_2d", "poisson_2d_inhomogeneous",
                             "helmholtz_2d", "advection_diffusion_2d",
                             "reaction_diffusion_2d",
                             "variable_coeff_elliptic_2d"])
    sp.add_argument("--nx", type=int, default=8)
    sp.add_argument("--ny", type=int, default=8)
    sp.add_argument("--M", type=int, default=6)
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--rounds", type=int, default=3)
    sp.add_argument("--refine-frac", type=float, default=0.3)
    sp.add_argument("--eval-points", type=int, default=2000)
    sp.add_argument("--goal-center", type=float, default=None,
                    help="switch to goal-oriented (DWR) refinement for "
                    "J(u) = int j u with j a Gaussian at (c, c)")
    sp.add_argument("--goal-width", type=float, default=0.15)
    sp.add_argument("--adjoint-zoom", type=int, default=1,
                    help="bisection levels for the adjoint mesh "
                    "(1 -> effectivity ~0.9, 2 -> ~0.98)")
    sp.set_defaults(fn=cmd_adaptive2d)

    sp = sub.add_parser(
        "adaptive3d",
        help="3D slack-driven tensor-product adaptivity (graded hexes)")
    sp.add_argument("--problem", default="poisson_3d",
                    choices=["poisson_3d", "poisson_3d_inhomogeneous",
                             "helmholtz_3d", "advection_diffusion_3d",
                             "variable_coeff_elliptic_3d"])
    sp.add_argument("--nx", type=int, default=6)
    sp.add_argument("--ny", type=int, default=6)
    sp.add_argument("--nz", type=int, default=6)
    sp.add_argument("--M", type=int, default=4)
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--rounds", type=int, default=2)
    sp.add_argument("--refine-frac", type=float, default=0.3)
    sp.add_argument("--eval-points", type=int, default=1000)
    sp.add_argument("--goal-center", type=float, default=None,
                    help="switch to goal-oriented (DWR) refinement for "
                    "J(u) = int j u with j a Gaussian at (c, c, c)")
    sp.add_argument("--goal-width", type=float, default=0.15)
    sp.add_argument("--adjoint-zoom", type=int, default=1,
                    help="bisection levels for the adjoint mesh "
                    "(1 -> effectivity ~0.86, 2 -> ~0.96)")
    sp.set_defaults(fn=cmd_adaptive3d)

    sp = sub.add_parser(
        "transient",
        help="parabolic march u_t + L u = f (theta-scheme / enhanced CN)")
    sp.add_argument("--problem", default="heat_1d",
                    choices=["heat_1d", "heat_robin_1d", "heat_2d",
                             "heat_3d", "wave_1d", "wave_2d", "wave_3d",
                             "semilinear_heat_1d", "semilinear_heat_2d",
                             "semilinear_heat_3d"])
    sp.add_argument("--dim", type=int, default=1, choices=[1, 2, 3])
    sp.add_argument("--num-nodes", type=int, default=33)
    sp.add_argument("--nx", type=int, default=16)
    sp.add_argument("--ny", type=int, default=16)
    sp.add_argument("--nz", type=int, default=16)
    sp.add_argument("--M", type=int, default=8)
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--t-final", type=float, default=0.5)
    sp.add_argument("--n-steps", type=int, default=256)
    sp.add_argument("--theta", type=float, default=0.5)
    sp.add_argument("--mass", default="consistent",
                    choices=["consistent", "numerov"])
    sp.add_argument("--enhanced", action="store_true",
                    help="LSSVR-enhanced CN march (spectral in space)")
    sp.add_argument("--adaptive-tol", type=float, default=None,
                    help="error-controlled adaptive dt (embedded CN/BE "
                    "pair; --n-steps becomes the attempt budget)")
    sp.add_argument("--trace-lift", type=int, default=0,
                    help="2D/3D enhanced marches: tangential/plane-"
                    "Lagrange lifted element traces (6 with --mass "
                    "numerov gives an O(h^4) enhanced Linf — measured "
                    "170x at 16^2)")
    sp.add_argument("--mesh", default=None, choices=[None, "slab"],
                    help="distributed slab march over all available "
                    "devices: 2D y-slabs / 3D z-slabs for the heat, "
                    "semilinear, and Newmark wave problems "
                    "(parallel/transient2d.py, transient3d.py, wave.py)")
    sp.add_argument("--checkpoint", default=None,
                    help="march-state dir: the time scan is chunked, "
                    "(step, state) written atomically per chunk; a "
                    "matching state resumes from the last completed "
                    "chunk (bitwise-identical to an uninterrupted run)")
    sp.add_argument("--checkpoint-chunk", type=int, default=0,
                    help="steps per checkpoint chunk (0 -> ~8 chunks)")
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--eval-points", type=int, default=401)
    sp.set_defaults(fn=cmd_transient)

    sp = sub.add_parser(
        "nonlinear",
        help="semilinear elliptic -a0 Lap u + s(u) = f (two-level Newton; "
        "1D/2D/3D by problem suffix)")
    sp.add_argument("--problem", default="cubic_1d",
                    choices=["cubic_1d", "bratu_1d", "cubic_2d",
                             "cubic_3d"])
    sp.add_argument("--num-nodes", type=int, default=33)
    sp.add_argument("--nx", type=int, default=16)
    sp.add_argument("--ny", type=int, default=16)
    sp.add_argument("--nz", type=int, default=8)
    sp.add_argument("--M", type=int, default=8)
    sp.add_argument("--M2", type=int, default=6,
                    help="per-dimension basis size for *_2d problems")
    sp.add_argument("--M3", type=int, default=4,
                    help="per-dimension basis size for *_3d problems")
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--scheme", default="p1",
                    choices=["p1", "numerov"],
                    help="FEM rows: P1/Q1 (O(h^2) nodal) or compact "
                    "(tensor-)Numerov (O(h^4) nodal; all dims)")
    sp.add_argument("--trace-lift", type=int, default=0,
                    help="2D/3D: tangential/plane-Lagrange element trace "
                    "stencil (6 with --scheme numerov gives an O(h^4) "
                    "hybrid solution)")
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--eval-points", type=int, default=401)
    sp.add_argument("--mesh", default=None, choices=[None, "slab"],
                    help="distributed element-sharded element-Newton "
                    "enhancement over all available devices — 1D element "
                    "slabs, 2D y-slabs, 3D z-slabs; the coarse Newton is "
                    "replicated (parallel/sharded_families.py)")
    sp.set_defaults(fn=cmd_nonlinear)

    sp = sub.add_parser(
        "biharmonic",
        help="fourth-order biharmonic / simply-supported plate (two "
        "chained hybrid solves; the second rhs is spectral in the "
        "first)")
    sp.add_argument("--dim", type=int, default=1, choices=[1, 2, 3])
    sp.add_argument("--num-nodes", type=int, default=25)
    sp.add_argument("--nx", type=int, default=16)
    sp.add_argument("--ny", type=int, default=16)
    sp.add_argument("--M", type=int, default=8)
    sp.add_argument("--M2", type=int, default=6,
                    help="per-dimension basis size for --dim 2")
    sp.add_argument("--M3", type=int, default=4,
                    help="per-dimension basis size for --dim 3")
    sp.add_argument("--coarse", default="q1", choices=["q1", "compact"])
    sp.add_argument("--trace-lift", type=int, default=0)
    sp.add_argument("--clamped", nargs="?", const="sin2",
                    choices=["sin2", "sin_slope"],
                    help="clamped beam u = u' = 0 (1D only): direct "
                    "Hermite-coarse + fourth-order enhancement instead "
                    "of the simply-supported splitting")
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--eval-points", type=int, default=401)
    sp.add_argument("--mesh", default=None, choices=[None, "slab"],
                    help="distributed chained solves over all available "
                    "devices — any --dim (parallel/sharded_families.py; "
                    "--dim 2 supports --coarse compact --trace-lift 6; "
                    "--clamped stays single-device)")
    sp.set_defaults(fn=cmd_biharmonic)

    sp = sub.add_parser(
        "elastic",
        help="linear elasticity (vector-valued family: block Q1 coarse "
        "+ coupled vector enhancement, stress readout; --dim 3 hexes)")
    sp.add_argument("--problem", default="sin_elastic_2d",
                    choices=["sin_elastic_2d", "poly_elastic_2d",
                             "sin_elastic_3d", "poly_elastic_3d"])
    sp.add_argument("--dim", type=int, default=2, choices=[2, 3])
    sp.add_argument("--nx", type=int, default=32)
    sp.add_argument("--ny", type=int, default=32)
    sp.add_argument("--nz", type=int, default=8,
                    help="z elements (--dim 3 only)")
    sp.add_argument("--M2", type=int, default=6,
                    help="per-dimension basis size per component")
    sp.add_argument("--M3", type=int, default=4,
                    help="per-dimension basis size (--dim 3 only)")
    sp.add_argument("--lam", type=float, default=1.0,
                    help="Lame lambda")
    sp.add_argument("--mu", type=float, default=1.0, help="Lame mu")
    sp.add_argument("--precond", default="auto",
                    choices=["auto", "jacobi", "mg"])
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--eval-points", type=int, default=2000)
    sp.add_argument("--wave", action="store_true",
                    help="elastodynamics: enhanced Newmark march of "
                    "rho u_tt - div sigma(u) = f on its own manufactured "
                    "problem (elastic_wave_2d, or elastic_wave_3d hexes "
                    "with --dim 3; --problem does not apply)")
    sp.add_argument("--t-final", type=float, default=0.25)
    sp.add_argument("--n-steps", type=int, default=40)
    sp.add_argument("--rho", type=float, default=1.0,
                    help="mass density (--wave)")
    sp.add_argument("--coarse", default="q1",
                    choices=["q1", "richardson"],
                    help="richardson: two-grid nodal extrapolation -> "
                    "O(h^4) nodal; pair with --trace-lift 6 for the "
                    "high-order hybrid route (239x at 32^2)")
    sp.add_argument("--trace-lift", type=int, default=0)
    sp.add_argument("--mesh", default=None, choices=[None, "slab"],
                    help="distributed slab solve over all available "
                    "devices: 2D y-slabs / --dim 3 z-slabs; composes "
                    "with --coarse richardson --trace-lift and with "
                    "--wave (parallel/sharded_elastic.py, wave.py)")
    sp.add_argument("--checkpoint", default=None,
                    help="march-state dir for --wave (chunked resumable "
                    "scan, bitwise-identical resume); ignored for the "
                    "steady solve")
    sp.add_argument("--checkpoint-chunk", type=int, default=0,
                    help="steps per checkpoint chunk (0 -> ~8 chunks)")
    sp.set_defaults(fn=cmd_elastic)

    sp = sub.add_parser(
        "eig",
        help="Sturm-Liouville eigenpairs (FEM pencil + enhanced "
        "Rayleigh-quotient eigenvalues)")
    sp.add_argument("--problem", default="poisson_1d")
    sp.add_argument("--dim", type=int, default=1, choices=[1, 2, 3])
    sp.add_argument("--num-nodes", type=int, default=33)
    sp.add_argument("--nx", type=int, default=16)
    sp.add_argument("--ny", type=int, default=16)
    sp.add_argument("--nz", type=int, default=8)
    sp.add_argument("--M", type=int, default=8)
    sp.add_argument("--M2", type=int, default=6,
                    help="per-dimension basis size for --dim 2")
    sp.add_argument("--M3", type=int, default=4,
                    help="per-dimension basis size for --dim 3")
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--k", type=int, default=4)
    sp.add_argument("--iters", type=int, default=40)
    sp.add_argument("--mass", default="consistent",
                    choices=["consistent", "numerov"])
    sp.add_argument("--rq-iters", type=int, default=2)
    sp.add_argument("--mixed", action="store_true",
                    help="--dim 2|3 mixed-precision route: f64 pencil + "
                    "f32 enhancement (the TPU fast dtype) + DG-corrected "
                    "f64 Rayleigh quotient — eigenvalues at 1.5e-11 / "
                    "1.0e-10 (32^2) vs the f32 gate's refusal "
                    "(models/eigen.py mixed section; enables x64)")
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--exact-c0", type=float, default=None,
                    help="emit eigenvalue errors vs (j pi/L)^2 + c0")
    sp.add_argument("--mesh", default=None, choices=[None, "slab"],
                    help="element-sharded per-pair enhancement over all "
                    "available devices, any --dim (the coarse pencil is "
                    "replicated; parallel/sharded_families.py)")
    sp.set_defaults(fn=cmd_eig)

    sp = sub.add_parser(
        "runsharded",
        help="multi-chip 1D solve over the element mesh (+ resume)")
    common(sp)
    sp.add_argument("--devices", type=int, default=None,
                    help="device count (default: all visible)")
    sp.add_argument("--checkpoint", default=None,
                    help="checkpoint dir (resume if fingerprint matches)")
    sp.set_defaults(fn=cmd_runsharded)

    sp = sub.add_parser(
        "run2d", help="2D families on structured quads (Poisson, Helmholtz,"
        " advection-diffusion, reaction-diffusion)")
    sp.add_argument("--problem", default="poisson_2d",
                    choices=["poisson_2d", "poisson_2d_inhomogeneous",
                             "helmholtz_2d", "advection_diffusion_2d",
                             "reaction_diffusion_2d",
                             "variable_coeff_elliptic_2d",
                             "poisson_2d_neumann", "robin_2d"])
    sp.add_argument("--nx", type=int, default=32)
    sp.add_argument("--ny", type=int, default=32)
    sp.add_argument("--M", type=int, default=6)
    sp.add_argument("--gamma", type=float, default=1e4)
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--fem-dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--precond", default="auto",
                    choices=["auto", "jacobi", "mg", "adi", "shifted"])
    sp.add_argument("--varcoeff-method", default="sne",
                    choices=["sne", "qr"],
                    help="Pallas per-element LSE algorithm (TPU only)")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--eval-points", type=int, default=2000)
    sp.add_argument("--mesh", default="none",
                    choices=["none", "slab", "grid"],
                    help="multi-chip: y-slab or 2-axis block sharding")
    sp.add_argument("--devices", type=int, default=None,
                    help="device count for --mesh slab")
    sp.add_argument("--mesh-shape", type=int, nargs=2, default=[2, 4],
                    metavar=("DY", "DX"),
                    help="device grid for --mesh grid")
    sp.add_argument("--grading", type=float, default=1.0,
                    help="power-law mesh grading exponent (1.0 = uniform; "
                    "> 1 clusters nodes toward the domain center; works "
                    "with --mesh none|slab)")
    sp.add_argument("--coarse", default="q1", choices=["q1", "compact"],
                    help="coarse scheme: Q1 weak form (O(h^2) nodal) or "
                    "tensor-Numerov compact (O(h^4) nodal; constant "
                    "coefficients, b=0, all-Dirichlet, uniform mesh)")
    sp.add_argument("--trace-lift", type=int, default=0,
                    help="tangential Lagrange lift stencil for element "
                    "traces (0 = bilinear; 6 with --coarse compact gives "
                    "an O(h^4) hybrid solution)")
    sp.set_defaults(fn=cmd_run2d)

    sp = sub.add_parser(
        "run3d", help="3D families on structured hexes (Poisson, "
        "Helmholtz, advection-diffusion)")
    sp.add_argument("--problem", default="poisson_3d",
                    choices=["poisson_3d", "poisson_3d_inhomogeneous",
                             "helmholtz_3d", "advection_diffusion_3d",
                             "variable_coeff_elliptic_3d",
                             "poisson_3d_neumann", "robin_3d"])
    sp.add_argument("--nx", type=int, default=16)
    sp.add_argument("--ny", type=int, default=16)
    sp.add_argument("--nz", type=int, default=16)
    sp.add_argument("--M", type=int, default=4)
    sp.add_argument("--dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--fem-dtype", default=None,
                    choices=[None, "float32", "float64"])
    sp.add_argument("--x64", action="store_true")
    sp.add_argument("--precond", default="auto",
                    choices=["auto", "jacobi", "mg", "shifted"])
    sp.add_argument("--eval-points", type=int, default=2000)
    sp.add_argument("--mesh", default="none",
                    choices=["none", "slab", "grid"],
                    help="multi-chip: z-slab or (z, y) block sharding")
    sp.add_argument("--devices", type=int, default=None,
                    help="device count for --mesh slab")
    sp.add_argument("--mesh-shape", type=int, nargs=2, default=[2, 4],
                    metavar=("DZ", "DY"),
                    help="device grid for --mesh grid")
    sp.add_argument("--grading", type=float, default=1.0,
                    help="power-law mesh grading exponent (1.0 = uniform; "
                    "> 1 clusters nodes toward the domain center; works "
                    "with --mesh none|slab)")
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--coarse", default="q1", choices=["q1", "compact"],
                    help="coarse scheme: Q1 weak form (O(h^2) nodal) or "
                    "tensor-Numerov compact (O(h^4) nodal; constant "
                    "coefficients, b=0, all-Dirichlet, uniform mesh)")
    sp.add_argument("--trace-lift", type=int, default=0,
                    help="tensor-Lagrange plane-lift stencil for element "
                    "surface traces (0 = trilinear; 6 with --coarse "
                    "compact gives an O(h^4) hybrid solution)")
    sp.set_defaults(fn=cmd_run3d)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "compile_cache", None):
        import os

        cache_dir = os.path.expanduser(args.compile_cache)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every program (the default 2-second autotune floor skips
        # exactly the small-but-many programs this repo compiles).
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    args.fn(args)


if __name__ == "__main__":
    main()
