"""Distributed solves for the COMPOSED model families — biharmonic,
Sturm–Liouville eigen, steady semilinear — closing the round-3 symmetry
gap (every scalar source family rode ``shard_map``; the composed families
did not).

Design per family (all element-axis DP, the framework's core parallelism
— the reference scales its element loop sequentially at ~15 el/s,
``Hybrid-FEM-LSSVR.py:151-176``):

* **Biharmonic 1D/2D** (``u'''' = f`` / ``Lap^2 u = f``, simply
  supported): the exact two-Poisson splitting (models/biharmonic.py)
  chains TWO existing distributed solves.  Stage v runs
  ``make_sharded_solve[_2d]`` unchanged; its enhanced coefficients are
  re-replicated with ONE collective (``jax.device_put`` to a replicated
  sharding — an all-gather over the element axis), and stage u's rhs
  reads them pointwise through the traced evaluator inside the second
  distributed solve.  Communication cost: the existing per-stage halo /
  SPIKE traffic + one [E, M] (resp. [ny, nx, M, M]) all-gather between
  stages.

* **Eigen 1D**: the coarse pencil subspace iteration is O(N·k) work on a
  tridiagonal — communication-free to replicate (every device runs the
  identical tiny iteration; replicating beats distributing because ONE
  halo exchange costs more than the whole pencil apply at practical N).
  The expensive stages — the per-pair shifted-operator LSSVR enhancement
  (batched KKT over E elements) and the Rayleigh-quotient quadrature —
  shard over element slabs; the quotient reduces via per-device partial
  sums (elements are disjoint, so the slab sums add exactly).

* **Steady semilinear 1D**: the coarse Newton iterates a tridiagonal
  solve at N ~ 1e3 unknowns — replicated for the same reason as the
  eigen pencil — while the element-Newton enhancement (``n_newton_elem``
  batched KKT solves over [E, C, M] tensors, the dominant cost) shards
  over element slabs.  Element Newton is per-element independent (the
  boundary traces are frozen from the coarse stage), so slab-batched ==
  full-batched exactly.

Every factory returns a zero-argument callable producing outputs equal
to the single-device family solver (asserted in
``tests/test_sharded_families.py``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.biharmonic import (BiharmonicProblem1D, BiharmonicProblem2D,
                                 BiharmonicProblem3D)
from ..models.eigen import (EigenConfig, _quadrature_forms,
                            fem_eigensolve)
from ..models.hybrid import SolverConfig, lssvr_enhance
from ..models.hybrid2d import Problem2D, Solution2D, Solver2DConfig
from ..models.hybrid3d import Problem3D, Solver3DConfig
from ..models.nonlinear import (SemilinearProblem1D, SemilinearProblem2D,
                                SemilinearProblem3D, SemilinearSolution,
                                SemilinearSolution2D, SemilinearSolution3D,
                                fem_newton)
from ..models.problem import Problem1D
from ..ops import eval as ev
from ..ops import kkt, legendre
from .mesh import ELEMENT_AXIS
from .sharded import ShardedSolution, make_sharded_solve
from .sharded2d import ShardedSolution2D, make_sharded_solve_2d
from .sharded3d import ShardedSolution3D, make_sharded_solve_3d

HI = jax.lax.Precision.HIGHEST


# ------------------------------------------------------------ biharmonic


class ShardedBiharmonicSolution(NamedTuple):
    u: ShardedSolution  # displacement solve (coeffs sharded over elements)
    v: ShardedSolution  # moment (u'') solve


def make_sharded_solve_biharmonic_1d(problem: BiharmonicProblem1D,
                                     cfg: SolverConfig, mesh,
                                     axis: str = ELEMENT_AXIS):
    """Distributed simply-supported biharmonic: two chained distributed
    Poisson solves (module docstring).  Returns a zero-argument callable;
    equality with ``solve_biharmonic_1d`` is per-stage exact up to the
    distributed coarse solve's SPIKE-vs-Thomas rounding."""
    f = problem.f
    pv = Problem1D(
        name=f"{problem.name}:moment",
        f=lambda x: -f(x),
        domain=problem.domain,
        exact=problem.exact_d2,
    )
    run_v = make_sharded_solve(pv, cfg, mesh, axis)
    dtype = cfg.jnp_dtype()
    x0, x1 = problem.domain
    nodes = jnp.linspace(x0, x1, cfg.num_nodes, dtype=dtype)
    repl = NamedSharding(mesh, P())
    cache = {}  # ADVICE r4 #4: run_v() is deterministic for a fixed
    # factory, so the stage-u program (which bakes wv as a constant) is
    # reused across repeated run() invocations instead of re-jitted.

    def run() -> ShardedBiharmonicSolution:
        sol_v = run_v()
        if "run_u" not in cache:
            # ONE all-gather: re-replicate the stage-v polynomials so
            # every device can read the stage-u rhs pointwise in its
            # own slab.
            wv = jax.device_put(sol_v.coeffs, repl)
            pu = Problem1D(
                name=f"{problem.name}:displacement",
                f=lambda x: -ev.evaluate(nodes, wv, x),
                domain=problem.domain,
                exact=problem.exact,
            )
            cache["run_u"] = make_sharded_solve(pu, cfg, mesh, axis)
        return ShardedBiharmonicSolution(u=cache["run_u"](), v=sol_v)

    return run


class ShardedBiharmonicSolution2D(NamedTuple):
    u: ShardedSolution2D
    v: ShardedSolution2D


class ShardedBiharmonicSolution3D(NamedTuple):
    u: ShardedSolution3D
    v: ShardedSolution3D


def make_sharded_solve_biharmonic_3d(problem: BiharmonicProblem3D,
                                     cfg: Solver3DConfig, mesh,
                                     axis: str = ELEMENT_AXIS):
    """Distributed simply-supported 3D biharmonic box: chained z-slab
    solves; the u-stage rhs reads the re-replicated v-stage tensor-
    Legendre polynomials through ``evaluate_3d`` inside the second
    ``shard_map`` (single-device chain:
    models/biharmonic.py::solve_biharmonic_3d)."""
    from ..models.hybrid3d import evaluate_3d

    f = problem.f
    zero = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    pv = Problem3D(
        name=f"{problem.name}:moment",
        f=lambda x, y, z: -f(x, y, z),
        g=zero,
        domain=problem.domain,
        exact=problem.exact_lap,
    )
    run_v = make_sharded_solve_3d(pv, cfg, mesh, axis)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    repl = NamedSharding(mesh, P())
    # The u-stage rhs is a traced evaluation — cannot enter the fused
    # Pallas kernels (same forcing as the single-device chain).
    cfg_u = dataclasses.replace(cfg, backend="xla")

    cache = {}  # ADVICE r4 #4: stage-u program reused across run() calls

    def run() -> ShardedBiharmonicSolution3D:
        from ..models.hybrid3d import Solution3D

        sol_v = run_v()
        if "run_u" not in cache:
            wv = jax.device_put(sol_v.coeffs, repl)
            zeros_grid = jnp.zeros((cfg.nz + 1, cfg.ny + 1, cfg.nx + 1),
                                   dtype)
            sv = Solution3D(xs, ys, zs, zeros_grid, wv, jnp.int32(0),
                            jnp.zeros((), dtype), None, None, None, None)

            def rhs_u(x, y, z):
                shp = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y),
                                           jnp.shape(z))
                ones = jnp.ones(shp, dtype)
                xf = jnp.ravel(x * ones)
                yf = jnp.ravel(y * ones)
                zf = jnp.ravel(z * ones)
                return -evaluate_3d(sv, xf, yf, zf).reshape(shp)

            pu = Problem3D(
                name=f"{problem.name}:displacement",
                f=rhs_u,
                g=zero,
                domain=problem.domain,
                exact=problem.exact,
            )
            cache["run_u"] = make_sharded_solve_3d(pu, cfg_u, mesh, axis)
        return ShardedBiharmonicSolution3D(u=cache["run_u"](), v=sol_v)

    return run


def make_sharded_solve_biharmonic_2d(problem: BiharmonicProblem2D,
                                     cfg: Solver2DConfig, mesh,
                                     axis: str = ELEMENT_AXIS):
    """Distributed simply-supported plate: chained y-slab solves; the
    u-stage rhs reads the re-replicated v-stage tensor-Legendre
    polynomials through ``evaluate_2d`` inside the second ``shard_map``
    (single-device chain: models/biharmonic.py::solve_biharmonic_2d)."""
    from ..models.hybrid2d import evaluate_2d

    f = problem.f
    zero = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731
    pv = Problem2D(
        name=f"{problem.name}:moment",
        f=lambda x, y: -f(x, y),
        g=zero,
        domain=problem.domain,
        exact=problem.exact_lap,
    )
    run_v = make_sharded_solve_2d(pv, cfg, mesh, axis)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    repl = NamedSharding(mesh, P())
    # The u-stage rhs is a traced evaluation — cannot enter the fused
    # Pallas kernels (same forcing as the single-device chain).
    cfg_u = dataclasses.replace(cfg, backend="xla")

    cache = {}  # ADVICE r4 #4: stage-u program reused across run() calls

    def run() -> ShardedBiharmonicSolution2D:
        sol_v = run_v()
        if "run_u" not in cache:
            wv = jax.device_put(sol_v.coeffs, repl)
            zeros_grid = jnp.zeros((cfg.ny + 1, cfg.nx + 1), dtype)
            zs = jnp.zeros((cfg.ny, cfg.nx), dtype)
            sv = Solution2D(xs, ys, zeros_grid, wv, jnp.int32(0),
                            jnp.zeros((), dtype), zs, zs,
                            jnp.ones((cfg.ny, cfg.nx), bool))

            def rhs_u(x, y):
                shp = jnp.broadcast_shapes(jnp.shape(x), jnp.shape(y))
                xf = jnp.ravel(x * jnp.ones_like(x + y))
                yf = jnp.ravel(y * jnp.ones_like(x + y))
                return -evaluate_2d(sv, xf, yf).reshape(shp)

            pu = Problem2D(
                name=f"{problem.name}:displacement",
                f=rhs_u,
                g=zero,
                domain=problem.domain,
                exact=problem.exact,
            )
            cache["run_u"] = make_sharded_solve_2d(pu, cfg_u, mesh, axis)
        return ShardedBiharmonicSolution2D(u=cache["run_u"](), v=sol_v)

    return run


# ------------------------------------------------------------------ eigen


class ShardedHybridEigenSolution(NamedTuple):
    fem: object  # EigenSolution (replicated coarse pencil)
    coeffs: jnp.ndarray  # [k, E, M] enhanced polynomials
    lams: jnp.ndarray  # [k] Rayleigh-quotient-refined eigenvalues
    solve_ok: jnp.ndarray  # [k, E]


def make_sharded_eigensolve(problem: Problem1D, cfg: SolverConfig, mesh,
                            ecfg: EigenConfig = EigenConfig(),
                            axis: str = ELEMENT_AXIS):
    """Distributed hybrid eigensolve: replicated coarse pencil +
    element-sharded per-pair enhancement with psum quotient reduction
    (module docstring; single-device: models/eigen.py::hybrid_eigensolve).

    ONE compiled program for the whole eigensolve (round-4 VERDICT Weak
    #1 / advisor finding): the shift ``lam`` enters as a TRACED scalar —
    the k pairs and the Rayleigh rounds are ``lax.scan`` loops INSIDE the
    jitted ``shard_map``, so every (pair, round) reuses one XLA
    executable instead of compiling k * rq_iters distinct programs
    (20-100 s each on a first TPU compile).  The shifted operator's
    collocation matrices are therefore built on-device per element and
    solved through the batched null-space QR (``lssvr_enhance`` with
    ``shared_ops=None``) rather than the host-f64 shared-operator
    precompute, whose factors depend on the (now traced) shift; the
    fused Pallas kernels cannot engage on this route.  That is moot in
    2D/3D (f64-gated, ``eigen._require_f64_eigen``), and the UNGATED 1D
    f32 route — now per-element f32 QR instead of host-f64 factors —
    measures at the documented f32 quotient floor
    (``test_sharded_eigensolve_f32_stays_at_f32_floor``).  The
    compile-once property is asserted by
    ``tests/test_sharded_families.py`` via ``run.jitted._cache_size()``.
    """
    n_dev = mesh.shape[axis]
    E_total = cfg.num_nodes - 1
    if E_total % n_dev:
        raise ValueError(
            f"E={E_total} must divide by the {n_dev}-device mesh "
            "(the per-pair enhancement slices exact element slabs)"
        )
    E_loc = E_total // n_dev
    repl = NamedSharding(mesh, P())
    base_c = problem.c
    rq = max(1, ecfg.rq_iters)

    def local(u_all, nodes_all, lam0_all):
        d = jax.lax.axis_index(axis)
        row0 = d * E_loc
        nodes_loc = jax.lax.dynamic_slice(nodes_all, (row0,),
                                          (E_loc + 1,))

        def pair(carry, inp):
            u_pair, lam0 = inp
            u_loc = jax.lax.dynamic_slice(u_pair, (row0,), (E_loc + 1,))

            def rq_iter(lam, _):
                # Traced-shift analog of eigen._shifted_problem: the
                # reaction closure reads the in-scan lam.
                shifted = dataclasses.replace(
                    problem, name=f"{problem.name}_eig_shift",
                    f=lambda x: jnp.zeros_like(x),
                    c=lambda x: base_c(x) - lam,
                    g_left=0.0, g_right=0.0, constant_coeffs=False,
                    f_shifted=None, f_elem_factors=None,
                    f_colloc_factors=None, f_translation=None,
                    exact=None, exact_dx=None,
                )
                w, diags = lssvr_enhance(
                    shifted, nodes_loc, u_loc, cfg, shared_ops=None,
                    touches_left=(d == 0),
                    touches_right=(d == n_dev - 1),
                )
                # Rayleigh-quotient partials over THIS slab's disjoint
                # elements (quadrature against the ORIGINAL operator),
                # psum-reduced so every device carries the same lam.
                num_p, den_p = _quadrature_forms(problem, nodes_loc, w,
                                                 cfg)
                num = jax.lax.psum(num_p, axis)
                den = jax.lax.psum(den_p, axis)
                return num / den, (w, diags.solve_ok, den)

            lamN, (ws, oks, dens) = jax.lax.scan(rq_iter, lam0, None,
                                                 length=rq)
            # Unit CONTINUOUS L2 norm, same convention as the
            # single-device solver (den is the final w's quadrature).
            wN = ws[-1] / jnp.sqrt(dens[-1])
            return carry, (wN, lamN, oks[-1])

        _, (coeffs, lams, oks) = jax.lax.scan(pair, 0,
                                              (u_all, lam0_all))
        return coeffs, oks, lams

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P()),
        out_specs=(P(None, axis), P(None, axis), P()), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> ShardedHybridEigenSolution:
        fem = fem_eigensolve(problem, cfg, ecfg)
        u_all = jax.device_put(jnp.asarray(fem.vectors).T, repl)  # [k, N]
        nodes = jax.device_put(fem.nodes, repl)
        lam0 = jax.device_put(jnp.asarray(fem.lams)[: ecfg.k], repl)
        coeffs, oks, lams = jitted(u_all, nodes, lam0)
        return ShardedHybridEigenSolution(
            fem, coeffs, lams.astype(fem.lams.dtype), oks,
        )

    run.jitted = jitted
    return run


# -------------------------------------------------------- steady semilinear


def make_sharded_solve_semilinear(problem: SemilinearProblem1D,
                                  cfg: SolverConfig, mesh,
                                  n_newton: int = 8,
                                  n_newton_elem: int = 5,
                                  scheme: str = "p1",
                                  axis: str = ELEMENT_AXIS):
    """Distributed steady semilinear solve: replicated coarse Newton +
    element-sharded element-Newton enhancement (module docstring;
    single-device: models/nonlinear.py::hybrid_solve_semilinear)."""
    n_dev = mesh.shape[axis]
    E = cfg.num_nodes - 1
    if E % n_dev:
        raise ValueError(
            f"E={E} must divide by the {n_dev}-device mesh "
            "(the element-Newton scan shards exact element slabs)"
        )
    dtype = cfg.jnp_dtype()
    M, C = cfg.M, cfg.n_colloc
    V0h, _, V2h = legendre.collocation_vandermonde_host(M, C)
    B = np.stack([V0h[0], V0h[-1]])
    Z, Pbc = kkt.nullspace_host(B)
    V0 = jnp.asarray(V0h, dtype)
    D2 = jnp.asarray(V2h, dtype)
    Bj = jnp.asarray(B, dtype)
    Zj = jnp.asarray(Z, dtype)
    Pj = jnp.asarray(Pbc, dtype)

    def local(h, xc_loc, f_loc, bc_loc, w0_loc):
        scale2 = (2.0 / h) ** 2

        def elem_newton(w, _):
            u_c = jnp.einsum("ck,ek->ec", V0, w, precision=HI)
            c_field = problem.ds(u_c)
            D = (-problem.a0 * scale2) * D2[None] \
                + c_field[..., None] * V0[None]
            rhs = f_loc - problem.s(u_c) + c_field * u_c
            w1, diags = kkt.solve_batched(D, Bj, rhs, bc_loc, cfg.gamma,
                                          ZP=(Zj, Pj))
            return w1, diags

        w, hist = jax.lax.scan(elem_newton, w0_loc, None,
                               length=n_newton_elem)
        u_c = jnp.einsum("ck,ek->ec", V0, w, precision=HI)
        upp = scale2 * jnp.einsum("ck,ek->ec", D2, w, precision=HI)
        res_loc = jnp.max(
            jnp.abs(-problem.a0 * upp + problem.s(u_c) - f_loc)
        )
        ok = jax.tree_util.tree_map(lambda a: a[-1], hist).solve_ok
        return w, ok, res_loc.reshape(1)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
    )

    def run() -> SemilinearSolution:
        # Replicated coarse Newton (tridiagonal at N unknowns —
        # cheaper to recompute everywhere than to communicate).
        nodes, fem_values, fem_res = fem_newton(problem, cfg, n_newton,
                                                scheme=scheme)
        h = nodes[1] - nodes[0]
        t = legendre.collocation_points(C, dtype=dtype)
        xl = nodes[:-1]
        xc = xl[:, None] + 0.5 * h * (t[None, :] + 1.0)  # [E, C]
        f_c = problem.f(xc) * jnp.ones_like(xc)
        g_l = jnp.asarray(problem.g_left, dtype)
        g_r = jnp.asarray(problem.g_right, dtype)
        u_left = fem_values[:-1].at[0].set(g_l)
        u_right = fem_values[1:].at[-1].set(g_r)
        bc = jnp.stack([u_left, u_right], axis=-1)  # [E, 2]
        w0 = kkt.linear_fallback_coeffs(u_left, u_right, M)
        w, ok, res = jax.jit(sharded)(h, xc, f_c, bc, w0)
        return SemilinearSolution(nodes, fem_values, w, fem_res,
                                  jnp.max(res), ok)

    return run


def make_sharded_solve_semilinear_2d(problem: SemilinearProblem2D,
                                     cfg: Solver2DConfig, mesh,
                                     n_newton: int = 8,
                                     n_newton_elem: int = 5,
                                     scheme: str = "p1",
                                     trace_lift: int = 0,
                                     axis: str = ELEMENT_AXIS):
    """Distributed 2D steady semilinear solve: replicated coarse Newton
    (matrix-free Q1/Numerov, cheaper to recompute everywhere than to
    communicate the tiny grid) + y-slab-sharded element-Newton
    enhancement.  Element Newton is per-element independent (traces
    frozen from the coarse stage), so slab-batched == full-batched
    exactly (single-device: nonlinear.py::hybrid_solve_semilinear_2d).

    ``trace_lift >= 2``: the tangential-Lagrange lift needs whole grid
    lines, so it is computed on the REPLICATED converged grid before the
    ``shard_map`` and each slab slices its element rows (same recipe as
    ``sharded2d.make_sharded_solve_2d``)."""
    from ..models.hybrid2d import (_bilinear_fallback_coeffs,
                                   _element_data_2d, _lifted_trace_2d)
    from ..models.nonlinear import (_P2DStub,
                                    _semilinear2d_element_parts_host,
                                    fem_newton_2d)

    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(
            f"ny={cfg.ny} must divide by the {n_dev}-device mesh "
            "(the element-Newton stage slices exact y-slabs)"
        )
    ny_loc = cfg.ny // n_dev
    dtype = cfg.jnp_dtype()
    M_, C = cfg.M, cfg.n_colloc
    Lap_j, Mass_j, Bj, Zj, Pj, t_int, bpts = \
        _semilinear2d_element_parts_host(problem, cfg, dtype)
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)
    x0, x1, y0, y1 = problem.domain
    hy = float((y1 - y0) / cfg.ny)
    stub = _P2DStub(problem)
    repl = NamedSharding(mesh, P())

    def local(fem_grid, trace_full):
        d = jax.lax.axis_index(axis)
        row0 = d * ny_loc
        z0 = jnp.zeros_like(row0)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = y0 + hy * jnp.arange(cfg.ny + 1, dtype=dtype)
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        fem_loc = jax.lax.dynamic_slice(fem_grid, (row0, z0),
                                        (ny_loc + 1, cfg.nx + 1))
        trace_rows = None
        if trace_lift >= 2:
            trace_rows = jax.lax.dynamic_slice(
                trace_full, (row0, z0, z0),
                (ny_loc, cfg.nx, trace_full.shape[-1]),
            )
        f_rows, bc_rows, corners = _element_data_2d(
            stub, cfg, xs, ys_loc, fem_loc, t_int_j, bpts_j,
            row_offset=row0, trace_rows=trace_rows,
        )
        w0 = _bilinear_fallback_coeffs(*corners, M_).reshape(
            ny_loc * cfg.nx, M_ * M_)

        def elem_newton(w, _):
            u_c = jnp.dot(w, Mass_j.T, precision=HI)
            c_field = problem.ds(u_c)
            D = Lap_j[None] + c_field[..., None] * Mass_j[None]
            rhs = f_rows - problem.s(u_c) + c_field * u_c
            w1, diags = kkt.solve_batched(D, Bj, rhs, bc_rows, cfg.gamma,
                                          ZP=(Zj, Pj))
            return w1, diags

        w, hist = jax.lax.scan(elem_newton, w0, None,
                               length=n_newton_elem)
        u_c = jnp.dot(w, Mass_j.T, precision=HI)
        lap_u = jnp.dot(w, Lap_j.T, precision=HI)
        res_loc = jnp.max(jnp.abs(lap_u + problem.s(u_c) - f_rows))
        ok = jax.tree_util.tree_map(lambda a: a[-1], hist).solve_ok
        return (w.reshape(ny_loc, cfg.nx, M_, M_),
                ok.reshape(ny_loc, cfg.nx), res_loc.reshape(1))

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> SemilinearSolution2D:
        xs, ys, fem, fem_res = fem_newton_2d(problem, cfg, n_newton,
                                             scheme)
        fem_r = jax.device_put(fem, repl)
        if trace_lift >= 2:
            trace_full = _lifted_trace_2d(
                fem, M_, cfg.nx, cfg.ny, stencil=trace_lift
            ).reshape(cfg.ny, cfg.nx, -1)
        else:
            trace_full = jnp.zeros((cfg.ny, cfg.nx, 1), dtype)
        trace_full = jax.device_put(trace_full, repl)
        w, ok, res = jitted(fem_r, trace_full)
        return SemilinearSolution2D(xs, ys, fem, w, fem_res,
                                    jnp.max(res), ok)

    run.jitted = jitted
    return run


def make_sharded_solve_semilinear_3d(problem: SemilinearProblem3D,
                                     cfg: Solver3DConfig, mesh,
                                     n_newton: int = 8,
                                     n_newton_elem: int = 5,
                                     scheme: str = "p1",
                                     trace_lift: int = 0,
                                     axis: str = ELEMENT_AXIS):
    """Distributed 3D steady semilinear solve: replicated coarse hex
    Newton + z-slab-sharded element-Newton enhancement (the tensor lift
    of ``make_sharded_solve_semilinear_2d``; single-device:
    nonlinear.py::hybrid_solve_semilinear_3d)."""
    from ..models.hybrid3d import (_element_data_3d, _lifted_trace_3d,
                                   _trilinear_fallback_coeffs)
    from ..models.nonlinear import (_P3DStub,
                                    _semilinear3d_element_parts_host,
                                    fem_newton_3d)

    n_dev = mesh.shape[axis]
    if cfg.nz % n_dev:
        raise ValueError(
            f"nz={cfg.nz} must divide by the {n_dev}-device mesh "
            "(the element-Newton stage slices exact z-slabs)"
        )
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    M_ = cfg.M
    Lap_j, Mass_j, Bj, Zj, Pj, t_int, spts = \
        _semilinear3d_element_parts_host(problem, cfg, dtype)
    t_int_j = jnp.asarray(t_int)
    spts_j = jnp.asarray(spts)
    x0, x1, y0, y1, z0f, z1f = problem.domain
    hz = float((z1f - z0f) / cfg.nz)
    stub = _P3DStub(problem)
    repl = NamedSharding(mesh, P())

    def local(fem_grid, trace_full):
        d = jax.lax.axis_index(axis)
        lay0 = d * nz_loc
        z0 = jnp.zeros_like(lay0)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = z0f + hz * jnp.arange(cfg.nz + 1, dtype=dtype)
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        fem_loc = jax.lax.dynamic_slice(
            fem_grid, (lay0, z0, z0),
            (nz_loc + 1, cfg.ny + 1, cfg.nx + 1),
        )
        trace_rows = None
        if trace_lift >= 2:
            trace_rows = jax.lax.dynamic_slice(
                trace_full, (lay0, z0, z0, z0),
                (nz_loc, cfg.ny, cfg.nx, trace_full.shape[-1]),
            )
        f_rows, bc_rows, cs = _element_data_3d(
            stub, cfg, xs, ys, zs_loc, fem_loc, t_int_j, spts_j,
            layer_offset=lay0, trace_rows=trace_rows,
        )
        w0 = _trilinear_fallback_coeffs(cs, M_).reshape(
            nz_loc * cfg.ny * cfg.nx, M_ ** 3)

        def elem_newton(w, _):
            u_c = jnp.dot(w, Mass_j.T, precision=HI)
            c_field = problem.ds(u_c)
            D = Lap_j[None] + c_field[..., None] * Mass_j[None]
            rhs = f_rows - problem.s(u_c) + c_field * u_c
            w1, diags = kkt.solve_batched(D, Bj, rhs, bc_rows, cfg.gamma,
                                          ZP=(Zj, Pj))
            return w1, diags

        w, hist = jax.lax.scan(elem_newton, w0, None,
                               length=n_newton_elem)
        u_c = jnp.dot(w, Mass_j.T, precision=HI)
        lap_u = jnp.dot(w, Lap_j.T, precision=HI)
        res_loc = jnp.max(jnp.abs(lap_u + problem.s(u_c) - f_rows))
        ok = jax.tree_util.tree_map(lambda a: a[-1], hist).solve_ok
        return (w.reshape(nz_loc, cfg.ny, cfg.nx, M_, M_, M_),
                ok.reshape(nz_loc, cfg.ny, cfg.nx), res_loc.reshape(1))

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P()),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> SemilinearSolution3D:
        xs, ys, zs, fem, fem_res = fem_newton_3d(problem, cfg, n_newton,
                                                 scheme)
        fem_r = jax.device_put(fem, repl)
        if trace_lift >= 2:
            trace_full = _lifted_trace_3d(
                fem, M_, cfg.nx, cfg.ny, cfg.nz, stencil=trace_lift
            ).reshape(cfg.nz, cfg.ny, cfg.nx, -1)
        else:
            trace_full = jnp.zeros((cfg.nz, cfg.ny, cfg.nx, 1), dtype)
        trace_full = jax.device_put(trace_full, repl)
        w, ok, res = jitted(fem_r, trace_full)
        return SemilinearSolution3D(xs, ys, zs, fem, w, fem_res,
                                    jnp.max(res), ok)

    run.jitted = jitted
    return run


# ------------------------------------------------------- eigen 2D / 3D


def make_sharded_eigensolve_2d(problem, cfg: Solver2DConfig, mesh,
                               ecfg: EigenConfig = EigenConfig(),
                               axis: str = ELEMENT_AXIS):
    """Distributed 2D hybrid eigensolve: replicated coarse pencil +
    y-slab-sharded per-pair enhancement with psum Rayleigh-quotient
    reduction (single-device: eigen.py::hybrid_eigensolve_2d).

    ONE compiled XLA program across all (pair, Rayleigh-round)
    iterations: the shift enters only through the NUMERIC VALUES of the
    host-precomputed shifted shared bundle (``prepare_shared_2d`` of the
    c -> c - lambda problem), which is a TRACED argument of fixed shape —
    so the k * rq_iters calls all hit one jit cache entry.  The host
    pays one tiny f64 QR per round (same cost structure as the
    single-device loop); the element-data stub is lam-independent
    (f = g = 0)."""
    from ..models.eigen import (_check_2d_eligible, _shifted_problem_2d,
                                fem_eigensolve_2d)
    from ..models.eigen import HybridEigenSolution2D
    from ..models.hybrid2d import (_bilinear_fallback_coeffs,
                                   _boundary_coords, _element_data_2d,
                                   _lifted_trace_2d, prepare_shared_2d)

    _check_2d_eligible(problem)
    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(
            f"ny={cfg.ny} must divide by the {n_dev}-device mesh "
            "(the per-pair enhancement slices exact y-slabs)"
        )
    ny_loc = cfg.ny // n_dev
    dtype = cfg.jnp_dtype()
    M_ = cfg.M
    x0, x1, y0, y1 = problem.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    repl = NamedSharding(mesh, P())
    use_lift = ecfg.trace_lift >= 2
    n_bpts = _boundary_coords(M_).shape[0]
    # lam-independent element-data stub: the shift lives entirely in the
    # shared bundle's numeric values (zero forcing, zero Dirichlet data).
    pz = _shifted_problem_2d(problem, 0.0)

    # Quadrature parts with STATIC spacings (the slab ys is traced, so
    # _quadrature_forms_2d's float(ys[1]-ys[0]) cannot run here).
    q = cfg.M + 2
    tq, wq = np.polynomial.legendre.leggauss(q)
    V0q, V1q = legendre.legendre_vandermonde(jnp.asarray(tq, dtype), M_,
                                             num_derivs=1)
    wq_j = jnp.asarray(wq, dtype)
    dA = (hx / 2.0) * (hy / 2.0) * (wq_j[:, None] * wq_j[None, :])

    def quad_partial(coeffs):
        Pv = jnp.einsum("abkl,qk,rl->abqr", coeffs, V0q, V0q,
                        precision=HI)
        Px = jnp.einsum("abkl,qk,rl->abqr", coeffs, V0q, V1q,
                        precision=HI) * (2.0 / hx)
        Py = jnp.einsum("abkl,qk,rl->abqr", coeffs, V1q, V0q,
                        precision=HI) * (2.0 / hy)
        num = jnp.sum(dA[None, None] * (problem.a0 * (Px**2 + Py**2)
                                        + problem.c * Pv**2))
        den = jnp.sum(dA[None, None] * Pv**2)
        return num, den

    def local(shared, t_int, bpts, u_grid, bc_over):
        d = jax.lax.axis_index(axis)
        row0 = d * ny_loc
        z0 = jnp.zeros_like(row0)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = y0 + hy * jnp.arange(cfg.ny + 1, dtype=dtype)
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        fem_loc = jax.lax.dynamic_slice(u_grid, (row0, z0),
                                        (ny_loc + 1, cfg.nx + 1))
        f_rows, bc_rows, corners = _element_data_2d(
            pz, cfg, xs, ys_loc, fem_loc, t_int, bpts, row_offset=row0,
        )
        if use_lift:
            # Override semantics identical to the single-device
            # bc_rows_override: the lifted rows REPLACE the masked trace
            # wholesale (no g-override re-application).
            bc_rows = jax.lax.dynamic_slice(
                bc_over, (row0 * cfg.nx, z0),
                (ny_loc * cfg.nx, bc_over.shape[1]),
            )
        w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        coeffs = w.reshape(ny_loc, cfg.nx, M_, M_)
        fb = _bilinear_fallback_coeffs(*corners, M_)
        ok = diags.solve_ok.reshape(ny_loc, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        num_p, den_p = quad_partial(coeffs)
        num = jax.lax.psum(num_p, axis)
        den = jax.lax.psum(den_p, axis)
        return coeffs, ok, num, den

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(), P()), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> HybridEigenSolution2D:
        fem = fem_eigensolve_2d(problem, cfg, ecfg)
        coeffs_all, lams, oks = [], [], []
        for j in range(ecfg.k):
            lam = float(fem.lams[j])
            u = jax.device_put(fem.vectors[j], repl)
            if use_lift:
                bc_over = _lifted_trace_2d(
                    fem.vectors[j], M_, cfg.nx, cfg.ny,
                    stencil=ecfg.trace_lift,
                )
            else:
                bc_over = jnp.zeros((cfg.ny * cfg.nx, n_bpts), dtype)
            bc_over = jax.device_put(bc_over, repl)
            coeffs = den = None
            for _ in range(max(1, ecfg.rq_iters)):
                shared, (t_int, bpts) = prepare_shared_2d(
                    _shifted_problem_2d(problem, lam), cfg)
                coeffs, ok, num, den = jitted(shared, t_int, bpts, u,
                                              bc_over)
                lam = float(num) / float(den)
            coeffs_all.append(coeffs / jnp.sqrt(den))
            lams.append(lam)
            oks.append(ok)
        return HybridEigenSolution2D(
            fem, jnp.stack(coeffs_all),
            jnp.asarray(lams, fem.lams.dtype), jnp.stack(oks),
        )

    run.jitted = jitted
    return run


def make_sharded_eigensolve_3d(problem, cfg: Solver3DConfig, mesh,
                               ecfg: EigenConfig = EigenConfig(),
                               axis: str = ELEMENT_AXIS):
    """Distributed 3D hybrid eigensolve: replicated coarse pencil +
    z-slab-sharded per-pair enhancement with psum Rayleigh-quotient
    reduction (the tensor lift of ``make_sharded_eigensolve_2d``;
    single-device: eigen.py::hybrid_eigensolve_3d).  Same compile-once
    design: the shift enters only through the traced shared bundle."""
    from ..models.eigen import (_check_3d_eligible, _shifted_problem_3d,
                                fem_eigensolve_3d)
    from ..models.eigen import HybridEigenSolution3D
    from ..models.hybrid3d import (_element_data_3d, _lifted_trace_3d,
                                   _surface_coords,
                                   _trilinear_fallback_coeffs,
                                   prepare_shared_3d)

    _check_3d_eligible(problem)
    n_dev = mesh.shape[axis]
    if cfg.nz % n_dev:
        raise ValueError(
            f"nz={cfg.nz} must divide by the {n_dev}-device mesh "
            "(the per-pair enhancement slices exact z-slabs)"
        )
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    M_ = cfg.M
    x0, x1, y0, y1, z0f, z1f = problem.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1f - z0f) / cfg.nz)
    repl = NamedSharding(mesh, P())
    use_lift = ecfg.trace_lift >= 2
    n_spts = _surface_coords(M_).shape[0]
    pz = _shifted_problem_3d(problem, 0.0)

    q = cfg.M + 2
    tq, wq = np.polynomial.legendre.leggauss(q)
    V0q, V1q = legendre.legendre_vandermonde(jnp.asarray(tq, dtype), M_,
                                             num_derivs=1)
    wq_j = jnp.asarray(wq, dtype)
    dV = ((hx / 2.0) * (hy / 2.0) * (hz / 2.0)
          * (wq_j[:, None, None] * wq_j[None, :, None]
             * wq_j[None, None, :]))

    def quad_partial(coeffs):
        Pv = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0q, V0q, V0q,
                        precision=HI)
        Px = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0q, V0q, V1q,
                        precision=HI) * (2.0 / hx)
        Py = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0q, V1q, V0q,
                        precision=HI) * (2.0 / hy)
        Pz = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V1q, V0q, V0q,
                        precision=HI) * (2.0 / hz)
        num = jnp.sum(dV[None, None, None]
                      * (problem.a0 * (Px**2 + Py**2 + Pz**2)
                         + problem.c * Pv**2))
        den = jnp.sum(dV[None, None, None] * Pv**2)
        return num, den

    def local(shared, t_int, spts, u_grid, bc_over):
        d = jax.lax.axis_index(axis)
        lay0 = d * nz_loc
        z0 = jnp.zeros_like(lay0)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = z0f + hz * jnp.arange(cfg.nz + 1, dtype=dtype)
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        fem_loc = jax.lax.dynamic_slice(
            u_grid, (lay0, z0, z0),
            (nz_loc + 1, cfg.ny + 1, cfg.nx + 1),
        )
        f_rows, bc_rows, cs = _element_data_3d(
            pz, cfg, xs, ys, zs_loc, fem_loc, t_int, spts,
            layer_offset=lay0,
        )
        if use_lift:
            bc_rows = jax.lax.dynamic_slice(
                bc_over, (lay0 * cfg.ny * cfg.nx, z0),
                (nz_loc * cfg.ny * cfg.nx, bc_over.shape[1]),
            )
        w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        coeffs = w.reshape(nz_loc, cfg.ny, cfg.nx, M_, M_, M_)
        fb = _trilinear_fallback_coeffs(cs, M_)
        ok = diags.solve_ok.reshape(nz_loc, cfg.ny, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        num_p, den_p = quad_partial(coeffs)
        num = jax.lax.psum(num_p, axis)
        den = jax.lax.psum(den_p, axis)
        return coeffs, ok, num, den

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(), P()), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> HybridEigenSolution3D:
        fem = fem_eigensolve_3d(problem, cfg, ecfg)
        coeffs_all, lams, oks = [], [], []
        for j in range(ecfg.k):
            lam = float(fem.lams[j])
            u = jax.device_put(fem.vectors[j], repl)
            if use_lift:
                bc_over = _lifted_trace_3d(
                    fem.vectors[j], M_, cfg.nx, cfg.ny, cfg.nz,
                    stencil=ecfg.trace_lift,
                )
            else:
                bc_over = jnp.zeros(
                    (cfg.nz * cfg.ny * cfg.nx, n_spts), dtype)
            bc_over = jax.device_put(bc_over, repl)
            coeffs = den = None
            for _ in range(max(1, ecfg.rq_iters)):
                shared, (t_int, spts) = prepare_shared_3d(
                    _shifted_problem_3d(problem, lam), cfg)
                coeffs, ok, num, den = jitted(shared, t_int, spts, u,
                                              bc_over)
                lam = float(num) / float(den)
            coeffs_all.append(coeffs / jnp.sqrt(den))
            lams.append(lam)
            oks.append(ok)
        return HybridEigenSolution3D(
            fem, jnp.stack(coeffs_all),
            jnp.asarray(lams, fem.lams.dtype), jnp.stack(oks),
        )

    run.jitted = jitted
    return run


# --------------------------------------------------------- clamped plate


def make_sharded_solve_clamped_2d(problem, cfg: Solver2DConfig, mesh,
                                  axis: str = ELEMENT_AXIS):
    """Distributed clamped plate: replicated C^1 BFS coarse stage (the
    4-dof-per-node grid is tiny — cheaper to recompute everywhere than
    to communicate, same policy as the semilinear coarse Newton) +
    y-slab-sharded fourth-order enhancement (one shared SVD-route LSE
    per slab; single-device: biharmonic.py::solve_clamped_biharmonic_2d).
    """
    from ..models.biharmonic import (ClampedBiharmonicSolution2D,
                                     _bfs_gather, bfs_fem_solve_2d,
                                     prepare_shared_clamped_2d)

    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(
            f"ny={cfg.ny} must divide by the {n_dev}-device mesh "
            "(the enhancement slices exact y-slabs)"
        )
    ny_loc = cfg.ny // n_dev
    dtype = cfg.jnp_dtype()
    M_, C = cfg.M, cfg.n_colloc
    shared, t_int, T_all = prepare_shared_clamped_2d(problem, cfg)
    x0, x1, y0, y1 = problem.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    repl = NamedSharding(mesh, P())
    shared_r = jax.device_put(shared, repl)
    T_r = jax.device_put(T_all, repl)
    t_j = jnp.asarray(t_int, dtype)

    def local(shared, T_all, loc_full):
        d = jax.lax.axis_index(axis)
        row0 = d * ny_loc
        z0 = jnp.zeros_like(row0)
        loc = jax.lax.dynamic_slice(
            loc_full, (row0, z0, z0), (ny_loc, cfg.nx, 16))
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = y0 + hy * jnp.arange(cfg.ny + 1, dtype=dtype)
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        xm = 0.5 * (xs[1:] + xs[:-1])
        ym = 0.5 * (ys_loc[1:] + ys_loc[:-1])
        xq = xm[:, None] + 0.5 * hx * t_j[None, :]
        yq = ym[:, None] + 0.5 * hy * t_j[None, :]
        F = problem.f(xq[None, :, None, :], yq[:, None, :, None])
        f_rows = (F * jnp.ones((ny_loc, cfg.nx, C, C), dtype)).reshape(
            ny_loc * cfg.nx, C * C)
        bc = jnp.einsum("yxl,pl->yxp", loc, T_all,
                        precision=HI).reshape(ny_loc * cfg.nx, -1)
        w, diags = kkt.solve_primal_shared(shared, f_rows, bc)
        return (w.reshape(ny_loc, cfg.nx, M_, M_),
                diags.solve_ok.reshape(ny_loc, cfg.nx),
                diags.max_slack.reshape(ny_loc, cfg.nx))

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
    )
    jitted = jax.jit(sharded)

    def run() -> ClampedBiharmonicSolution2D:
        xs, ys, u, res = bfs_fem_solve_2d(problem, cfg)
        loc_full = jax.device_put(_bfs_gather(u), repl)
        w, ok, slack = jitted(shared_r, T_r, loc_full)
        return ClampedBiharmonicSolution2D(
            xs=xs, ys=ys, u_nodal=u, coeffs=w, solve_ok=ok,
            max_slack=slack, cg_iters=res.iters,
            cg_residual=res.residual,
        )

    run.jitted = jitted
    return run
