"""Transient (parabolic) extension: u_t + L u = f(x, t).

Beyond-reference capability (the reference is steady 1D Poisson only,
``Hybrid-FEM-LSSVR.py:8-18``): method-of-lines with the theta-scheme over
the existing P1 substrate, the whole time loop a single ``lax.scan`` on
device (no per-step host round trips).

Two solvers:

* ``fem_march`` — standard P1 theta-scheme (Crank-Nicolson default):
  (M + th*dt*A) u^{n+1} = (M - (1-th)*dt*A) u^n + dt*(th f^{n+1} +
  (1-th) f^n); tridiagonal Thomas solve per step.  Supports the full
  per-end Dirichlet/Neumann/Robin BC surface of the spatial operator.

* ``hybrid_march`` — the LSSVR-enhanced Crank-Nicolson march: each
  element carries a degree-(M-1) Legendre polynomial advanced by
  collocating the CN update  (2/dt) u^{n+1} + L u^{n+1} =
  (2/dt) u^n - L u^n + f^n + f^{n+1}  with endpoint traces pinned to the
  P1 march (the transient analog of the steady enhancement's FEM-value
  pinning).  The CN collocation operator D_CN = (2/dt) V0 + D_L is SHARED
  across elements (uniform mesh, constant coefficients), so every step is
  two MXU matmuls through the precomputed f64 affine map
  (``kkt.precompute_shared_host``) — the rhs itself is two more batched
  matmuls of the previous coefficients.  Spatial accuracy between nodes
  is spectral; the floor is the P1 march's nodal error + O(dt^2).

2D mirrors both (``fem_march_2d`` / ``hybrid_march_2d``: per step one
Jacobi-CG solve of the mass-dominated (M + th dt A) — measured 1-2
iterations — plus, for the enhanced march, four batched MXU matmuls
through the shared-LSE CN operator).  Floors differ by dimension: in 1D
the element trace IS the nodal value, so the enhanced march inherits the
march's nodal accuracy (O(h^4) with Numerov); in 2D the trace is the Q1
bilinear edge interpolant, whose O(h^2) interpolation error bounds the
enhanced Linf regardless of nodal superaccuracy (measured
step-count-independent, same floor as the steady 2D enhancement) — the
Numerov option still yields O(h^4) NODAL output in 2D (measured 16.3x
per h-halving).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly, kkt, legendre, tridiag
from .hybrid import SolverConfig, uniform_nodes
from .problem import Problem1D


@dataclasses.dataclass(frozen=True)
class TransientProblem1D:
    """u_t + L u = f(x, t) with L (and its BCs) a ``Problem1D``.

    ``elliptic.f`` is unused; boundary data is time-independent."""

    name: str
    elliptic: Problem1D
    f: Callable  # f(x, t)
    u0: Callable  # initial condition u0(x)
    exact: Optional[Callable] = None  # exact(x, t)


@dataclasses.dataclass(frozen=True)
class TransientConfig:
    t_final: float = 1.0
    n_steps: int = 100
    theta: float = 0.5  # 0.5 = Crank-Nicolson, 1.0 = backward Euler
    # "consistent": standard P1 mass — O(h^2) nodal (symbol error
    # +h^2 k^4/12, measured).  "numerov": (1, 10, 1)/12 mass weights —
    # the compact 4th-order scheme (symbol (k^2 - k^4 h^2/12)/(1 - k^2
    # h^2/12) = k^2 + O(h^4)); requires uniform mesh, constant diffusion,
    # no advection, Dirichlet ends; reaction and load are Numerov-weighted
    # so the full operator keeps O(h^4).
    mass: str = "consistent"
    checkpoint: Optional[str] = None  # mid-march resume dir: the scan is
    # chunked and (step, carry, new ys slice) written atomically per
    # chunk (utils.checkpoint.scan_checkpointed; ys IO append-only,
    # O(S)); a matching on-disk state resumes from the last completed
    # chunk, bitwise-identical to the uninterrupted run.  The adaptive-dt
    # marches checkpoint through their own ``checkpoint=`` kwarg (the
    # carry includes the running t/dt, so the attempt sequence resumes
    # exactly); the distributed marches through this field (the sharded
    # carry round-trips the jit boundary — parallel/transient2d.py).
    checkpoint_chunk: int = 0  # steps per chunk (0 -> ~8 chunks)


def _march_scan(step, carry0, ts, problem, cfg, tcfg, tag: str):
    """``lax.scan`` or, when ``tcfg.checkpoint`` is set, the
    chunk-checkpointed resumable scan (``utils.checkpoint``)."""
    if not tcfg.checkpoint:
        return jax.lax.scan(step, carry0, ts)
    from ..utils import checkpoint as _ckpt

    fp = _ckpt.march_fingerprint(problem.name, cfg, tcfg, tag)
    return _ckpt.scan_checkpointed(
        step, carry0, ts, path=tcfg.checkpoint,
        chunk=tcfg.checkpoint_chunk, fingerprint=fp)


def _tri_apply(sub, main, sup, u):
    """A @ u for tridiagonal diagonals in the ops.tridiag convention."""
    return (main * u
            + sub * jnp.concatenate([u[:1] * 0, u[:-1]])
            + sup * jnp.concatenate([u[1:], u[:1] * 0]))


def _operator_and_mass(problem: Problem1D, nodes, cfg: SolverConfig):
    """Raw stiffness A (with Robin boundary mass) + mass M diagonals and
    the constant natural-BC load vector."""
    zero_f = lambda x: jnp.zeros_like(x)  # noqa: E731
    sub_a, main_a, sup_a, _ = assembly.assemble_p1(
        nodes, problem.a, problem.b, problem.c, zero_f,
        quad_order=cfg.fem_quad_order)
    sub_m, main_m, sup_m, _ = assembly.assemble_p1(
        nodes, None, None, lambda x: jnp.ones_like(x), zero_f,
        quad_order=cfg.fem_quad_order)
    dt_ = main_a.dtype
    ell = jnp.zeros_like(main_a)  # natural-BC load (time-independent)
    if problem.bc_left != "dirichlet":
        main_a = main_a.at[0].add(
            jnp.asarray(problem.robin_alpha_left, dt_))
        ell = ell.at[0].add(jnp.asarray(problem.g_left, dt_))
    if problem.bc_right != "dirichlet":
        main_a = main_a.at[-1].add(
            jnp.asarray(problem.robin_alpha_right, dt_))
        ell = ell.at[-1].add(jnp.asarray(problem.g_right, dt_))
    return (sub_a, main_a, sup_a), (sub_m, main_m, sup_m), ell


def _dirichlet_rows(problem, trip, rhs_val_left, rhs_val_right):
    """Identity rows at Dirichlet ends (no column elimination — the
    Thomas solve does not need symmetry)."""
    sub, main, sup = trip
    if problem.bc_left == "dirichlet":
        main = main.at[0].set(1.0)
        sup = sup.at[0].set(0.0)
    if problem.bc_right == "dirichlet":
        main = main.at[-1].set(1.0)
        sub = sub.at[-1].set(0.0)
    return sub, main, sup


def _load(nodes, f_t, t, quad_order):
    """Load vector of f(x, t) at a traced time t."""
    _, _, _, rhs = assembly.assemble_p1(
        nodes, None, None, None, lambda x: f_t(x, t),
        quad_order=quad_order)
    return rhs


def _numerov_setup(problem: Problem1D, nodes, f_t):
    """Compact-4th-order discretisation pieces (TransientConfig.mass =
    "numerov"): exact P1 stiffness + (1, 10, 1)/12-weighted mass applied
    to the time term, the reaction term, AND the load, so the whole
    semidiscrete operator is O(h^4) at the nodes."""
    if problem.b is not None:
        bad = bool(np.any(np.asarray(problem.b(nodes)) != 0.0))
        if bad:
            raise NotImplementedError("numerov mass requires b == 0")
    if not problem.constant_coeffs:
        raise NotImplementedError(
            "numerov mass requires constant coefficients")
    if problem.bc_left != "dirichlet" or problem.bc_right != "dirichlet":
        raise NotImplementedError(
            "numerov mass requires Dirichlet ends (the one-sided "
            "boundary correction is not implemented)")
    dtype = nodes.dtype
    N = nodes.shape[0]
    h = nodes[1] - nodes[0]
    a0 = jnp.asarray(problem.a(nodes[:1])[0], dtype)
    c0 = jnp.asarray(problem.c(nodes[:1])[0], dtype)
    # Numerov mass (h-scaled): sub = sup = h/12, main = 10h/12
    sub_m = jnp.full((N,), h / 12.0, dtype).at[0].set(0.0)
    sup_m = jnp.full((N,), h / 12.0, dtype).at[-1].set(0.0)
    main_m = jnp.full((N,), 10.0 * h / 12.0, dtype)
    Mm = (sub_m, main_m, sup_m)
    # exact P1 stiffness of -a u'' + Numerov-weighted reaction
    sub_a = jnp.full((N,), -a0 / h, dtype).at[0].set(0.0) + c0 * sub_m
    sup_a = jnp.full((N,), -a0 / h, dtype).at[-1].set(0.0) + c0 * sup_m
    main_a = jnp.full((N,), 2.0 * a0 / h, dtype) + c0 * main_m
    A = (sub_a, main_a, sup_a)

    def load(t):
        return _tri_apply(*Mm, f_t(nodes, t))

    return A, Mm, jnp.zeros((N,), dtype), load


class TransientSolution(NamedTuple):
    nodes: jnp.ndarray  # [N]
    fem_values: jnp.ndarray  # [N] at t_final
    coeffs: Optional[jnp.ndarray]  # [E, M] enhanced (hybrid_march only)
    t_final: float


def fem_march(problem: TransientProblem1D, cfg: SolverConfig,
              tcfg: TransientConfig):
    """P1 theta-scheme march; returns nodal values at t_final."""
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + th * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)

    def step(u, t):
        r = (_tri_apply(*Mm, u) - (1.0 - th) * dt * _tri_apply(*A, u)
             + dt * (th * load(t + dt) + (1.0 - th) * load(t) + ell))
        if p.bc_left == "dirichlet":
            r = r.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            r = r.at[-1].set(g_r)
        return tridiag.solve(*lhs, r, method=cfg.tridiag_method), None

    u0 = problem.u0(nodes).astype(dtype)
    if p.bc_left == "dirichlet":
        u0 = u0.at[0].set(g_l)
    if p.bc_right == "dirichlet":
        u0 = u0.at[-1].set(g_r)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt
    uN, _ = _march_scan(step, u0, ts, problem, cfg, tcfg, "fem_march")
    return TransientSolution(nodes, uN, None, tcfg.t_final)


def _shared_cn_operators(problem: TransientProblem1D, cfg: SolverConfig,
                         dt: float):
    """Host-f64 shared CN collocation operator and companions."""
    p = problem.elliptic
    if not p.constant_coeffs:
        raise NotImplementedError(
            "hybrid_march shares its CN operator across elements "
            "(uniform mesh, constant coefficients only)")
    x0, x1 = p.domain
    h = (x1 - x0) / (cfg.num_nodes - 1)
    V0, V1, V2 = legendre.collocation_vandermonde_host(cfg.M, cfg.n_colloc)
    t = np.linspace(-1.0, 1.0, cfg.n_colloc)
    xc = x0 + (t + 1.0) * 0.5 * h
    a2, a1, a0 = p.colloc_coeffs(jnp.asarray(xc))
    a2, a1, a0 = (np.asarray(v, np.float64) for v in (a2, a1, a0))
    scale = 2.0 / h
    D_L = (a2[:, None] * scale**2 * V2 + a1[:, None] * scale * V1
           + a0[:, None] * V0)
    D_CN = (2.0 / dt) * V0 + D_L
    B = np.stack([V0[0], V0[-1]])
    shared = kkt.precompute_shared_host(D_CN, B, cfg.gamma,
                                        cfg.jnp_dtype())
    W0pinv = np.linalg.pinv(V0)  # least-squares u0 projection
    return shared, D_L, V0, W0pinv


def hybrid_march(problem: TransientProblem1D, cfg: SolverConfig,
                 tcfg: TransientConfig):
    """LSSVR-enhanced Crank-Nicolson march (see module docstring).

    Each step: one tridiagonal P1 step (traces) + two batched matmuls for
    the collocated CN rhs from the previous coefficients + the shared
    affine-map solve.  Returns coefficients at t_final; evaluate with
    ``ops.eval.evaluate``.
    """
    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march collocates the Crank-Nicolson "
                         "update; theta must be 0.5")
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    E = cfg.num_nodes - 1
    dt = tcfg.t_final / tcfg.n_steps
    shared, D_L64, V064, W0pinv64 = _shared_cn_operators(problem, cfg, dt)
    D_L = jnp.asarray(D_L64, dtype)
    V0 = jnp.asarray(V064, dtype)

    # FEM march pieces (trace provider)
    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + 0.5 * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)

    # per-element collocation coordinates [E, C]
    xl = nodes[:-1]
    h = nodes[1] - nodes[0]
    tc = legendre.collocation_points(cfg.n_colloc, dtype=dtype)
    xc = xl[:, None] + 0.5 * h * (tc[None, :] + 1.0)
    hi = jax.lax.Precision.HIGHEST

    def fem_step(u, t):
        r = (_tri_apply(*Mm, u) - 0.5 * dt * _tri_apply(*A, u)
             + dt * (0.5 * load(t + dt) + 0.5 * load(t) + ell))
        if p.bc_left == "dirichlet":
            r = r.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            r = r.at[-1].set(g_r)
        return tridiag.solve(*lhs, r, method=cfg.tridiag_method)

    def step(carry, t):
        u, w = carry
        u1 = fem_step(u, t)
        # traces at t+dt (Dirichlet ends take exact data, the 1D
        # _dirichlet_consistent semantics)
        u_l = u1[:-1]
        u_r = u1[1:]
        if p.bc_left == "dirichlet":
            u_l = u_l.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            u_r = u_r.at[-1].set(g_r)
        bc = jnp.stack([u_l, u_r], axis=-1)
        # collocated CN rhs: (2/dt) u^n - L u^n + f^n + f^{n+1}
        f_rows = (jnp.dot(w, ((2.0 / dt) * V0 - D_L).T, precision=hi)
                  + problem.f(xc, t) + problem.f(xc, t + dt))
        w1, _ = kkt.solve_primal_shared(shared, f_rows, bc)
        return (u1, w1), None

    # initial state: P1 nodal restriction + per-element least-squares fit
    u0 = problem.u0(nodes).astype(dtype)
    w0 = jnp.dot(problem.u0(xc).astype(dtype),
                 jnp.asarray(W0pinv64, dtype).T, precision=hi)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt
    (uN, wN), _ = _march_scan(step, (u0, w0), ts, problem, cfg, tcfg,
                              "hybrid_march")
    return TransientSolution(nodes, uN, wN, tcfg.t_final)


def heat_1d() -> TransientProblem1D:
    """u_t - u_xx = (pi^2 - 1) e^{-t} sin(pi x), u(+-1) = 0,
    u0 = sin(pi x); exact u = e^{-t} sin(pi x)."""
    pi = jnp.pi
    from .problems import poisson_1d

    return TransientProblem1D(
        name="heat_1d",
        elliptic=dataclasses.replace(poisson_1d(),
                                     name="heat_1d_operator"),
        f=lambda x, t: (pi**2 - 1.0) * jnp.exp(-t) * jnp.sin(pi * x),
        u0=lambda x: jnp.sin(pi * x),
        exact=lambda x, t: jnp.exp(-t) * jnp.sin(pi * x),
    )


def heat_robin_1d(alpha: float = 1.0) -> TransientProblem1D:
    """u_t - u_xx + u = f with Robin ends whose data is TIME-INDEPENDENT:
    exact u = cos(pi x) + e^{-t} sin^2(pi x) (the decaying part has zero
    value and zero slope at x = +-1, so the Robin data stays that of the
    steady cos(pi x) part)."""
    pi = jnp.pi
    from .problems import robin_1d

    def exact(x, t):
        return jnp.cos(pi * x) + jnp.exp(-t) * jnp.sin(pi * x) ** 2

    def f(x, t):
        s2 = jnp.sin(pi * x) ** 2
        # u_t = -e^{-t} s2 ; u_xx = -pi^2 cos + e^{-t} * 2 pi^2 cos(2 pi x)
        uxx = (-pi**2 * jnp.cos(pi * x)
               + jnp.exp(-t) * 2.0 * pi**2 * jnp.cos(2.0 * pi * x))
        return -jnp.exp(-t) * s2 - uxx + exact(x, t)

    return TransientProblem1D(
        name="heat_robin_1d",
        elliptic=dataclasses.replace(robin_1d(alpha),
                                     name="heat_robin_1d_operator"),
        f=f,
        u0=lambda x: jnp.cos(pi * x) + jnp.sin(pi * x) ** 2,
        exact=exact,
    )


TRANSIENT_REGISTRY = {
    "heat_1d": heat_1d,
    "heat_robin_1d": heat_robin_1d,
}


# --------------------------------------------------------------- 2D


@dataclasses.dataclass(frozen=True)
class TransientProblem2D:
    """u_t + L u = f(x, y, t) on a rectangle; L (and BCs) a Problem2D."""

    name: str
    elliptic: "object"  # models.hybrid2d.Problem2D
    f: Callable  # f(x, y, t)
    u0: Callable  # u0(x, y)
    exact: Optional[Callable] = None  # exact(x, y, t)


def _check_2d_dirichlet(p):
    if any(t != "dirichlet" for t in p.bc_edges):
        raise NotImplementedError(
            "2D transient marches support all-Dirichlet edges")
    if p.a_var is not None:
        raise NotImplementedError(
            "2D transient marches require constant coefficients")


class TransientSolution2D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    fem_values: jnp.ndarray  # [ny+1, nx+1] at t_final
    coeffs: Optional[jnp.ndarray]  # [ny, nx, M, M] (hybrid_march_2d)
    t_final: float
    cg_iters: jnp.ndarray


def _numerov_locals_2d(hx, hy, a0, c):
    """Tensor Numerov local 4x4s — shared with the steady coarse='compact'
    option; see ``ops.assembly2d.q1_numerov_locals``."""
    from ..ops.assembly2d import q1_numerov_locals

    return q1_numerov_locals(hx, hy, a0, c)


def _fem_march_pieces_2d(p, cfg, tcfg):
    from ..ops import assembly2d

    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    if tcfg.mass == "numerov":
        if p.b != (0.0, 0.0):
            raise NotImplementedError("numerov mass requires b == 0")
        K_A_np, K_M_np = _numerov_locals_2d(hx, hy, p.a0, p.c)
        K_A = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K_A = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, p.a0, p.c, *p.b), dtype)
        K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    K_lhs = K_M + th * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    interior = jnp.zeros((cfg.ny + 1, cfg.nx + 1), bool
                         ).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y) * jnp.ones_like(X))
    diag = assembly2d.stiffness_diag((cfg.ny + 1, cfg.nx + 1), K_lhs,
                                     dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    return (dtype, hx, hy, dt, th, K_A, K_M, K_lhs, xs, ys, interior,
            u_bc, M_inv)


def _fem_step_2d(problem, p, cfg, pieces, numerov=False):
    """One theta-step closure: u^n (full grid incl. g boundary) -> u^{n+1}."""
    from ..ops import assembly2d, cg

    (dtype, hx, hy, dt, th, K_A, K_M, K_lhs, xs, ys, interior, u_bc,
     M_inv) = pieces
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def apply_free(v):
        return jnp.where(interior,
                         assembly2d.apply_stiffness(v * interior, K_lhs),
                         0.0)

    if numerov:
        X, Y = jnp.meshgrid(xs, ys)

        def load_at(t):
            # Numerov-weighted NODAL load (the (1,10,1)/12^2 tensor
            # weights are part of the 4th-order consistency)
            return assembly2d.apply_stiffness(
                problem.f(X, Y, t) * jnp.ones_like(X), K_M)
    else:
        def load_at(t):
            return assembly2d.assemble_load(
                xs, ys, lambda x, y: problem.f(x, y, t))

    def step(u, t):
        load = th * load_at(t + dt) + (1.0 - th) * load_at(t)
        r = (assembly2d.apply_stiffness(u, K_M)
             - (1.0 - th) * dt * assembly2d.apply_stiffness(u, K_A)
             + dt * load)
        # boundary data is time-independent: lhs row for boundary nodes
        # is handled by masking (solve for the interior increment over
        # the Dirichlet lift)
        rhs = jnp.where(interior, r - assembly2d.apply_stiffness(
            u_bc, K_lhs), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return u_bc + jnp.where(interior, res.x, 0.0), res.iters

    return step


def fem_march_2d(problem: TransientProblem2D, cfg, tcfg: TransientConfig):
    """Q1 theta-scheme march on structured quads: per step one
    Jacobi-preconditioned CG solve of (M + th dt A), the whole loop a
    single lax.scan (all-Dirichlet edges, constant coefficients)."""
    p = problem.elliptic
    _check_2d_dirichlet(p)
    pieces = _fem_march_pieces_2d(p, cfg, tcfg)
    dtype, xs, ys, interior, u_bc = (pieces[0], pieces[8], pieces[9],
                                     pieces[10], pieces[11])
    dt = pieces[3]
    step = _fem_step_2d(problem, p, cfg, pieces,
                        numerov=tcfg.mass == 'numerov')
    X, Y = jnp.meshgrid(xs, ys)
    u0 = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                   ).astype(dtype)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt

    def scan_step(u, t):
        u1, iters = step(u, t)
        return u1, iters

    uN, iters = _march_scan(scan_step, u0, ts, problem, cfg, tcfg,
                            "fem_march_2d")
    return TransientSolution2D(xs, ys, uN, None, tcfg.t_final,
                               jnp.max(iters))


def _mass_dl_b_2d(p, cfg):
    """Host f64 (Mass, D_L, B, t_int, bpts) on the shared element —
    the common ingredients of the enhanced CN and Newmark marches."""
    from ..ops import legendre as leg
    from .hybrid2d import _boundary_coords

    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    M, C = cfg.M, cfg.n_colloc
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = leg.vandermonde_host(t_int, M)
    sx, sy = 2.0 / hx, 2.0 / hy
    Mass = np.einsum("yk,xl->yxkl", V0, V0).reshape(C * C, M * M)
    D_L = -p.a0 * (
        sx * sx * np.einsum("yk,xl->yxkl", V0, V2)
        + sy * sy * np.einsum("yk,xl->yxkl", V2, V0)
    ).reshape(C * C, M * M)
    bx, by = p.b
    if bx != 0.0:
        D_L = D_L + bx * sx * np.einsum(
            "yk,xl->yxkl", V0, V1).reshape(C * C, M * M)
    if by != 0.0:
        D_L = D_L + by * sy * np.einsum(
            "yk,xl->yxkl", V1, V0).reshape(C * C, M * M)
    if p.c != 0.0:
        D_L = D_L + p.c * Mass
    bpts = _boundary_coords(M)
    V0y_b = leg.vandermonde_host(bpts[:, 0], M)[0]
    V0x_b = leg.vandermonde_host(bpts[:, 1], M)[0]
    B = np.einsum("pk,pl->pkl", V0y_b, V0x_b).reshape(-1, M * M)
    return Mass, D_L, B, t_int, bpts


def _shared_cn_ops_2d(p, cfg, dt):
    """Host f64 shared CN operators for the 2D enhanced march:
    (shared LSE map of D_CN = (2/dt)·Mass + D_L, projection map of Mass
    for the u0 fit, rhs operator (2/dt)·Mass - D_L, t_int, bpts).  The
    (2/dt) mass shift also removes the steady 2D Laplacian's
    discrete-harmonic pathology, so the plain LSE factorisation is
    well-posed."""
    dtype = cfg.jnp_dtype()
    Mass, D_L, B, t_int, bpts = _mass_dl_b_2d(p, cfg)
    D_CN = (2.0 / dt) * Mass + D_L
    shared = kkt.precompute_shared_lse_host(D_CN, B, dtype)
    proj = kkt.precompute_shared_lse_host(Mass, B, dtype)  # u0 fit
    R_op = jnp.asarray((2.0 / dt) * Mass - D_L, dtype)
    return shared, proj, R_op, t_int, bpts


def hybrid_march_2d(problem: TransientProblem2D, cfg,
                    tcfg: TransientConfig, trace_lift: int = 0):
    """LSSVR-enhanced 2D Crank-Nicolson march: per element a tensor-
    Legendre polynomial advanced by collocating the CN update at interior
    points with the trace pinned to the Q1 march (the 2D lift of
    ``hybrid_march``).  D_CN = (2/dt)·Mass + D_L is shared across
    elements, factorised once on the host in f64 via the null-space LSE,
    so each step is the Q1 CG step plus four batched MXU matmuls."""
    from .hybrid2d import _element_data_2d

    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march_2d collocates the Crank-Nicolson "
                         "update; theta must be 0.5")
    p = problem.elliptic
    _check_2d_dirichlet(p)
    pieces = _fem_march_pieces_2d(p, cfg, tcfg)
    dtype, hx, hy, dt = pieces[0], pieces[1], pieces[2], pieces[3]
    xs, ys, interior, u_bc = pieces[8], pieces[9], pieces[10], pieces[11]
    M, C = cfg.M, cfg.n_colloc
    shared, proj, R_op, t_int, bpts = _shared_cn_ops_2d(p, cfg, dt)

    # collocation coordinates, row-major (iy, ix) x (cy, cx) as in
    # _element_data_2d / prepare_shared_2d
    t_j = jnp.asarray(t_int, dtype)
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx * t_j[None, :]  # [nx, C]
    yq = ym[:, None] + 0.5 * hy * t_j[None, :]  # [ny, C]
    E = cfg.nx * cfg.ny
    hi = jax.lax.Precision.HIGHEST
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)

    def f_rows_at(t):
        F = problem.f(xq[None, :, None, :], yq[:, None, :, None], t)
        F = F * jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
        return F.reshape(E, C * C)

    fem_step = _fem_step_2d(problem, p, cfg, pieces,
                        numerov=tcfg.mass == 'numerov')

    def scan_step(carry, t):
        u, w = carry
        u1, iters = fem_step(u, t)
        # trace_lift >= 2: tangential-Lagrange lifted traces of the
        # marching grid — with the numerov mass the O(h^4) NODAL values
        # carry to an O(h^4) enhanced Linf (measured 1.06e-2 -> 6.2e-5
        # at 16^2), the transient analog of the steady trace_lift.
        _, bc_rows, _ = _element_data_2d(p, cfg, xs, ys, u1, t_int_j,
                                         bpts_j, trace_lift=trace_lift)
        rhs = (jnp.dot(w, R_op.T, precision=hi)
               + f_rows_at(t) + f_rows_at(t + dt))
        w1, _ = kkt.solve_primal_shared(shared, rhs, bc_rows)
        return (u1, w1), iters

    X, Y = jnp.meshgrid(xs, ys)
    u0g = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                    ).astype(dtype)
    # initial per-element fit: values at interior colloc + trace of u0
    F0 = problem.u0(xq[None, :, None, :] * jnp.ones((cfg.ny, 1, 1, 1)),
                    yq[:, None, :, None] * jnp.ones((1, cfg.nx, 1, 1)))
    f0_rows = (F0 * jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
               ).reshape(E, C * C)
    _, bc0, _ = _element_data_2d(p, cfg, xs, ys, u0g, t_int_j, bpts_j,
                                 trace_lift=trace_lift)
    w0, _ = kkt.solve_primal_shared(proj, f0_rows, bc0)
    dt_j = jnp.asarray(dt, dtype)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt_j
    (uN, wN), iters = _march_scan(scan_step, (u0g, w0), ts, problem,
                                  cfg, tcfg, "hybrid_march_2d")
    return TransientSolution2D(
        xs, ys, uN, wN.reshape(cfg.ny, cfg.nx, M, M), tcfg.t_final,
        jnp.max(iters))


def heat_2d() -> TransientProblem2D:
    """u_t - Lap u = (2 pi^2 - 1) e^{-t} sin sin, u = 0 on the boundary;
    exact u = e^{-t} sin(pi x) sin(pi y)."""
    pi = jnp.pi
    from .hybrid2d import poisson_2d

    return TransientProblem2D(
        name="heat_2d",
        elliptic=dataclasses.replace(poisson_2d(),
                                     name="heat_2d_operator"),
        f=lambda x, y, t: (2.0 * pi**2 - 1.0) * jnp.exp(-t)
        * jnp.sin(pi * x) * jnp.sin(pi * y),
        u0=lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y),
        exact=lambda x, y, t: jnp.exp(-t) * jnp.sin(pi * x)
        * jnp.sin(pi * y),
    )


# --------------------------------------------------------------- 3D


@dataclasses.dataclass(frozen=True)
class TransientProblem3D:
    """u_t + L u = f(x, y, z, t) on a box; L (and BCs) a Problem3D."""

    name: str
    elliptic: "object"  # models.hybrid3d.Problem3D
    f: Callable  # f(x, y, z, t)
    u0: Callable  # u0(x, y, z)
    exact: Optional[Callable] = None  # exact(x, y, z, t)


class TransientSolution3D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    zs: jnp.ndarray
    fem_values: jnp.ndarray  # [nz+1, ny+1, nx+1] at t_final
    coeffs: Optional[jnp.ndarray]  # [nz, ny, nx, M, M, M]
    t_final: float
    cg_iters: jnp.ndarray


def _check_3d_dirichlet(p):
    if any(t != "dirichlet" for t in p.bc_faces):
        raise NotImplementedError(
            "3D transient marches support all-Dirichlet faces")
    if p.a_var is not None:
        raise NotImplementedError(
            "3D transient marches require constant coefficients")


def _locals_3d(hx, hy, hz, p, mass):
    """Local 8x8 (K_A, K_M): the Q1 hex operators are exact tensor
    products of the 1D P1 matrices (assembly3d), so the Numerov
    (1,10,1)/12 mass tensorises like 2D."""
    from ..ops import assembly3d

    m1c = lambda h: (h / 6.0) * np.array([[2.0, 1.0], [1.0, 2.0]])  # noqa: E731,E501

    def kron3(a, b, c):
        return np.kron(a, np.kron(b, c))

    if mass == "numerov":
        if p.b != (0.0, 0.0, 0.0):
            raise NotImplementedError("numerov mass requires b == 0")
        K_A, K_M = assembly3d.q1_numerov_locals_3d(hx, hy, hz, p.a0, p.c)
    else:
        K_M = kron3(m1c(hz), m1c(hy), m1c(hx))
        K_A = np.asarray(assembly3d.q1_local_operator_3d(
            hx, hy, hz, p.a0, p.c, *p.b))
    return K_A, K_M


def fem_march_3d(problem: TransientProblem3D, cfg,
                 tcfg: TransientConfig):
    """Q1 hex theta-scheme march (3D lift of ``fem_march_2d``): per step
    one Jacobi-CG solve of the mass-dominated system, one lax.scan."""
    from ..ops import assembly3d, cg

    p = problem.elliptic
    _check_3d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + th * dt * K_A
    K_rhs = K_M - (1.0 - th) * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_lhs, dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    bc_term = jnp.where(interior,
                        assembly3d.apply_stiffness_3d(u_bc, K_lhs), 0.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def apply_free(v):
        return jnp.where(
            interior,
            assembly3d.apply_stiffness_3d(v * interior, K_lhs), 0.0)

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly3d.apply_stiffness_3d(
                problem.f(X, Y, Z, t) * ones, K_M)
    else:
        def load_at(t):
            return assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    def step(u, t):
        r = (assembly3d.apply_stiffness_3d(u, K_rhs)
             + dt * (th * load_at(t + dt) + (1.0 - th) * load_at(t)))
        rhs = jnp.where(interior, r, 0.0) - bc_term
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return u_bc + jnp.where(interior, res.x, 0.0), res.iters

    u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                    ).astype(dtype)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    uN, iters = _march_scan(step, u0g, ts, problem, cfg, tcfg,
                            "fem_march_3d")
    return TransientSolution3D(xs, ys, zs, uN, None, tcfg.t_final,
                               jnp.max(iters))


def _mass_dl_b_3d(p, cfg):
    """Host f64 (Mass, D_L, B, t_int, spts) on the shared hex — common
    ingredients of the enhanced 3D CN and Newmark marches."""
    from ..ops import legendre as leg
    from .hybrid3d import _surface_coords

    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    M, C = cfg.M, cfg.n_colloc
    t_int = np.linspace(-1.0, 1.0, C + 2)[1:-1]
    V0, V1, V2 = leg.vandermonde_host(t_int, M)
    sx, sy, sz = 2.0 / hx, 2.0 / hy, 2.0 / hz

    def t3(Az, Ay, Ax):
        return np.einsum("zk,yl,xm->zyxklm", Az, Ay, Ax).reshape(
            C * C * C, M * M * M)

    Mass = t3(V0, V0, V0)
    D_L = -p.a0 * (sx * sx * t3(V0, V0, V2) + sy * sy * t3(V0, V2, V0)
                   + sz * sz * t3(V2, V0, V0))
    bx, by, bz = p.b
    if bx != 0.0:
        D_L = D_L + bx * sx * t3(V0, V0, V1)
    if by != 0.0:
        D_L = D_L + by * sy * t3(V0, V1, V0)
    if bz != 0.0:
        D_L = D_L + bz * sz * t3(V1, V0, V0)
    if p.c != 0.0:
        D_L = D_L + p.c * Mass
    spts = _surface_coords(M)
    Vz_b = leg.vandermonde_host(spts[:, 0], M)[0]
    Vy_b = leg.vandermonde_host(spts[:, 1], M)[0]
    Vx_b = leg.vandermonde_host(spts[:, 2], M)[0]
    B = np.einsum("pk,pl,pm->pklm", Vz_b, Vy_b, Vx_b).reshape(
        -1, M * M * M)
    return Mass, D_L, B, t_int, spts


def _shared_cn_ops_3d(p, cfg, dt):
    """Host f64 shared CN operators for the 3D enhanced march (the 3D
    lift of ``_shared_cn_ops_2d``): (shared LSE map of D_CN, projection
    map of Mass, rhs operator (2/dt)·Mass - D_L, t_int, spts)."""
    dtype = cfg.jnp_dtype()
    Mass, D_L, B, t_int, spts = _mass_dl_b_3d(p, cfg)
    D_CN = (2.0 / dt) * Mass + D_L
    shared = kkt.precompute_shared_lse_host(D_CN, B, dtype)
    proj = kkt.precompute_shared_lse_host(Mass, B, dtype)
    R_op = jnp.asarray((2.0 / dt) * Mass - D_L, dtype)
    return shared, proj, R_op, t_int, spts


def hybrid_march_3d(problem: TransientProblem3D, cfg,
                    tcfg: TransientConfig, trace_lift: int = 0):
    """LSSVR-enhanced 3D CN march: per-hex tensor-Legendre polynomial
    advanced by collocating the CN update at interior points, trace
    pinned to the Q1 hex march at the surface points (3D lift of
    ``hybrid_march_2d``; the enhanced Linf floor is the trilinear TRACE
    error O(h^2), same mechanism as 2D)."""
    from .hybrid3d import _element_data_3d

    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march_3d collocates the Crank-Nicolson "
                         "update; theta must be 0.5")
    p = problem.elliptic
    _check_3d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    M, C = cfg.M, cfg.n_colloc
    shared, proj, R_op, t_int, spts = _shared_cn_ops_3d(p, cfg, dt)

    # FEM march pieces (trace provider) — reuse the fem_march_3d step by
    # marching both states in one scan
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    t_j = jnp.asarray(t_int, dtype)
    xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)  # [nx, C]
    yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
    E = cfg.nx * cfg.ny * cfg.nz
    hi = jax.lax.Precision.HIGHEST
    ones6 = jnp.ones((cfg.nz, cfg.ny, cfg.nx, C, C, C), dtype)

    def f_rows_at(t):
        F = problem.f(
            xq[None, None, :, None, None, :],
            yq[None, :, None, None, :, None],
            zq[:, None, None, :, None, None], t)
        return (F * ones6).reshape(E, C * C * C)

    # one combined scan: Q1 march + enhanced coefficients
    from ..ops import assembly3d

    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + 0.5 * dt * K_A
    K_rhs = K_M - 0.5 * dt * K_A
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_lhs, dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    bc_term = jnp.where(interior,
                        assembly3d.apply_stiffness_3d(u_bc, K_lhs), 0.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def apply_free(v):
        return jnp.where(
            interior,
            assembly3d.apply_stiffness_3d(v * interior, K_lhs), 0.0)

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly3d.apply_stiffness_3d(
                problem.f(X, Y, Z, t) * ones, K_M)
    else:
        def load_at(t):
            return assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    from ..ops import cg

    t_int_j = jnp.asarray(t_int)
    spts_j = jnp.asarray(spts)

    def scan_step(carry, t):
        u, w = carry
        r = (assembly3d.apply_stiffness_3d(u, K_rhs)
             + dt * 0.5 * (load_at(t + dt) + load_at(t)))
        rhs = jnp.where(interior, r, 0.0) - bc_term
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        u1 = u_bc + jnp.where(interior, res.x, 0.0)
        _, bc_rows, _ = _element_data_3d(p, cfg, xs, ys, zs, u1,
                                         t_int_j, spts_j,
                                         trace_lift=trace_lift)
        rhs_w = (jnp.dot(w, R_op.T, precision=hi)
                 + f_rows_at(t) + f_rows_at(t + dt))
        w1, _ = kkt.solve_primal_shared(shared, rhs_w, bc_rows)
        return (u1, w1), res.iters

    u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                    ).astype(dtype)
    F0 = problem.u0(xq[None, None, :, None, None, :]
                    * jnp.ones((cfg.nz, cfg.ny, 1, 1, 1, 1)),
                    yq[None, :, None, None, :, None]
                    * jnp.ones((cfg.nz, 1, cfg.nx, 1, 1, 1)),
                    zq[:, None, None, :, None, None]
                    * jnp.ones((1, cfg.ny, cfg.nx, 1, 1, 1)))
    f0 = (F0 * ones6).reshape(E, C * C * C)
    _, bc0, _ = _element_data_3d(p, cfg, xs, ys, zs, u0g, t_int_j,
                                 spts_j, trace_lift=trace_lift)
    w0, _ = kkt.solve_primal_shared(proj, f0, bc0)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, wN), iters = _march_scan(scan_step, (u0g, w0), ts, problem,
                                  cfg, tcfg, "hybrid_march_3d")
    return TransientSolution3D(
        xs, ys, zs, uN, wN.reshape(cfg.nz, cfg.ny, cfg.nx, M, M, M),
        tcfg.t_final, jnp.max(iters))


def heat_3d() -> TransientProblem3D:
    """u_t - Lap u = (3 pi^2 - 1) e^{-t} sin sin sin, u = 0 on the
    boundary; exact u = e^{-t} sin(pi x) sin(pi y) sin(pi z)."""
    pi = jnp.pi
    from .hybrid3d import poisson_3d

    return TransientProblem3D(
        name="heat_3d",
        elliptic=dataclasses.replace(poisson_3d(),
                                     name="heat_3d_operator"),
        f=lambda x, y, z, t: (3.0 * pi**2 - 1.0) * jnp.exp(-t)
        * jnp.sin(pi * x) * jnp.sin(pi * y) * jnp.sin(pi * z),
        u0=lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
        exact=lambda x, y, z, t: jnp.exp(-t) * jnp.sin(pi * x)
        * jnp.sin(pi * y) * jnp.sin(pi * z),
    )


# --------------------------------------------------------------- waves


@dataclasses.dataclass(frozen=True)
class WaveProblem1D:
    """u_tt + L u = f(x, t); L (and BCs) a Problem1D; initial (u0, v0)."""

    name: str
    elliptic: Problem1D
    f: Callable  # f(x, t)
    u0: Callable
    v0: Callable
    exact: Optional[Callable] = None  # exact(x, t)


def wave_1d() -> WaveProblem1D:
    """Free vibration u_tt = u_xx, u(+-1) = 0, u0 = sin(pi x), v0 = 0;
    exact u = cos(pi t) sin(pi x) (f = 0 — also the energy-conservation
    oracle for Newmark beta = 1/4)."""
    pi = jnp.pi
    from .problems import poisson_1d

    return WaveProblem1D(
        name="wave_1d",
        elliptic=dataclasses.replace(poisson_1d(),
                                     name="wave_1d_operator"),
        f=lambda x, t: jnp.zeros_like(x),
        u0=lambda x: jnp.sin(pi * x),
        v0=lambda x: jnp.zeros_like(x),
        exact=lambda x, t: jnp.cos(pi * t) * jnp.sin(pi * x),
    )


def wave_march(problem: WaveProblem1D, cfg: SolverConfig,
               tcfg: TransientConfig, beta: float = 0.25,
               gamma_n: float = 0.5):
    """Newmark-beta march for u_tt + L u = f (unconditionally stable at
    beta = 1/4, gamma = 1/2; O(dt^2)): per step one tridiagonal solve of
    (M + beta dt^2 A) for the new acceleration.  ``tcfg.mass`` selects
    the consistent or Numerov mass exactly as in ``fem_march``."""
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    dt = tcfg.t_final / tcfg.n_steps
    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + beta * dt * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)
    free = jnp.ones_like(nodes, bool)
    if p.bc_left == "dirichlet":
        free = free.at[0].set(False)
    if p.bc_right == "dirichlet":
        free = free.at[-1].set(False)

    def accel(u, t):
        # M a = F - A u  (free rows; boundary rows a = 0 since the
        # Dirichlet data is time-independent)
        rhs = jnp.where(free, load(t) + ell - _tri_apply(*A, u), 0.0)
        Ml = _dirichlet_rows(p, Mm, None, None)
        return tridiag.solve(*Ml, rhs, method=cfg.tridiag_method)

    def step(carry, t):
        u, v, a = carry
        pred_u = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = jnp.where(free,
                        load(t + dt) + ell - _tri_apply(*A, pred_u), 0.0)
        a1 = tridiag.solve(*lhs, rhs, method=cfg.tridiag_method)
        u1 = pred_u + beta * dt * dt * a1
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        if p.bc_left == "dirichlet":
            u1 = u1.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            u1 = u1.at[-1].set(g_r)
        return (u1, v1, a1), None

    u0 = problem.u0(nodes).astype(dtype)
    if p.bc_left == "dirichlet":
        u0 = u0.at[0].set(g_l)
    if p.bc_right == "dirichlet":
        u0 = u0.at[-1].set(g_r)
    v0 = jnp.where(free, problem.v0(nodes), 0.0).astype(dtype)
    a0 = accel(u0, jnp.asarray(0.0, dtype))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _), _ = _march_scan(step, (u0, v0, a0), ts, problem, cfg,
                                 tcfg, "wave_march")
    return TransientSolution(nodes, uN, None, tcfg.t_final), vN


def hybrid_wave_march(problem: WaveProblem1D, cfg: SolverConfig,
                      tcfg: TransientConfig, beta: float = 0.25,
                      gamma_n: float = 0.5):
    """LSSVR-enhanced Newmark march: the element polynomials carry
    (u, v, a) coefficient triples; each step collocates
    a^{n+1} + L u^{n+1} = f^{n+1} with the Newmark closure
    u^{n+1} = pred + beta dt^2 a^{n+1}, i.e. ONE shared-operator solve
    for the acceleration coefficients with
    D = V0 + beta dt^2 D_L and trace pinning transferred to the
    acceleration: a_trace = (u_fem_trace - pred_trace)/(beta dt^2)."""
    p = problem.elliptic
    if p.bc_left != "dirichlet" or p.bc_right != "dirichlet":
        raise NotImplementedError("hybrid_wave_march supports Dirichlet "
                                  "ends")
    if not p.constant_coeffs:
        raise NotImplementedError("hybrid_wave_march shares its operator "
                                  "(constant coefficients only)")
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    E = cfg.num_nodes - 1
    M, C = cfg.M, cfg.n_colloc
    dt = tcfg.t_final / tcfg.n_steps
    x0d, x1d = p.domain
    h = (x1d - x0d) / (cfg.num_nodes - 1)
    V0h, V1h, V2h = legendre.collocation_vandermonde_host(M, C)
    t_np = np.linspace(-1.0, 1.0, C)
    xc_np = x0d + (t_np + 1.0) * 0.5 * h
    a2, a1c, a0c = p.colloc_coeffs(jnp.asarray(xc_np))
    a2, a1c, a0c = (np.asarray(v, np.float64) for v in (a2, a1c, a0c))
    scale = 2.0 / h
    D_L64 = (a2[:, None] * scale**2 * V2h + a1c[:, None] * scale * V1h
             + a0c[:, None] * V0h)
    D_NM = V0h + beta * dt * dt * D_L64
    B = np.stack([V0h[0], V0h[-1]])
    shared = kkt.precompute_shared_host(D_NM, B, cfg.gamma, dtype)
    W0pinv = jnp.asarray(np.linalg.pinv(V0h), dtype)
    D_L = jnp.asarray(D_L64, dtype)
    Bj = jnp.asarray(B, dtype)
    hi = jax.lax.Precision.HIGHEST

    # FEM Newmark march (trace provider) reusing wave_march pieces
    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + beta * dt * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)
    free = jnp.ones_like(nodes, bool).at[0].set(False).at[-1].set(False)
    tc = legendre.collocation_points(C, dtype=dtype)
    xl = nodes[:-1]
    xc = xl[:, None] + 0.5 * h * (tc[None, :] + 1.0)

    def step(carry, t):
        u, v, a, wu, wv, wa = carry
        # FEM Newmark step
        pred_u = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = jnp.where(free,
                        load(t + dt) + ell - _tri_apply(*A, pred_u), 0.0)
        a1 = tridiag.solve(*lhs, rhs, method=cfg.tridiag_method)
        u1 = pred_u + beta * dt * dt * a1
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        u1 = u1.at[0].set(g_l).at[-1].set(g_r)
        # element polynomials: collocated Newmark acceleration solve
        w_pred = wu + dt * wv + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
        f_rows = (problem.f(xc, t + dt)
                  - jnp.dot(w_pred, D_L.T, precision=hi))
        u1_l = u1[:-1].at[0].set(g_l)
        u1_r = u1[1:].at[-1].set(g_r)
        pred_tr = jnp.dot(w_pred, Bj.T, precision=hi)  # [E, 2]
        bc = (jnp.stack([u1_l, u1_r], axis=-1) - pred_tr) / (
            beta * dt * dt)
        wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc)
        wu1 = w_pred + beta * dt * dt * wa1
        wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
        return (u1, v1, a1, wu1, wv1, wa1), None

    u0 = problem.u0(nodes).astype(dtype).at[0].set(g_l).at[-1].set(g_r)
    v0 = jnp.where(free, problem.v0(nodes), 0.0).astype(dtype)
    rhs0 = jnp.where(free, load(jnp.asarray(0.0, dtype)) + ell
                     - _tri_apply(*A, u0), 0.0)
    Ml = _dirichlet_rows(p, Mm, None, None)
    a0 = tridiag.solve(*Ml, rhs0, method=cfg.tridiag_method)
    wu0 = jnp.dot(problem.u0(xc).astype(dtype), W0pinv.T, precision=hi)
    wv0 = jnp.dot(problem.v0(xc).astype(dtype) * jnp.ones_like(xc),
                  W0pinv.T, precision=hi)
    # initial acceleration polynomials from the PDE: a0 = f - L u0
    fa0 = problem.f(xc, 0.0) - jnp.dot(wu0, D_L.T, precision=hi)
    wa0 = jnp.dot(fa0, W0pinv.T, precision=hi)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _, wuN, _, _), _ = _march_scan(
        step, (u0, v0, a0, wu0, wv0, wa0), ts, problem, cfg, tcfg,
        "hybrid_wave_march")
    return TransientSolution(nodes, uN, wuN, tcfg.t_final), vN


@dataclasses.dataclass(frozen=True)
class WaveProblem2D:
    """u_tt + L u = f(x, y, t); L (and BCs) a Problem2D."""

    name: str
    elliptic: "object"
    f: Callable
    u0: Callable
    v0: Callable
    exact: Optional[Callable] = None  # exact(x, y, t)


def wave_2d() -> WaveProblem2D:
    """Free vibration u_tt = Lap u, u0 = sin sin, v0 = 0; exact
    u = cos(sqrt(2) pi t) sin(pi x) sin(pi y)."""
    pi = jnp.pi
    from .hybrid2d import poisson_2d

    om = jnp.sqrt(2.0) * pi
    return WaveProblem2D(
        name="wave_2d",
        elliptic=dataclasses.replace(poisson_2d(),
                                     name="wave_2d_operator"),
        f=lambda x, y, t: jnp.zeros_like(x + y),
        u0=lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y),
        v0=lambda x, y: jnp.zeros_like(x + y),
        exact=lambda x, y, t: jnp.cos(om * t) * jnp.sin(pi * x)
        * jnp.sin(pi * y),
    )


def wave_march_2d(problem: WaveProblem2D, cfg, tcfg: TransientConfig,
                  beta: float = 0.25, gamma_n: float = 0.5):
    """Newmark-beta march on Q1 quads (2D lift of ``wave_march``): per
    step one Jacobi-CG solve of (M + beta dt^2 A) for the acceleration;
    consistent or tensor-Numerov mass via ``tcfg.mass``."""
    from ..ops import assembly2d, cg

    p = problem.elliptic
    _check_2d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    dt = tcfg.t_final / tcfg.n_steps
    if tcfg.mass == "numerov":
        if p.b != (0.0, 0.0):
            raise NotImplementedError("numerov mass requires b == 0")
        K_A_np, K_M_np = _numerov_locals_2d(hx, hy, p.a0, p.c)
        K_A = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K_A = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, p.a0, p.c, *p.b), dtype)
        K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    K_lhs = K_M + beta * dt * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    interior = jnp.zeros((cfg.ny + 1, cfg.nx + 1), bool
                         ).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y) * jnp.ones_like(X))
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def free_solve(K, rhs):
        def apply_free(v):
            return jnp.where(
                interior,
                assembly2d.apply_stiffness(v * interior, K), 0.0)

        diag = assembly2d.stiffness_diag((cfg.ny + 1, cfg.nx + 1), K,
                                         dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return jnp.where(interior, res.x, 0.0), res.iters

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly2d.apply_stiffness(
                problem.f(X, Y, t) * jnp.ones_like(X), K_M)
    else:
        def load_at(t):
            return assembly2d.assemble_load(
                xs, ys, lambda x, y: problem.f(x, y, t))

    def step(carry, t):
        u, v, a = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - assembly2d.apply_stiffness(pred, K_A)
        a1, iters = free_solve(K_lhs, rhs)
        u1 = u_bc + jnp.where(interior, pred + beta * dt * dt * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        return (u1, v1, a1), iters

    u0g = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                    ).astype(dtype)
    v0g = jnp.where(interior, problem.v0(X, Y) * jnp.ones_like(X), 0.0
                    ).astype(dtype)
    rhs0 = load_at(jnp.asarray(0.0, dtype)) \
        - assembly2d.apply_stiffness(u0g, K_A)
    a0g, _ = free_solve(K_M, rhs0)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _), iters = _march_scan(step, (u0g, v0g, a0g), ts,
                                     problem, cfg, tcfg, "wave_march_nd")
    return TransientSolution2D(xs, ys, uN, None, tcfg.t_final,
                               jnp.max(iters)), vN


@dataclasses.dataclass(frozen=True)
class WaveProblem3D:
    """u_tt + L u = f(x, y, z, t); L (and BCs) a Problem3D."""

    name: str
    elliptic: "object"
    f: Callable
    u0: Callable
    v0: Callable
    exact: Optional[Callable] = None


def wave_3d() -> WaveProblem3D:
    """Free vibration u_tt = Lap u on the cube; exact
    u = cos(sqrt(3) pi t) sin sin sin."""
    pi = jnp.pi
    from .hybrid3d import poisson_3d

    om = jnp.sqrt(3.0) * pi
    return WaveProblem3D(
        name="wave_3d",
        elliptic=dataclasses.replace(poisson_3d(),
                                     name="wave_3d_operator"),
        f=lambda x, y, z, t: jnp.zeros_like(x + y + z),
        u0=lambda x, y, z: jnp.sin(pi * x) * jnp.sin(pi * y)
        * jnp.sin(pi * z),
        v0=lambda x, y, z: jnp.zeros_like(x + y + z),
        exact=lambda x, y, z, t: jnp.cos(om * t) * jnp.sin(pi * x)
        * jnp.sin(pi * y) * jnp.sin(pi * z),
    )


def wave_march_3d(problem: WaveProblem3D, cfg, tcfg: TransientConfig,
                  beta: float = 0.25, gamma_n: float = 0.5):
    """Newmark-beta march on Q1 hexes (3D lift of ``wave_march_2d``)."""
    from ..ops import assembly3d, cg

    p = problem.elliptic
    _check_3d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + beta * dt * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def free_solve(K, rhs):
        def apply_free(v):
            return jnp.where(
                interior,
                assembly3d.apply_stiffness_3d(v * interior, K), 0.0)

        diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K, dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return jnp.where(interior, res.x, 0.0), res.iters

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly3d.apply_stiffness_3d(
                problem.f(X, Y, Z, t) * ones, K_M)
    else:
        def load_at(t):
            return assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    def step(carry, t):
        u, v, a = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - assembly3d.apply_stiffness_3d(pred, K_A)
        a1, iters = free_solve(K_lhs, rhs)
        u1 = u_bc + jnp.where(interior,
                              pred + beta * dt * dt * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        return (u1, v1, a1), iters

    u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                    ).astype(dtype)
    v0g = jnp.where(interior, problem.v0(X, Y, Z) * ones, 0.0
                    ).astype(dtype)
    rhs0 = load_at(jnp.asarray(0.0, dtype)) \
        - assembly3d.apply_stiffness_3d(u0g, K_A)
    a0g, _ = free_solve(K_M, rhs0)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _), iters = _march_scan(step, (u0g, v0g, a0g), ts,
                                     problem, cfg, tcfg, "wave_march_nd")
    return TransientSolution3D(xs, ys, zs, uN, None, tcfg.t_final,
                               jnp.max(iters)), vN


# ------------------------------------------------- semilinear (IMEX)
#
# Reaction-diffusion marching u_t + L u + s(u) = f(x, t): Crank-Nicolson
# on the stiff linear operator, Adams-Bashforth-2 extrapolation of the
# nonlinearity (IMEX "CNAB" — s^{n+1/2} ~ 1.5 s(u^n) - 0.5 s(u^{n-1}),
# first step AB1 by seeding s^{-1} = s(u^0); global O(dt^2)).  The
# IMPLICIT operator is exactly the linear heat march's (M + th dt A), so
# the enhanced variant reuses the shared CN affine map verbatim — the
# reaction enters only as explicit rhs terms: nodal group-FEM M s(u) on
# the P1/Q1 march (Numerov-weighted under mass="numerov", keeping
# O(h^4)), and s evaluated at interior collocation points from the
# previous element polynomial on the enhanced march (keeping the
# interior spectral, as in the steady two-level Newton of
# models/nonlinear.py).


@dataclasses.dataclass(frozen=True)
class SemilinearTransientProblem1D:
    """u_t + L u + s(u) = f(x, t); L (and BCs) a ``Problem1D``."""

    name: str
    elliptic: Problem1D
    s: Callable  # s(u), applied pointwise
    f: Callable  # f(x, t)
    u0: Callable
    exact: Optional[Callable] = None


def fem_march_semilinear(problem: SemilinearTransientProblem1D,
                         cfg: SolverConfig, tcfg: TransientConfig):
    """P1/Numerov IMEX CNAB march; returns nodal values at t_final."""
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + th * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)

    def step(carry, t):
        u, s_prev = carry
        s_n = problem.s(u)
        s_ex = 1.5 * s_n - 0.5 * s_prev  # AB2 at t + dt/2
        r = (_tri_apply(*Mm, u) - (1.0 - th) * dt * _tri_apply(*A, u)
             + dt * (th * load(t + dt) + (1.0 - th) * load(t) + ell)
             - dt * _tri_apply(*Mm, s_ex))
        if p.bc_left == "dirichlet":
            r = r.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            r = r.at[-1].set(g_r)
        u1 = tridiag.solve(*lhs, r, method=cfg.tridiag_method)
        return (u1, s_n), None

    u0 = problem.u0(nodes).astype(dtype)
    if p.bc_left == "dirichlet":
        u0 = u0.at[0].set(g_l)
    if p.bc_right == "dirichlet":
        u0 = u0.at[-1].set(g_r)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt
    (uN, _), _ = _march_scan(step, (u0, problem.s(u0)), ts, problem,
                             cfg, tcfg, "fem_march_semilinear")
    return TransientSolution(nodes, uN, None, tcfg.t_final)


def hybrid_march_semilinear(problem: SemilinearTransientProblem1D,
                            cfg: SolverConfig, tcfg: TransientConfig):
    """LSSVR-enhanced semilinear CN march: the linear shared CN affine
    map (``_shared_cn_operators`` — the implicit side is unchanged by
    IMEX) + the extrapolated reaction collocated from the previous
    element polynomial: rhs -= 3 s(u^n) - s(u^{n-1}) at interior
    collocation points ((s^{n+1} ~ 2 s^n - s^{n-1}) + s^n of the CN
    average, both times the 2/dt-scaled update)."""
    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march_semilinear collocates the "
                         "Crank-Nicolson update; theta must be 0.5")
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    dt = tcfg.t_final / tcfg.n_steps
    lin = TransientProblem1D(problem.name, p, problem.f, problem.u0)
    shared, D_L64, V064, W0pinv64 = _shared_cn_operators(lin, cfg, dt)
    D_L = jnp.asarray(D_L64, dtype)
    V0 = jnp.asarray(V064, dtype)

    if tcfg.mass == "numerov":
        A, Mm, ell, load = _numerov_setup(p, nodes, problem.f)
    else:
        A, Mm, ell = _operator_and_mass(p, nodes, cfg)
        load = lambda t: _load(nodes, problem.f, t,  # noqa: E731
                               cfg.fem_quad_order)
    lhs = tuple(m + 0.5 * dt * a for m, a in zip(Mm, A))
    lhs = _dirichlet_rows(p, lhs, None, None)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)

    xl = nodes[:-1]
    h = nodes[1] - nodes[0]
    tc = legendre.collocation_points(cfg.n_colloc, dtype=dtype)
    xc = xl[:, None] + 0.5 * h * (tc[None, :] + 1.0)
    hi = jax.lax.Precision.HIGHEST

    def fem_step(carry, t):
        u, s_prev = carry
        s_n = problem.s(u)
        s_ex = 1.5 * s_n - 0.5 * s_prev
        r = (_tri_apply(*Mm, u) - 0.5 * dt * _tri_apply(*A, u)
             + dt * (0.5 * load(t + dt) + 0.5 * load(t) + ell)
             - dt * _tri_apply(*Mm, s_ex))
        if p.bc_left == "dirichlet":
            r = r.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            r = r.at[-1].set(g_r)
        return tridiag.solve(*lhs, r, method=cfg.tridiag_method), s_n

    def step(carry, t):
        u, s_prev, w, sc_prev = carry
        u1, s_n = fem_step((u, s_prev), t)
        u_l = u1[:-1]
        u_r = u1[1:]
        if p.bc_left == "dirichlet":
            u_l = u_l.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            u_r = u_r.at[-1].set(g_r)
        bc = jnp.stack([u_l, u_r], axis=-1)
        uc = jnp.dot(w, V0.T, precision=hi)  # u^n at collocation points
        sc_n = problem.s(uc)
        f_rows = (jnp.dot(w, ((2.0 / dt) * V0 - D_L).T, precision=hi)
                  + problem.f(xc, t) + problem.f(xc, t + dt)
                  - (3.0 * sc_n - sc_prev))
        w1, _ = kkt.solve_primal_shared(shared, f_rows, bc)
        return (u1, s_n, w1, sc_n), None

    u0 = problem.u0(nodes).astype(dtype)
    w0 = jnp.dot(problem.u0(xc).astype(dtype),
                 jnp.asarray(W0pinv64, dtype).T, precision=hi)
    sc0 = problem.s(jnp.dot(w0, V0.T, precision=hi))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt
    (uN, _, wN, _), _ = _march_scan(
        step, (u0, problem.s(u0), w0, sc0), ts, problem, cfg, tcfg,
        "hybrid_march_semilinear")
    return TransientSolution(nodes, uN, wN, tcfg.t_final)


def semilinear_heat_1d() -> SemilinearTransientProblem1D:
    """u_t - u_xx + u^3 = f, exact u = e^{-t} sin(pi x)."""
    pi = jnp.pi
    from . import problems as P

    u = lambda x, t: jnp.exp(-t) * jnp.sin(pi * x)  # noqa: E731
    return SemilinearTransientProblem1D(
        name="semilinear_heat_1d",
        elliptic=dataclasses.replace(P.poisson_1d(),
                                     name="semilinear_heat_operator"),
        s=lambda v: v ** 3,
        f=lambda x, t: (pi ** 2 - 1.0) * u(x, t) + u(x, t) ** 3,
        u0=lambda x: jnp.sin(pi * x),
        exact=u,
    )


@dataclasses.dataclass(frozen=True)
class SemilinearTransientProblem2D:
    """u_t + L u + s(u) = f(x, y, t); L (and BCs) a ``Problem2D``."""

    name: str
    elliptic: "object"
    s: Callable
    f: Callable
    u0: Callable
    exact: Optional[Callable] = None


def _semilinear_fem_step_2d(problem, p, cfg, pieces, numerov):
    """IMEX CNAB step closure: carry (u^n grid, s(u^{n-1}) grid)."""
    from ..ops import assembly2d, cg

    (dtype, hx, hy, dt, th, K_A, K_M, K_lhs, xs, ys, interior, u_bc,
     M_inv) = pieces
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def apply_free(v):
        return jnp.where(interior,
                         assembly2d.apply_stiffness(v * interior, K_lhs),
                         0.0)

    if numerov:
        X, Y = jnp.meshgrid(xs, ys)

        def load_at(t):
            return assembly2d.apply_stiffness(
                problem.f(X, Y, t) * jnp.ones_like(X), K_M)
    else:
        def load_at(t):
            return assembly2d.assemble_load(
                xs, ys, lambda x, y: problem.f(x, y, t))

    def step(carry, t):
        u, s_prev = carry
        s_n = problem.s(u)
        s_ex = 1.5 * s_n - 0.5 * s_prev
        load = th * load_at(t + dt) + (1.0 - th) * load_at(t)
        r = (assembly2d.apply_stiffness(u, K_M)
             - (1.0 - th) * dt * assembly2d.apply_stiffness(u, K_A)
             + dt * load
             - dt * assembly2d.apply_stiffness(s_ex, K_M))
        rhs = jnp.where(interior, r - assembly2d.apply_stiffness(
            u_bc, K_lhs), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return (u_bc + jnp.where(interior, res.x, 0.0), s_n), res.iters

    return step


def fem_march_semilinear_2d(problem: SemilinearTransientProblem2D, cfg,
                            tcfg: TransientConfig):
    """Q1/tensor-Numerov IMEX CNAB march on structured quads."""
    p = problem.elliptic
    _check_2d_dirichlet(p)
    pieces = _fem_march_pieces_2d(p, cfg, tcfg)
    dtype, xs, ys, interior, u_bc = (pieces[0], pieces[8], pieces[9],
                                     pieces[10], pieces[11])
    dt = pieces[3]
    step = _semilinear_fem_step_2d(problem, p, cfg, pieces,
                                   numerov=tcfg.mass == "numerov")
    X, Y = jnp.meshgrid(xs, ys)
    u0 = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                   ).astype(dtype)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * dt
    (uN, _), iters = _march_scan(step, (u0, problem.s(u0)), ts,
                                 problem, cfg, tcfg,
                                 "fem_march_semilinear_2d")
    return TransientSolution2D(xs, ys, uN, None, tcfg.t_final,
                               jnp.max(iters))


def hybrid_march_semilinear_2d(problem: SemilinearTransientProblem2D,
                               cfg, tcfg: TransientConfig,
                               trace_lift: int = 0):
    """2D enhanced semilinear CN march: the linear shared CN affine map
    (the implicit side is unchanged by IMEX) + the extrapolated reaction
    collocated from the previous element polynomial (rhs -= 3 s(u^n) -
    s(u^{n-1}) at interior collocation points), traces pinned to the
    IMEX Q1 march."""
    from ..ops import legendre as leg
    from .hybrid2d import _element_data_2d

    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march_semilinear_2d collocates the "
                         "Crank-Nicolson update; theta must be 0.5")
    p = problem.elliptic
    _check_2d_dirichlet(p)
    pieces = _fem_march_pieces_2d(p, cfg, tcfg)
    dtype, hx, hy, dt = pieces[0], pieces[1], pieces[2], pieces[3]
    xs, ys, interior, u_bc = pieces[8], pieces[9], pieces[10], pieces[11]
    M, C = cfg.M, cfg.n_colloc
    shared, proj, R_op, t_int, bpts = _shared_cn_ops_2d(p, cfg, dt)
    V0i = leg.vandermonde_host(t_int, M)[0]
    Mass_op = jnp.asarray(
        np.einsum("yk,xl->yxkl", V0i, V0i).reshape(C * C, M * M), dtype)

    t_j = jnp.asarray(t_int, dtype)
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx * t_j[None, :]
    yq = ym[:, None] + 0.5 * hy * t_j[None, :]
    E = cfg.nx * cfg.ny
    hi = jax.lax.Precision.HIGHEST
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)

    def f_rows_at(t):
        F = problem.f(xq[None, :, None, :], yq[:, None, :, None], t)
        F = F * jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
        return F.reshape(E, C * C)

    fem_step = _semilinear_fem_step_2d(problem, p, cfg, pieces,
                                       numerov=tcfg.mass == "numerov")

    def scan_step(carry, t):
        u, s_prev, w, sc_prev = carry
        (u1, s_n), iters = fem_step((u, s_prev), t)
        _, bc_rows, _ = _element_data_2d(p, cfg, xs, ys, u1, t_int_j,
                                         bpts_j, trace_lift=trace_lift)
        uc = jnp.dot(w, Mass_op.T, precision=hi)
        sc_n = problem.s(uc)
        rhs = (jnp.dot(w, R_op.T, precision=hi)
               + f_rows_at(t) + f_rows_at(t + dt)
               - (3.0 * sc_n - sc_prev))
        w1, _ = kkt.solve_primal_shared(shared, rhs, bc_rows)
        return (u1, s_n, w1, sc_n), iters

    X, Y = jnp.meshgrid(xs, ys)
    u0g = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                    ).astype(dtype)
    F0 = problem.u0(xq[None, :, None, :] * jnp.ones((cfg.ny, 1, 1, 1)),
                    yq[:, None, :, None] * jnp.ones((1, cfg.nx, 1, 1)))
    f0_rows = (F0 * jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
               ).reshape(E, C * C)
    _, bc0, _ = _element_data_2d(p, cfg, xs, ys, u0g, t_int_j, bpts_j,
                                 trace_lift=trace_lift)
    w0, _ = kkt.solve_primal_shared(proj, f0_rows, bc0)
    sc0 = problem.s(jnp.dot(w0, Mass_op.T, precision=hi))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, _, wN, _), iters = _march_scan(
        scan_step, (u0g, problem.s(u0g), w0, sc0), ts, problem, cfg,
        tcfg, "hybrid_march_semilinear_2d")
    return TransientSolution2D(
        xs, ys, uN, wN.reshape(cfg.ny, cfg.nx, M, M), tcfg.t_final,
        jnp.max(iters))


def semilinear_heat_2d() -> SemilinearTransientProblem2D:
    """u_t - Lap u + u^3 = f, exact u = e^{-t} sin(pi x) sin(pi y)."""
    pi = jnp.pi
    from .hybrid2d import poisson_2d

    u = lambda x, y, t: (jnp.exp(-t) * jnp.sin(pi * x)  # noqa: E731
                         * jnp.sin(pi * y))
    return SemilinearTransientProblem2D(
        name="semilinear_heat_2d",
        elliptic=dataclasses.replace(poisson_2d(),
                                     name="semilinear_heat_2d_operator"),
        s=lambda v: v ** 3,
        f=lambda x, y, t: (2.0 * pi ** 2 - 1.0) * u(x, y, t)
        + u(x, y, t) ** 3,
        u0=lambda x, y: jnp.sin(pi * x) * jnp.sin(pi * y),
        exact=u,
    )


TRANSIENT_REGISTRY["semilinear_heat_1d"] = semilinear_heat_1d


@dataclasses.dataclass(frozen=True)
class SemilinearTransientProblem3D:
    """u_t + L u + s(u) = f(x, y, z, t); L (and BCs) a ``Problem3D``."""

    name: str
    elliptic: "object"
    s: Callable
    f: Callable
    u0: Callable
    exact: Optional[Callable] = None


def _semilinear_pieces_3d(problem, p, cfg, tcfg):
    from ..ops import assembly3d

    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + th * dt * K_A
    K_rhs = K_M - (1.0 - th) * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_lhs, dtype)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    bc_term = jnp.where(interior,
                        assembly3d.apply_stiffness_3d(u_bc, K_lhs), 0.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def apply_free(v):
        return jnp.where(
            interior,
            assembly3d.apply_stiffness_3d(v * interior, K_lhs), 0.0)

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly3d.apply_stiffness_3d(
                problem.f(X, Y, Z, t) * ones, K_M)
    else:
        def load_at(t):
            return assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    def step(carry, t):
        from ..ops import cg

        u, s_prev = carry
        s_n = problem.s(u)
        s_ex = 1.5 * s_n - 0.5 * s_prev
        r = (assembly3d.apply_stiffness_3d(u, K_rhs)
             + dt * (th * load_at(t + dt) + (1.0 - th) * load_at(t))
             - dt * assembly3d.apply_stiffness_3d(s_ex, K_M))
        rhs = jnp.where(interior, r, 0.0) - bc_term
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return (u_bc + jnp.where(interior, res.x, 0.0), s_n), res.iters

    return (dtype, hx, hy, hz, dt, xs, ys, zs, interior, u_bc, X, Y, Z,
            ones, step)


def fem_march_semilinear_3d(problem: SemilinearTransientProblem3D, cfg,
                            tcfg: TransientConfig):
    """Q1-hex/tensor-Numerov IMEX CNAB march (3D lift)."""
    p = problem.elliptic
    _check_3d_dirichlet(p)
    (dtype, hx, hy, hz, dt, xs, ys, zs, interior, u_bc, X, Y, Z, ones,
     step) = _semilinear_pieces_3d(problem, p, cfg, tcfg)
    u0 = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                   ).astype(dtype)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, _), iters = _march_scan(step, (u0, problem.s(u0)), ts,
                                 problem, cfg, tcfg,
                                 "fem_march_semilinear_3d")
    return TransientSolution3D(xs, ys, zs, uN, None, tcfg.t_final,
                               jnp.max(iters))


def hybrid_march_semilinear_3d(problem: SemilinearTransientProblem3D,
                               cfg, tcfg: TransientConfig,
                               trace_lift: int = 0):
    """3D enhanced semilinear CN march (lift of
    ``hybrid_march_semilinear_2d``): linear shared CN affine map + the
    extrapolated reaction collocated from the previous hex polynomial."""
    from ..ops import legendre as leg
    from .hybrid3d import _element_data_3d

    if tcfg.theta != 0.5:
        raise ValueError("hybrid_march_semilinear_3d collocates the "
                         "Crank-Nicolson update; theta must be 0.5")
    p = problem.elliptic
    _check_3d_dirichlet(p)
    (dtype, hx, hy, hz, dt, xs, ys, zs, interior, u_bc, X, Y, Z, ones,
     fem_step) = _semilinear_pieces_3d(problem, p, cfg, tcfg)
    M, C = cfg.M, cfg.n_colloc
    shared, proj, R_op, t_int, spts = _shared_cn_ops_3d(p, cfg, dt)
    V0i = leg.vandermonde_host(t_int, M)[0]
    Mass_op = jnp.asarray(
        np.einsum("zk,yl,xm->zyxklm", V0i, V0i, V0i).reshape(
            C * C * C, M * M * M), dtype)

    t_j = jnp.asarray(t_int, dtype)
    xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
    yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
    E = cfg.nx * cfg.ny * cfg.nz
    hi = jax.lax.Precision.HIGHEST
    ones6 = jnp.ones((cfg.nz, cfg.ny, cfg.nx, C, C, C), dtype)
    t_int_j = jnp.asarray(t_int)
    spts_j = jnp.asarray(spts)

    def f_rows_at(t):
        F = problem.f(
            xq[None, None, :, None, None, :],
            yq[None, :, None, None, :, None],
            zq[:, None, None, :, None, None], t)
        return (F * ones6).reshape(E, C * C * C)

    def scan_step(carry, t):
        u, s_prev, w, sc_prev = carry
        (u1, s_n), iters = fem_step((u, s_prev), t)
        _, bc_rows, _ = _element_data_3d(p, cfg, xs, ys, zs, u1,
                                         t_int_j, spts_j,
                                         trace_lift=trace_lift)
        uc = jnp.dot(w, Mass_op.T, precision=hi)
        sc_n = problem.s(uc)
        rhs = (jnp.dot(w, R_op.T, precision=hi)
               + f_rows_at(t) + f_rows_at(t + dt)
               - (3.0 * sc_n - sc_prev))
        w1, _ = kkt.solve_primal_shared(shared, rhs, bc_rows)
        return (u1, s_n, w1, sc_n), iters

    u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                    ).astype(dtype)
    F0 = problem.u0(xq[None, None, :, None, None, :],
                    yq[None, :, None, None, :, None],
                    zq[:, None, None, :, None, None])
    f0_rows = (F0 * ones6).reshape(E, C * C * C)
    _, bc0, _ = _element_data_3d(p, cfg, xs, ys, zs, u0g, t_int_j,
                                 spts_j, trace_lift=trace_lift)
    w0, _ = kkt.solve_primal_shared(proj, f0_rows, bc0)
    sc0 = problem.s(jnp.dot(w0, Mass_op.T, precision=hi))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, _, wN, _), iters = _march_scan(
        scan_step, (u0g, problem.s(u0g), w0, sc0), ts, problem, cfg,
        tcfg, "hybrid_march_semilinear_3d")
    return TransientSolution3D(
        xs, ys, zs, uN, wN.reshape(cfg.nz, cfg.ny, cfg.nx, M, M, M),
        tcfg.t_final, jnp.max(iters))


def semilinear_heat_3d() -> SemilinearTransientProblem3D:
    """u_t - Lap u + u^3 = f, exact u = e^{-t} sin^3 (pi .)."""
    pi = jnp.pi
    from .hybrid3d import get_problem_3d

    u = lambda x, y, z, t: (jnp.exp(-t) * jnp.sin(pi * x)  # noqa: E731
                            * jnp.sin(pi * y) * jnp.sin(pi * z))
    return SemilinearTransientProblem3D(
        name="semilinear_heat_3d",
        elliptic=dataclasses.replace(
            get_problem_3d("poisson_3d"),
            name="semilinear_heat_3d_operator"),
        s=lambda v: v ** 3,
        f=lambda x, y, z, t: (3.0 * pi ** 2 - 1.0) * u(x, y, z, t)
        + u(x, y, z, t) ** 3,
        u0=lambda x, y, z: (jnp.sin(pi * x) * jnp.sin(pi * y)
                            * jnp.sin(pi * z)),
        exact=u,
    )


# ------------------------------------------- adaptive time stepping
#
# Error-controlled marching: each attempt takes one Crank-Nicolson step
# AND one backward-Euler step with the current dt; their difference is
# the standard embedded local-error estimate of the first-order member
# (err ~ C dt^2 |u_tt|/2).  Accept when err <= tol, then rescale dt by
# the PI-style rule dt *= clip(0.9 (tol/err)^(1/2), 0.2, 5.0), clamped
# to land exactly on t_final.  TPU-idiomatic: the whole
# attempt/reject/grow loop is ONE lax.scan over a STATIC attempt budget
# — rejected attempts update only (dt,), accepted ones update (u, t, dt)
# via jnp.where; no data-dependent shapes or host round trips.  The two
# implicit operators (M + dt/2 A and M + dt A) depend on the TRACED dt,
# so the tridiagonal diagonals are rebuilt per attempt (two Thomas
# solves per attempt — still microseconds at P1 sizes).


class AdaptiveMarchResult(NamedTuple):
    solution: TransientSolution
    t_reached: jnp.ndarray  # scalar; == t_final when the budget sufficed
    accepted: jnp.ndarray  # number of accepted steps
    rejected: jnp.ndarray  # number of rejected attempts
    max_err: jnp.ndarray  # max accepted local-error estimate


@dataclasses.dataclass(frozen=True)
class _AdaptiveParams:
    """Fingerprint payload for the adaptive-dt marches: everything that
    determines the attempt trajectory (the carry includes the running t
    and dt, so restoring it resumes the attempt sequence exactly)."""

    t_final: float
    tol: float
    dt0: Optional[float]
    max_attempts: int


def _adaptive_scan(attempt, carry0, max_attempts, problem, cfg, params,
                   tag, checkpoint, checkpoint_chunk):
    """Attempt scan, chunk-checkpointed when ``checkpoint`` is set (the
    attempt index is the scan axis; the body ignores it, so the
    trajectory matches the plain ``length=``-scan bitwise)."""
    if not checkpoint:
        return jax.lax.scan(attempt, carry0, None, length=max_attempts)
    from ..utils import checkpoint as _ckpt

    fp = _ckpt.march_fingerprint(problem.name, cfg, params, tag)
    ts = jnp.arange(max_attempts)
    return _ckpt.scan_checkpointed(
        lambda c, _t: attempt(c, None), carry0, ts, path=checkpoint,
        chunk=checkpoint_chunk, fingerprint=fp)


def fem_march_adaptive(problem: TransientProblem1D, cfg: SolverConfig,
                       t_final: float, tol: float = 1e-6,
                       dt0: Optional[float] = None,
                       max_attempts: int = 512,
                       checkpoint: Optional[str] = None,
                       checkpoint_chunk: int = 0) -> AdaptiveMarchResult:
    """Adaptive-dt P1 march of u_t + L u = f (CN/BE embedded pair)."""
    p = problem.elliptic
    dtype = cfg.jnp_dtype()
    nodes = uniform_nodes(p, cfg.num_nodes, dtype)
    A, Mm, ell = _operator_and_mass(p, nodes, cfg)
    g_l = jnp.asarray(p.g_left, dtype)
    g_r = jnp.asarray(p.g_right, dtype)

    def load(t):
        return _load(nodes, problem.f, t, cfg.fem_quad_order)

    def theta_solve(u, t, dt, th):
        lhs = tuple(m + th * dt * a for m, a in zip(Mm, A))
        lhs = _dirichlet_rows(p, lhs, None, None)
        r = (_tri_apply(*Mm, u) - (1.0 - th) * dt * _tri_apply(*A, u)
             + dt * (th * load(t + dt) + (1.0 - th) * load(t) + ell))
        if p.bc_left == "dirichlet":
            r = r.at[0].set(g_l)
        if p.bc_right == "dirichlet":
            r = r.at[-1].set(g_r)
        return tridiag.solve(*lhs, r, method=cfg.tridiag_method)

    tf = jnp.asarray(t_final, dtype)
    tol_j = jnp.asarray(tol, dtype)

    def attempt(carry, _):
        u, t, dt, acc, rej, emax = carry
        done = t >= tf * (1.0 - 1e-12)
        dt_c = jnp.minimum(dt, tf - t)  # land exactly on t_final
        dt_c = jnp.maximum(dt_c, jnp.asarray(0.0, dtype))
        u_cn = theta_solve(u, t, dt_c, 0.5)
        u_be = theta_solve(u, t, dt_c, 1.0)
        err = jnp.max(jnp.abs(u_cn - u_be))
        ok = (err <= tol_j) & ~done
        fac = jnp.clip(0.9 * jnp.sqrt(tol_j / jnp.maximum(err, 1e-30)),
                       0.2, 5.0)
        u1 = jnp.where(ok, u_cn, u)
        t1 = jnp.where(ok, t + dt_c, t)
        dt1 = jnp.where(done, dt, dt * fac)
        acc1 = acc + jnp.where(ok, 1, 0)
        rej1 = rej + jnp.where(ok | done, 0, 1)
        emax1 = jnp.where(ok, jnp.maximum(emax, err), emax)
        return (u1, t1, dt1, acc1, rej1, emax1), None

    u0 = problem.u0(nodes).astype(dtype)
    if p.bc_left == "dirichlet":
        u0 = u0.at[0].set(g_l)
    if p.bc_right == "dirichlet":
        u0 = u0.at[-1].set(g_r)
    dt_init = jnp.asarray(dt0 if dt0 is not None else t_final / 64.0,
                          dtype)
    zero_i = jnp.zeros((), jnp.int32)
    zero = jnp.zeros((), dtype)
    (uN, tN, _, acc, rej, emax), _ = _adaptive_scan(
        attempt, (u0, zero, dt_init, zero_i, zero_i, zero),
        max_attempts, problem, cfg,
        _AdaptiveParams(t_final, tol, dt0, max_attempts),
        "fem_march_adaptive", checkpoint, checkpoint_chunk)
    return AdaptiveMarchResult(
        solution=TransientSolution(nodes, uN, None, float(t_final)),
        t_reached=tN, accepted=acc, rejected=rej, max_err=emax)


def fem_march_adaptive_2d(problem: TransientProblem2D, cfg,
                          t_final: float, tol: float = 1e-5,
                          dt0: Optional[float] = None,
                          max_attempts: int = 512,
                          checkpoint: Optional[str] = None,
                          checkpoint_chunk: int = 0
                          ) -> AdaptiveMarchResult:
    """2D adaptive-dt Q1 march (CN/BE embedded pair, the 2D lift of
    ``fem_march_adaptive``): the implicit operators M + th dt A carry
    the TRACED dt through the matrix-free apply (K_M + th dt K_A per
    element), so each attempt is two Jacobi-CG solves and the whole
    accept/reject loop is one lax.scan.  Returns fem_values in the
    ``solution`` (coeffs None)."""
    from ..ops import assembly2d, cg

    p = problem.elliptic
    _check_2d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    K_A = jnp.asarray(
        assembly2d.q1_local_operator(hx, hy, p.a0, p.c, *p.b), dtype)
    K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    interior = jnp.zeros((cfg.ny + 1, cfg.nx + 1), bool
                         ).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y) * jnp.ones_like(X))
    tolcg = cfg.cg_tol
    if tolcg is None:
        tolcg = 100.0 * float(jnp.finfo(dtype).eps)

    def load_at(t):
        return assembly2d.assemble_load(
            xs, ys, lambda x, y: problem.f(x, y, t))

    def theta_solve(u, t, dt, th):
        K_lhs = K_M + th * dt * K_A

        def apply_free(v):
            return jnp.where(
                interior,
                assembly2d.apply_stiffness(v * interior, K_lhs), 0.0)

        diag = assembly2d.stiffness_diag((cfg.ny + 1, cfg.nx + 1),
                                         K_lhs, dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        load = th * load_at(t + dt) + (1.0 - th) * load_at(t)
        r = (assembly2d.apply_stiffness(u, K_M)
             - (1.0 - th) * dt * assembly2d.apply_stiffness(u, K_A)
             + dt * load)
        rhs = jnp.where(interior, r - assembly2d.apply_stiffness(
            u_bc, K_lhs), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tolcg,
                    maxiter=cfg.cg_maxiter)
        return u_bc + jnp.where(interior, res.x, 0.0)

    tf = jnp.asarray(t_final, dtype)
    tol_j = jnp.asarray(tol, dtype)

    def attempt(carry, _):
        u, t, dt, acc, rej, emax = carry
        done = t >= tf * (1.0 - 1e-12)
        dt_c = jnp.maximum(jnp.minimum(dt, tf - t),
                           jnp.asarray(0.0, dtype))
        u_cn = theta_solve(u, t, dt_c, 0.5)
        u_be = theta_solve(u, t, dt_c, 1.0)
        err = jnp.max(jnp.abs(u_cn - u_be))
        ok = (err <= tol_j) & ~done
        fac = jnp.clip(0.9 * jnp.sqrt(tol_j / jnp.maximum(err, 1e-30)),
                       0.2, 5.0)
        return (jnp.where(ok, u_cn, u), jnp.where(ok, t + dt_c, t),
                jnp.where(done, dt, dt * fac),
                acc + jnp.where(ok, 1, 0),
                rej + jnp.where(ok | done, 0, 1),
                jnp.where(ok, jnp.maximum(emax, err), emax)), None

    u0 = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                   ).astype(dtype)
    dt_init = jnp.asarray(dt0 if dt0 is not None else t_final / 64.0,
                          dtype)
    zero_i = jnp.zeros((), jnp.int32)
    zero = jnp.zeros((), dtype)
    (uN, tN, _, acc, rej, emax), _ = _adaptive_scan(
        attempt, (u0, zero, dt_init, zero_i, zero_i, zero),
        max_attempts, problem, cfg,
        _AdaptiveParams(t_final, tol, dt0, max_attempts),
        "fem_march_adaptive_2d", checkpoint, checkpoint_chunk)
    sol = TransientSolution2D(xs, ys, uN, None, float(t_final),
                              jnp.zeros((), jnp.int32))
    return AdaptiveMarchResult(solution=sol, t_reached=tN, accepted=acc,
                               rejected=rej, max_err=emax)


def hybrid_wave_march_2d(problem: WaveProblem2D, cfg,
                         tcfg: TransientConfig, beta: float = 0.25,
                         gamma_n: float = 0.5, trace_lift: int = 0):
    """LSSVR-enhanced 2D Newmark march (lift of ``hybrid_wave_march``):
    per-element tensor-Legendre (u, v, a) coefficient triples; each step
    collocates a^{n+1} + L u^{n+1} = f^{n+1} under the Newmark closure
    u^{n+1} = pred + beta dt^2 a^{n+1} — ONE shared-LSE solve of
    D_NM = Mass + beta dt^2 D_L for the acceleration coefficients, with
    the trace pinning transferred to the acceleration:
    a_trace = (u_trace(Q1 march) - pred_trace)/(beta dt^2).
    ``trace_lift=6`` + numerov mass carries the O(h^4) nodal dispersion
    to the enhanced Linf (as in ``hybrid_march_2d``)."""
    from ..ops import assembly2d, cg
    from .hybrid2d import _element_data_2d

    p = problem.elliptic
    _check_2d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    dt = tcfg.t_final / tcfg.n_steps
    M, C = cfg.M, cfg.n_colloc
    Mass64, D_L64, B64, t_int, bpts = _mass_dl_b_2d(p, cfg)
    D_NM = Mass64 + beta * dt * dt * D_L64
    shared = kkt.precompute_shared_lse_host(D_NM, B64, dtype)
    proj = kkt.precompute_shared_lse_host(Mass64, B64, dtype)
    D_L = jnp.asarray(D_L64, dtype)
    Bj = jnp.asarray(B64, dtype)
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)
    hi = jax.lax.Precision.HIGHEST

    # FEM Newmark pieces (trace provider), as in wave_march_2d
    if tcfg.mass == "numerov":
        if p.b != (0.0, 0.0):
            raise NotImplementedError("numerov mass requires b == 0")
        K_A_np, K_M_np = _numerov_locals_2d(hx, hy, p.a0, p.c)
        K_A = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K_A = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, p.a0, p.c, *p.b), dtype)
        K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    K_lhs = K_M + beta * dt * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    interior = jnp.zeros((cfg.ny + 1, cfg.nx + 1), bool
                         ).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y) * jnp.ones_like(X))
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def free_solve(K, rhs):
        def apply_free(v):
            return jnp.where(
                interior,
                assembly2d.apply_stiffness(v * interior, K), 0.0)

        diag = assembly2d.stiffness_diag((cfg.ny + 1, cfg.nx + 1), K,
                                         dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return jnp.where(interior, res.x, 0.0), res.iters

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly2d.apply_stiffness(
                problem.f(X, Y, t) * jnp.ones_like(X), K_M)
    else:
        def load_at(t):
            return assembly2d.assemble_load(
                xs, ys, lambda x, y: problem.f(x, y, t))

    # collocation coordinates (iy, ix) x (cy, cx)
    t_j = jnp.asarray(t_int, dtype)
    xm = 0.5 * (xs[1:] + xs[:-1])
    ym = 0.5 * (ys[1:] + ys[:-1])
    xq = xm[:, None] + 0.5 * hx * t_j[None, :]
    yq = ym[:, None] + 0.5 * hy * t_j[None, :]
    E = cfg.nx * cfg.ny

    def f_rows_at(t):
        F = problem.f(xq[None, :, None, :], yq[:, None, :, None], t)
        return (F * jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
                ).reshape(E, C * C)

    def step(carry, t):
        u, v, a, wu, wv, wa = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - assembly2d.apply_stiffness(pred, K_A)
        a1, iters = free_solve(K_lhs, rhs)
        u1 = u_bc + jnp.where(interior, pred + beta * dt * dt * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        # element polynomials
        w_pred = wu + dt * wv + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
        f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_L.T, precision=hi)
        _, bc_u1, _ = _element_data_2d(p, cfg, xs, ys, u1, t_int_j,
                                       bpts_j, trace_lift=trace_lift)
        pred_tr = jnp.dot(w_pred, Bj.T, precision=hi)
        bc_a = (bc_u1 - pred_tr) / (beta * dt * dt)
        wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
        wu1 = w_pred + beta * dt * dt * wa1
        wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
        return (u1, v1, a1, wu1, wv1, wa1), iters

    u0g = jnp.where(interior, problem.u0(X, Y) * jnp.ones_like(X), u_bc
                    ).astype(dtype)
    v0g = jnp.where(interior, problem.v0(X, Y) * jnp.ones_like(X), 0.0
                    ).astype(dtype)
    rhs0 = load_at(jnp.asarray(0.0, dtype)) \
        - assembly2d.apply_stiffness(u0g, K_A)
    a0g, _ = free_solve(K_M, rhs0)
    # initial polynomial fits: u0/v0 from values + traces; the
    # acceleration from the PDE a0 = f(0) - L u0 with zero boundary
    # traces (time-independent Dirichlet data)
    ones4 = jnp.ones((cfg.ny, cfg.nx, C, C), dtype)
    F0u = (problem.u0(xq[None, :, None, :], yq[:, None, :, None])
           * ones4).reshape(E, C * C)
    F0v = (problem.v0(xq[None, :, None, :], yq[:, None, :, None])
           * ones4).reshape(E, C * C)
    _, bc_u0, _ = _element_data_2d(p, cfg, xs, ys, u0g, t_int_j, bpts_j,
                                   trace_lift=trace_lift)
    import dataclasses as _dc

    p0 = _dc.replace(p, g=lambda x, y: jnp.zeros_like(x + y))
    _, bc_v0, _ = _element_data_2d(p0, cfg, xs, ys, v0g, t_int_j, bpts_j,
                                   trace_lift=trace_lift)
    _, bc_a0, _ = _element_data_2d(p0, cfg, xs, ys, a0g, t_int_j, bpts_j,
                                   trace_lift=trace_lift)
    wu0, _ = kkt.solve_primal_shared(proj, F0u, bc_u0)
    wv0, _ = kkt.solve_primal_shared(proj, F0v, bc_v0)
    fa0 = f_rows_at(jnp.asarray(0.0, dtype)) \
        - jnp.dot(wu0, D_L.T, precision=hi)
    wa0, _ = kkt.solve_primal_shared(proj, fa0, bc_a0)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _, wuN, _, _), iters = _march_scan(
        step, (u0g, v0g, a0g, wu0, wv0, wa0), ts, problem, cfg, tcfg,
        "hybrid_wave_march_2d")
    return TransientSolution2D(
        xs, ys, uN, wuN.reshape(cfg.ny, cfg.nx, M, M), tcfg.t_final,
        jnp.max(iters)), vN


def hybrid_wave_march_3d(problem: WaveProblem3D, cfg,
                         tcfg: TransientConfig, beta: float = 0.25,
                         gamma_n: float = 0.5, trace_lift: int = 0):
    """LSSVR-enhanced 3D Newmark march (tensor lift of
    ``hybrid_wave_march_2d``): per-hex (u, v, a) coefficient triples,
    one shared-LSE solve of Mass + beta dt^2 D_L per step, trace
    pinning transferred to the acceleration."""
    from ..ops import assembly3d, cg
    from .hybrid3d import _element_data_3d

    p = problem.elliptic
    _check_3d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    M, C = cfg.M, cfg.n_colloc
    Mass64, D_L64, B64, t_int, spts = _mass_dl_b_3d(p, cfg)
    D_NM = Mass64 + beta * dt * dt * D_L64
    shared = kkt.precompute_shared_lse_host(D_NM, B64, dtype)
    proj = kkt.precompute_shared_lse_host(Mass64, B64, dtype)
    D_L = jnp.asarray(D_L64, dtype)
    Bj = jnp.asarray(B64, dtype)
    t_int_j = jnp.asarray(t_int)
    spts_j = jnp.asarray(spts)
    hi = jax.lax.Precision.HIGHEST

    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + beta * dt * dt * K_A
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def free_solve(K, rhs):
        def apply_free(v):
            return jnp.where(
                interior,
                assembly3d.apply_stiffness_3d(v * interior, K), 0.0)

        diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K, dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                    M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
        return jnp.where(interior, res.x, 0.0), res.iters

    if tcfg.mass == "numerov":
        def load_at(t):
            return assembly3d.apply_stiffness_3d(
                problem.f(X, Y, Z, t) * ones, K_M)
    else:
        def load_at(t):
            return assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    t_j = jnp.asarray(t_int, dtype)
    xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
    yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
    E = cfg.nx * cfg.ny * cfg.nz
    ones6 = jnp.ones((cfg.nz, cfg.ny, cfg.nx, C, C, C), dtype)

    def f_rows_at(t):
        F = problem.f(
            xq[None, None, :, None, None, :],
            yq[None, :, None, None, :, None],
            zq[:, None, None, :, None, None], t)
        return (F * ones6).reshape(E, C * C * C)

    def step(carry, t):
        u, v, a, wu, wv, wa = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - assembly3d.apply_stiffness_3d(pred, K_A)
        a1, iters = free_solve(K_lhs, rhs)
        u1 = u_bc + jnp.where(interior, pred + beta * dt * dt * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        w_pred = wu + dt * wv + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
        f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_L.T, precision=hi)
        _, bc_u1, _ = _element_data_3d(p, cfg, xs, ys, zs, u1, t_int_j,
                                       spts_j, trace_lift=trace_lift)
        pred_tr = jnp.dot(w_pred, Bj.T, precision=hi)
        bc_a = (bc_u1 - pred_tr) / (beta * dt * dt)
        wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
        wu1 = w_pred + beta * dt * dt * wa1
        wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
        return (u1, v1, a1, wu1, wv1, wa1), iters

    u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                    ).astype(dtype)
    v0g = jnp.where(interior, problem.v0(X, Y, Z) * ones, 0.0
                    ).astype(dtype)
    rhs0 = load_at(jnp.asarray(0.0, dtype)) \
        - assembly3d.apply_stiffness_3d(u0g, K_A)
    a0g, _ = free_solve(K_M, rhs0)
    F0u = (problem.u0(xq[None, None, :, None, None, :],
                      yq[None, :, None, None, :, None],
                      zq[:, None, None, :, None, None])
           * ones6).reshape(E, C * C * C)
    F0v = (problem.v0(xq[None, None, :, None, None, :],
                      yq[None, :, None, None, :, None],
                      zq[:, None, None, :, None, None])
           * ones6).reshape(E, C * C * C)
    import dataclasses as _dc

    p0 = _dc.replace(p, g=lambda x, y, z: jnp.zeros_like(x + y + z))
    _, bc_u0, _ = _element_data_3d(p, cfg, xs, ys, zs, u0g, t_int_j,
                                   spts_j, trace_lift=trace_lift)
    _, bc_v0, _ = _element_data_3d(p0, cfg, xs, ys, zs, v0g, t_int_j,
                                   spts_j, trace_lift=trace_lift)
    _, bc_a0, _ = _element_data_3d(p0, cfg, xs, ys, zs, a0g, t_int_j,
                                   spts_j, trace_lift=trace_lift)
    wu0, _ = kkt.solve_primal_shared(proj, F0u, bc_u0)
    wv0, _ = kkt.solve_primal_shared(proj, F0v, bc_v0)
    fa0 = f_rows_at(jnp.asarray(0.0, dtype)) \
        - jnp.dot(wu0, D_L.T, precision=hi)
    wa0, _ = kkt.solve_primal_shared(proj, fa0, bc_a0)
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _, wuN, _, _), iters = _march_scan(
        step, (u0g, v0g, a0g, wu0, wv0, wa0), ts, problem, cfg, tcfg,
        "hybrid_wave_march_3d")
    return TransientSolution3D(
        xs, ys, zs, uN, wuN.reshape(cfg.nz, cfg.ny, cfg.nx, M, M, M),
        tcfg.t_final, jnp.max(iters)), vN


def fem_march_adaptive_3d(problem: TransientProblem3D, cfg,
                          t_final: float, tol: float = 1e-5,
                          dt0: Optional[float] = None,
                          max_attempts: int = 512,
                          checkpoint: Optional[str] = None,
                          checkpoint_chunk: int = 0
                          ) -> AdaptiveMarchResult:
    """3D adaptive-dt Q1-hex march (tensor lift of
    ``fem_march_adaptive_2d``: traced-dt matrix-free implicit operators,
    two Jacobi-CG solves per attempt, one lax.scan)."""
    from ..ops import assembly3d, cg

    p = problem.elliptic
    _check_3d_dirichlet(p)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, "consistent")
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool
                         ).at[1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)
    tolcg = cfg.cg_tol
    if tolcg is None:
        tolcg = 100.0 * float(jnp.finfo(dtype).eps)

    def load_at(t):
        return assembly3d.assemble_load_3d(
            xs, ys, zs, lambda x, y, z: problem.f(x, y, z, t))

    def theta_solve(u, t, dt, th):
        K_lhs = K_M + th * dt * K_A

        def apply_free(v):
            return jnp.where(
                interior,
                assembly3d.apply_stiffness_3d(v * interior, K_lhs), 0.0)

        diag = assembly3d.stiffness_diag_3d((nz1, ny1, nx1), K_lhs,
                                            dtype)
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        load = th * load_at(t + dt) + (1.0 - th) * load_at(t)
        r = (assembly3d.apply_stiffness_3d(u, K_M)
             - (1.0 - th) * dt * assembly3d.apply_stiffness_3d(u, K_A)
             + dt * load)
        rhs = jnp.where(interior, r - assembly3d.apply_stiffness_3d(
            u_bc, K_lhs), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tolcg,
                    maxiter=cfg.cg_maxiter)
        return u_bc + jnp.where(interior, res.x, 0.0)

    tf = jnp.asarray(t_final, dtype)
    tol_j = jnp.asarray(tol, dtype)

    def attempt(carry, _):
        u, t, dt, acc, rej, emax = carry
        done = t >= tf * (1.0 - 1e-12)
        dt_c = jnp.maximum(jnp.minimum(dt, tf - t),
                           jnp.asarray(0.0, dtype))
        u_cn = theta_solve(u, t, dt_c, 0.5)
        u_be = theta_solve(u, t, dt_c, 1.0)
        err = jnp.max(jnp.abs(u_cn - u_be))
        ok = (err <= tol_j) & ~done
        fac = jnp.clip(0.9 * jnp.sqrt(tol_j / jnp.maximum(err, 1e-30)),
                       0.2, 5.0)
        return (jnp.where(ok, u_cn, u), jnp.where(ok, t + dt_c, t),
                jnp.where(done, dt, dt * fac),
                acc + jnp.where(ok, 1, 0),
                rej + jnp.where(ok | done, 0, 1),
                jnp.where(ok, jnp.maximum(emax, err), emax)), None

    u0 = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                   ).astype(dtype)
    dt_init = jnp.asarray(dt0 if dt0 is not None else t_final / 64.0,
                          dtype)
    zero_i = jnp.zeros((), jnp.int32)
    zero = jnp.zeros((), dtype)
    (uN, tN, _, acc, rej, emax), _ = _adaptive_scan(
        attempt, (u0, zero, dt_init, zero_i, zero_i, zero),
        max_attempts, problem, cfg,
        _AdaptiveParams(t_final, tol, dt0, max_attempts),
        "fem_march_adaptive_3d", checkpoint, checkpoint_chunk)
    sol = TransientSolution3D(xs, ys, zs, uN, None, float(t_final),
                              jnp.zeros((), jnp.int32))
    return AdaptiveMarchResult(solution=sol, t_reached=tN, accepted=acc,
                               rejected=rej, max_err=emax)
