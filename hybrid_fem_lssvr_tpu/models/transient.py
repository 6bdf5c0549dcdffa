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
    uN, _ = jax.lax.scan(step, u0, ts)
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
    (uN, wN), _ = jax.lax.scan(step, (u0, w0), ts)
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
