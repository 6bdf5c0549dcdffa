"""2D elastodynamics: Newmark-beta marches for rho u_tt - div sigma(u) = f.

Time-dependent extension of the vector-valued elasticity family
(``models/elastic.py``) — the reference prototype covers only the steady
scalar 1D Poisson problem (``/root/reference/1D-Possion/
Hybrid-FEM-LSSVR.py:8-18``), so this family is beyond-reference scope
composed entirely from machinery already in the framework:

* Coarse march — Newmark-beta (default beta=1/4, gamma=1/2: the
  unconditionally stable, energy-conserving trapezoidal member) on the
  block Q1 system  M_rho a + K u = F(t):  per step one block
  matrix-free CG solve of (M_rho + beta dt^2 K) for the acceleration,
  with K the ``elastic._block_locals`` operator and M_rho = rho x the
  scalar consistent mass per displacement component (block-diagonal).
  The whole march is one ``jax.lax.scan`` (TPU-legal control flow, same
  shape as ``transient.wave_march_2d``).
* Enhanced march — per-element tensor-Legendre (u, v, a) COEFFICIENT
  triples for both displacement components at once: each step
  collocates  rho a^{n+1} - div sigma(u^{n+1}) = f^{n+1}  under the
  Newmark closure u^{n+1} = pred + beta dt^2 a^{n+1}, i.e. ONE shared
  block LSE solve of  D_NM = rho Mass_blk + beta dt^2 D_blk  for the
  acceleration coefficients (``kkt.solve_primal_shared`` — two MXU
  matmuls over all elements), with the trace pinning transferred to the
  acceleration exactly as in the scalar ``transient.hybrid_wave_march_2d``:
  a_trace = (u_trace(Q1 march) - pred_trace) / (beta dt^2).

Dirichlet data must be time-independent (the march pins u_bc once); the
shipped problems use homogeneous data.  The enhanced march's Linf floor
is the vector trace accuracy — O(h^2), the same floor as the steady
elastic family (``docs/NUMERICS.md`` 24b: traces gate what enhancement
can add).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly2d, cg, kkt
from .elastic import (ElasticConfig2D, ElasticProblem2D, _block_colloc_host,
                      _block_locals, _component_problem, sin_elastic_2d)
from .hybrid2d import _element_data_2d
from .transient import TransientConfig, _march_scan


@dataclasses.dataclass(frozen=True)
class ElasticWaveProblem2D:
    """rho u_tt - div sigma(u) = f(x, y, t); spatial operator, Lame
    coefficients and (time-independent) Dirichlet data from ``elastic``."""

    name: str
    elastic: ElasticProblem2D
    f1: Callable  # body force components f(x, y, t)
    f2: Callable
    u01: Callable  # initial displacement (x, y)
    u02: Callable
    v01: Callable  # initial velocity (x, y)
    v02: Callable
    rho: float = 1.0
    exact1: Optional[Callable] = None  # exact(x, y, t)
    exact2: Optional[Callable] = None


def elastic_wave_2d(lam: float = 1.0, mu: float = 1.0, rho: float = 1.0,
                    omega: float = float(np.pi)) -> ElasticWaveProblem2D:
    """Manufactured forced motion: the steady ``sin_elastic_2d``
    displacement field oscillating as cos(omega t).  With
    u_i(x,y,t) = cos(omega t) u_i^s(x,y),  rho u_tt = -rho omega^2 u,
    so  f_i = cos(omega t) (f_i^s - rho omega^2 u_i^s)  with f_i^s the
    steady body force — the coupling terms are exercised at every step."""
    st = sin_elastic_2d(lam=lam, mu=mu)

    def make_f(fs, us):
        return lambda x, y, t: jnp.cos(omega * t) * (
            fs(x, y) - rho * omega ** 2 * us(x, y))

    return ElasticWaveProblem2D(
        name="elastic_wave_2d",
        elastic=st,
        f1=make_f(st.f1, st.exact1),
        f2=make_f(st.f2, st.exact2),
        u01=st.exact1, u02=st.exact2,
        v01=lambda x, y: jnp.zeros_like(x + y),
        v02=lambda x, y: jnp.zeros_like(x + y),
        rho=rho,
        exact1=lambda x, y, t: jnp.cos(omega * t) * st.exact1(x, y),
        exact2=lambda x, y, t: jnp.cos(omega * t) * st.exact2(x, y),
    )


def elastic_free_vibration_2d(lam: float = 1.0, mu: float = 1.0,
                              rho: float = 1.0) -> ElasticWaveProblem2D:
    """Unforced release from the ``sin_elastic_2d`` displacement shape:
    f = 0, v0 = 0.  No closed-form solution (the coupled square membrane
    modes are not separable) — used by the energy-conservation test,
    which needs no oracle: Newmark at (1/4, 1/2) conserves the discrete
    energy  E = 1/2 v^T M_rho v + 1/2 u^T K u  exactly for f = 0."""
    st = sin_elastic_2d(lam=lam, mu=mu)
    zero3 = lambda x, y, t: jnp.zeros_like(x + y)  # noqa: E731
    zero2 = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731
    return ElasticWaveProblem2D(
        name="elastic_free_vibration_2d", elastic=st,
        f1=zero3, f2=zero3, u01=st.exact1, u02=st.exact2,
        v01=zero2, v02=zero2, rho=rho,
    )


class ElasticWaveSolution2D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    fem_values: jnp.ndarray  # [2, ny+1, nx+1] displacement at t_final
    velocity: jnp.ndarray  # [2, ny+1, nx+1] at t_final
    coeffs: Optional[jnp.ndarray]  # [2, ny, nx, M, M] (enhanced march)
    t_final: float
    cg_iters: jnp.ndarray
    energy0: jnp.ndarray  # discrete energy at t=0 / t_final — the
    energyN: jnp.ndarray  # conservation diagnostic (equal when f = 0)
    lam: float = 1.0
    mu: float = 1.0


def _march_pieces(problem: ElasticWaveProblem2D, cfg: ElasticConfig2D,
                  dt: float):
    """Shared FEM-march setup: grids, block operators, masked CG.

    The per-step CG is Jacobi-preconditioned (the Newmark LHS
    M_rho + beta dt^2 K is mass-dominated at practical dt, so Jacobi
    converges in a handful of iterations and a V-cycle buys nothing);
    asking for 'mg' is an error, not a silent downgrade."""
    if cfg.precond == "mg":
        raise ValueError(
            "the elastodynamics marches use Jacobi-preconditioned CG "
            "(mass-dominated Newmark LHS); precond='mg' is not supported "
            "— use 'jacobi' or 'auto'"
        )
    if cfg.coarse != "q1":
        raise ValueError(
            "the elastodynamics marches run the q1 block coarse stage "
            "per step; coarse='richardson' applies only to the steady "
            "solves"
        )
    p = problem.elastic
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    A11, A12, A22 = _block_locals(p, hx, hy, dtype)
    Ms = problem.rho * jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    interior = jnp.zeros((cfg.ny + 1, cfg.nx + 1), bool
                         ).at[1:-1, 1:-1].set(True)
    X, Y = jnp.meshgrid(xs, ys)
    u_bc = jnp.stack([
        jnp.where(interior, 0.0, p.g1(X, Y) * jnp.ones_like(X)),
        jnp.where(interior, 0.0, p.g2(X, Y) * jnp.ones_like(X)),
    ])

    def apply_K(u):
        r1 = (assembly2d.apply_stiffness(u[0], A11)
              + assembly2d.apply_stiffness(u[1], A12))
        r2 = (assembly2d.apply_stiffness(u[0], A12.T)
              + assembly2d.apply_stiffness(u[1], A22))
        return jnp.stack([r1, r2])

    def apply_M(u):
        return jnp.stack([assembly2d.apply_stiffness(u[0], Ms),
                          assembly2d.apply_stiffness(u[1], Ms)])

    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    shape = (cfg.ny + 1, cfg.nx + 1)
    m_diag = assembly2d.stiffness_diag(shape, Ms, dtype)

    def make_free_solve(apply_full, diag):
        def apply_free(v):
            return jnp.where(interior, apply_full(v * interior), 0.0)

        M_inv = jnp.where(interior, 1.0 / diag, 1.0)

        def free_solve(rhs):
            res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                        M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
            return jnp.where(interior, res.x, 0.0), res.iters

        return free_solve

    def lhs_diag(bdt2):
        return jnp.stack([
            m_diag + bdt2 * assembly2d.stiffness_diag(shape, A11, dtype),
            m_diag + bdt2 * assembly2d.stiffness_diag(shape, A22, dtype),
        ])

    def load_at(t):
        return jnp.stack([
            assembly2d.assemble_load(xs, ys,
                                     lambda x, y: problem.f1(x, y, t)),
            assembly2d.assemble_load(xs, ys,
                                     lambda x, y: problem.f2(x, y, t)),
        ])

    u0g = u_bc + jnp.where(interior, jnp.stack([
        problem.u01(X, Y) * jnp.ones_like(X),
        problem.u02(X, Y) * jnp.ones_like(X)]), 0.0)
    v0g = jnp.where(interior, jnp.stack([
        problem.v01(X, Y) * jnp.ones_like(X),
        problem.v02(X, Y) * jnp.ones_like(X)]), 0.0).astype(dtype)
    return (dtype, xs, ys, interior, u_bc, apply_K, apply_M,
            make_free_solve, lhs_diag, jnp.stack([m_diag, m_diag]),
            load_at, u0g.astype(dtype), v0g)


def _energy(apply_K, apply_M, u, v, u_bc):
    """Discrete energy 1/2 v^T M_rho v + 1/2 (u-u_bc)^T K (u-u_bc) + the
    boundary-coupling work term — for homogeneous Dirichlet data this is
    the standard conserved quadratic form of Newmark (1/4, 1/2)."""
    ud = u - u_bc
    return 0.5 * (jnp.vdot(v, apply_M(v)) + jnp.vdot(ud, apply_K(ud))
                  + 2.0 * jnp.vdot(ud, apply_K(u_bc)))


def elastic_wave_march_2d(problem: ElasticWaveProblem2D,
                          cfg: ElasticConfig2D, tcfg: TransientConfig,
                          beta: float = 0.25, gamma_n: float = 0.5
                          ) -> ElasticWaveSolution2D:
    """FEM Newmark-beta march on the block Q1 system (module docstring)."""
    dt = tcfg.t_final / tcfg.n_steps
    (dtype, xs, ys, interior, u_bc, apply_K, apply_M, make_free_solve,
     lhs_diag, m_diag2, load_at, u0g, v0g) = _march_pieces(problem, cfg, dt)
    bdt2 = beta * dt * dt
    solve_lhs = make_free_solve(lambda u: apply_M(u) + bdt2 * apply_K(u),
                                lhs_diag(bdt2))
    solve_mass = make_free_solve(apply_M, m_diag2)

    def step(carry, t):
        u, v, a = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - apply_K(pred)
        a1, iters = solve_lhs(rhs)
        u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        return (u1, v1, a1), iters

    a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype)) - apply_K(u0g))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _), iters = _march_scan(step, (u0g, v0g, a0g), ts,
                                     problem, cfg, tcfg,
                                     "elastic_wave_march_2d")
    return ElasticWaveSolution2D(
        xs=xs, ys=ys, fem_values=uN, velocity=vN, coeffs=None,
        t_final=tcfg.t_final, cg_iters=jnp.max(iters),
        energy0=_energy(apply_K, apply_M, u0g, v0g, u_bc),
        energyN=_energy(apply_K, apply_M, uN, vN, u_bc),
        lam=problem.elastic.lam, mu=problem.elastic.mu,
    )


def hybrid_elastic_wave_march_2d(problem: ElasticWaveProblem2D,
                                 cfg: ElasticConfig2D,
                                 tcfg: TransientConfig,
                                 beta: float = 0.25,
                                 gamma_n: float = 0.5
                                 ) -> ElasticWaveSolution2D:
    """LSSVR-enhanced Newmark march: coupled per-element vector (u, v, a)
    coefficient triples riding the FEM march's traces (module docstring).

    Requires beta > 0: the enhanced acceleration traces are recovered as
    (u_trace - pred_trace) / (beta dt^2), so the explicit central-difference
    member (beta = 0) has no enhanced form — use the FEM-only march."""
    if beta <= 0.0:
        raise ValueError("hybrid march needs beta > 0 (trace recovery "
                         "divides by beta dt^2); beta=0 runs only the "
                         "FEM-only elastic_wave_march_2d")
    p = problem.elastic
    dt = tcfg.t_final / tcfg.n_steps
    dtypec = cfg.jnp_dtype()
    M, C = cfg.M, cfg.n_colloc
    rho = problem.rho
    D64, B64, Mass_s64, t_int, bpts = _block_colloc_host(p, cfg)
    Mass_blk = np.kron(np.eye(2), Mass_s64)  # [2 C^2, 2 M^2]
    bdt2 = beta * dt * dt
    shared = kkt.precompute_shared_lse_host(rho * Mass_blk + bdt2 * D64,
                                            B64, dtypec)
    proj = kkt.precompute_shared_lse_host(Mass_blk, B64, dtypec)
    D_j = jnp.asarray(D64, dtypec)
    B_j = jnp.asarray(B64, dtypec)
    t_int_j = jnp.asarray(t_int)
    bpts_j = jnp.asarray(bpts)
    hi = jax.lax.Precision.HIGHEST

    (dtype, xs, ys, interior, u_bc, apply_K, apply_M, make_free_solve,
     lhs_diag, m_diag2, load_at, u0g, v0g) = _march_pieces(problem, cfg, dt)
    solve_lhs = make_free_solve(lambda u: apply_M(u) + bdt2 * apply_K(u),
                                lhs_diag(bdt2))
    solve_mass = make_free_solve(apply_M, m_diag2)

    # collocation coordinates (iy, ix) x (cy, cx)
    hx = float(xs[1] - xs[0])
    hy = float(ys[1] - ys[0])
    t_j = jnp.asarray(t_int, dtype)
    xq = 0.5 * (xs[1:] + xs[:-1])[:, None] + 0.5 * hx * t_j[None, :]
    yq = 0.5 * (ys[1:] + ys[:-1])[:, None] + 0.5 * hy * t_j[None, :]
    E = cfg.nx * cfg.ny
    ones4 = jnp.ones((cfg.ny, cfg.nx, C, C), dtype)

    def grid_rows(fn, *a):
        return (fn(xq[None, :, None, :], yq[:, None, :, None], *a)
                * ones4).reshape(E, C * C)

    def f_rows_at(t):
        return jnp.concatenate([grid_rows(problem.f1, t),
                                grid_rows(problem.f2, t)], axis=1)

    comp_p = [_component_problem(p, c) for c in range(2)]
    comp_p0 = [dataclasses.replace(
        q, g=lambda x, y: jnp.zeros_like(x + y)) for q in comp_p]

    def traces(u, probs):
        rows = [_element_data_2d(probs[c], cfg, xs, ys, u[c], t_int_j,
                                 bpts_j, trace_lift=cfg.trace_lift,
                                 skip_f=True)[1]
                for c in range(2)]
        return jnp.concatenate(rows, axis=1)  # [E, 2 (4M-4)]

    def step(carry, t):
        u, v, a, wu, wv, wa = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        rhs = load_at(t + dt) - apply_K(pred)
        a1, iters = solve_lhs(rhs)
        u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        # element polynomials: one block LSE for the acceleration
        w_pred = wu + dt * wv + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
        f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_j.T, precision=hi)
        bc_a = (traces(u1, comp_p)
                - jnp.dot(w_pred, B_j.T, precision=hi)) / bdt2
        wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
        wu1 = w_pred + bdt2 * wa1
        wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
        return (u1, v1, a1, wu1, wv1, wa1), iters

    a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype)) - apply_K(u0g))
    # initial fits: u0/v0 by value projection; a0 from the momentum
    # balance rho a0 = f(0) + div sigma(u0) with the FEM a0's traces
    u0_rows = jnp.concatenate([grid_rows(problem.u01),
                               grid_rows(problem.u02)], axis=1)
    v0_rows = jnp.concatenate([grid_rows(problem.v01),
                               grid_rows(problem.v02)], axis=1)
    wu0, _ = kkt.solve_primal_shared(proj, u0_rows, traces(u0g, comp_p))
    wv0, _ = kkt.solve_primal_shared(proj, v0_rows, traces(v0g, comp_p0))
    fa0 = (f_rows_at(jnp.asarray(0.0, dtype))
           - jnp.dot(wu0, D_j.T, precision=hi)) / rho
    wa0, _ = kkt.solve_primal_shared(proj, fa0, traces(a0g, comp_p0))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _, wuN, _, _), iters = _march_scan(
        step, (u0g, v0g, a0g, wu0, wv0, wa0), ts, problem, cfg, tcfg,
        "hybrid_elastic_wave_march_2d")
    return ElasticWaveSolution2D(
        xs=xs, ys=ys, fem_values=uN, velocity=vN,
        coeffs=jnp.stack([
            wuN[:, :M * M].reshape(cfg.ny, cfg.nx, M, M),
            wuN[:, M * M:].reshape(cfg.ny, cfg.nx, M, M)]),
        t_final=tcfg.t_final, cg_iters=jnp.max(iters),
        energy0=_energy(apply_K, apply_M, u0g, v0g, u_bc),
        energyN=_energy(apply_K, apply_M, uN, vN, u_bc),
        lam=p.lam, mu=p.mu,
    )


def evaluate_elastic_wave_2d(sol: ElasticWaveSolution2D, x, y):
    """(u1, u2) at t_final from the enhanced coefficients (same tensor
    contraction as ``elastic.evaluate_elastic_2d``)."""
    from .elastic import evaluate_elastic_2d

    assert sol.coeffs is not None, "FEM-only march has no coefficients"
    # ElasticWaveSolution2D duck-types ElasticSolution2D's xs/ys/coeffs.
    return evaluate_elastic_2d(sol, x, y)


# ---------------------------------------------------------------------------
# 3D elastodynamics: the tensor lift onto structured hexes
# (coarse blocks from models/elastic3d.py, trace machinery from hybrid3d).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ElasticWaveProblem3D:
    """rho u_tt - div sigma(u) = f(x, y, z, t) on a box; spatial
    operator / Lame coefficients / (time-independent) Dirichlet data
    from ``elastic3d.ElasticProblem3D``."""

    name: str
    elastic: "object"  # ElasticProblem3D
    f: tuple  # 3 components f_c(x, y, z, t)
    u0: tuple  # 3 components (x, y, z)
    v0: tuple
    rho: float = 1.0
    exact: Optional[tuple] = None  # 3 components (x, y, z, t)


def elastic_wave_3d(lam: float = 1.0, mu: float = 1.0, rho: float = 1.0,
                    omega: float = float(np.pi)) -> ElasticWaveProblem3D:
    """Manufactured forced motion: the ``sin_elastic_3d`` displacement
    field oscillating as cos(omega t) (same construction as the 2D
    ``elastic_wave_2d``)."""
    from .elastic3d import sin_elastic_3d

    st = sin_elastic_3d(lam=lam, mu=mu)

    def make_f(fs, us):
        return lambda x, y, z, t: jnp.cos(omega * t) * (
            fs(x, y, z) - rho * omega ** 2 * us(x, y, z))

    def make_exact(us):
        return lambda x, y, z, t: jnp.cos(omega * t) * us(x, y, z)

    zero = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    return ElasticWaveProblem3D(
        name="elastic_wave_3d", elastic=st,
        f=tuple(make_f(fs, us) for fs, us in zip(st.f, st.exact)),
        u0=st.exact, v0=(zero, zero, zero), rho=rho,
        exact=tuple(make_exact(us) for us in st.exact),
    )


class ElasticWaveSolution3D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    zs: jnp.ndarray
    fem_values: jnp.ndarray  # [3, nz+1, ny+1, nx+1] at t_final
    velocity: jnp.ndarray
    coeffs: Optional[jnp.ndarray]  # [3, nz, ny, nx, M, M, M]
    t_final: float
    cg_iters: jnp.ndarray
    energy0: jnp.ndarray
    energyN: jnp.ndarray
    lam: float = 1.0
    mu: float = 1.0


def _march_pieces_3d(problem: ElasticWaveProblem3D, cfg, dt: float):
    from ..ops import assembly3d
    from .elastic3d import _block_locals_3d

    if cfg.precond == "mg":
        raise ValueError(
            "the elastodynamics marches use Jacobi-preconditioned CG "
            "(mass-dominated Newmark LHS); precond='mg' is not supported "
            "— use 'jacobi' or 'auto'"
        )
    if cfg.coarse != "q1":
        raise ValueError(
            "the elastodynamics marches run the q1 block coarse stage "
            "per step; coarse='richardson' applies only to the steady "
            "solves"
        )
    p = problem.elastic
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    diag_loc, off_loc = _block_locals_3d(p, hx, hy, hz, dtype)
    # exact tensor-product consistent mass (a0=0, c=1 local operator)
    Ms = problem.rho * jnp.asarray(
        assembly3d.q1_local_operator_3d(hx, hy, hz, a0=0.0, c=1.0), dtype)
    xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
    nz1, ny1, nx1 = cfg.nz + 1, cfg.ny + 1, cfg.nx + 1
    interior = jnp.zeros((nz1, ny1, nx1), bool).at[
        1:-1, 1:-1, 1:-1].set(True)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    ones = jnp.ones((nz1, ny1, nx1), dtype)
    u_bc = jnp.stack([jnp.where(interior, 0.0, gc(X, Y, Z) * ones)
                      for gc in p.g])
    A = assembly3d.apply_stiffness_3d
    Axy, Axz, Ayz = off_loc["xy"], off_loc["xz"], off_loc["yz"]

    def apply_K(u):
        r1 = A(u[0], diag_loc["x"]) + A(u[1], Axy) + A(u[2], Axz)
        r2 = A(u[0], Axy.T) + A(u[1], diag_loc["y"]) + A(u[2], Ayz)
        r3 = A(u[0], Axz.T) + A(u[1], Ayz.T) + A(u[2], diag_loc["z"])
        return jnp.stack([r1, r2, r3])

    def apply_M(u):
        return jnp.stack([A(u[c], Ms) for c in range(3)])

    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    shape = (nz1, ny1, nx1)
    m_diag = assembly3d.stiffness_diag_3d(shape, Ms, dtype)

    def make_free_solve(apply_full, diag):
        def apply_free(v):
            return jnp.where(interior, apply_full(v * interior), 0.0)

        M_inv = jnp.where(interior, 1.0 / diag, 1.0)

        def free_solve(rhs):
            res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                        M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter)
            return jnp.where(interior, res.x, 0.0), res.iters

        return free_solve

    def lhs_diag(bdt2):
        return jnp.stack([
            m_diag + bdt2 * assembly3d.stiffness_diag_3d(
                shape, diag_loc[d], dtype)
            for d in ("x", "y", "z")])

    def load_at(t):
        return jnp.stack([
            assembly3d.assemble_load_3d(
                xs, ys, zs, lambda x, y, z, fc=fc: fc(x, y, z, t))
            for fc in problem.f])

    u0g = u_bc + jnp.where(interior, jnp.stack(
        [uc(X, Y, Z) * ones for uc in problem.u0]), 0.0)
    v0g = jnp.where(interior, jnp.stack(
        [vc(X, Y, Z) * ones for vc in problem.v0]), 0.0).astype(dtype)
    return (dtype, xs, ys, zs, interior, u_bc, apply_K, apply_M,
            make_free_solve, lhs_diag, jnp.stack([m_diag] * 3),
            load_at, u0g.astype(dtype), v0g)


def elastic_wave_march_3d(problem: ElasticWaveProblem3D, cfg,
                          tcfg: TransientConfig, beta: float = 0.25,
                          gamma_n: float = 0.5) -> ElasticWaveSolution3D:
    """FEM Newmark-beta march on the nine-block Q1 hex system."""
    dt = tcfg.t_final / tcfg.n_steps
    (dtype, xs, ys, zs, interior, u_bc, apply_K, apply_M,
     make_free_solve, lhs_diag, m_diag3, load_at, u0g,
     v0g) = _march_pieces_3d(problem, cfg, dt)
    bdt2 = beta * dt * dt
    solve_lhs = make_free_solve(lambda u: apply_M(u) + bdt2 * apply_K(u),
                                lhs_diag(bdt2))
    solve_mass = make_free_solve(apply_M, m_diag3)

    def step(carry, t):
        u, v, a = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        a1, iters = solve_lhs(load_at(t + dt) - apply_K(pred))
        u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        return (u1, v1, a1), iters

    a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype)) - apply_K(u0g))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _), iters = _march_scan(step, (u0g, v0g, a0g), ts,
                                     problem, cfg, tcfg,
                                     "elastic_wave_march_3d")
    return ElasticWaveSolution3D(
        xs=xs, ys=ys, zs=zs, fem_values=uN, velocity=vN, coeffs=None,
        t_final=tcfg.t_final, cg_iters=jnp.max(iters),
        energy0=_energy(apply_K, apply_M, u0g, v0g, u_bc),
        energyN=_energy(apply_K, apply_M, uN, vN, u_bc),
        lam=problem.elastic.lam, mu=problem.elastic.mu,
    )


def hybrid_elastic_wave_march_3d(problem: ElasticWaveProblem3D, cfg,
                                 tcfg: TransientConfig,
                                 beta: float = 0.25,
                                 gamma_n: float = 0.5
                                 ) -> ElasticWaveSolution3D:
    """Enhanced 3D Newmark march: coupled per-hex vector (u, v, a)
    coefficient triples, one block LSE solve of
    rho Mass_blk + beta dt^2 D_blk per step (3D mirror of the 2D march).
    Requires beta > 0 (same trace-recovery division as the 2D march)."""
    if beta <= 0.0:
        raise ValueError("hybrid march needs beta > 0 (trace recovery "
                         "divides by beta dt^2); beta=0 runs only the "
                         "FEM-only elastic_wave_march_3d")
    from .elastic3d import (_block_colloc_host_3d, _component_problem_3d)
    from .hybrid3d import _element_data_3d

    p = problem.elastic
    dt = tcfg.t_final / tcfg.n_steps
    dtypec = cfg.jnp_dtype()
    M, C = cfg.M, cfg.n_colloc
    rho = problem.rho
    D64, B64, Mass_s64, t_int, spts = _block_colloc_host_3d(p, cfg)
    Mass_blk = np.kron(np.eye(3), Mass_s64)
    bdt2 = beta * dt * dt
    shared = kkt.precompute_shared_lse_host(rho * Mass_blk + bdt2 * D64,
                                            B64, dtypec)
    proj = kkt.precompute_shared_lse_host(Mass_blk, B64, dtypec)
    D_j = jnp.asarray(D64, dtypec)
    B_j = jnp.asarray(B64, dtypec)
    t_int_j = jnp.asarray(t_int)
    spts_j = jnp.asarray(spts)
    hi = jax.lax.Precision.HIGHEST

    (dtype, xs, ys, zs, interior, u_bc, apply_K, apply_M,
     make_free_solve, lhs_diag, m_diag3, load_at, u0g,
     v0g) = _march_pieces_3d(problem, cfg, dt)
    solve_lhs = make_free_solve(lambda u: apply_M(u) + bdt2 * apply_K(u),
                                lhs_diag(bdt2))
    solve_mass = make_free_solve(apply_M, m_diag3)

    hx = float(xs[1] - xs[0])
    hy = float(ys[1] - ys[0])
    hz = float(zs[1] - zs[0])
    t_j = jnp.asarray(t_int, dtype)
    xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
    yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
    zq = zs[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
    E = cfg.nx * cfg.ny * cfg.nz
    ones6 = jnp.ones((cfg.nz, cfg.ny, cfg.nx, C, C, C), dtype)

    def grid_rows(fn, *a):
        return (fn(xq[None, None, :, None, None, :],
                   yq[None, :, None, None, :, None],
                   zq[:, None, None, :, None, None], *a)
                * ones6).reshape(E, C * C * C)

    def f_rows_at(t):
        return jnp.concatenate([grid_rows(fc, t) for fc in problem.f],
                               axis=1)  # [E, 3 C^3]

    comp_p = [_component_problem_3d(p, c) for c in range(3)]
    comp_p0 = [dataclasses.replace(
        q, g=lambda x, y, z: jnp.zeros_like(x + y + z)) for q in comp_p]

    def traces(u, probs):
        rows = [_element_data_3d(probs[c], cfg, xs, ys, zs, u[c],
                                 t_int_j, spts_j,
                                 trace_lift=cfg.trace_lift,
                                 skip_f=True)[1]
                for c in range(3)]
        return jnp.concatenate(rows, axis=1)

    def step(carry, t):
        u, v, a, wu, wv, wa = carry
        pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
        a1, iters = solve_lhs(load_at(t + dt) - apply_K(pred))
        u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
        v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
        w_pred = wu + dt * wv + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
        f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_j.T, precision=hi)
        bc_a = (traces(u1, comp_p)
                - jnp.dot(w_pred, B_j.T, precision=hi)) / bdt2
        wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
        wu1 = w_pred + bdt2 * wa1
        wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
        return (u1, v1, a1, wu1, wv1, wa1), iters

    a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype)) - apply_K(u0g))
    u0_rows = jnp.concatenate([grid_rows(uc) for uc in problem.u0],
                              axis=1)
    v0_rows = jnp.concatenate([grid_rows(vc) for vc in problem.v0],
                              axis=1)
    wu0, _ = kkt.solve_primal_shared(proj, u0_rows, traces(u0g, comp_p))
    wv0, _ = kkt.solve_primal_shared(proj, v0_rows, traces(v0g, comp_p0))
    fa0 = (f_rows_at(jnp.asarray(0.0, dtype))
           - jnp.dot(wu0, D_j.T, precision=hi)) / rho
    wa0, _ = kkt.solve_primal_shared(proj, fa0, traces(a0g, comp_p0))
    ts = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    (uN, vN, _, wuN, _, _), iters = _march_scan(
        step, (u0g, v0g, a0g, wu0, wv0, wa0), ts, problem, cfg, tcfg,
        "hybrid_elastic_wave_march_3d")
    M3 = M * M * M
    shp = (cfg.nz, cfg.ny, cfg.nx, M, M, M)
    return ElasticWaveSolution3D(
        xs=xs, ys=ys, zs=zs, fem_values=uN, velocity=vN,
        coeffs=jnp.stack([wuN[:, c * M3:(c + 1) * M3].reshape(shp)
                          for c in range(3)]),
        t_final=tcfg.t_final, cg_iters=jnp.max(iters),
        energy0=_energy(apply_K, apply_M, u0g, v0g, u_bc),
        energyN=_energy(apply_K, apply_M, uN, vN, u_bc),
        lam=p.lam, mu=p.mu,
    )


def evaluate_elastic_wave_3d(sol: ElasticWaveSolution3D, x, y, z):
    """(u1, u2, u3) at t_final from the enhanced coefficients."""
    from .elastic3d import evaluate_elastic_3d

    assert sol.coeffs is not None, "FEM-only march has no coefficients"
    # duck-types ElasticSolution3D's xs/ys/zs/coeffs
    return evaluate_elastic_3d(sol, x, y, z)
