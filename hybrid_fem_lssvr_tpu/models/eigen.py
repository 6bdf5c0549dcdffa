"""Sturm–Liouville eigenvalue family: A u = lambda M u, hybrid-enhanced.

The reference prototype (``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py``)
solves only source problems -u'' = f.  This module extends the same
two-level hybrid scheme to the symmetric eigenproblem

    L u = -(a(x) u')' + c(x) u = lambda u   on (x0, x1),   u(x0)=u(x1)=0,

which the per-element machinery supports verbatim: given a FEM eigenpair
(lambda_h, u_h), each element solves the reference's constrained QP
(``Hybrid-FEM-LSSVR.py:20-105``) for the *shifted* operator L - lambda_h
with zero right-hand side and traces pinned to the FEM nodal eigenvector —
i.e. ``lssvr_enhance`` on a derived ``Problem1D`` with
``c <- c - lambda_h`` and ``f <- 0``.

Pipeline (all stages batched / TPU-resident; the tiny K x K Rayleigh–Ritz
is host-side numpy, like the other setup-time f64 precomputes):

1. ``fem_eigensolve`` — generalized tridiagonal eigenproblem on interior
   dofs via inverse subspace iteration: V <- A^{-1} (M V) (one multi-column
   Thomas solve per step), M-orthonormalisation through a Cholesky of the
   K x K Gram, then one host Rayleigh–Ritz extraction.  ``mass`` selects
   the consistent P1 mass (eigenvalue error O(h^2)) or the Numerov
   (1, 10, 1)/12 mass (O(h^4) dispersion, constant coefficients).
2. ``enhance_eigenpair`` — the derived-problem LSSVR enhancement above.
3. ``rayleigh_quotient`` — exact-quadrature Rayleigh quotient of the
   enhanced piecewise polynomial; because the quotient's error is
   *quadratic* in the eigenfunction error, the enhanced lambda lands far
   below the FEM dispersion floor.
4. ``hybrid_eigensolve`` — per-pair fixed-point: enhance with the current
   lambda, re-estimate via the quotient (``rq_iters`` rounds).

On a uniform mesh the discrete eigenvectors of the (consistent or
Numerov) tridiagonal pencil are exactly the sampled sines, so for
-u'' = lambda u ALL the discrete error sits in lambda_h — the enhanced
quotient is then limited only by the shifted-operator enhancement floor.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import assembly, legendre, tridiag
from .hybrid import SolverConfig, lssvr_enhance, prepare_shared_host, \
    uniform_nodes
from .problem import Problem1D, _zero


@dataclasses.dataclass(frozen=True)
class EigenConfig:
    """Eigensolver knobs (validated, frozen — like every config here)."""

    k: int = 4  # number of smallest eigenpairs
    iters: int = 40  # inverse subspace iterations
    mass: str = "consistent"  # 'consistent' | 'numerov'
    rq_iters: int = 2  # enhancement <-> Rayleigh-quotient rounds
    oversample: int = 2  # extra subspace vectors (guard the K-th pair)
    # 2D/3D: tangential-interpolation stencil width for the element-edge
    # trace lift (>= 2; 0 disables and keeps the O(h^2) bilinear trace).
    # Lifting is what lets the enhanced quotient beat the FEM dispersion
    # floor in 2D — it is only valid because eigenvector NODAL values are
    # high-order (exact on tensor pencils), unlike source-problem solves.
    trace_lift: int = 6

    def __post_init__(self):
        if self.k < 1:
            raise ValueError(f"k must be >= 1, got {self.k}")
        if self.iters < 1:
            raise ValueError(f"iters must be >= 1, got {self.iters}")
        if self.mass not in ("consistent", "numerov"):
            raise ValueError(f"unknown mass: {self.mass!r}")
        if self.rq_iters < 0:
            raise ValueError(f"rq_iters must be >= 0, got {self.rq_iters}")
        if self.oversample < 0:
            raise ValueError(
                f"oversample must be >= 0, got {self.oversample}")


class EigenSolution(NamedTuple):
    nodes: jnp.ndarray  # [N]
    lams: jnp.ndarray  # [K] Rayleigh–Ritz eigenvalues, ascending
    vectors: jnp.ndarray  # [N, K] M-orthonormal nodal eigenvectors
    residuals: jnp.ndarray  # [K] ||A v - lam M v||_inf diagnostics


class HybridEigenSolution(NamedTuple):
    fem: EigenSolution
    coeffs: jnp.ndarray  # [K, E, M] per-element Legendre coefficients
    lams: jnp.ndarray  # [K] enhanced (Rayleigh-quotient) eigenvalues
    solve_ok: jnp.ndarray  # [K, E] enhancement fallback mask


def _check_symmetric_dirichlet(problem: Problem1D, nodes):
    if problem.bc_left != "dirichlet" or problem.bc_right != "dirichlet":
        raise NotImplementedError(
            "eigensolver requires Dirichlet ends (natural-BC eigenproblems "
            "need the boundary mass terms in the pencil)")
    if problem.b is not None and problem.b is not _zero:
        if bool(np.any(np.asarray(problem.b(nodes)) != 0.0)):
            raise NotImplementedError(
                "eigensolver requires b == 0 (symmetric pencil)")


def _pencil(problem: Problem1D, nodes, cfg: SolverConfig, mass: str):
    """Interior-dof diagonals of the stiffness/mass pencil (A, M)."""
    zero_f = lambda x: jnp.zeros_like(x)  # noqa: E731
    if mass == "numerov":
        from .transient import _numerov_setup

        A, Mm, _, _ = _numerov_setup(
            problem, nodes, lambda x, t: jnp.zeros_like(x))
    else:
        sub_a, main_a, sup_a, _ = assembly.assemble_p1(
            nodes, problem.a, None, problem.c, zero_f,
            quad_order=cfg.fem_quad_order)
        sub_m, main_m, sup_m, _ = assembly.assemble_p1(
            nodes, None, None, lambda x: jnp.ones_like(x), zero_f,
            quad_order=cfg.fem_quad_order)
        A = (sub_a, main_a, sup_a)
        Mm = (sub_m, main_m, sup_m)

    def interior(trip):
        sub, main, sup = trip
        return (sub[1:-1].at[0].set(0.0), main[1:-1],
                sup[1:-1].at[-1].set(0.0))

    return interior(A), interior(Mm)


def _tri_matvec(trip, V):
    """Tridiagonal multi-vector product, V: [n, K]."""
    sub, main, sup = trip
    up = jnp.concatenate([V[1:], jnp.zeros_like(V[:1])])
    dn = jnp.concatenate([jnp.zeros_like(V[:1]), V[:-1]])
    return main[:, None] * V + sub[:, None] * dn + sup[:, None] * up


def _m_orthonormalize(Mt, V):
    """V <- V R^{-1} with R = chol(V^T M V)^T (Cholesky QR in the M inner
    product; K x K, well-conditioned after the first iteration)."""
    G = V.T @ _tri_matvec(Mt, V)
    L = jnp.linalg.cholesky(0.5 * (G + G.T))
    return jax.scipy.linalg.solve_triangular(
        L, V.T, lower=True).T


def _require_f64_eigen(dtype, where: str):
    """Loud f32 gate for the 2D/3D eigensolves: their f32
    inverse-iteration pencil residual floors at ~1e-2 at 32^2
    (RESULTS.md eigen section), so eigenvalues/vectors would be silently
    garbage.  The 1D path is NOT gated — its f32 pipeline measures at the
    f32 quotient floor (test_eigen.py::test_f32_pipeline_reaches_f32_floor).  TPU-emulated f64 runs every op this family uses
    (CG/MG are elementwise + dots; CLAUDE.md f64 probe), so f64 is the
    supported on-chip route (measured on-chip f64 == CPU f64 to all
    digits shown, RESULTS.md)."""
    import jax.numpy as _jnp

    if _jnp.dtype(dtype) == _jnp.float32:
        raise ValueError(
            f"{where} requires dtype='float64' (enable jax_enable_x64 / "
            "--x64): the f32 inverse-iteration pencil residual floors at "
            "~1e-2 — use f64, which runs on TPU via emulated f64"
        )


def fem_eigensolve(problem: Problem1D, cfg: SolverConfig,
                   ecfg: EigenConfig = EigenConfig(),
                   nodes: Optional[jnp.ndarray] = None) -> EigenSolution:
    """K smallest eigenpairs of the P1 (or Numerov) pencil.

    Deterministic sine-sheet start (the exact eigenvectors of the
    constant-coefficient pencil on a uniform mesh), ``ecfg.iters`` inverse
    subspace iterations, host Rayleigh–Ritz.
    """
    dtype = cfg.jnp_dtype()
    if nodes is None:
        nodes = uniform_nodes(problem, cfg.num_nodes, dtype)
    _check_symmetric_dirichlet(problem, nodes)
    At, Mt = _pencil(problem, nodes, cfg, ecfg.mass)

    x0, x1 = problem.domain
    L = x1 - x0
    K = ecfg.k
    Ks = K + ecfg.oversample
    n = nodes.shape[0] - 2
    if Ks > n:
        raise ValueError(
            f"k + oversample = {Ks} exceeds interior dofs ({n})")
    xi = nodes[1:-1]
    js = jnp.arange(1, Ks + 1, dtype=dtype)
    V0 = jnp.sin(jnp.pi * js[None, :] * (xi[:, None] - x0) / L)

    def step(V, _):
        W = tridiag.thomas(*At, _tri_matvec(Mt, V))
        return _m_orthonormalize(Mt, W), None

    @jax.jit
    def _iterate(V):
        V, _ = jax.lax.scan(step, _m_orthonormalize(Mt, V),
                            None, length=ecfg.iters)
        H = V.T @ _tri_matvec(At, V)
        G = V.T @ _tri_matvec(Mt, V)
        return V, 0.5 * (H + H.T), 0.5 * (G + G.T)

    V, H, G = _iterate(V0)
    # Host Rayleigh–Ritz on the K_s x K_s projected pencil (setup-class
    # f64 work, same policy as prepare_shared_host).
    Hn = np.asarray(H, np.float64)
    Gn = np.asarray(G, np.float64)
    Ln = np.linalg.cholesky(Gn)
    Hs = np.linalg.solve(Ln, np.linalg.solve(Ln, Hn).T).T
    w, S = np.linalg.eigh(0.5 * (Hs + Hs.T))
    Q = np.linalg.solve(Ln.T, S)[:, :K]
    lams = jnp.asarray(w[:K], dtype)
    Vr = V @ jnp.asarray(Q, dtype)  # [n, K], M-orthonormal
    # Sign convention: positive slope at the left end (u[1] > 0), matching
    # sqrt(2/L) sin(j pi (x - x0)/L).
    sign = jnp.where(Vr[0] >= 0, 1.0, -1.0).astype(dtype)
    Vr = Vr * sign[None, :]
    res = jnp.max(
        jnp.abs(_tri_matvec(At, Vr) - lams[None, :] * _tri_matvec(Mt, Vr)),
        axis=0)
    vecs = jnp.zeros((nodes.shape[0], K), dtype).at[1:-1, :].set(Vr)
    return EigenSolution(nodes, lams, vecs, res)


def _shifted_problem(problem: Problem1D, lam: float) -> Problem1D:
    """The enhancement's derived source problem: (L - lam) p = 0 with the
    FEM eigenvector traces as Dirichlet pins."""
    base_c = problem.c
    return dataclasses.replace(
        problem,
        name=f"{problem.name}_eig_shift",
        f=_zero,
        c=lambda x: base_c(x) - lam,
        g_left=0.0,
        g_right=0.0,
        f_shifted=None,
        f_elem_factors=None,
        f_colloc_factors=None,
        f_translation=None,
        exact=None,
        exact_dx=None,
    )


def enhance_eigenpair(problem: Problem1D, nodes, lam: float, u_nodal,
                      cfg: SolverConfig):
    """Per-element LSSVR fit of the shifted homogeneous operator, traces
    pinned to the FEM nodal eigenvector (reference constraint structure,
    ``Hybrid-FEM-LSSVR.py:62-79``, with f = 0 and c -> c - lam)."""
    shifted = _shifted_problem(problem, float(lam))
    shared = prepare_shared_host(shifted, cfg)
    x0, x1 = problem.domain
    h = (x1 - x0) / (cfg.num_nodes - 1)
    geom = (x0, h) if shifted.constant_coeffs else None
    return lssvr_enhance(shifted, nodes, u_nodal, cfg,
                         shared_ops=shared, uniform_geom=geom)


def _quadrature_forms(problem: Problem1D, nodes, coeffs, cfg: SolverConfig):
    """(int a p'^2 + c p^2, int p^2) over the piecewise polynomial, by
    per-element Gauss quadrature exact for the polynomial terms (degree
    2M-2 -> M+1 points; coefficient variation is smooth)."""
    dtype = coeffs.dtype
    q = cfg.M + 2
    tq, wq = np.polynomial.legendre.leggauss(q)
    t = jnp.asarray(tq, dtype)
    w = jnp.asarray(wq, dtype)
    V0, V1 = legendre.legendre_vandermonde(t, cfg.M, num_derivs=1)
    xl, xr = nodes[:-1], nodes[1:]
    h = (xr - xl)[:, None]  # [E, 1]
    xq = 0.5 * (xl + xr)[:, None] + 0.5 * h * t[None, :]  # [E, Q]
    P = coeffs @ V0.T  # [E, Q]
    dP = (coeffs @ V1.T) * (2.0 / h)
    a = problem.a(xq) * jnp.ones_like(xq)
    c = problem.c(xq) * jnp.ones_like(xq)
    dx = 0.5 * h * w[None, :]
    num = jnp.sum(dx * (a * dP**2 + c * P**2))
    den = jnp.sum(dx * P**2)
    return num, den


def rayleigh_quotient(problem: Problem1D, nodes, coeffs, cfg: SolverConfig):
    """lambda* — the quotient's error is quadratic in the eigenfunction
    error, which is what buys the enhanced eigenvalues their floor."""
    num, den = _quadrature_forms(problem, nodes, coeffs, cfg)
    return num / den


def hybrid_eigensolve(problem: Problem1D, cfg: SolverConfig,
                      ecfg: EigenConfig = EigenConfig()
                      ) -> HybridEigenSolution:
    """FEM eigensolve, then per-pair enhancement with Rayleigh-quotient
    eigenvalue refinement.

    Each round enhances with the current lambda estimate (a host float —
    it enters the setup-time shared-operator precompute) and re-reads
    lambda from the enhanced polynomial's quotient; the quotient error is
    quadratic in the eigenfunction error, so one round already drops far
    below the FEM dispersion floor and ``rq_iters=2`` is saturated.
    """
    fem = fem_eigensolve(problem, cfg, ecfg)
    coeffs_all, lams, oks = [], [], []
    for j in range(ecfg.k):
        lam = float(fem.lams[j])
        u = fem.vectors[:, j]
        coeffs, diags = None, None
        for _ in range(max(1, ecfg.rq_iters)):
            coeffs, diags = enhance_eigenpair(problem, fem.nodes, lam, u,
                                              cfg)
            lam = float(rayleigh_quotient(problem, fem.nodes, coeffs, cfg))
        # Output convention: unit CONTINUOUS L2 norm (the discrete
        # M-normalisation of the nodal vector carries an O(h^2) amplitude
        # factor that would otherwise dominate the pointwise error of the
        # enhanced polynomial).
        _, den = _quadrature_forms(problem, fem.nodes, coeffs, cfg)
        coeffs_all.append(coeffs / jnp.sqrt(den))
        lams.append(lam)
        oks.append(diags.solve_ok)
    return HybridEigenSolution(
        fem,
        jnp.stack(coeffs_all),
        jnp.asarray(lams, fem.lams.dtype),
        jnp.stack(oks),
    )


def evaluate_eigenfunction(sol: HybridEigenSolution, j: int, x):
    """Enhanced eigenfunction j at query points x (clamped read path, same
    semantics as the source-problem evaluator)."""
    from ..ops import eval as ev

    return ev.evaluate(sol.fem.nodes, sol.coeffs[j], x)


def exact_eigenvalues(problem: Problem1D, k: int, c0: float = 0.0):
    """(j pi / L)^2 + c0 for the constant-coefficient pencil — the test
    oracle for poisson/helmholtz-type problems."""
    x0, x1 = problem.domain
    L = x1 - x0
    j = np.arange(1, k + 1)
    return (j * np.pi / L) ** 2 + c0


# ---------------------------------------------------------------------------
# 2D: -a0 Lap(u) + c u = lambda u on the rectangle, all-Dirichlet.
#
# The reaction term shifts the pencil EXACTLY (A(c) = A(0) + c Mass), so the
# iteration always runs on the SPD a0-Laplacian pencil and adds c afterwards
# — Helmholtz (c < 0) costs nothing extra and CG stays applicable.
# ---------------------------------------------------------------------------


class EigenSolution2D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    lams: jnp.ndarray  # [K] ascending (includes the +c shift)
    vectors: jnp.ndarray  # [K, ny+1, nx+1] Mass-orthonormal nodal grids
    residuals: jnp.ndarray  # [K] ||A v - mu M v||_inf of the SPD pencil


class HybridEigenSolution2D(NamedTuple):
    fem: EigenSolution2D
    coeffs: jnp.ndarray  # [K, ny, nx, M, M]
    lams: jnp.ndarray  # [K] enhanced (Rayleigh-quotient) eigenvalues
    solve_ok: jnp.ndarray  # [K, ny, nx]


def _check_2d_eligible(p):
    if any(t != "dirichlet" for t in p.bc_edges):
        raise NotImplementedError(
            "2D eigensolver requires all-Dirichlet edges")
    if p.b != (0.0, 0.0):
        raise NotImplementedError(
            "2D eigensolver requires b == 0 (symmetric pencil)")
    if p.a_var is not None:
        raise NotImplementedError(
            "2D eigensolver requires constant diffusion")


def _mode_table(p, Ks: int):
    """First Ks tensor modes (i, j) of the a0-Laplacian, ascending."""
    x0, x1, y0, y1 = p.domain
    Lx, Ly = x1 - x0, y1 - y0
    cand = [(p.a0 * np.pi**2 * (i**2 / Lx**2 + j**2 / Ly**2), i, j)
            for i in range(1, Ks + 2) for j in range(1, Ks + 2)]
    cand.sort()
    return cand[:Ks], (x0, Lx, y0, Ly)


def fem_eigensolve_2d(problem, cfg, ecfg: EigenConfig = EigenConfig()
                      ) -> EigenSolution2D:
    """K smallest eigenpairs of the Q1 (or tensor-Numerov) pencil on the
    structured grid: inverse subspace iteration with an MG-CG (or
    Jacobi-CG) inner solve, scan over subspace columns, host
    Rayleigh–Ritz."""
    from ..ops import assembly2d, cg, multigrid

    _check_2d_eligible(problem)
    dtype = cfg.jnp_dtype()
    _require_f64_eigen(dtype, "fem_eigensolve_2d")
    x0, x1, y0, y1 = problem.domain
    nx, ny = cfg.nx, cfg.ny
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    xs = jnp.linspace(x0, x1, nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, ny + 1, dtype=dtype)
    if ecfg.mass == "numerov":
        from .transient import _numerov_locals_2d

        K_A_np, K_M_np = _numerov_locals_2d(hx, hy, problem.a0, 0.0)
        K_A = jnp.asarray(K_A_np, dtype)
        K_M = jnp.asarray(K_M_np, dtype)
    else:
        K_A = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, problem.a0, 0.0, 0.0, 0.0),
            dtype)
        K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    interior = jnp.zeros((ny + 1, nx + 1), bool).at[1:-1, 1:-1].set(True)

    def apply_free(v):
        return jnp.where(interior,
                         assembly2d.apply_stiffness(v * interior, K_A), 0.0)

    def apply_mass(v):
        return assembly2d.apply_stiffness(v, K_M)

    mg_ok = nx % 2 == 0 and ny % 2 == 0 and min(nx, ny) >= 8
    if mg_ok:
        M_inv = multigrid.make_vcycle(ny + 1, nx + 1, K_A, dtype)
    else:
        M_inv = 1.0 / assembly2d.stiffness_diag((ny + 1, nx + 1), K_A,
                                                dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    K = ecfg.k
    Ks = K + ecfg.oversample
    modes, (mx0, Lx, my0, Ly) = _mode_table(problem, Ks)
    X, Y = jnp.meshgrid(xs, ys)
    V0 = jnp.stack([
        jnp.sin(i * jnp.pi * (X - mx0) / Lx)
        * jnp.sin(j * jnp.pi * (Y - my0) / Ly)
        for _, i, j in modes
    ])  # [Ks, ny+1, nx+1]
    V0 = V0 * interior[None]

    def dotg(Af, Bf):
        return jnp.einsum("kij,lij->kl", Af, Bf)

    def orthonormalize(V):
        MV = jax.vmap(apply_mass)(V)
        G = dotg(V, MV)
        L = jnp.linalg.cholesky(0.5 * (G + G.T))
        Vf = V.reshape(Ks, -1)
        Vf = jax.scipy.linalg.solve_triangular(L, Vf, lower=True)
        return Vf.reshape(V.shape)

    def col_solve(carry, v):
        rhs = jnp.where(interior, apply_mass(v), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return carry, res.x

    def step(V, _):
        _, W = jax.lax.scan(col_solve, 0, V)
        return orthonormalize(W), None

    @jax.jit
    def _iterate(V):
        V, _ = jax.lax.scan(step, orthonormalize(V), None,
                            length=ecfg.iters)
        AV = jax.vmap(apply_free)(V)
        MV = jax.vmap(apply_mass)(V)
        H = dotg(V, AV)
        G = dotg(V, MV)
        return V, 0.5 * (H + H.T), 0.5 * (G + G.T)

    V, H, G = _iterate(V0)
    Hn = np.asarray(H, np.float64)
    Gn = np.asarray(G, np.float64)
    Ln = np.linalg.cholesky(Gn)
    Hs = np.linalg.solve(Ln, np.linalg.solve(Ln, Hn).T).T
    w, S = np.linalg.eigh(0.5 * (Hs + Hs.T))
    Q = np.linalg.solve(Ln.T, S)[:, :K]
    mus = jnp.asarray(w[:K], dtype)
    Vr = jnp.einsum("kij,kl->lij", V, jnp.asarray(Q, dtype))  # [K, ., .]
    sign = jnp.where(Vr[:, 1, 1] >= 0, 1.0, -1.0).astype(dtype)
    Vr = Vr * sign[:, None, None]
    AV = jax.vmap(apply_free)(Vr)
    MV = jax.vmap(lambda v: jnp.where(interior, apply_mass(v), 0.0))(Vr)
    res = jnp.max(jnp.abs(AV - mus[:, None, None] * MV), axis=(1, 2))
    lams = mus + jnp.asarray(problem.c, dtype)  # exact reaction shift
    return EigenSolution2D(xs, ys, lams, Vr, res)


# _lift_weights / _lifted_trace_2d moved to models/hybrid2d.py (shared with
# the steady coarse='compact' + trace_lift path); re-imported here.
from .hybrid2d import _lifted_trace_2d  # noqa: E402


def _shifted_problem_2d(problem, lam: float):
    zero2 = lambda x, y: jnp.zeros_like(x + y)  # noqa: E731
    return dataclasses.replace(
        problem,
        name=f"{problem.name}_eig_shift",
        f=zero2,
        g=zero2,
        c=problem.c - lam,
        exact=None,
        f_shifted=None,
        f_elem_factors=None,
        f_colloc_factors=None,
    )


def _quadrature_forms_2d(problem, xs, ys, coeffs, cfg):
    """(int a0 |grad p|^2 + c p^2, int p^2) by tensor Gauss quadrature."""
    dtype = coeffs.dtype
    q = cfg.M + 2
    tq, wq = np.polynomial.legendre.leggauss(q)
    t = jnp.asarray(tq, dtype)
    w = jnp.asarray(wq, dtype)
    V0, V1 = legendre.legendre_vandermonde(t, cfg.M, num_derivs=1)
    hx = float(xs[1] - xs[0])
    hy = float(ys[1] - ys[0])
    # coeffs: [ny, nx, M(ky), M(kx)]
    P = jnp.einsum("abkl,qk,rl->abqr", coeffs, V0, V0)  # value at (tq_y q, tq_x r)
    Px = jnp.einsum("abkl,qk,rl->abqr", coeffs, V0, V1) * (2.0 / hx)
    Py = jnp.einsum("abkl,qk,rl->abqr", coeffs, V1, V0) * (2.0 / hy)
    dA = (hx / 2.0) * (hy / 2.0) * (w[:, None] * w[None, :])
    num = jnp.sum(dA[None, None] * (problem.a0 * (Px**2 + Py**2)
                                    + problem.c * P**2))
    den = jnp.sum(dA[None, None] * P**2)
    return num, den


def rayleigh_quotient_2d(problem, xs, ys, coeffs, cfg):
    num, den = _quadrature_forms_2d(problem, xs, ys, coeffs, cfg)
    return num / den


def hybrid_eigensolve_2d(problem, cfg, ecfg: EigenConfig = EigenConfig()
                         ) -> HybridEigenSolution2D:
    """2D analog of ``hybrid_eigensolve``: FEM pencil eigenpairs, then
    per-pair enhancement on the shifted operator c -> c - lambda with the
    eigenvector grid as the trace data, eigenvalue re-read from the
    enhanced polynomial's Rayleigh quotient."""
    from .hybrid2d import enhance_2d, prepare_shared_2d

    fem = fem_eigensolve_2d(problem, cfg, ecfg)
    coeffs_all, lams, oks = [], [], []
    for j in range(ecfg.k):
        lam = float(fem.lams[j])
        u = fem.vectors[j]
        bc_rows = None
        if ecfg.trace_lift >= 2:
            bc_rows = _lifted_trace_2d(u, cfg.M, cfg.nx, cfg.ny,
                                       stencil=ecfg.trace_lift)
        coeffs, diags = None, None
        for _ in range(max(1, ecfg.rq_iters)):
            shifted = _shifted_problem_2d(problem, lam)
            bundle = prepare_shared_2d(shifted, cfg)
            coeffs, diags, _ = enhance_2d(shifted, cfg, fem.xs, fem.ys, u,
                                          bundle, bc_rows_override=bc_rows)
            lam = float(rayleigh_quotient_2d(problem, fem.xs, fem.ys,
                                             coeffs, cfg))
        _, den = _quadrature_forms_2d(problem, fem.xs, fem.ys, coeffs, cfg)
        coeffs_all.append(coeffs / jnp.sqrt(den))
        lams.append(lam)
        oks.append(diags.solve_ok.reshape(cfg.ny, cfg.nx))
    return HybridEigenSolution2D(
        fem,
        jnp.stack(coeffs_all),
        jnp.asarray(lams, fem.lams.dtype),
        jnp.stack(oks),
    )


def evaluate_eigenfunction_2d(sol: HybridEigenSolution2D, j: int, x, y):
    from .hybrid2d import Solution2D, evaluate_2d

    stub = Solution2D(
        xs=sol.fem.xs, ys=sol.fem.ys, fem_values=sol.fem.vectors[j],
        coeffs=sol.coeffs[j], cg_iters=None, cg_residual=None,
        max_slack=None, bc_violation=None, solve_ok=sol.solve_ok[j])
    return evaluate_2d(stub, x, y)


def exact_eigenvalues_2d(problem, k: int):
    """Sorted a0 pi^2 (i^2/Lx^2 + j^2/Ly^2) + c — the rectangle oracle."""
    modes, _ = _mode_table(problem, k)
    return np.array([m[0] for m in modes]) + problem.c


# ---------------------------------------------------------------------------
# 3D: -a0 Lap u + c u = lambda u on a box, Q1 hex (or tensor-Numerov) pencil
# on the structured grid.  Same architecture as 2D lifted tensorially: the
# iteration always runs on the SPD a0-Laplacian pencil (c added exactly
# afterwards), inner solves are MG-CG, trace data for the enhancement comes
# from the tensor-Lagrange PLANE lift (hybrid3d._lifted_trace_3d) — valid
# because eigenvector nodal values of the tensor pencils are high-order.
# ---------------------------------------------------------------------------


class EigenSolution3D(NamedTuple):
    xs: jnp.ndarray  # [nx+1]
    ys: jnp.ndarray  # [ny+1]
    zs: jnp.ndarray  # [nz+1]
    lams: jnp.ndarray  # [K] ascending (includes the +c shift)
    vectors: jnp.ndarray  # [K, nz+1, ny+1, nx+1] M-orthonormal nodal grids
    residuals: jnp.ndarray  # [K] ||A v - mu M v||_inf of the SPD pencil


class HybridEigenSolution3D(NamedTuple):
    fem: EigenSolution3D
    coeffs: jnp.ndarray  # [K, nz, ny, nx, M, M, M]
    lams: jnp.ndarray  # [K] enhanced (Rayleigh-quotient) eigenvalues
    solve_ok: jnp.ndarray  # [K, nz, ny, nx]


def _check_3d_eligible(p):
    if any(t != "dirichlet" for t in p.bc_faces):
        raise NotImplementedError(
            "3D eigensolver requires all-Dirichlet faces")
    if p.b != (0.0, 0.0, 0.0):
        raise NotImplementedError(
            "3D eigensolver requires b == 0 (symmetric pencil)")
    if p.a_var is not None:
        raise NotImplementedError(
            "3D eigensolver requires constant diffusion")


def _mode_table_3d(p, Ks: int):
    """First Ks tensor modes (i, j, k) of the a0-Laplacian, ascending."""
    x0, x1, y0, y1, z0, z1 = p.domain
    Lx, Ly, Lz = x1 - x0, y1 - y0, z1 - z0
    r = range(1, Ks + 2)
    cand = [
        (p.a0 * np.pi**2 * (i**2 / Lx**2 + j**2 / Ly**2 + k**2 / Lz**2),
         i, j, k)
        for i in r for j in r for k in r
    ]
    cand.sort()
    return cand[:Ks], (x0, Lx, y0, Ly, z0, Lz)


def fem_eigensolve_3d(problem, cfg, ecfg: EigenConfig = EigenConfig()
                      ) -> EigenSolution3D:
    """K smallest eigenpairs of the Q1 hex (or tensor-Numerov) pencil:
    inverse subspace iteration with an MG-CG inner solve, scan over
    subspace columns, host Rayleigh–Ritz (3D mirror of
    ``fem_eigensolve_2d``)."""
    from ..ops import assembly3d, cg, multigrid

    _check_3d_eligible(problem)
    dtype = cfg.jnp_dtype()
    _require_f64_eigen(dtype, "fem_eigensolve_3d")
    x0, x1, y0, y1, z0, z1 = problem.domain
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    hx = float((x1 - x0) / nx)
    hy = float((y1 - y0) / ny)
    hz = float((z1 - z0) / nz)
    xs = jnp.linspace(x0, x1, nx + 1, dtype=dtype)
    ys = jnp.linspace(y0, y1, ny + 1, dtype=dtype)
    zs = jnp.linspace(z0, z1, nz + 1, dtype=dtype)
    if ecfg.mass == "numerov":
        K_A_np, K_M_np = assembly3d.q1_numerov_locals_3d(
            hx, hy, hz, problem.a0, 0.0)
    else:
        K_A_np = assembly3d.q1_local_operator_3d(
            hx, hy, hz, problem.a0, 0.0, 0.0, 0.0, 0.0)
        m1c = lambda h: (h / 6.0) * np.array([[2.0, 1.0], [1.0, 2.0]])  # noqa: E731,E501
        K_M_np = np.kron(m1c(hz), np.kron(m1c(hy), m1c(hx)))
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    # Both pencil operators scale EXACTLY like h per coarsening level in
    # 3D (each tensor term is (1/h) x h x h), which is make_vcycle_3d's
    # automatic pure-Laplacian scaling — no loc_for_level needed.
    interior = (jnp.zeros((nz + 1, ny + 1, nx + 1), bool)
                .at[1:-1, 1:-1, 1:-1].set(True))

    def apply_free(v):
        return jnp.where(
            interior, assembly3d.apply_stiffness_3d(v * interior, K_A), 0.0)

    def apply_mass(v):
        return assembly3d.apply_stiffness_3d(v, K_M)

    mg_ok = (nx % 2 == 0 and ny % 2 == 0 and nz % 2 == 0
             and min(nx, ny, nz) >= 8)
    if mg_ok:
        M_inv = multigrid.make_vcycle_3d(nz + 1, ny + 1, nx + 1, K_A, dtype)
    else:
        M_inv = 1.0 / assembly3d.stiffness_diag_3d(
            (nz + 1, ny + 1, nx + 1), K_A, dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    K = ecfg.k
    Ks = K + ecfg.oversample
    modes, (mx0, Lx, my0, Ly, mz0, Lz) = _mode_table_3d(problem, Ks)
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs[:, None, None]
    V0 = jnp.stack([
        jnp.sin(i * jnp.pi * (X - mx0) / Lx)
        * jnp.sin(j * jnp.pi * (Y - my0) / Ly)
        * jnp.sin(k * jnp.pi * (Z - mz0) / Lz)
        for _, i, j, k in modes
    ])  # [Ks, nz+1, ny+1, nx+1]
    V0 = V0 * interior[None]

    def dotg(Af, Bf):
        return jnp.einsum("kzyx,lzyx->kl", Af, Bf)

    def orthonormalize(V):
        MV = jax.vmap(apply_mass)(V)
        G = dotg(V, MV)
        L = jnp.linalg.cholesky(0.5 * (G + G.T))
        Vf = V.reshape(Ks, -1)
        Vf = jax.scipy.linalg.solve_triangular(L, Vf, lower=True)
        return Vf.reshape(V.shape)

    def col_solve(carry, v):
        rhs = jnp.where(interior, apply_mass(v), 0.0)
        res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                    maxiter=cfg.cg_maxiter)
        return carry, res.x

    def step(V, _):
        _, W = jax.lax.scan(col_solve, 0, V)
        return orthonormalize(W), None

    @jax.jit
    def _iterate(V):
        V, _ = jax.lax.scan(step, orthonormalize(V), None,
                            length=ecfg.iters)
        AV = jax.vmap(apply_free)(V)
        MV = jax.vmap(apply_mass)(V)
        H = dotg(V, AV)
        G = dotg(V, MV)
        return V, 0.5 * (H + H.T), 0.5 * (G + G.T)

    V, H, G = _iterate(V0)
    Hn = np.asarray(H, np.float64)
    Gn = np.asarray(G, np.float64)
    Ln = np.linalg.cholesky(Gn)
    Hs = np.linalg.solve(Ln, np.linalg.solve(Ln, Hn).T).T
    w, S = np.linalg.eigh(0.5 * (Hs + Hs.T))
    Q = np.linalg.solve(Ln.T, S)[:, :K]
    mus = jnp.asarray(w[:K], dtype)
    Vr = jnp.einsum("kzyx,kl->lzyx", V, jnp.asarray(Q, dtype))
    sign = jnp.where(Vr[:, 1, 1, 1] >= 0, 1.0, -1.0).astype(dtype)
    Vr = Vr * sign[:, None, None, None]
    AV = jax.vmap(apply_free)(Vr)
    MV = jax.vmap(lambda v: jnp.where(interior, apply_mass(v), 0.0))(Vr)
    res = jnp.max(jnp.abs(AV - mus[:, None, None, None] * MV),
                  axis=(1, 2, 3))
    lams = mus + jnp.asarray(problem.c, dtype)  # exact reaction shift
    return EigenSolution3D(xs, ys, zs, lams, Vr, res)


def _shifted_problem_3d(problem, lam: float):
    zero3 = lambda x, y, z: jnp.zeros_like(x + y + z)  # noqa: E731
    return dataclasses.replace(
        problem,
        name=f"{problem.name}_eig_shift",
        f=zero3,
        g=zero3,
        c=problem.c - lam,
        exact=None,
        f_shifted=None,
    )


def _quadrature_forms_3d(problem, xs, ys, zs, coeffs, cfg):
    """(int a0 |grad p|^2 + c p^2, int p^2) by tensor Gauss quadrature
    (exact for the degree-(M-1) tensor polynomials)."""
    dtype = coeffs.dtype
    q = cfg.M + 2
    tq, wq = np.polynomial.legendre.leggauss(q)
    t = jnp.asarray(tq, dtype)
    w = jnp.asarray(wq, dtype)
    V0, V1 = legendre.legendre_vandermonde(t, cfg.M, num_derivs=1)
    hx = float(xs[1] - xs[0])
    hy = float(ys[1] - ys[0])
    hz = float(zs[1] - zs[0])
    hi = jax.lax.Precision.HIGHEST
    # coeffs: [nz, ny, nx, M(kz), M(ky), M(kx)]
    P = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0, V0, V0,
                   precision=hi)
    Px = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0, V0, V1,
                    precision=hi) * (2.0 / hx)
    Py = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V0, V1, V0,
                    precision=hi) * (2.0 / hy)
    Pz = jnp.einsum("eabklm,qk,rl,sm->eabqrs", coeffs, V1, V0, V0,
                    precision=hi) * (2.0 / hz)
    dV = ((hx / 2.0) * (hy / 2.0) * (hz / 2.0)
          * (w[:, None, None] * w[None, :, None] * w[None, None, :]))
    num = jnp.sum(dV[None, None, None]
                  * (problem.a0 * (Px**2 + Py**2 + Pz**2)
                     + problem.c * P**2))
    den = jnp.sum(dV[None, None, None] * P**2)
    return num, den


def rayleigh_quotient_3d(problem, xs, ys, zs, coeffs, cfg):
    num, den = _quadrature_forms_3d(problem, xs, ys, zs, coeffs, cfg)
    return num / den


def hybrid_eigensolve_3d(problem, cfg, ecfg: EigenConfig = EigenConfig()
                         ) -> HybridEigenSolution3D:
    """3D analog of ``hybrid_eigensolve_2d``: FEM pencil eigenpairs, then
    per-pair enhancement on the shifted operator c -> c - lambda with the
    (plane-lifted) eigenvector grid as the trace data, eigenvalue re-read
    from the enhanced polynomial's Rayleigh quotient."""
    from .hybrid3d import _lifted_trace_3d, enhance_3d, prepare_shared_3d

    fem = fem_eigensolve_3d(problem, cfg, ecfg)
    coeffs_all, lams, oks = [], [], []
    for j in range(ecfg.k):
        lam = float(fem.lams[j])
        u = fem.vectors[j]
        bc_rows = None
        if ecfg.trace_lift >= 2:
            bc_rows = _lifted_trace_3d(u, cfg.M, cfg.nx, cfg.ny, cfg.nz,
                                       stencil=ecfg.trace_lift)
        coeffs, diags = None, None
        for _ in range(max(1, ecfg.rq_iters)):
            shifted = _shifted_problem_3d(problem, lam)
            bundle = prepare_shared_3d(shifted, cfg)
            coeffs, diags, _ = enhance_3d(
                shifted, cfg, fem.xs, fem.ys, fem.zs, u, bundle,
                bc_rows_override=bc_rows)
            lam = float(rayleigh_quotient_3d(problem, fem.xs, fem.ys,
                                             fem.zs, coeffs, cfg))
        _, den = _quadrature_forms_3d(problem, fem.xs, fem.ys, fem.zs,
                                      coeffs, cfg)
        coeffs_all.append(coeffs / jnp.sqrt(den))
        lams.append(lam)
        oks.append(diags.solve_ok.reshape(cfg.nz, cfg.ny, cfg.nx))
    return HybridEigenSolution3D(
        fem,
        jnp.stack(coeffs_all),
        jnp.asarray(lams, fem.lams.dtype),
        jnp.stack(oks),
    )


def evaluate_eigenfunction_3d(sol: HybridEigenSolution3D, j: int, x, y, z):
    from .hybrid3d import Solution3D, evaluate_3d

    stub = Solution3D(
        xs=sol.fem.xs, ys=sol.fem.ys, zs=sol.fem.zs,
        fem_values=sol.fem.vectors[j], coeffs=sol.coeffs[j],
        cg_iters=None, cg_residual=None, max_slack=None,
        bc_violation=None, solve_ok=sol.solve_ok[j], cond_estimate=None)
    return evaluate_3d(stub, x, y, z)


def exact_eigenvalues_3d(problem, k: int):
    """Sorted a0 pi^2 (i^2/Lx^2 + j^2/Ly^2 + k^2/Lz^2) + c — the box
    oracle."""
    modes, _ = _mode_table_3d(problem, k)
    return np.array([m[0] for m in modes]) + problem.c


# ------------------------------------------------- mixed-precision route
#
# Round-5 (round-4 VERDICT Weak #6 / task 9): the 2D/3D f32 gate exists
# because the f32 inverse-iteration PENCIL floors at ~1e-2 residual —
# but the pencil is the cheap stage.  The mixed route runs the pencil in
# f64 (TPU: emulated f64, the already-supported mode) and the EXPENSIVE
# per-pair enhancement in f32 — the TPU's fast dtype, host-f64 QR
# factors applied as f32 MXU dots — then re-reads eigenvalues from the
# f64-upcast Rayleigh quotient.  The quotient is STATIONARY at the true
# eigenfunction, so the f32 coefficient noise e enters only as O(|e|_H1^2):
# measured floors in tests/test_eigen.py / RESULTS.md (the linear-in-e
# f32 error is suppressed quadratically; the remaining floor is physical
# f32 enhancement noise, not implementation).


def hybrid_eigensolve_2d_mixed(problem, cfg,
                               ecfg: EigenConfig = EigenConfig()
                               ) -> HybridEigenSolution2D:
    """f64 pencil + f32 enhancement + f64-quotient re-read (module
    section comment).  ``cfg`` may be float32; requires jax_enable_x64
    for the f64 stages."""
    import dataclasses as _dc

    from .hybrid2d import enhance_2d, prepare_shared_2d

    if not jax.config.jax_enable_x64:
        raise ValueError("the mixed eigen route needs jax_enable_x64 "
                         "(the pencil and quotient stages run f64)")
    cfg64 = _dc.replace(cfg, dtype="float64")
    cfg32 = _dc.replace(cfg, dtype="float32")
    fem = fem_eigensolve_2d(problem, cfg64, ecfg)
    xs32 = fem.xs.astype(jnp.float32)
    ys32 = fem.ys.astype(jnp.float32)
    coeffs_all, lams, oks = [], [], []
    for j in range(ecfg.k):
        lam = float(fem.lams[j])
        u64 = fem.vectors[j]
        u32 = u64.astype(jnp.float32)
        bc_rows = None
        if ecfg.trace_lift >= 2:
            # Lift in f64 (tiny), cast: the lift windows amplify nodal
            # noise by the Lagrange constants, so lifting BEFORE the
            # downcast keeps the trace data at f32 rounding of the f64
            # values.
            bc_rows = _lifted_trace_2d(u64, cfg.M, cfg.nx, cfg.ny,
                                       stencil=ecfg.trace_lift
                                       ).astype(jnp.float32)
        coeffs64 = None
        ok = None
        for _ in range(max(1, ecfg.rq_iters)):
            shifted = _shifted_problem_2d(problem, lam)
            bundle = prepare_shared_2d(shifted, cfg32)
            coeffs32, diags, _ = enhance_2d(shifted, cfg32, xs32, ys32,
                                            u32, bundle,
                                            bc_rows_override=bc_rows)
            coeffs64 = coeffs32.astype(jnp.float64)
            # DG-corrected quotient: the plain broken quotient is only
            # LINEARLY accurate in the f32 jump/boundary noise (measured
            # 1.9e-7 vs 1.6e-11 corrected at 32^2, NUMERICS.md round 5).
            lam = float(rayleigh_quotient_2d_corrected(
                problem, fem.xs, fem.ys, coeffs64, cfg64))
            ok = diags.solve_ok.reshape(cfg.ny, cfg.nx)
        _, den = _quadrature_forms_2d(problem, fem.xs, fem.ys, coeffs64,
                                      cfg64)
        coeffs_all.append(coeffs64 / jnp.sqrt(den))
        lams.append(lam)
        oks.append(ok)
    return HybridEigenSolution2D(
        fem, jnp.stack(coeffs_all),
        jnp.asarray(lams, fem.lams.dtype), jnp.stack(oks),
    )


def hybrid_eigensolve_3d_mixed(problem, cfg,
                               ecfg: EigenConfig = EigenConfig()
                               ) -> HybridEigenSolution3D:
    """3D mirror of ``hybrid_eigensolve_2d_mixed``."""
    import dataclasses as _dc

    from .hybrid3d import _lifted_trace_3d, enhance_3d, prepare_shared_3d

    if not jax.config.jax_enable_x64:
        raise ValueError("the mixed eigen route needs jax_enable_x64 "
                         "(the pencil and quotient stages run f64)")
    cfg64 = _dc.replace(cfg, dtype="float64")
    cfg32 = _dc.replace(cfg, dtype="float32")
    fem = fem_eigensolve_3d(problem, cfg64, ecfg)
    xs32 = fem.xs.astype(jnp.float32)
    ys32 = fem.ys.astype(jnp.float32)
    zs32 = fem.zs.astype(jnp.float32)
    coeffs_all, lams, oks = [], [], []
    for j in range(ecfg.k):
        lam = float(fem.lams[j])
        u64 = fem.vectors[j]
        u32 = u64.astype(jnp.float32)
        bc_rows = None
        if ecfg.trace_lift >= 2:
            bc_rows = _lifted_trace_3d(u64, cfg.M, cfg.nx, cfg.ny,
                                       cfg.nz, stencil=ecfg.trace_lift
                                       ).astype(jnp.float32)
        coeffs64 = None
        ok = None
        for _ in range(max(1, ecfg.rq_iters)):
            shifted = _shifted_problem_3d(problem, lam)
            bundle = prepare_shared_3d(shifted, cfg32)
            coeffs32, diags, _ = enhance_3d(shifted, cfg32, xs32, ys32,
                                            zs32, u32, bundle,
                                            bc_rows_override=bc_rows)
            coeffs64 = coeffs32.astype(jnp.float64)
            lam = float(rayleigh_quotient_3d_corrected(
                problem, fem.xs, fem.ys, fem.zs, coeffs64, cfg64))
            ok = diags.solve_ok.reshape(cfg.nz, cfg.ny, cfg.nx)
        _, den = _quadrature_forms_3d(problem, fem.xs, fem.ys, fem.zs,
                                      coeffs64, cfg64)
        coeffs_all.append(coeffs64 / jnp.sqrt(den))
        lams.append(lam)
        oks.append(ok)
    return HybridEigenSolution3D(
        fem, jnp.stack(coeffs_all),
        jnp.asarray(lams, fem.lams.dtype), jnp.stack(oks),
    )


def _face_correction_2d(coeffs, hx: float, hy: float, q: int):
    """DG-consistency face term J(p) = 2 sum_F int_F {d_nu p} [[p]] ds for
    the elementwise tensor-Legendre field p (coeffs [ny, nx, M(ky),
    M(kx)]), interior faces with [[p]] = p^- - p^+ (nu from - to +) and
    domain-boundary faces with the one-sided outward flux and [[p]] = p.

    Why it exists: the broken-H^1 Rayleigh quotient loses its
    stationarity at the true eigenfunction through terms LINEAR in the
    inter-element jumps and boundary traces of the error — invisible at
    f64 jump sizes (~1e-13) but the dominant floor of the mixed f32
    route (measured: quotient error 1.9e-7 ~ the f32 trace noise, while
    the quadratic energy term is 4.5e-11).  Subtracting J restores
    RQ - lambda = O(e^2) for elementwise-smooth p (derivation in the
    NUMERICS.md round-5 entry)."""
    dtype = coeffs.dtype
    M = coeffs.shape[-1]
    tq, wq = np.polynomial.legendre.leggauss(q)
    t = jnp.asarray(tq, dtype)
    w = jnp.asarray(wq, dtype)
    V0q, V1q = legendre.legendre_vandermonde(t, M, num_derivs=1)
    Ve0, Ve1 = legendre.legendre_vandermonde(
        jnp.asarray([-1.0, 1.0], dtype), M, num_derivs=1)
    HI_ = jax.lax.Precision.HIGHEST

    def pair_terms(c, h_norm, h_face):
        """c: [*, n, M(kt), M(kn)] with kn the normal direction and kt
        tangential; returns the face-term sum over the n-axis faces."""
        # edge values/derivs: [..., n, q, side]
        vals = jnp.einsum("...kl,qk,sl->...qs", c, V0q, Ve0,
                          precision=HI_)
        ders = jnp.einsum("...kl,qk,sl->...qs", c, V0q, Ve1,
                          precision=HI_) * (2.0 / h_norm)
        pL = vals[..., :-1, :, 1]   # element i at +1 (left of face i+1)
        pR = vals[..., 1:, :, 0]    # element i+1 at -1
        dL = ders[..., :-1, :, 1]
        dR = ders[..., 1:, :, 0]
        interior = jnp.sum(
            w * 0.5 * (dL + dR) * (pL - pR)) * (h_face / 2.0)
        # domain boundary: outward normal is -n at face 0, +n at face n
        lo = jnp.sum(w * (-ders[..., 0, :, 0]) * vals[..., 0, :, 0]) \
            * (h_face / 2.0)
        hi = jnp.sum(w * ders[..., -1, :, 1] * vals[..., -1, :, 1]) \
            * (h_face / 2.0)
        return interior + lo + hi

    # vertical faces (normal x): n-axis is nx, tangential ky along hy
    Jx = pair_terms(coeffs, hx, hy)
    # horizontal faces (normal y): swap the roles
    cT = jnp.swapaxes(jnp.swapaxes(coeffs, 0, 1), 2, 3)  # [nx, ny, kx, ky]
    Jy = pair_terms(cT, hy, hx)
    return 2.0 * (Jx + Jy)


def rayleigh_quotient_2d_corrected(problem, xs, ys, coeffs, cfg):
    """Broken Rayleigh quotient with the DG-consistency face correction
    (``_face_correction_2d``): quadratic in the eigenfunction error even
    when p carries inter-element jumps / boundary-trace noise (the mixed
    f32 route's floor)."""
    num, den = _quadrature_forms_2d(problem, xs, ys, coeffs, cfg)
    J = _face_correction_2d(coeffs, float(xs[1] - xs[0]),
                            float(ys[1] - ys[0]), cfg.M + 2)
    return (num - problem.a0 * J) / den


def _face_correction_3d(coeffs, hx: float, hy: float, hz: float, q: int):
    """3D mirror of ``_face_correction_2d``: J(p) = 2 sum_F int_F
    {d_nu p} [[p]] dA over the three face orientations of the hex grid
    (coeffs [nz, ny, nx, M(kz), M(ky), M(kx)])."""
    dtype = coeffs.dtype
    M = coeffs.shape[-1]
    tq, wq = np.polynomial.legendre.leggauss(q)
    t = jnp.asarray(tq, dtype)
    w = jnp.asarray(wq, dtype)
    V0q, _ = legendre.legendre_vandermonde(t, M, num_derivs=1)
    Ve0, Ve1 = legendre.legendre_vandermonde(
        jnp.asarray([-1.0, 1.0], dtype), M, num_derivs=1)
    HI_ = jax.lax.Precision.HIGHEST
    W2 = w[:, None] * w[None, :]

    def pair_terms(c, h_norm, area):
        """c: [*, n, M(kt1), M(kt2), M(kn)]; faces along the n axis."""
        vals = jnp.einsum("...kml,qk,rm,sl->...qrs", c, V0q, V0q, Ve0,
                          precision=HI_)
        ders = jnp.einsum("...kml,qk,rm,sl->...qrs", c, V0q, V0q, Ve1,
                          precision=HI_) * (2.0 / h_norm)
        interior = jnp.sum(
            W2 * 0.5 * (ders[..., :-1, :, :, 1] + ders[..., 1:, :, :, 0])
            * (vals[..., :-1, :, :, 1] - vals[..., 1:, :, :, 0])) * area
        lo = jnp.sum(W2 * (-ders[..., 0, :, :, 0])
                     * vals[..., 0, :, :, 0]) * area
        hi = jnp.sum(W2 * ders[..., -1, :, :, 1]
                     * vals[..., -1, :, :, 1]) * area
        return interior + lo + hi

    # x-normal faces: c already [nz, ny, nx, kz, ky, kx]
    Jx = pair_terms(coeffs, hx, (hy / 2.0) * (hz / 2.0))
    # y-normal: [nz, nx, ny, kz, kx, ky]
    cy = jnp.transpose(coeffs, (0, 2, 1, 3, 5, 4))
    Jy = pair_terms(cy, hy, (hx / 2.0) * (hz / 2.0))
    # z-normal: [ny, nx, nz, ky, kx, kz]
    cz = jnp.transpose(coeffs, (1, 2, 0, 4, 5, 3))
    Jz = pair_terms(cz, hz, (hx / 2.0) * (hy / 2.0))
    return 2.0 * (Jx + Jy + Jz)


def rayleigh_quotient_3d_corrected(problem, xs, ys, zs, coeffs, cfg):
    """Broken Rayleigh quotient with the DG-consistency face correction
    (3D mirror of ``rayleigh_quotient_2d_corrected``)."""
    num, den = _quadrature_forms_3d(problem, xs, ys, zs, coeffs, cfg)
    J = _face_correction_3d(coeffs, float(xs[1] - xs[0]),
                            float(ys[1] - ys[0]), float(zs[1] - zs[0]),
                            cfg.M + 2)
    return (num - problem.a0 * J) / den
