"""Batched LSSVR element solves: closed-form bordered KKT systems.

This module deletes the reference's per-element ``scipy.optimize.minimize``
SLSQP loop (``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:90-91``,
measured ~66 ms/element).  The per-element problem

    min_w,e  0.5 ||w||^2 + gamma/2 ||e||^2
    s.t.     (D w)_j + e_j = f_j   (C PDE collocation rows, ``:62``)
             B w = bc              (2 endpoint-continuity rows, ``:64-79``)

is an equality-constrained convex QP whose unique optimum satisfies, after
eliminating e = f - D w, the bordered KKT system (SURVEY.md section 0.4,
verified against the reference's SLSQP output to ~6e-12):

    [ I + gamma D^T D   B^T ] [ w ]   [ gamma D^T f ]
    [       B            0  ] [ l ] = [     bc      ]

Three solve paths, all mathematically identical:

* ``solve_primal_batched`` — per-element D (variable coefficients / graded
  meshes): H = I + gamma D^T D is always SPD regardless of the PDE operator
  (it is identity + a Gram matrix), so a vmapped, Jacobi-equilibrated
  Cholesky + 2x2 Schur complement on the constraint block solves every
  element — no pivoted LU of an indefinite system is ever needed.
* ``solve_primal_shared`` — uniform mesh + x-independent operator
  coefficients: D and B are the *same matrix for every element* (only the
  collocated rhs f and the endpoint values differ), so the affine map
  (f, bc) -> w collapses to two small precomputed operators and the entire
  enhancement of E elements is two MXU matmuls:
      w = f @ Wf^T + bc @ Wbc^T.
* ``solve_dual_batched`` — the genuine dual formulation the reference's
  "Dual" script does not contain (SURVEY.md section 0.2): with constraint
  matrix A = [D; B] and Legendre kernel K = A A^T, solve
  (K + diag(1/gamma .. 1/gamma, 0, 0)) mu = [f; bc], recover w = A^T mu.
  System size (C + 2) independent of the basis size M; SPD (Gram + PSD
  diagonal, nonsingular because B has full row rank).

Precision: float32 factorisations can be wrapped with iterative refinement
(``refine_steps``) — residuals accumulated at the solve dtype; pair with a
float64 path (CPU x64 or TPU-emulated f64) for 1e-10 targets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KKTDiagnostics(NamedTuple):
    """Per-element health signals the reference computed then discarded
    (``Hybrid-FEM-LSSVR.py:102-103``) — here they are first-class outputs."""

    max_slack: jnp.ndarray  # [E] max |e_j| = |f - D w|_inf per element
    bc_violation: jnp.ndarray  # [E] max |B w - bc| per element
    solve_ok: jnp.ndarray  # [E] bool: finite solution + sane constraints
    # Cheap per-element condition monitor on the factorisation actually
    # performed (SURVEY.md section 5 failure detection): Cholesky path —
    # (max_j L_jj / min_j L_jj)^2 of the equilibrated factor (lower bound
    # on kappa(Hs)); QR/LSE path — max|R_jj| / min|R_jj| (lower bound on
    # kappa of the projected operator); shared paths — the host-exact
    # kappa_2 of the factored operator, broadcast.  None where no cheap
    # estimate exists (per-element dual LU).
    cond_estimate: jnp.ndarray = None


def operator_rows(V0, V1, V2, a2, a1, a0, scale):
    """Collocation matrix D for L u = a2 u'' + a1 u' + a0 u on one element.

    V0/V1/V2: [C, M] reference-coordinate Vandermonde + derivatives.
    a2/a1/a0: [C] operator coefficients at the mapped collocation points.
    scale: 2/h chain factor (scalar).  Returns D: [C, M].
    """
    return (
        a2[:, None] * (scale**2) * V2
        + a1[:, None] * scale * V1
        + a0[:, None] * V0
    )


def boundary_rows(V0):
    """B: [2, M] — endpoint value rows (collocation includes endpoints,
    matching the reference's linspace incl. endpoints, ``:40``)."""
    return jnp.stack([V0[0], V0[-1]])


def _equilibrated_cholesky_factor(H):
    """Jacobi-equilibrated Cholesky of SPD H: returns (L, s) with
    S H S = L L^T, S = diag(s).  Equilibration tames the kappa ~ gamma * k^8
    growth of I + gamma D^T D at high polynomial degree (SURVEY.md 7.4)."""
    s = jax.lax.rsqrt(jnp.diagonal(H, axis1=-2, axis2=-1))
    Hs = H * s[..., :, None] * s[..., None, :]
    L = jnp.linalg.cholesky(Hs)
    return L, s


def _chol_solve(L, s, r):
    """Solve H x = r given the equilibrated factor: x = S solve(LL^T, S r)."""
    rs = r * s[..., :, None]
    y = jax.scipy.linalg.solve_triangular(L, rs, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x * s[..., :, None]


def _solve_tiny(S, r):
    """Solve the tiny K x K Schur system.  K == 2 (the 1D endpoint-
    continuity block) gets the closed-form adjugate — elementwise only.
    Larger K uses Cholesky + triangular solves: every call site passes
    the SPD Schur complement B H^{-1} B^T, and unlike LU-based
    ``jnp.linalg.solve`` (which TPU cannot compile in emulated f64,
    CLAUDE.md) the Cholesky pair IS TPU-legal — this is what lets the
    2D/3D f64 Cholesky KKT path (K = 4M-4 / M^3-(M-2)^3 trace rows) run
    on-chip."""
    if S.shape[-1] == 2:
        a, b = S[..., 0, 0], S[..., 0, 1]
        c, d = S[..., 1, 0], S[..., 1, 1]
        det = a * d - b * c
        r0, r1 = r[..., 0], r[..., 1]
        return jnp.stack(
            [(d * r0 - b * r1) / det, (a * r1 - c * r0) / det], axis=-1
        )
    # Symmetric Jacobi equilibration + one residual-refinement step:
    # the trace-constraint Schur block can be ill-conditioned (discrete-
    # harmonic modes), and plain Cholesky lost ~6 digits vs the pivoted
    # LU it replaced (measured: graded==uniform varcoeff agreement
    # degraded to 1.3e-6 in f64).  Scaling + one refinement recovers the
    # LU-level floor while staying TPU-legal in emulated f64.
    d = jnp.diagonal(S, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(jnp.abs(d), jnp.finfo(S.dtype).tiny))
    Ss = S * s[..., :, None] * s[..., None, :]
    L = jnp.linalg.cholesky(Ss)
    vec = r.ndim == S.ndim - 1
    rr = r[..., None] if vec else r

    def solve(b):
        y = jax.scipy.linalg.solve_triangular(
            L, b * s[..., :, None], lower=True)
        x = jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), y, lower=False)
        return x * s[..., :, None]

    x = solve(rr)
    x = x + solve(rr - S @ x)
    return x[..., 0] if vec else x


def _kkt_core(L, s, B, rw, rbc):
    """Solve the bordered system [[H, B^T], [B, 0]] [w; lam] = [rw; rbc]
    given the equilibrated Cholesky factor (L, s) of H.  Returns (w, lam)."""
    rhs = jnp.concatenate([B.T, rw[:, None]], axis=1)  # [M, K+1]
    X = _chol_solve(L, s, rhs)
    HiBt, Hirw = X[:, :-1], X[:, -1]
    S = B @ HiBt  # [K, K] Schur complement (SPD, tiny)
    lam = _solve_tiny(S, B @ Hirw - rbc)
    w = Hirw - HiBt @ lam
    return w, lam


def solve_primal_batched(
    D: jnp.ndarray,
    B: jnp.ndarray,
    f: jnp.ndarray,
    bc: jnp.ndarray,
    gamma,
    refine_steps: int = 0,
):
    """Per-element-operator path. D: [E, C, M]; B: [2, M] or [E, 2, M];
    f: [E, C]; bc: [E, 2].  Returns (w [E, M], KKTDiagnostics).

    ``refine_steps`` > 0 adds classical iterative refinement on the full KKT
    residual (factor once, re-solve with residual rhs) — recovers near-f64
    accuracy from f32 factorisations when data are well-scaled.
    """
    gamma = jnp.asarray(gamma, D.dtype)
    if B.ndim == 2:
        B = jnp.broadcast_to(B, (D.shape[0],) + B.shape)

    def one(De, Be, fe, bce):
        M = De.shape[1]
        H = jnp.eye(M, dtype=De.dtype) + gamma * (De.T @ De)
        L, s = _equilibrated_cholesky_factor(H)
        rw0 = gamma * (De.T @ fe)
        w, lam = _kkt_core(L, s, Be, rw0, bce)
        for _ in range(refine_steps):
            res_w = rw0 - (H @ w + Be.T @ lam)
            res_bc = bce - Be @ w
            dw, dlam = _kkt_core(L, s, Be, res_w, res_bc)
            w = w + dw
            lam = lam + dlam
        dL = jnp.abs(jnp.diagonal(L))
        cond = (jnp.max(dL) / jnp.maximum(jnp.min(dL), 1e-30)) ** 2
        return w, cond

    w, cond = jax.vmap(one)(D, B, f, bc)
    return w, _diagnostics(D, B, f, bc, w, cond=cond)


def _diagnostics(D, B, f, bc, w, tol: float = 1e-2, cond=None):
    """D may be [E, C, M] (per-element) or [C, M] (shared — stays a plain
    matmul, never materialising an [E, C, M] broadcast)."""
    hi = jax.lax.Precision.HIGHEST
    if D.ndim == 2:
        e = f - jnp.einsum("em,cm->ec", w, D, precision=hi)
    else:
        e = f - jnp.einsum("ecm,em->ec", D, w, precision=hi)  # optimal slack
    max_slack = jnp.max(jnp.abs(e), axis=-1)
    if B.ndim == 2:
        bres = jnp.abs(jnp.einsum("km,em->ek", B, w, precision=hi) - bc)
    else:
        bres = jnp.abs(jnp.einsum("ekm,em->ek", B, w, precision=hi) - bc)
    bc_violation = jnp.max(bres, axis=-1)
    finite = jnp.all(jnp.isfinite(w), axis=-1)
    scale = 1.0 + jnp.max(jnp.abs(bc), axis=-1)
    solve_ok = finite & (bc_violation <= tol * scale)
    return KKTDiagnostics(max_slack, bc_violation, solve_ok, cond)


def nullspace_host(B):
    """Host float64 (Z, Pbc): orthonormal null-space basis of B [K, M] and
    the min-norm particular map Pbc = B^T (B B^T)^{-1} [M, K].  B is shared
    by every element (its rows depend only on the reference-coordinate
    basis values), so this is setup-time work."""
    import numpy as np

    B = np.asarray(B, np.float64)
    K, M = B.shape
    Q, _ = np.linalg.qr(B.T, mode="complete")
    Z = Q[:, K:]
    Pbc = B.T @ np.linalg.inv(B @ B.T)
    return Z, Pbc


def _batched_mgs_qr_factor(G):
    """CGS2 QR factorisation of a batch of SMALL thin systems G [E, C, K]
    (K static, <= ~12), written as static Python loops of batched
    elementwise/reduction ops — TPU's ``lax.linalg.qr`` is unusable here
    (batched Householder compiles for minutes and runs worse; measured
    43 s compile at E=64).  Returns (lstsq, cond): ``lstsq(g)`` solves
    min ||G y - g|| for g [E, C] via the retained factors — reusable for
    iterative refinement without re-factorising."""
    E, C, K = G.shape
    cols = [G[:, :, j] for j in range(K)]
    Qc = []
    R = jnp.zeros((E, K, K), G.dtype)
    for j in range(K):
        v = cols[j]
        for _pass in range(2):  # MGS + reorthogonalisation (CGS2 stability)
            for i in range(j):
                rij = jnp.sum(Qc[i] * v, axis=-1)
                R = R.at[:, i, j].add(rij)
                v = v - rij[:, None] * Qc[i]
        rjj = jnp.sqrt(jnp.sum(v * v, axis=-1))
        R = R.at[:, j, j].set(rjj)
        Qc.append(v / (rjj[:, None] + 1e-30))

    def lstsq(g):
        # y = R^{-1} Q^T g by static back-substitution.
        qtg = [jnp.sum(Qc[j] * g, axis=-1) for j in range(K)]
        y = [None] * K
        for j in reversed(range(K)):
            acc = qtg[j]
            for i in range(j + 1, K):
                acc = acc - R[:, j, i] * y[i]
            y[j] = acc / (R[:, j, j] + 1e-30)
        return jnp.stack(y, axis=-1)

    dR = jnp.abs(jnp.diagonal(R, axis1=-2, axis2=-1))  # [E, K]
    cond = jnp.max(dR, axis=-1) / jnp.maximum(jnp.min(dR, axis=-1), 1e-30)
    return lstsq, cond


def _batched_mgs_qr_solve(G, g):
    """min ||G y - g||: one-shot form of ``_batched_mgs_qr_factor``."""
    lstsq, cond = _batched_mgs_qr_factor(G)
    return lstsq(g), cond


def solve_primal_lse(D: jnp.ndarray, B: jnp.ndarray, f: jnp.ndarray,
                     bc: jnp.ndarray, ZP=None, refine_steps: int = 0):
    """Orthogonal-method path for float32 (the TPU hot dtype).

    Forming H = I + gamma D^T D squares D's conditioning and drowns the
    identity: at gamma=1e4 and fine meshes kappa(H) overflows f32 entirely
    (measured: Cholesky path degrades to ~1e-3 errors on-chip).  But the
    regularised QP is, to O(1/(gamma * ||D||_F^2)) — i.e. to ~1e-14 at the
    reference's gamma (which SURVEY.md 0.3 shows is error-irrelevant over
    gamma in [1e2, 1e8]) — the equality-constrained least-squares problem

        min_w ||D w - f||_2   s.t.  B w = bc,

    solved stably by the null-space method at kappa(D), not gamma*kappa(D)^2:
      Z = orthonormal null basis of B, w_p = particular solution (both
      host-precomputed when B is shared; pass as ``ZP=(Z, Pbc)``),
      y = argmin ||(D Z) y - (f - D w_p)|| via the batched MGS QR,
      w = w_p + Z y.

    ``refine_steps`` > 0 adds least-squares iterative refinement: the
    retained CGS2 factors re-solve min ||G dy - (g - G y)|| and y += dy.
    Each pass knocks the factorisation/back-substitution error eps*kappa(G)
    down toward the residual-evaluation floor ~eps*C — at the optimum
    G^T (g - G y) = 0, so dy -> 0 and the iteration is stationary.
    """
    E = D.shape[0]
    hi = jax.lax.Precision.HIGHEST
    if ZP is None:
        if B.ndim != 2:
            raise ValueError(
                "per-element B requires precomputed ZP per element"
            )
        Z_np, Pbc_np = nullspace_host(B)
        Z = jnp.asarray(Z_np, D.dtype)
        Pbc = jnp.asarray(Pbc_np, D.dtype)
    else:
        Z, Pbc = ZP
    wp = jnp.einsum("mk,ek->em", Pbc, bc, precision=hi)  # [E, M]
    # Global per-element scale removal (all rows share the (2/h)^2 chain
    # factor): scale-invariant for the minimiser, keeps f32 sane.
    s0 = jnp.sqrt(jnp.mean(D * D, axis=(1, 2))) + 1e-30  # [E]
    G = jnp.einsum("ecm,mk->eck", D, Z, precision=hi) / s0[:, None, None]
    g = (f - jnp.einsum("ecm,em->ec", D, wp, precision=hi)) / s0[:, None]
    lstsq, cond = _batched_mgs_qr_factor(G)
    y = lstsq(g)
    for _ in range(refine_steps):
        r = g - jnp.einsum("eck,ek->ec", G, y, precision=hi)
        y = y + lstsq(r)
    w = wp + jnp.einsum("mk,ek->em", Z, y, precision=hi)
    return w, _diagnostics(D, B, f, bc, w, cond=cond)


def _solve_batched_inner(D, B, f, bc, gamma, formulation="primal",
                         method="auto", refine_steps: int = 0, ZP=None):
    """Dtype-aware routing.

    float64: primal -> Schur/Cholesky KKT; dual -> augmented LU.  These are
    the two genuinely distinct algebraic formulations.
    float32: both formulations route to the orthogonal LSE core — they solve
    the same QP, and only the orthogonal method survives f32 at the
    reference's gamma (see solve_primal_lse).  Override with ``method``.
    """
    if method == "auto":
        method = "qr" if D.dtype == jnp.float32 else (
            "dual_aug" if formulation == "dual" else "cholesky"
        )
    if method == "qr":
        return solve_primal_lse(D, B, f, bc, ZP=ZP,
                                refine_steps=refine_steps)
    if method == "cholesky":
        return solve_primal_batched(D, B, f, bc, gamma,
                                    refine_steps=refine_steps)
    if method == "dual_aug":
        return solve_dual_batched(D, B, f, bc, gamma)
    raise ValueError(f"unknown KKT method: {method}")


def solve_batched(D, B, f, bc, gamma, formulation="primal",
                  method="auto", refine_steps: int = 0, ZP=None):
    """Dtype-aware routed solve; see _solve_batched_inner for the routing.

    All linear algebra runs at HIGHEST matmul precision: the TPU MXU's
    default f32 matmul uses bf16 passes (~4e-4 relative error — measured to
    dominate the whole solver's error budget before this was forced)."""
    with jax.default_matmul_precision("highest"):
        return _solve_batched_inner(D, B, f, bc, gamma,
                                    formulation=formulation, method=method,
                                    refine_steps=refine_steps, ZP=ZP)


class SharedOperators(NamedTuple):
    """Precomputed affine map (f, bc) -> w for a shared element operator.

    The optional rank-factored fields exist when the problem's rhs is
    separable over (element, collocation-offset): f(xl + d) =
    sum_r a_r(xl) b_r(d) with the b_r static.  Then the hot path needs no
    [C, tile] rhs materialisation at all:
      w     = sum_r a_r * WfF[r]  + Wbc @ bc        (WfF[r] = Wf b_r)
      slack = max | sum_r a_r * PF[r] + Qres @ bc |  (PF[r] = (I - D Wf) b_r)
    with WfF / PF contracted on the host in float64 — the slack floor drops
    from the f32 cancellation of f - D w (~1e-6 |f|) to ~eps * |residual|.
    """

    Wf: jnp.ndarray  # [M, C]
    Wbc: jnp.ndarray  # [M, 2]
    D: jnp.ndarray  # [C, M] (kept for diagnostics)
    B: jnp.ndarray  # [2, M]
    WfF: jnp.ndarray = None  # [R, M] host-f64 Wf @ b_r
    PF: jnp.ndarray = None  # [R, C] host-f64 (I - D Wf) @ b_r
    Qres: jnp.ndarray = None  # [C, K] host-f64 -(D @ Wbc)
    Pres: jnp.ndarray = None  # [C, C] host-f64 residual projector I - D Wf
    cond: jnp.ndarray = None  # scalar: host-exact kappa_2 of the matrix
    # actually factored (equilibrated H / projected G / augmented dual)


def precompute_shared(D: jnp.ndarray, B: jnp.ndarray, gamma) -> SharedOperators:
    """Factor the shared KKT once: w = Wf @ f + Wbc @ bc.

    With H = I + gamma D^T D (SPD), S = B H^-1 B^T:
      Wbc = H^-1 B^T S^-1
      Wf  = (I - Wbc B) H^-1 gamma D^T
    """
    M = D.shape[1]
    gamma = jnp.asarray(gamma, D.dtype)
    H = jnp.eye(M, dtype=D.dtype) + gamma * (D.T @ D)
    L, s = _equilibrated_cholesky_factor(H)
    HiBt = _chol_solve(L, s, B.T)  # [M, 2]
    HiDt = _chol_solve(L, s, gamma * D.T)  # [M, C]
    S = B @ HiBt  # [2, 2]
    Wbc = _solve_tiny(S.T, HiBt)  # == HiBt @ inv(S): S SPD, tiny
    Wf = HiDt - Wbc @ (B @ HiDt)  # [M, C]
    return SharedOperators(Wf=Wf, Wbc=Wbc, D=D, B=B)


def _rhs_factor_fields(Wf64, Wbc64, D64, rhs_colloc_factors, dtype):
    """Host-f64 residual operators + optional static-factor contractions.

    Always returns the residual projector Pres = I - D Wf and
    Qres = -(D Wbc) (they define the exact-algebra slack e = Pres f +
    Qres bc for ANY rhs); when static rhs collocation factors are given,
    additionally contracts them (see SharedOperators docstring)."""
    import numpy as np

    C = D64.shape[0]
    P = np.eye(C) - D64 @ Wf64  # residual projector [C, C]
    fields = dict(
        Qres=jnp.asarray(-(D64 @ Wbc64), dtype),  # [C, K]
        Pres=jnp.asarray(P, dtype),
    )
    if rhs_colloc_factors is None:
        return fields
    bs = np.stack(
        [np.asarray(b, np.float64) for b in rhs_colloc_factors]
    )  # [R, C]
    fields.update(
        WfF=jnp.asarray(bs @ Wf64.T, dtype),  # [R, M]
        PF=jnp.asarray(bs @ P.T, dtype),  # [R, C]
    )
    return fields


def precompute_shared_host(D0, B, gamma, dtype=jnp.float32,
                           rhs_colloc_factors=None) -> SharedOperators:
    """Host-side float64 precompute of the shared affine map.

    On TPU the factorisation precision problem disappears entirely for the
    shared path: (Wf, Wbc) are computed once in numpy float64 at setup time
    (tiny M x M work), and the on-chip hot loop is two well-conditioned
    matmuls in the run dtype.  D0/B: numpy float64 [C, M]/[2, M].
    """
    import numpy as np

    D0 = np.asarray(D0, np.float64)
    B = np.asarray(B, np.float64)
    M = D0.shape[1]
    H = np.eye(M) + float(gamma) * D0.T @ D0
    s = 1.0 / np.sqrt(np.diag(H))
    Hs = H * s[:, None] * s[None, :]
    cho = np.linalg.cholesky(Hs)

    def hsolve(R):
        Rs = R * s[:, None]
        y = np.linalg.solve(cho, Rs)
        x = np.linalg.solve(cho.T, y)
        return x * s[:, None]

    HiBt = hsolve(B.T)
    HiDt = hsolve(float(gamma) * D0.T)
    S = B @ HiBt
    Wbc = HiBt @ np.linalg.inv(S)
    Wf = HiDt - Wbc @ (B @ HiDt)
    return SharedOperators(
        Wf=jnp.asarray(Wf, dtype),
        Wbc=jnp.asarray(Wbc, dtype),
        D=jnp.asarray(D0, dtype),
        B=jnp.asarray(B, dtype),
        cond=jnp.asarray(np.linalg.cond(Hs), dtype),
        **_rhs_factor_fields(Wf, Wbc, D0, rhs_colloc_factors, dtype),
    )


def precompute_shared_dual_host(D0, B, gamma, dtype=jnp.float32,
                                rhs_colloc_factors=None) -> SharedOperators:
    """Host float64 precompute of the shared affine map THROUGH THE DUAL
    ALGEBRA: the row-equilibrated augmented quasi-definite system of
    ``solve_dual_batched`` is factorised once and its (f, bc) -> w block
    extracted, so the dual formulation enjoys the same two-matmul
    (and fused-Pallas) hot path as the primal.  Same solution, genuinely
    dual derivation — kept distinct so primal==dual stays a real test."""
    import numpy as np

    D0 = np.asarray(D0, np.float64)
    B = np.asarray(B, np.float64)
    C, M = D0.shape
    K = B.shape[0]
    n = C + K
    A = np.vstack([D0, B])
    r = 1.0 / np.linalg.norm(A, axis=1)
    At = A * r[:, None]
    reg = np.concatenate([r[:C] ** 2 / float(gamma), np.zeros(K)])
    aug = np.zeros((M + n, M + n))
    aug[:M, :M] = -np.eye(M)
    aug[:M, M:] = At.T
    aug[M:, :M] = At
    aug[M:, M:] = np.diag(reg)
    # Columns of the inverse give the map rhs -> (w, mu); rhs rows M: are
    # the equilibrated data rows, so w = T @ diag(r) @ [f; bc].
    T = np.linalg.solve(aug, np.vstack([np.zeros((M, n)), np.eye(n)]))[:M]
    T = T * r[None, :]
    return SharedOperators(
        Wf=jnp.asarray(T[:, :C], dtype),
        Wbc=jnp.asarray(T[:, C:], dtype),
        D=jnp.asarray(D0, dtype),
        B=jnp.asarray(B, dtype),
        cond=jnp.asarray(np.linalg.cond(aug), dtype),
        **_rhs_factor_fields(T[:, :C], T[:, C:], D0, rhs_colloc_factors,
                             dtype),
    )


def precompute_shared_lse_host(D0, B, dtype=jnp.float32,
                               rhs_colloc_factors=None,
                               rcond=None) -> SharedOperators:
    """Host float64 precompute of the shared affine map via the null-space
    LSE formulation (the gamma -> infinity limit; deviation from the
    gamma-regularised optimum is O(1/(gamma ||D||_F^2)), ~1e-16 at reference
    settings).

    Required when D has a large null space — e.g. the 2D Laplacian on
    tensor-product Legendre bases, where the 11+ discrete-harmonic
    directions make cond(I + gamma D^T D) overflow even float64 (measured
    3e16 at a 32x32 mesh; the Cholesky/Schur path then fails on-mesh).

    ``rcond``: rank-tolerant SVD route for RANK-DEFICIENT constraint
    matrices.  The clamped-plate trace rows (biharmonic.py) carry exact
    dependencies — the corner normal-derivative rows equal tangential
    derivatives of the value trace, rank(B) = 8M - 16 < 8M - 4 rows —
    where the QR/inv route silently produces a truncated null space and a
    garbage particular map (inv of the singular B B^T).  With ``rcond``
    set, Z spans the FULL null space (right singular vectors past the
    numerical rank) and the particular map is the pseudoinverse; the row
    data must be consistent with the dependencies (any smooth function's
    trace is — measured clamped-plate fit goes from Linf ~1 to 1.6e-2 at
    M=12 single-element)."""
    import numpy as np

    D0 = np.asarray(D0, np.float64)
    B = np.asarray(B, np.float64)
    M = D0.shape[1]
    K = B.shape[0]
    if rcond is None:
        Q, _ = np.linalg.qr(B.T, mode="complete")  # [M, M]
        Z = Q[:, K:]  # orthonormal null(B)
        Pbc = B.T @ np.linalg.inv(B @ B.T)  # min-norm particular map
    else:
        U, s, Vt = np.linalg.svd(B)
        r = int(np.sum(s > rcond * s[0]))
        Z = Vt[r:].T  # orthonormal FULL null(B)
        Pbc = Vt[:r].T @ ((1.0 / s[:r])[:, None] * U[:, :r].T)  # pinv(B)
    G = D0 @ Z
    qg, rg = np.linalg.qr(G)
    T = Z @ np.linalg.solve(rg, qg.T)  # [M, C]: lsq correction map
    Wf = T
    Wbc = (np.eye(M) - T @ D0) @ Pbc
    return SharedOperators(
        Wf=jnp.asarray(Wf, dtype),
        Wbc=jnp.asarray(Wbc, dtype),
        D=jnp.asarray(D0, dtype),
        B=jnp.asarray(B, dtype),
        cond=jnp.asarray(np.linalg.cond(G), dtype),
        **_rhs_factor_fields(Wf, Wbc, D0, rhs_colloc_factors, dtype),
    )


def solve_primal_shared(ops: SharedOperators, f: jnp.ndarray, bc: jnp.ndarray):
    """The MXU fast path: all E elements in two matmuls.

    f: [E, C]; bc: [E, 2] -> (w [E, M], KKTDiagnostics).
    """
    # HIGHEST precision: the MXU's default f32 matmul is bf16-based (~4e-4
    # relative) — measured to swamp the entire error budget if left default.
    w = jnp.dot(
        f, ops.Wf.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=f.dtype,
    ) + jnp.dot(
        bc, ops.Wbc.T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=f.dtype,
    )
    cond = None
    if ops.cond is not None:
        cond = jnp.broadcast_to(ops.cond, (f.shape[0],))
    return w, _diagnostics(ops.D, ops.B, f, bc, w, cond=cond)


def solve_dual_batched(
    D: jnp.ndarray,
    B: jnp.ndarray,
    f: jnp.ndarray,
    bc: jnp.ndarray,
    gamma,
    return_multipliers: bool = False,
):
    """Genuine dual formulation (SURVEY.md section 7.3).

    A = [D; B]: [C+2, M]; kernel K = A A^T (Legendre kernel Gram matrix with
    operator applied to both arguments on the D block — K_LL, K_Lb, K_bb).
    Solve (K + diag(1/gamma on PDE rows, 0 on BC rows)) mu = [f; bc];
    recover w = A^T mu.  Cheaper than primal when M > C + 2; identical
    solution (same QP) — asserted in tests.

    ``return_multipliers=True`` additionally returns the dual variables
    (alpha [E, C] — the LSSVR support values, alpha = gamma * slack — and
    beta [E, K]) as a third output.
    """
    if D.dtype == jnp.float64 and jax.default_backend() == "tpu":
        raise ValueError(
            "the per-element dual path factorises the augmented "
            "quasi-definite system with LU, which TPU-emulated f64 cannot "
            "compile (CLAUDE.md); run dual f64 on the CPU x64 backend, or "
            "use formulation='primal' (f64-TPU-legal via Cholesky/LSE — "
            "identical solution, measured 1.2e-11 Linf at E=320 on-chip)"
        )
    gamma = jnp.asarray(gamma, D.dtype)
    E, C, M = D.shape
    if B.ndim == 2:
        B = jnp.broadcast_to(B, (E,) + B.shape)
    K_bc = B.shape[1]
    n = C + K_bc

    def one(De, Be, fe, bce):
        # Two exact reformulations for numerical stability:
        # 1. Row equilibration — scaling constraint row j by r_j and its
        #    slack penalty by gamma/r_j^2 leaves the QP unchanged but keeps
        #    the kernel Gram matrix (which squares D's row scaling) sane at
        #    large 2/h chain factors (SURVEY.md 7.4).
        # 2. Augmented quasi-definite form — solving
        #        [ -I   A^T  ] [ w  ]   [  0  ]
        #        [  A   Reg  ] [ mu ] = [ rhs ]
        #    with pivoted LU keeps w = A^T mu as an *equation*, avoiding the
        #    catastrophic forward-error amplification of the normal-equations
        #    kernel system (K + Reg) mu = rhs when M < C + K and gamma is
        #    large (measured 1e-5 coefficient error at E=320 vs 1e-13 here).
        A = jnp.concatenate([De, Be], axis=0)  # [n, M]
        r = jax.lax.rsqrt(jnp.sum(A * A, axis=1) + 1e-30)  # [n]
        At = A * r[:, None]
        reg = jnp.concatenate(
            [r[:C] ** 2 / gamma, jnp.zeros((K_bc,), De.dtype)]
        )
        aug = jnp.zeros((M + n, M + n), De.dtype)
        aug = aug.at[:M, :M].set(-jnp.eye(M, dtype=De.dtype))
        aug = aug.at[:M, M:].set(At.T)
        aug = aug.at[M:, :M].set(At)
        aug = aug.at[M:, M:].set(jnp.diag(reg))
        rhs = jnp.concatenate(
            [jnp.zeros((M,), De.dtype), jnp.concatenate([fe, bce]) * r]
        )
        sol = jnp.linalg.solve(aug, rhs)  # batched LU with partial pivoting
        # Unscale: the equilibrated multipliers are mu_tilde = mu / r.
        return sol[:M], sol[M:] * r

    w, mu = jax.vmap(one)(D, B, f, bc)
    if return_multipliers:
        return w, _diagnostics(D, B, f, bc, w), (mu[:, :C], mu[:, C:])
    return w, _diagnostics(D, B, f, bc, w)


def linear_fallback_coeffs(u_left, u_right, M: int):
    """Legendre coefficients of the linear interpolant through the element
    endpoint values — the reference's per-element failure fallback
    (``Hybrid-FEM-LSSVR.py:171-176``), without its late-binding-closure bug
    (SURVEY.md section 2.1 defect (c)).  u(t) = (u_l+u_r)/2 + (u_r-u_l)/2 t.
    """
    c0 = 0.5 * (u_left + u_right)
    c1 = 0.5 * (u_right - u_left)
    zeros = jnp.zeros(u_left.shape + (max(M - 2, 0),), u_left.dtype)
    cols = [c0[..., None]]
    if M > 1:
        cols.append(c1[..., None])
    cols.append(zeros)
    return jnp.concatenate(cols, axis=-1)[..., :M]


def apply_fallback(w, diags: KKTDiagnostics, u_left, u_right):
    """Mask failed elements to the linear interpolant (graceful per-element
    degradation, same semantics as the reference's try/except)."""
    M = w.shape[-1]
    wf = linear_fallback_coeffs(u_left, u_right, M)
    w_safe = jnp.where(jnp.isfinite(w), w, 0.0)
    return jnp.where(diags.solve_ok[..., None], w_safe, wf)
