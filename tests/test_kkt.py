"""Batched KKT solver tests (SURVEY.md section 4 #3).

Oracles:
* a dense float64 solve of the full bordered KKT system (numpy),
* scipy SLSQP on the original constrained QP — the same optimisation the
  reference runs per element (mathematical spec from SURVEY.md 0.4), run
  once on a random element to certify closed-form == optimiser.
* primal vs dual: the two formulations solve the same QP, so coefficients
  must agree to solver tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.ops import kkt, legendre


def random_elements(rng, E=5, C=12, M=8):
    V0, V1, V2 = legendre.collocation_vandermonde(M, C, dtype=jnp.float64)
    # Random smooth per-element operator coefficients and data
    a2 = -(1.0 + rng.uniform(0.1, 1.0, size=(E, C)))
    a1 = rng.normal(size=(E, C)) * 0.3
    a0 = rng.normal(size=(E, C)) * 0.5
    scale = rng.uniform(5.0, 50.0, size=(E, 1, 1))
    D = (
        a2[:, :, None] * scale**2 * np.asarray(V2)[None]
        + a1[:, :, None] * scale * np.asarray(V1)[None]
        + a0[:, :, None] * np.asarray(V0)[None]
    )
    B = np.stack([np.asarray(V0)[0], np.asarray(V0)[-1]])
    f = rng.normal(size=(E, C))
    bc = rng.normal(size=(E, 2)) * 0.1
    return D, B, f, bc


def dense_kkt_oracle(D, B, f, bc, gamma):
    """Direct float64 solve of [[I+gDtD, Bt],[B,0]] [w;l] = [gDtf; bc]."""
    C, M = D.shape
    K = B.shape[0]
    A = np.zeros((M + K, M + K))
    A[:M, :M] = np.eye(M) + gamma * D.T @ D
    A[:M, M:] = B.T
    A[M:, :M] = B
    rhs = np.concatenate([gamma * D.T @ f, bc])
    return np.linalg.solve(A, rhs)[:M]


@pytest.mark.parametrize("gamma", [1e2, 1e4, 1e6])
def test_primal_batched_vs_dense_oracle(gamma, rng):
    D, B, f, bc = random_elements(rng)
    w, diags = kkt.solve_primal_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc), gamma
    )
    for e in range(D.shape[0]):
        w_ref = dense_kkt_oracle(D[e], B, f[e], bc[e], gamma)
        np.testing.assert_allclose(np.asarray(w[e]), w_ref, atol=1e-8)
    assert bool(jnp.all(diags.solve_ok))


def test_dual_equals_primal(rng):
    """Same QP => same solution (the reference's 'Dual' script is a copy of
    the primal, SURVEY.md 0.2 — this framework has a real dual).

    Random data with O(1) slacks, gamma=1e4 and row norms ~1e5 is the
    worst case for ANY dual formulation (the kernel system's forward error
    scales with gamma * kappa(A)^2, a property of the formulation, not the
    solver) — tolerance here is relative 1e-4.  On the actual PDE workloads
    slacks are tiny and primal/dual coefficients agree to ~1e-15
    (tests/test_poisson1d.py::test_primal_dual_agree_end_to_end)."""
    D, B, f, bc = random_elements(rng, E=7, M=8)
    args = (jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc))
    wp, _ = kkt.solve_primal_batched(*args, 1e4)
    wd, _ = kkt.solve_dual_batched(*args, 1e4)
    scale = float(jnp.max(jnp.abs(wp)))
    np.testing.assert_allclose(
        np.asarray(wp), np.asarray(wd), atol=1e-4 * scale
    )


def test_dual_shared_precompute_equals_primal(rng):
    """The dual-algebra shared precompute (augmented-inverse map) yields the
    same affine operator as the primal Schur/Cholesky precompute."""
    D, B, f, bc = random_elements(rng, E=4)
    ops_p = kkt.precompute_shared_host(D[0], B, 1e4, jnp.float64)
    ops_d = kkt.precompute_shared_dual_host(D[0], B, 1e4, jnp.float64)
    wp, _ = kkt.solve_primal_shared(ops_p, jnp.asarray(f), jnp.asarray(bc))
    wd, _ = kkt.solve_primal_shared(ops_d, jnp.asarray(f), jnp.asarray(bc))
    scale = float(jnp.max(jnp.abs(wp)))
    # operator extraction is conditioning-limited to ~1e-3 relative on
    # adversarial data (why the f64 dual keeps the batched path; the shared
    # dual map serves the f32 hot path where this is dtype noise)
    np.testing.assert_allclose(np.asarray(wp), np.asarray(wd),
                               atol=1e-3 * scale)


def test_shared_equals_batched(rng):
    """The two-matmul shared path must agree with the general path."""
    D, B, f, bc = random_elements(rng, E=6)
    D0 = D[0]
    Drep = np.broadcast_to(D0, D.shape)
    wb, _ = kkt.solve_primal_batched(
        jnp.asarray(Drep), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc), 1e4
    )
    ops = kkt.precompute_shared(jnp.asarray(D0), jnp.asarray(B), 1e4)
    ws, diags = kkt.solve_primal_shared(ops, jnp.asarray(f), jnp.asarray(bc))
    np.testing.assert_allclose(np.asarray(ws), np.asarray(wb), atol=1e-9)
    assert bool(jnp.all(diags.solve_ok))


def test_closed_form_equals_slsqp_optimizer(rng):
    """Certify that the bordered KKT system IS the reference's per-element
    optimisation problem: min .5||w||^2 + g/2||e||^2 s.t. Dw + e = f, Bw = bc
    solved with scipy SLSQP (independent implementation of the spec)."""
    from scipy.optimize import minimize

    D, B, f, bc = random_elements(rng, E=1, M=6)
    D, f, bc = D[0], f[0], bc[0]
    gamma = 1e4
    C, M = D.shape

    def objective(v):
        w, e = v[:M], v[M:]
        return 0.5 * np.sum(w**2) + gamma / 2 * np.sum(e**2)

    def constraints(v):
        w, e = v[:M], v[M:]
        return np.concatenate([D @ w + e - f, B @ w - bc])

    res = minimize(
        objective,
        x0=np.concatenate([rng.uniform(size=M) * 0.01, np.zeros(C)]),
        constraints={"type": "eq", "fun": constraints},
        method="SLSQP",
        options={"maxiter": 1000, "ftol": 1e-14},
    )
    w_opt = res.x[:M]
    w_kkt, _ = kkt.solve_primal_batched(
        jnp.asarray(D)[None], jnp.asarray(B), jnp.asarray(f)[None],
        jnp.asarray(bc)[None], gamma,
    )
    np.testing.assert_allclose(np.asarray(w_kkt[0]), w_opt, atol=5e-6)


def test_fallback_mask(rng):
    """Corrupted elements fall back to the linear interpolant (fault
    injection per SURVEY.md section 5 failure-detection plan)."""
    D, B, f, bc = random_elements(rng, E=4)
    f = np.asarray(f)
    f[2] = np.nan  # corrupt one element's data
    w, diags = kkt.solve_primal_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc), 1e4
    )
    u_left = jnp.asarray(bc[:, 0])
    u_right = jnp.asarray(bc[:, 1])
    w_final = kkt.apply_fallback(w, diags, u_left, u_right)
    ok = np.asarray(diags.solve_ok)
    assert not ok[2] and ok[[0, 1, 3]].all()
    # fallback coeffs reproduce the endpoints
    np.testing.assert_allclose(
        np.asarray(w_final[2, 0] - w_final[2, 1]), bc[2, 0], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(w_final[2, 0] + w_final[2, 1]), bc[2, 1], atol=1e-12
    )
    assert np.isfinite(np.asarray(w_final)).all()


def test_dual_multipliers_satisfy_kkt_identities(rng):
    """Exposed dual variables: stationarity w = D^T alpha + B^T beta holds
    tightly; alpha tracks gamma * slack (exact at the optimum; ~1e-3
    relative here because the multiplier components living in the kernel
    system's ill-conditioned directions are less determined than w)."""
    from hybrid_fem_lssvr_tpu.ops import legendre

    V0, V1, V2 = legendre.collocation_vandermonde(8, 12, dtype=jnp.float64)
    D = np.broadcast_to(-100.0 * np.asarray(V2), (3, 12, 8))
    B = np.stack([np.asarray(V0)[0], np.asarray(V0)[-1]])
    f = rng.normal(size=(3, 12))
    bc = rng.normal(size=(3, 2)) * 0.1
    w, diags, (alpha, beta) = kkt.solve_dual_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc),
        1e4, return_multipliers=True,
    )
    w_rec = np.einsum("ecm,ec->em", D, np.asarray(alpha)) \
        + np.asarray(beta) @ B
    scale = np.abs(np.asarray(w)).max()
    np.testing.assert_allclose(w_rec, np.asarray(w), atol=1e-6 * scale)
    slack = f - np.einsum("ecm,em->ec", D, np.asarray(w))
    rel = np.abs(np.asarray(alpha) - 1e4 * slack).max() \
        / np.abs(np.asarray(alpha)).max()
    assert rel < 5e-3, rel


def test_element_permutation_invariance(rng):
    """SURVEY.md section 4 #6: permuting the element batch permutes the
    outputs exactly (no cross-element coupling in the batched solver)."""
    D, B, f, bc = random_elements(rng, E=6)
    perm = np.array([3, 0, 5, 1, 4, 2])
    w, _ = kkt.solve_primal_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc), 1e4
    )
    wp, _ = kkt.solve_primal_batched(
        jnp.asarray(D[perm]), jnp.asarray(B), jnp.asarray(f[perm]),
        jnp.asarray(bc[perm]), 1e4,
    )
    np.testing.assert_array_equal(np.asarray(w)[perm], np.asarray(wp))


def test_refinement_in_float32(rng):
    """f32 + iterative refinement approaches the f64 answer."""
    D, B, f, bc = random_elements(rng, E=3)
    gamma = 1e4
    w64, _ = kkt.solve_primal_batched(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc), gamma
    )
    cast = lambda v: jnp.asarray(v, jnp.float32)
    w32, _ = kkt.solve_primal_batched(
        cast(D), cast(B), cast(f), cast(bc), gamma, refine_steps=0
    )
    w32r, _ = kkt.solve_primal_batched(
        cast(D), cast(B), cast(f), cast(bc), gamma, refine_steps=2
    )
    err0 = np.abs(np.asarray(w32, np.float64) - np.asarray(w64)).max()
    err2 = np.abs(np.asarray(w32r, np.float64) - np.asarray(w64)).max()
    scale = np.abs(np.asarray(w64)).max()
    assert err2 <= err0 * 1.5  # refinement never hurts materially
    assert err2 / scale < 5e-5


def test_lse_refinement_in_float32(rng):
    """refine_steps is FUNCTIONAL on the f32 LSE/QR path (the default f32
    route): the retained-factor least-squares refinement changes the
    result and moves it toward the f64 oracle.  High basis degree makes
    kappa(G) large enough for the first solve's eps*kappa error to be
    visible above the residual-evaluation floor."""
    D, B, f, bc = random_elements(rng, E=8, C=14, M=12)
    w64, _ = kkt.solve_primal_lse(
        jnp.asarray(D), jnp.asarray(B), jnp.asarray(f), jnp.asarray(bc)
    )
    cast = lambda v: jnp.asarray(v, jnp.float32)
    w0, _ = kkt.solve_batched(cast(D), cast(B), cast(f), cast(bc), 1e4,
                              method="qr", refine_steps=0)
    w2, _ = kkt.solve_batched(cast(D), cast(B), cast(f), cast(bc), 1e4,
                              method="qr", refine_steps=2)
    assert np.abs(np.asarray(w0) - np.asarray(w2)).max() > 0  # not a no-op
    err0 = np.abs(np.asarray(w0, np.float64) - np.asarray(w64)).max()
    err2 = np.abs(np.asarray(w2, np.float64) - np.asarray(w64)).max()
    assert err2 <= err0, (err0, err2)


def test_condition_monitors_surface_kappa():
    """SURVEY section 5 failure detection: every factorisation path surfaces
    a cheap condition estimate that moves with the true conditioning."""
    import numpy as np

    from hybrid_fem_lssvr_tpu.ops import legendre

    rng = np.random.default_rng(0)
    E, C = 16, 12

    def build(M, scale=10.0):
        V0, V1, V2 = legendre.collocation_vandermonde_host(M, C)
        D = jnp.asarray(
            np.stack([scale**2 * V2 + rng.normal(0, 0.1) * V0
                      for _ in range(E)])
        )
        B = jnp.asarray(np.stack([V0[0], V0[-1]]))
        f = jnp.asarray(rng.normal(size=(E, C)))
        bc = jnp.asarray(rng.normal(size=(E, 2)))
        return D, B, f, bc

    # Cholesky path: estimate present, positive, and grows with gamma
    # (kappa(I + gamma D^T D) ~ gamma ||D||^2).
    D, B, f, bc = build(M=6)
    _, d_lo = kkt.solve_primal_batched(D, B, f, bc, gamma=1e0)
    _, d_hi = kkt.solve_primal_batched(D, B, f, bc, gamma=1e6)
    assert d_lo.cond_estimate is not None
    assert bool(jnp.all(d_lo.cond_estimate > 0))
    assert float(jnp.median(d_hi.cond_estimate)) > \
        1e3 * float(jnp.median(d_lo.cond_estimate))

    # QR/LSE path: R-diagonal ratio grows with the basis degree (P_k''
    # endpoint growth ~ k^4 drives kappa of the projected operator).
    D4, B4, f4, bc4 = build(M=4)
    _, d4 = kkt.solve_primal_lse(D4, B4, f4, bc4)
    D12, B12, f12, bc12 = build(M=12)
    _, d12 = kkt.solve_primal_lse(D12, B12, f12, bc12)
    assert d4.cond_estimate is not None
    assert float(jnp.median(d12.cond_estimate)) > \
        5.0 * float(jnp.median(d4.cond_estimate))

    # Shared paths: host-exact kappa_2 broadcast per element.
    V0, V1, V2 = legendre.collocation_vandermonde_host(8, C)
    D0 = 100.0 * V2 + V0
    Bs = np.stack([V0[0], V0[-1]])
    for ops in (kkt.precompute_shared_host(D0, Bs, 1e4),
                kkt.precompute_shared_lse_host(D0, Bs),
                kkt.precompute_shared_dual_host(D0, Bs, 1e4)):
        assert ops.cond is not None and float(ops.cond) > 1.0
        _, ds = kkt.solve_primal_shared(
            ops, jnp.asarray(rng.normal(size=(E, C))),
            jnp.asarray(rng.normal(size=(E, 2))),
        )
        assert ds.cond_estimate.shape == (E,)
        np.testing.assert_allclose(np.asarray(ds.cond_estimate),
                                   float(ops.cond), rtol=1e-6)


def test_solve_tiny_ill_conditioned_spd_hits_lu_floor():
    """Regression: the TPU-legal Cholesky Schur solve must match pivoted
    LU's forward-error floor on ill-conditioned SPD blocks (kappa 1e10).
    Plain unscaled Cholesky lost ~6 digits here and broke the
    graded==uniform varcoeff agreement at 1.3e-6; the equilibrated +
    one-step-refined version (kkt._solve_tiny) sits at the kappa*eps
    floor like LU."""
    from hybrid_fem_lssvr_tpu.ops.kkt import _solve_tiny

    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    S = (Q * np.logspace(0, -10, 16)) @ Q.T
    S = 0.5 * (S + S.T)
    xt = rng.standard_normal(16)
    r = S @ xt
    x = np.asarray(_solve_tiny(jnp.asarray(S), jnp.asarray(r)))
    lu_err = np.abs(np.linalg.solve(S, r) - xt).max()
    assert np.abs(x - xt).max() < 10.0 * max(lu_err, 1e-8)
    # matrix-valued rhs path
    R = S @ np.stack([xt, -2.0 * xt], axis=-1)
    X = np.asarray(_solve_tiny(jnp.asarray(S), jnp.asarray(R)))
    assert np.abs(X[:, 0] - xt).max() < 10.0 * max(lu_err, 1e-8)
