"""L0 kernel unit tests: Legendre Vandermonde vs numpy.polynomial
(the substrate the reference uses at Hybrid-FEM-LSSVR.py:45,59,98)."""

import jax.numpy as jnp
import numpy as np
import numpy.polynomial.legendre as npleg
import pytest

from hybrid_fem_lssvr_tpu.ops import legendre


@pytest.mark.parametrize("M", [1, 2, 3, 8, 12, 16])
def test_vandermonde_matches_numpy(M, rng):
    t = rng.uniform(-1, 1, size=37)
    V, V1, V2 = legendre.legendre_vandermonde(jnp.asarray(t), M)
    for k in range(M):
        c = np.zeros(M)
        c[k] = 1.0
        p = npleg.Legendre(c)
        np.testing.assert_allclose(np.asarray(V[:, k]), p(t), atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(V1[:, k]), p.deriv(1)(t), atol=1e-11
        )
        np.testing.assert_allclose(
            np.asarray(V2[:, k]), p.deriv(2)(t), atol=1e-10
        )


def test_evaluate_series_matches_numpy(rng):
    M = 8
    c = rng.normal(size=(5, M))
    t = rng.uniform(-1, 1, size=5)
    got = legendre.evaluate_series(jnp.asarray(c), jnp.asarray(t))
    want = [npleg.Legendre(c[i])(t[i]) for i in range(5)]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_domain_mapped_evaluation_matches_reference_convention(rng):
    """The (2/h) chain factors must reproduce numpy's domain-mapped
    Legendre(w, domain).deriv(2) — the exact object the reference builds."""
    M = 8
    w = rng.normal(size=M)
    xmin, xmax = 0.25, 0.41
    h = xmax - xmin
    x = rng.uniform(xmin, xmax, size=9)
    t = (2 * x - xmin - xmax) / h
    V, V1, V2 = legendre.legendre_vandermonde(jnp.asarray(t), M)
    u = npleg.Legendre(w, domain=[xmin, xmax])
    np.testing.assert_allclose(np.asarray(V @ w), u(x), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(V2 @ w) * (2 / h) ** 2, u.deriv(2)(x), atol=1e-8
    )


def test_collocation_points_match_reference_linspace():
    """Reference: np.linspace(xmin, xmax, 12) incl. endpoints (:40)."""
    t = np.asarray(legendre.collocation_points(12, dtype=jnp.float64))
    np.testing.assert_allclose(t, np.linspace(-1, 1, 12), atol=0)
