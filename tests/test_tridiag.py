"""Banded-solver unit tests: Thomas / PCR vs dense solve (SURVEY.md 4 #4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hybrid_fem_lssvr_tpu.ops import tridiag


def make_system(rng, N, dominant=True):
    a = rng.normal(size=N)
    c = rng.normal(size=N)
    a[0] = 0.0
    c[-1] = 0.0
    b = rng.normal(size=N)
    if dominant:
        b = np.abs(a) + np.abs(c) + 1.0 + np.abs(b)
    rhs = rng.normal(size=N)
    return tuple(jnp.asarray(v) for v in (a, b, c, rhs))


@pytest.mark.parametrize("N", [2, 3, 7, 16, 101, 257])
@pytest.mark.parametrize("method", ["thomas", "pcr", "spike"])
def test_matches_dense(N, method, rng):
    a, b, c, rhs = make_system(rng, N)
    x = tridiag.solve(a, b, c, rhs, method=method)
    A = tridiag.to_dense(a, b, c)
    xd = jnp.linalg.solve(A, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xd), rtol=1e-9)


@pytest.mark.parametrize("method", ["thomas", "pcr"])
def test_multiple_rhs(method, rng):
    a, b, c, _ = make_system(rng, 64)
    R = jnp.asarray(rng.normal(size=(64, 3)))
    X = tridiag.solve(a, b, c, R, method=method)
    A = tridiag.to_dense(a, b, c)
    np.testing.assert_allclose(
        np.asarray(X), np.asarray(jnp.linalg.solve(A, R)), rtol=1e-9
    )


@pytest.mark.parametrize("block_size", [16, 64, 300])
def test_spike_blocked_matches_thomas(block_size, rng):
    """Blocked SPIKE (vmapped block-Thomas + 2x2 block-PCR reduced system)
    == Thomas, including non-divisible N (padding path)."""
    N = 1000
    a, b, c, rhs = make_system(rng, N)
    x = tridiag.spike(a, b, c, rhs, block_size=block_size)
    xt = tridiag.thomas(a, b, c, rhs)
    np.testing.assert_allclose(np.asarray(x), np.asarray(xt), atol=1e-10)


def test_auto_method_dispatch(rng):
    a, b, c, rhs = make_system(rng, 100)
    x_auto = tridiag.solve(a, b, c, rhs, method="auto")
    np.testing.assert_allclose(
        np.asarray(x_auto), np.asarray(tridiag.thomas(a, b, c, rhs)),
        atol=1e-12,
    )
    N = 9000  # > 8192 -> spike
    a, b, c, rhs = make_system(rng, N)
    x_auto = tridiag.solve(a, b, c, rhs, method="auto")
    np.testing.assert_allclose(
        np.asarray(x_auto), np.asarray(tridiag.thomas(a, b, c, rhs)),
        atol=1e-9,
    )


def test_matvec_roundtrip(rng):
    a, b, c, rhs = make_system(rng, 50)
    x = tridiag.thomas(a, b, c, rhs)
    np.testing.assert_allclose(
        np.asarray(tridiag.matvec(a, b, c, x)), np.asarray(rhs), atol=1e-10
    )


def test_fem_like_system(rng):
    """The actual FEM shape: -u'' stiffness (2/h main, -1/h off)."""
    N = 33
    h = 2.0 / (N - 1)
    b = jnp.full(N, 2.0 / h).at[0].set(1.0).at[-1].set(1.0)
    a = jnp.full(N, -1.0 / h).at[0].set(0.0).at[-1].set(0.0).at[1].set(0.0)
    c = jnp.full(N, -1.0 / h).at[-1].set(0.0).at[0].set(0.0).at[-2].set(0.0)
    rhs = jnp.asarray(rng.normal(size=N)).at[0].set(0.0).at[-1].set(0.0)
    for method in ("thomas", "pcr"):
        x = tridiag.solve(a, b, c, rhs, method=method)
        A = tridiag.to_dense(a, b, c)
        np.testing.assert_allclose(
            np.asarray(A @ x), np.asarray(rhs), atol=1e-9
        )
