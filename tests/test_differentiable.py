"""End-to-end differentiability: the whole hybrid solve (assembly ->
tridiagonal solve -> batched KKT -> evaluation) is a pure JAX function, so
gradients w.r.t. operator parameters come for free — the inverse-design
capability highlighted by JAX-FEM-style frameworks (PAPERS.md), structurally
impossible for the reference's scipy/SLSQP pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import SolverConfig
from hybrid_fem_lssvr_tpu.models import batched
from hybrid_fem_lssvr_tpu.ops import eval as ops_eval


FAM = batched.helmholtz_family()
CFG = SolverConfig(num_nodes=33)
XQ = jnp.linspace(-1, 1, 101)


def _solve_u(k):
    sol = batched.solve_family(FAM, CFG, jnp.asarray([k]))
    return ops_eval.evaluate(sol.nodes[0], sol.coeffs[0], XQ)


def test_grad_matches_finite_differences():
    target = jnp.sin(jnp.pi * XQ)

    def loss(k):
        return jnp.mean((_solve_u(k) - target) ** 2)

    g = jax.grad(loss)(2.3)
    eps = 1e-5
    fd = (loss(2.3 + eps) - loss(2.3 - eps)) / (2 * eps)
    assert abs(float(g) - float(fd)) < 1e-6 * max(abs(float(fd)), 1e-12)


def test_inverse_problem_recovers_parameter():
    """Recover the Helmholtz wavenumber from solution data by gradient
    descent through the full solver."""
    k_true = 2.7
    data = _solve_u(k_true)

    def loss(k):
        return jnp.mean((_solve_u(k) - data) ** 2)

    import optax

    opt = optax.adam(5e-2)
    k = jnp.asarray(2.3)
    state = opt.init(k)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(120):
        _, dk = vg(k)
        updates, state = opt.update(dk, state)
        k = optax.apply_updates(k, updates)
    assert abs(float(k) - k_true) < 1e-2, float(k)
