"""Grouped batched solves over parametric problem families.

The expert-parallel analog from SURVEY.md section 2.3: heterogeneous
workloads are grouped by (operator family, solver config) into "experts"
with a STATIC partition — membership is known at trace time, so there is no
dynamic gating; each group is one vmapped solve over its parameter batch.
This is how parameter sweeps (gamma/M/k sweeps, boundary-data families,
uncertainty quantification ensembles) run at MXU batch efficiency instead
of a Python loop of solves.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .hybrid import SolverConfig, Solution, fem_solve, lssvr_enhance, uniform_nodes
from .problem import Problem1D


@dataclasses.dataclass(frozen=True)
class ParametricFamily1D:
    """A family of 1D problems indexed by a parameter vector theta.

    Every callable takes (x, theta); theta may be a scalar or a small
    vector.  Instances of the family share mesh/config and therefore solve
    as ONE vmapped batch.
    """

    name: str
    f: Callable  # (x, theta) -> rhs
    a: Callable = lambda x, th: jnp.ones_like(x)
    da: Callable = lambda x, th: jnp.zeros_like(x)
    b: Callable = lambda x, th: jnp.zeros_like(x)
    c: Callable = lambda x, th: jnp.zeros_like(x)
    g_left: Callable = lambda th: 0.0
    g_right: Callable = lambda th: 0.0
    domain: Tuple[float, float] = (-1.0, 1.0)
    exact: Optional[Callable] = None  # (x, theta) -> u

    def instantiate(self, theta) -> Problem1D:
        """Bind theta (possibly a tracer) into a concrete Problem1D."""
        return Problem1D(
            name=self.name,
            f=lambda x: self.f(x, theta),
            a=lambda x: self.a(x, theta),
            da=lambda x: self.da(x, theta),
            b=lambda x: self.b(x, theta),
            c=lambda x: self.c(x, theta),
            domain=self.domain,
            g_left=self.g_left(theta),
            g_right=self.g_right(theta),
            exact=(lambda x: self.exact(x, theta)) if self.exact else None,
            constant_coeffs=False,
        )


def helmholtz_family() -> ParametricFamily1D:
    """-u'' - k^2 u = (pi^2 - k^2) sin(pi x); theta = k; exact sin(pi x)."""
    pi = jnp.pi
    return ParametricFamily1D(
        name="helmholtz_family",
        f=lambda x, k: (pi**2 - k**2) * jnp.sin(pi * x),
        c=lambda x, k: -(k**2) * jnp.ones_like(x),
        exact=lambda x, k: jnp.sin(pi * x),
    )


def advdiff_family() -> ParametricFamily1D:
    """-eps u'' + beta u' = f; theta = (eps, beta); exact sin(pi x)."""
    pi = jnp.pi
    return ParametricFamily1D(
        name="advdiff_family",
        f=lambda x, th: th[0] * pi**2 * jnp.sin(pi * x)
        + th[1] * pi * jnp.cos(pi * x),
        a=lambda x, th: th[0] * jnp.ones_like(x),
        b=lambda x, th: th[1] * jnp.ones_like(x),
        exact=lambda x, th: jnp.sin(pi * x),
    )


@functools.partial(jax.jit, static_argnums=(0, 1))
def solve_family(family: ParametricFamily1D, cfg: SolverConfig,
                 thetas: jnp.ndarray) -> Solution:
    """One vmapped hybrid solve over the family's parameter batch.

    thetas: [P] or [P, d].  Returns a Solution whose leaves carry a leading
    batch axis [P, ...].
    """
    dtype = cfg.jnp_dtype()

    def one(theta):
        problem = family.instantiate(theta)
        nodes = uniform_nodes(problem, cfg.num_nodes, dtype)
        fem_values = fem_solve(problem, nodes, cfg)
        w, diags = lssvr_enhance(problem, nodes, fem_values, cfg,
                                 shared_ops=None)
        return Solution(nodes, fem_values, w, diags.max_slack,
                        diags.bc_violation, diags.solve_ok)

    return jax.vmap(one)(thetas)


class GroupResult(NamedTuple):
    family_name: str
    solution: Solution


def solve_groups(groups: Sequence[Tuple[ParametricFamily1D, SolverConfig,
                                        jnp.ndarray]]):
    """Static expert routing: each (family, cfg, thetas) group dispatches as
    one vmapped solve; groups run back-to-back (XLA overlaps dispatch)."""
    return [
        GroupResult(family.name, solve_family(family, cfg, thetas))
        for family, cfg, thetas in groups
    ]
