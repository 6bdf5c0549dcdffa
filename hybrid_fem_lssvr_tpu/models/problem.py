"""First-class problem definitions (operator, rhs, BCs, exact solution).

The reference hard-wires its problem as module-level functions that the
element solver closes over (``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:8-18``
with the BC functions hard-referenced inside ``lssvr_primal`` at ``:69,76`` —
the layering violation called out in SURVEY.md section 1).  Here the problem
is an injected, frozen object.

Operator convention (1D): the strong form is

    L u = -(a(x) u')' + b(x) u' + c(x) u = f(x)     on (x0, x1)
    u(x0) = g_left,  u(x1) = g_right

* FEM assembles the weak form of (a, b, c) directly (``ops.assembly``).
* LSSVR collocation uses the expanded non-divergence form
      L u = -a u'' + (b - a') u' + c u
  so the problem carries ``da`` = a'. Constant-coefficient problems flag
  ``constant_coeffs=True``, unlocking the shared-operator MXU fast path
  (``ops.kkt.solve_primal_shared``) on uniform meshes.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax.numpy as jnp


def _zero(x):
    return jnp.zeros_like(x)


def _one(x):
    return jnp.ones_like(x)


@dataclasses.dataclass(frozen=True)
class Problem1D:
    """A 1D second-order linear elliptic boundary-value problem."""

    name: str
    f: Callable  # right-hand side f(x)
    a: Callable = _one  # diffusion coefficient a(x) > 0
    da: Callable = _zero  # a'(x) (needed for the collocation form)
    b: Callable = _zero  # advection coefficient
    c: Callable = _zero  # reaction coefficient
    domain: Tuple[float, float] = (-1.0, 1.0)
    g_left: float = 0.0  # Dirichlet data, reference ``:14-18``
    g_right: float = 0.0
    exact: Optional[Callable] = None
    exact_dx: Optional[Callable] = None
    constant_coeffs: bool = False  # a, b, c independent of x
    # Optional structured rhs evaluation for the fused kernel:
    # f_shifted(xl, dloc) == f(xl + dloc) computed with per-element work
    # factored out (e.g. trig angle addition: 2 transcendentals per element
    # instead of n_colloc).  xl: [1, T] element left edges; dloc: [C, 1]
    # static in-element offsets; returns [C, T].
    f_shifted: Optional[Callable] = None

    def colloc_coeffs(self, x):
        """(a2, a1, a0) of the non-divergence collocation operator at x."""
        a2 = -self.a(x) * jnp.ones_like(x)
        a1 = (self.b(x) - self.da(x)) * jnp.ones_like(x)
        a0 = self.c(x) * jnp.ones_like(x)
        return a2, a1, a0
