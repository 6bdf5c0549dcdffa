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
    g_left: float = 0.0  # boundary data (meaning set by bc_left/right)
    g_right: float = 0.0
    # Boundary-condition type per end (the reference supports Dirichlet
    # only, ``:14-18``).  "dirichlet": u = g.  "neumann": a u'·n = g with
    # n the outward normal (natural BC — enters the weak form's boundary
    # term; the FEM system keeps the assembled boundary row).  "robin":
    # a u'·n + robin_alpha u = g.  Non-Dirichlet ends keep their FEM
    # nodal value as the enhancement's pin (no exact-data override).
    bc_left: str = "dirichlet"
    bc_right: str = "dirichlet"
    robin_alpha_left: float = 0.0
    robin_alpha_right: float = 0.0
    exact: Optional[Callable] = None
    exact_dx: Optional[Callable] = None
    constant_coeffs: bool = False  # a, b, c independent of x
    # Optional structured rhs evaluation for the fused kernel:
    # f_shifted(xl, dloc) == f(xl + dloc) computed with per-element work
    # factored out (e.g. trig angle addition: 2 transcendentals per element
    # instead of n_colloc).  xl: [1, T] element left edges; dloc: [C, 1]
    # static in-element offsets; returns [C, T].
    f_shifted: Optional[Callable] = None
    # Optional SEPARABLE rhs (the strongest structure the fused kernel can
    # exploit): f(xl + d) == sum_r f_elem_factors(xl)[r] * colloc_r(d) with
    # f_colloc_factors(d) STATIC (numpy float64 in, list of [C] out).  The
    # static factors are contracted with the shared affine map on the host
    # in float64 (kkt._rhs_factor_fields), so the hot path never
    # materialises a [C, tile] rhs: per element, w costs R fused
    # multiply-adds of [M] vectors and the slack residual R of [C] vectors.
    f_elem_factors: Optional[Callable] = None  # xl [1,T] -> list of [1,T]
    f_colloc_factors: Optional[Callable] = None  # d [C] np -> list of [C]
    # Optional translation closure of the element-factor family:
    #   a_r(x + c) == sum_s T[r, s, ...] * a_s(x)  with T STATIC for static
    # shifts c (true for trig/exp families; trig gives a rotation matrix).
    # Lets the fused kernel evaluate the factors at ONE base point per tile
    # (R scalar transcendentals per grid step) and span the tile with
    # static mixing vectors — transcendental cost per element drops to ~0
    # (measured 0.22 ms of 0.50 ms at E = 2^20 without this).
    # Signature: c (np float64 [T]) -> np [R, R, T].
    f_translation: Optional[Callable] = None

    def colloc_coeffs(self, x):
        """(a2, a1, a0) of the non-divergence collocation operator at x."""
        a2 = -self.a(x) * jnp.ones_like(x)
        a1 = (self.b(x) - self.da(x)) * jnp.ones_like(x)
        a0 = self.c(x) * jnp.ones_like(x)
        return a2, a1, a0
