"""The workload library: every BASELINE.json config as a Problem instance.

Config 1 (``poisson_1d``) is the reference's exact problem
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:8-18``, README.md:7-16).
Configs 3-4 are manufactured-solution variants with the same u = sin(pi x)
oracle so convergence floors are directly comparable.
"""

from __future__ import annotations

import jax.numpy as jnp

from .problem import Problem1D


def _trig_translation(c):
    """Rotation matrix of the (sin(pi x), cos(pi x))-proportional factor
    pair under translation: a(x + c) = T(c) a(x)."""
    import numpy as np

    cc, sc = np.cos(np.pi * c), np.sin(np.pi * c)
    return np.array([[cc, sc], [-sc, cc]])


def poisson_1d() -> Problem1D:
    """-u'' = pi^2 sin(pi x) on (-1, 1), u(+-1) = 0, exact u = sin(pi x)."""
    pi = jnp.pi

    def f_shifted(xl, dloc):
        # sin(pi(xl+d)) = sin(pi xl)cos(pi d) + cos(pi xl)sin(pi d):
        # the cos(pi d)/sin(pi d) factors are static per collocation offset,
        # so the fused kernel pays 2 transcendentals per element, not C.
        return (pi**2) * (
            jnp.sin(pi * xl) * jnp.cos(pi * dloc)
            + jnp.cos(pi * xl) * jnp.sin(pi * dloc)
        )

    def f_elem_factors(xl):
        # f(xl+d) = pi^2 [sin(pi xl) cos(pi d) + cos(pi xl) sin(pi d)]:
        # rank-2 separable over (element, offset).
        return [(pi**2) * jnp.sin(pi * xl), (pi**2) * jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        return [np.cos(np.pi * d), np.sin(np.pi * d)]

    return Problem1D(
        name="poisson_1d",
        f=lambda x: (pi**2) * jnp.sin(pi * x),
        exact=lambda x: jnp.sin(pi * x),
        exact_dx=lambda x: pi * jnp.cos(pi * x),
        constant_coeffs=True,
        f_shifted=f_shifted,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


def variable_coeff_elliptic() -> Problem1D:
    """-((1 + x^2) u')' + u = f, manufactured so that u = sin(pi x).

    BASELINE.json config 3: nonconstant stiffness integrands exercise the
    quadrature assembly and the per-element (non-shared) SPD KKT path.
    """
    pi = jnp.pi

    def a(x):
        return 1.0 + x**2

    def da(x):
        return 2.0 * x

    def f(x):
        s, c = jnp.sin(pi * x), jnp.cos(pi * x)
        # -(a u')' + u = -a u'' - a' u' + u
        return (1.0 + x**2) * pi**2 * s - 2.0 * x * pi * c + s

    def f_shifted(xl, dloc):
        # Angle addition: 2 transcendentals per element, static [C, 1]
        # factors; the polynomial coefficient parts are cheap VPU work.
        sl, cl = jnp.sin(pi * xl), jnp.cos(pi * xl)
        sd, cd = jnp.sin(pi * dloc), jnp.cos(pi * dloc)
        s = sl * cd + cl * sd
        c = cl * cd - sl * sd
        x = xl + dloc
        return (1.0 + x**2) * pi**2 * s - 2.0 * x * pi * c + s

    return Problem1D(
        name="variable_coeff_elliptic",
        f=f,
        a=a,
        da=da,
        c=lambda x: jnp.ones_like(x),
        exact=lambda x: jnp.sin(pi * x),
        exact_dx=lambda x: pi * jnp.cos(pi * x),
        constant_coeffs=False,
        f_shifted=f_shifted,
    )


def helmholtz_1d(k: float = 2.3) -> Problem1D:
    """-u'' - k^2 u = f, manufactured u = sin(pi x) (k off-resonance).

    BASELINE.json config 4a: the element operator is indefinite, but the
    LSSVR normal-equations block I + gamma D^T D stays SPD (ops/kkt.py), so
    no pivoted LU is needed — this problem exists to prove that claim.
    """
    pi = jnp.pi

    def f(x):
        return (pi**2 - k**2) * jnp.sin(pi * x)

    amp = pi**2 - k**2

    def f_elem_factors(xl):
        return [amp * jnp.sin(pi * xl), amp * jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        return [np.cos(np.pi * d), np.sin(np.pi * d)]

    return Problem1D(
        name=f"helmholtz_1d_k{k:g}",
        f=f,
        c=lambda x: jnp.full_like(x, -(k**2)),
        exact=lambda x: jnp.sin(pi * x),
        exact_dx=lambda x: pi * jnp.cos(pi * x),
        constant_coeffs=True,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


def advection_diffusion_1d(eps: float = 1.0, beta: float = 3.0) -> Problem1D:
    """-eps u'' + beta u' = f, manufactured u = sin(pi x).

    BASELINE.json config 4b: nonsymmetric FEM system (tridiagonal,
    handled by the same Thomas/PCR solvers) and nonsymmetric collocation
    rows in D.
    """
    pi = jnp.pi

    def f(x):
        return eps * pi**2 * jnp.sin(pi * x) + beta * pi * jnp.cos(pi * x)

    def f_elem_factors(xl):
        # f(xl+d) = sin(pi xl) [eps pi^2 cos(pi d) - beta pi sin(pi d)]
        #         + cos(pi xl) [eps pi^2 sin(pi d) + beta pi cos(pi d)]
        return [jnp.sin(pi * xl), jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        cd, sd = np.cos(np.pi * d), np.sin(np.pi * d)
        return [eps * np.pi**2 * cd - beta * np.pi * sd,
                eps * np.pi**2 * sd + beta * np.pi * cd]

    return Problem1D(
        name=f"advdiff_1d_eps{eps:g}_beta{beta:g}",
        f=f,
        a=lambda x: jnp.full_like(x, eps),
        b=lambda x: jnp.full_like(x, beta),
        exact=lambda x: jnp.sin(pi * x),
        exact_dx=lambda x: pi * jnp.cos(pi * x),
        constant_coeffs=True,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


def poisson_inhomogeneous() -> Problem1D:
    """-u'' = pi^2 sin(pi x) with u = sin(pi x) + x + 2: exercises the
    inhomogeneous-Dirichlet path (u(-1) = 1, u(1) = 3) — column elimination
    in the assembler and the boundary-element overrides, which the
    reference's homogeneous-only ``enforce`` (``:137``) never hits."""
    pi = jnp.pi

    def f_elem_factors(xl):
        return [(pi**2) * jnp.sin(pi * xl), (pi**2) * jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        return [np.cos(np.pi * d), np.sin(np.pi * d)]

    return Problem1D(
        name="poisson_inhomogeneous",
        f=lambda x: (pi**2) * jnp.sin(pi * x),
        g_left=1.0,
        g_right=3.0,
        exact=lambda x: jnp.sin(pi * x) + x + 2.0,
        exact_dx=lambda x: pi * jnp.cos(pi * x) + 1.0,
        constant_coeffs=True,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


def poisson_neumann() -> Problem1D:
    """-u'' = pi^2 sin(pi x), u(-1) = 0 Dirichlet, u'(1) = -pi Neumann
    (outward flux a u'·n = g_right = -pi); exact u = sin(pi x).

    Exercises the natural-BC path (``assembly.apply_bcs``): the right
    boundary row stays assembled, the enhancement pins the right boundary
    element to the FEM nodal value (no exact-data override).  Beyond the
    reference's scope (Dirichlet only, ``:14-18``)."""
    pi = jnp.pi

    def f_elem_factors(xl):
        return [(pi**2) * jnp.sin(pi * xl), (pi**2) * jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        return [np.cos(np.pi * d), np.sin(np.pi * d)]

    return Problem1D(
        name="poisson_neumann",
        f=lambda x: (pi**2) * jnp.sin(pi * x),
        bc_right="neumann",
        g_right=float(-jnp.pi),  # a u'(1)·(+1) = pi cos(pi) = -pi
        exact=lambda x: jnp.sin(pi * x),
        exact_dx=lambda x: pi * jnp.cos(pi * x),
        constant_coeffs=True,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


def robin_1d(alpha: float = 1.0) -> Problem1D:
    """-u'' + u = (pi^2 + 1) cos(pi x), Robin a u'·n + alpha u = g at both
    ends; exact u = cos(pi x) (u(+-1) = -1, u'(+-1) = 0 -> g = -alpha).

    The exact solution is NONZERO at the boundary, so this certifies that
    the enhancement's FEM-value pin at non-Dirichlet ends carries real
    boundary information (not a masked zero)."""
    pi = jnp.pi
    amp = pi**2 + 1.0

    def f_elem_factors(xl):
        return [jnp.sin(pi * xl), jnp.cos(pi * xl)]

    def f_colloc_factors(d):
        import numpy as np

        return [-amp * np.sin(np.pi * d), amp * np.cos(np.pi * d)]

    return Problem1D(
        name=f"robin_1d_alpha{alpha:g}",
        f=lambda x: amp * jnp.cos(pi * x),
        c=lambda x: jnp.ones_like(x),
        bc_left="robin",
        bc_right="robin",
        robin_alpha_left=alpha,
        robin_alpha_right=alpha,
        g_left=-alpha,  # a u'·n + alpha u = 0 + alpha*(-1)
        g_right=-alpha,
        exact=lambda x: jnp.cos(pi * x),
        exact_dx=lambda x: -pi * jnp.sin(pi * x),
        constant_coeffs=True,
        f_elem_factors=f_elem_factors,
        f_colloc_factors=f_colloc_factors,
        f_translation=_trig_translation,
    )


REGISTRY = {
    "poisson_1d": poisson_1d,
    "variable_coeff_elliptic": variable_coeff_elliptic,
    "helmholtz_1d": helmholtz_1d,
    "advection_diffusion_1d": advection_diffusion_1d,
    "poisson_inhomogeneous": poisson_inhomogeneous,
    "poisson_neumann": poisson_neumann,
    "robin_1d": robin_1d,
}


def get(name: str, **kwargs) -> Problem1D:
    return REGISTRY[name](**kwargs)
