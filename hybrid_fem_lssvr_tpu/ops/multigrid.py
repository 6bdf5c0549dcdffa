"""Geometric multigrid V-cycle preconditioner for the 2D Q1 coarse solve.

Jacobi-CG iteration counts grow like O(N) with mesh refinement (measured
88/177/357 at n = 32/64/128 on a generic rhs) — at production grid sizes the
coarse stage would dominate the whole pipeline.  A standard geometric
V-cycle (weighted-Jacobi smoothing, full-weighting restriction, bilinear
prolongation, rediscretised coarse operators — scale-invariant for the 2D
Laplacian on square-ish cells) bounds the preconditioned iteration count
independently of N.

Everything is expressed as static slicing/stencil ops on the node grid —
no gathers, no sparse formats; XLA fuses each level into a few stencil
kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import assembly2d


def _fw_rows(x: jnp.ndarray) -> jnp.ndarray:
    """1D full weighting along axis 0 of an ODD-length (padded) array:
    y[i] = (x[2i] + 2 x[2i+1] + x[2i+2]) / 2.

    Implemented by a pair-deinterleaving reshape instead of stride-2
    slicing: TPU lowers strided slices on the minor (lane) axis to
    element gathers — the old sliced restrict measured 24.6 ms for one
    1025^2 -> 513^2 transfer where this form measures 0.03 ms (820x;
    docs/NUMERICS.md 20)."""
    L = x.shape[0]
    m = (L - 1) // 2
    pairs = x[:-1].reshape((m, 2) + x.shape[1:])
    xe = pairs[:, 0]  # x[0], x[2], ..., x[L-3]
    xo = pairs[:, 1]  # x[1], x[3], ..., x[L-2]
    xe_next = jnp.concatenate([xe[1:], x[-1:]], axis=0)  # x[2i+2]
    return 0.5 * (xe + 2.0 * xo + xe_next)


def restrict_full_weighting(r: jnp.ndarray) -> jnp.ndarray:
    """[nf+1, nf+1] fine-grid residual -> [nf/2+1, nf/2+1] via R = P^T
    (stencil [1 2 1; 2 4 2; 1 2 1]/4, applied separably per axis).  For Q1
    elements with bilinear P the coarse Q1 space is nested in the fine one
    and P^T A P IS the coarse Q1 stiffness (square cells), so R must be
    P^T exactly — the classical FW/16 scaling under-weights the coarse
    correction by 4x (measured: CG iteration counts kept growing ~O(N^0.8)
    instead of staying flat)."""
    rp = jnp.pad(r, 1)
    return _fw_rows(_fw_rows(rp).T).T


def _interleave_rows(xe: jnp.ndarray, xo: jnp.ndarray) -> jnp.ndarray:
    """[m+1, ...] even rows + [m, ...] odd rows -> [2m+1, ...] interleaved
    (stack + reshape; strided .at[::2].set scatters measured 5.5 ms for
    one 513 -> 1025 prolongation where this form is ~free)."""
    body = jnp.stack([xe[:-1], xo], axis=1)
    body = body.reshape((-1,) + xe.shape[1:])
    return jnp.concatenate([body, xe[-1:]], axis=0)


def prolong_bilinear(c: jnp.ndarray) -> jnp.ndarray:
    """[nc+1, nc+1] coarse field -> [2nc+1, 2nc+1] bilinear interpolation
    (separable interleave per axis).  The fine shape is always
    (2*nc+1, 2*nc+1) by construction — nested Q1 spaces."""
    top = _interleave_rows(c.T, 0.5 * (c[:, :-1] + c[:, 1:]).T).T
    return _interleave_rows(top, 0.5 * (top[:-1] + top[1:]))


def _interior(shape):
    m = jnp.zeros(shape, bool)
    return m.at[1:-1, 1:-1].set(True)


def restrict_full_weighting_3d(r: jnp.ndarray) -> jnp.ndarray:
    """[nf+1]^3 fine residual -> [nf/2+1]^3 via R = P^T (separable
    [1 2 1]/2 per axis — same pair-deinterleaved form as 2D)."""
    rp = jnp.pad(r, 1)
    a = _fw_rows(rp)
    b = jnp.moveaxis(_fw_rows(jnp.moveaxis(a, 1, 0)), 0, 1)
    return jnp.moveaxis(_fw_rows(jnp.moveaxis(b, 2, 0)), 0, 2)


def prolong_trilinear(c: jnp.ndarray) -> jnp.ndarray:
    """[nc+1]^3 coarse field -> [2nc+1]^3 trilinear interpolation
    (separable interleave per axis)."""

    def up(x):
        return _interleave_rows(x, 0.5 * (x[:-1] + x[1:]))

    a = up(c)
    b = jnp.moveaxis(up(jnp.moveaxis(a, 1, 0)), 0, 1)
    return jnp.moveaxis(up(jnp.moveaxis(b, 2, 0)), 0, 2)


def _interior_3d(shape):
    m = jnp.zeros(shape, bool)
    return m.at[1:-1, 1:-1, 1:-1].set(True)


def make_vcycle_3d(nz1: int, ny1: int, nx1: int, K_loc, dtype,
                   nu: int = 2, omega: float = 0.8, coarsest: int = 5,
                   coarse_sweeps: int = 60, loc_for_level=None,
                   apply_diag_for_level=None):
    """3D analog of ``make_vcycle``: V(nu, nu) on the Dirichlet-interior
    Q1 hex system.  ``loc_for_level(lvl)`` returns the rediscretised local
    8x8 at level ``lvl`` (spacing 2**lvl x fine) — required whenever the
    operator has DIFFERENTLY-h-scaling terms (mass ~ h^3, convection
    ~ h^2 vs stiffness ~ h).  With ``loc_for_level=None`` the pure
    a0-Laplacian scaling is applied automatically: every term of the 3D
    Q1 stiffness tensor product scales like h (1/h x h x h), so
    K_loc(2^l h) = 2^l K_loc(h) EXACTLY.  (Reusing the fine K_loc
    unscaled — the 2D habit, where stiffness IS scale-invariant — makes
    each coarse correction wrong by 2x per level; measured CG iterations
    13/18/26 at 16/32/64^3 with the bug vs mesh-independent after.)
    For operators without a shared local 8x8 (variable coefficients),
    pass ``apply_diag_for_level(lvl, shape)`` returning
    ``(apply_fn, diag_array)`` — exact rediscretisation per level, the 3D
    analog of ``make_vcycle``'s hook."""
    from . import assembly3d

    shapes = [(nz1, ny1, nx1)]
    while (
        all((s - 1) % 2 == 0 for s in shapes[-1])
        and min(shapes[-1]) - 1 > coarsest
    ):
        shapes.append(tuple((s - 1) // 2 + 1 for s in shapes[-1]))
    masks = [_interior_3d(s) for s in shapes]
    if apply_diag_for_level is not None:
        applies, raw_diags = zip(*[
            apply_diag_for_level(i, shapes[i]) for i in range(len(shapes))
        ])
        diags = [
            jnp.where(masks[i], raw_diags[i], 1.0)
            for i in range(len(shapes))
        ]

        def apply_A(u, lvl):
            return jnp.where(
                masks[lvl], applies[lvl](u * masks[lvl]), 0.0
            )
    else:
        if loc_for_level is None:
            locs = [K_loc * jnp.asarray(2.0**lvl, dtype)
                    for lvl in range(len(shapes))]
        else:
            locs = [jnp.asarray(loc_for_level(lvl), dtype)
                    for lvl in range(len(shapes))]
        diags = [
            jnp.where(
                masks[lvl],
                assembly3d.stiffness_diag_3d(shapes[lvl], locs[lvl],
                                             dtype),
                1.0,
            )
            for lvl in range(len(shapes))
        ]

        def apply_A(u, lvl):
            return jnp.where(
                masks[lvl],
                assembly3d.apply_stiffness_3d(u * masks[lvl], locs[lvl]),
                0.0,
            )

    def smooth(u, r, lvl, sweeps):
        for _ in range(sweeps):
            u = u + omega * jnp.where(
                masks[lvl], (r - apply_A(u, lvl)) / diags[lvl], 0.0
            )
        return u

    def vcycle(r, lvl=0):
        u = smooth(jnp.zeros_like(r), r, lvl, nu)
        if lvl == len(shapes) - 1:
            return smooth(u, r, lvl, coarse_sweeps - nu)
        res = jnp.where(masks[lvl], r - apply_A(u, lvl), 0.0)
        rc = jnp.where(masks[lvl + 1], restrict_full_weighting_3d(res),
                       0.0)
        ec = vcycle(rc, lvl + 1)
        u = u + jnp.where(masks[lvl], prolong_trilinear(ec), 0.0)
        return smooth(u, r, lvl, nu)

    return vcycle


def make_vcycle(ny1: int, nx1: int, K_loc, dtype, nu: int = 2,
                omega: float = 0.8, coarsest: int = 5,
                coarse_sweeps: int = 60, loc_for_level=None,
                apply_diag_for_level=None):
    """Build M_inv(r): one V(nu, nu) cycle on the Dirichlet-interior system.

    Requires (ny1-1, nx1-1) divisible by 2 down to the coarsest level; the
    2D Laplacian's Q1 stiffness is scale-invariant for fixed aspect ratio,
    so by default K_loc is reused on every level.  For operators with mass
    or convection terms (which scale with h), pass ``loc_for_level(lvl)``
    returning the rediscretised local 4x4 at level ``lvl`` (spacing
    ``2**lvl`` times the fine spacing).  For operators without a shared
    local 4x4 (variable coefficients), pass ``apply_diag_for_level(lvl,
    shape)`` returning ``(apply_fn, diag_array)`` — the exact
    rediscretisation per level (coefficient callables re-sampled at each
    level's own quadrature points)."""
    shapes = [(ny1, nx1)]
    while (
        (shapes[-1][0] - 1) % 2 == 0
        and (shapes[-1][1] - 1) % 2 == 0
        and min(shapes[-1]) - 1 > coarsest
    ):
        shapes.append(((shapes[-1][0] - 1) // 2 + 1,
                       (shapes[-1][1] - 1) // 2 + 1))
    masks = [_interior(s) for s in shapes]
    if apply_diag_for_level is not None:
        applies, raw_diags = zip(*[
            apply_diag_for_level(i, shapes[i]) for i in range(len(shapes))
        ])
        diags = [
            jnp.where(masks[i], raw_diags[i], 1.0)
            for i in range(len(shapes))
        ]

        def apply_A(u, lvl):
            return jnp.where(
                masks[lvl], applies[lvl](u * masks[lvl]), 0.0
            )
    else:
        if loc_for_level is None:
            locs = [K_loc] * len(shapes)
        else:
            locs = [loc_for_level(i) for i in range(len(shapes))]
        diags = [
            jnp.where(
                masks[i],
                assembly2d.stiffness_diag(shapes[i], locs[i], dtype),
                1.0,
            )
            for i in range(len(shapes))
        ]

        def apply_A(u, lvl):
            return jnp.where(
                masks[lvl],
                assembly2d.apply_stiffness(u * masks[lvl], locs[lvl]),
                0.0,
            )

    def smooth(u, r, lvl, sweeps):
        for _ in range(sweeps):
            u = u + omega * jnp.where(
                masks[lvl], (r - apply_A(u, lvl)) / diags[lvl], 0.0
            )
        return u

    def vcycle(r, lvl=0):
        u = smooth(jnp.zeros_like(r), r, lvl, nu)
        if lvl == len(shapes) - 1:
            return smooth(u, r, lvl, coarse_sweeps - nu)
        res = jnp.where(masks[lvl], r - apply_A(u, lvl), 0.0)
        rc = jnp.where(masks[lvl + 1], restrict_full_weighting(res), 0.0)
        ec = vcycle(rc, lvl + 1)
        u = u + jnp.where(masks[lvl], prolong_bilinear(ec), 0.0)
        return smooth(u, r, lvl, nu)

    return vcycle
