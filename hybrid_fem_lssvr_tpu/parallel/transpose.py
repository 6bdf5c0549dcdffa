"""Ulysses-pattern all-to-all layout transpose + distributed ADI sweeps.

SURVEY.md section 2.3 (Ulysses row): for 2D structured grids, an
``all_to_all`` transpose between row-sharded (y-slab) and column-sharded
(x-slab) layouts supports the two sweep directions of ADI-style / banded
solvers — the same communication pattern Ulysses uses to move sequence
sharding between the token and head axes.

Two layers:

* ``make_sharded_transpose`` — the bare layout move: a [rows, cols] array
  sharded over rows becomes its transpose [cols, rows] sharded over rows,
  in ONE ``all_to_all`` (each device exchanges a [rows/D, cols/D] block
  with every other device; total bytes moved = the array once over ICI).
* ``adi_poisson_sweeps`` — Peaceman–Rachford ADI iterations for the 2D
  Dirichlet Poisson problem: each half-step solves independent tridiagonal
  line systems along one axis (batched Thomas — lines are the batch axis,
  so under GSPMD a line-sharded batch solves with zero communication), and
  the transpose switches the line direction between half-steps.  Pass the
  distributed transpose to run multi-chip; the math is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops import tridiag
from .mesh import ELEMENT_AXIS


def _local_transpose_block(x_loc, axis, n_dev):
    """Local shard [r_loc, Ctot] -> transposed shard [Ctot/n_dev,
    r_loc*n_dev] via one all_to_all."""
    r_loc, Ctot = x_loc.shape
    c_loc = Ctot // n_dev
    # [r_loc, n_dev, c_loc] -> [n_dev, r_loc, c_loc]: chunk e goes to dev e.
    blocks = jnp.swapaxes(x_loc.reshape(r_loc, n_dev, c_loc), 0, 1)
    recv = jax.lax.all_to_all(blocks, axis, split_axis=0, concat_axis=0)
    # recv[e, j, i] = x[e * r_loc + j, d * c_loc + i]  (d = this device)
    # -> out[i, e * r_loc + j]: exactly x.T rows [d*c_loc, (d+1)*c_loc).
    return jnp.transpose(recv, (2, 0, 1)).reshape(c_loc, n_dev * r_loc)


def make_sharded_transpose(mesh, rows: int, cols: int,
                           axis: str = ELEMENT_AXIS):
    """Jitted distributed transpose: x [rows, cols] sharded over rows ->
    x.T [cols, rows] sharded over rows.  rows and cols must divide by the
    device count (pad upstream otherwise)."""
    n_dev = mesh.shape[axis]
    if rows % n_dev or cols % n_dev:
        raise ValueError(
            f"rows={rows} and cols={cols} must divide by n_dev={n_dev}"
        )

    def local(x_loc):
        return _local_transpose_block(x_loc, axis, n_dev)

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)


def _line_solve(rhs_rows, h, tau, n_true=None):
    """Solve (tau I + A) u = rhs along axis 1 for a batch of interior
    Dirichlet lines [L, n]: A = (1/h^2) tridiag(-1, 2, -1).  Batched
    Thomas over lines (the scan runs along the unsharded axis, so a
    line-sharded batch needs no communication).

    ``n_true`` < n marks the line's true Dirichlet length when the batch
    is zero-padded for divisibility (distributed all_to_all transposes):
    couplings are cut at the n_true boundary and the pad region solves as
    identity, so the true-region solution is EXACT — not a perturbed
    longer line."""
    n = rhs_rows.shape[1]
    if n_true is None:
        n_true = n
    inv2 = 1.0 / (h * h)
    dt = rhs_rows.dtype
    j = jnp.arange(n)
    a = jnp.where((j == 0) | (j >= n_true), 0.0,
                  jnp.asarray(-inv2, dt))
    b = jnp.where(j < n_true, jnp.asarray(tau, dt) + 2.0 * inv2,
                  jnp.asarray(1.0, dt))
    c = jnp.where(j >= n_true - 1, 0.0, jnp.asarray(-inv2, dt))
    return tridiag.thomas(a, b, c, rhs_rows.T).T


def _apply_line_laplacian(u_rows, h):
    """A u along axis 1 (zero-Dirichlet line Laplacian)."""
    pad = jnp.pad(u_rows, ((0, 0), (1, 1)))
    return (2.0 * u_rows - pad[:, :-2] - pad[:, 2:]) / (h * h)


def adi_poisson_sweeps(f_int, hx, hy, tau, n_sweeps: int,
                       transpose_fn=None, transpose_fn_T=None,
                       true_shape=None):
    """Peaceman–Rachford ADI for -Lap u = f, u = 0 on the boundary of a
    uniform grid; ``f_int``: interior rhs [ny-1, nx-1] (y-major).

    Each sweep:  (tau I + A_x) u*  = (tau I - A_y) u  + f
                 (tau I + A_y) u'  = (tau I - A_x) u* + f

    ``transpose_fn`` maps the y-major interior grid to x-major (and
    ``transpose_fn_T`` back); pass the pair from
    ``make_sharded_transpose`` for the distributed all-to-all version, or
    leave None for the local ``.T``.  ``true_shape`` = (ny_true, nx_true)
    marks the true interior extents when ``f_int`` is zero-padded for
    device divisibility — the pad region stays exactly zero (masked
    applies + identity pad rows in the line solves), so the true-region
    iteration is unchanged by padding.  Returns the interior solution,
    same shape as ``f_int``.
    """
    tp = (lambda a: a.T) if transpose_fn is None else transpose_fn
    tpT = (lambda a: a.T) if transpose_fn_T is None else transpose_fn_T

    u = jnp.zeros_like(f_int)
    fT = tp(f_int)
    nx_t = f_int.shape[1] if true_shape is None else true_shape[1]
    ny_t = fT.shape[1] if true_shape is None else true_shape[0]
    mx = (jnp.arange(f_int.shape[1]) < nx_t)[None, :]
    my = (jnp.arange(fT.shape[1]) < ny_t)[None, :]
    for _ in range(n_sweeps):
        uT = tp(u)  # x-major: y-lines along axis 1
        rhs1 = tpT(my * (tau * uT - _apply_line_laplacian(uT, hy))) + f_int
        u_star = _line_solve(mx * rhs1, hx, tau, n_true=nx_t)
        rhs2 = tp(mx * (tau * u_star - _apply_line_laplacian(u_star, hx))) \
            + fT
        uT = _line_solve(my * rhs2, hy, tau, n_true=ny_t)
        u = tpT(uT)
    return u


def make_adi_preconditioner(ny1: int, nx1: int, hx, hy, dtype,
                            n_sweeps: int = 1, tau=None,
                            transpose_fn=None, transpose_fn_T=None):
    """ADI sweeps as a CG preconditioner for the 2D coarse solve.

    Approximately inverts the 5-point FD Laplacian (spectrally equivalent
    to the Q1 stiffness) with ``n_sweeps`` Peaceman-Rachford iterations
    from a zero start — on a rectangle A_x and A_y commute, so the sweep
    operator is a symmetric rational function of them: a valid SPD
    preconditioner.  The line solves are exact per direction regardless of
    the hx/hy aspect ratio, which is exactly where point-smoothing
    (Jacobi / point-MG) degrades.  Returns M_inv(r_grid) -> u_grid over
    the padded [ny1, nx1] nodal grid (boundary rows/cols zero).
    """
    import numpy as np

    if tau is None:
        # Geometric mean of the line operators' spectral extremes:
        # lam in [pi^2, 4/h^2] per direction, h = min(hx, hy).
        hmin = min(float(hx), float(hy))
        tau = np.sqrt(np.pi**2 * 4.0 / hmin**2)
    # The Q1 load/stiffness scale: r ~ (hx hy) * continuous residual.
    scale = 1.0 / (float(hx) * float(hy))

    def M_inv(r_grid):
        r_int = r_grid[1:-1, 1:-1] * jnp.asarray(scale, dtype)
        u_int = adi_poisson_sweeps(r_int, hx, hy, tau, n_sweeps,
                                   transpose_fn=transpose_fn,
                                   transpose_fn_T=transpose_fn_T)
        return jnp.pad(u_int, ((1, 1), (1, 1)))

    return M_inv
