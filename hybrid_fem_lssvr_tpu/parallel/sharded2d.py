"""Multi-chip 2D hybrid solve: element rows sharded as y-slabs.

BASELINE.json config 5: "per-element LSSVR batched across a TPU mesh".
The coarse Q1-CG stage is replicated (identical deterministic result on
every device — it is the cheap stage and needs no communication); the
enhancement, which dominates at scale, shards its element rows as
contiguous y-slabs: every device builds and solves its own slab's batch
through the shared two-matmul path, with the domain-boundary override masks
driven by GLOBAL row indices.  Output coefficients are sharded over the
leading (element-row) axis.

A fully distributed CG (slab-halo stiffness apply via ppermute) is the
natural extension and shares this module's slab layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.hybrid2d import (
    Problem2D, Solver2DConfig, _bilinear_fallback_coeffs, _element_data_2d,
    _varcoeff_element_operators, fem_solve_2d, prepare_shared_2d,
)
from ..ops import kkt
from .mesh import ELEMENT_AXIS


class ShardedSolution2D(NamedTuple):
    coeffs: jnp.ndarray  # [ny, nx, M, M] sharded over element rows
    fem_local: jnp.ndarray  # [n_dev, ny_loc+1, nx+1] per-device slabs
    solve_ok: jnp.ndarray  # [ny, nx]
    # Full observability (SURVEY.md section 5 metrics): per-element slack /
    # boundary-trace residuals and the coarse stage's iteration count +
    # final residual (identical across devices for the distributed CG —
    # reported per device so a divergent shard would be visible).
    max_slack: jnp.ndarray = None  # [ny, nx]
    bc_violation: jnp.ndarray = None  # [ny, nx]
    cg_iters: jnp.ndarray = None  # [n_dev]
    cg_residual: jnp.ndarray = None  # [n_dev]

    def assemble_fem_grid(self, total_ny=None):
        """Stitch the overlapping slabs back into the [ny+1, nx+1] grid
        (pass ``total_ny`` to strip padded tail rows)."""
        import numpy as np

        n_dev, nloc1, nx1 = self.fem_local.shape
        ny_loc = nloc1 - 1
        grid = np.zeros((n_dev * ny_loc + 1, nx1))
        fl = np.asarray(self.fem_local)
        for dd in range(n_dev):
            grid[dd * ny_loc:(dd + 1) * ny_loc + 1] = fl[dd]
        if total_ny is not None:
            grid = grid[: total_ny + 1]
        return grid


def _halo_add(y_loc, d, n_dev, axis):
    """Sum duplicated-interface contributions across neighbouring slabs.

    Each device's first/last node row is shared with a neighbour; after a
    local stiffness/load computation both owners hold PARTIAL sums.  Two
    ``ppermute``s exchange the partial rows and both copies become the full
    sum — the duplicated-consistent slab representation.
    """
    up_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    dn_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    from_next = jax.lax.ppermute(y_loc[0], axis, up_perm)  # next dev's row 0
    from_prev = jax.lax.ppermute(y_loc[-1], axis, dn_perm)
    y_loc = y_loc.at[-1].add(
        jnp.where(d < n_dev - 1, from_next, jnp.zeros_like(from_next))
    )
    y_loc = y_loc.at[0].add(
        jnp.where(d > 0, from_prev, jnp.zeros_like(from_prev))
    )
    return y_loc


def _restrict_slab(res, d, n_dev, axis):
    """Full-weighting restriction of a y-slab residual [nyl+1, nx+1] ->
    [nyl/2+1, nx/2+1], with the two 1-row halos needed by the interface
    coarse nodes fetched via ppermute (R = P^T scaling, see ops/multigrid).
    """
    from ..ops.multigrid import _fw_rows

    up_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    dn_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    # row below slab start = previous device's second-to-last row
    from_prev = jax.lax.ppermute(res[-2], axis, up_perm)
    # row above slab end = next device's second row
    from_next = jax.lax.ppermute(res[1], axis, dn_perm)
    from_prev = jnp.where(d > 0, from_prev, jnp.zeros_like(from_prev))
    from_next = jnp.where(d < n_dev - 1, from_next,
                          jnp.zeros_like(from_next))
    r_ext = jnp.concatenate([from_prev[None], res, from_next[None]])
    # Separable pair-deinterleaved full weighting ([1 2 1]/2 per axis) —
    # stride-2 slicing lowers to element gathers on TPU (multigrid._fw_rows
    # docstring; same fix as the serial restrict).
    rows = _fw_rows(r_ext)  # [nyl/2 + 1, nx + 1]
    return _fw_rows(jnp.pad(rows, ((0, 0), (1, 1))).T).T


def _gather_grid(c_slab, n_dev, axis):
    """all_gather overlapping coarse slabs [nc_loc+1, nxc+1] into the full
    replicated coarse grid [n_dev*nc_loc+1, nxc+1]."""
    slabs = jax.lax.all_gather(c_slab, axis)  # [n_dev, nc_loc+1, nxc+1]
    parts = [slabs[dd, :-1] for dd in range(n_dev)]
    parts.append(slabs[n_dev - 1, -1:])
    return jnp.concatenate(parts, axis=0)


def _restrict_block(res, dy, dx, n_dy, n_dx, ay, ax):
    """Full-weighting restriction of a 2-axis block residual
    [nyl+1, nxl+1] -> [nyl/2+1, nxl/2+1].  Rows are extended with the
    y-neighbours' halo rows first; the column exchange then runs on the
    ROW-EXTENDED array, so the corner entries it delivers are the diagonal
    neighbours' values (the same nested-halo trick as ``_halo_add_2d``).
    Global-boundary sides extend with zeros (the residual vanishes there).
    """
    from ..ops.multigrid import _fw_rows

    up = [(i, (i + 1) % n_dy) for i in range(n_dy)]
    dn = [(i, (i - 1) % n_dy) for i in range(n_dy)]
    from_prev = jax.lax.ppermute(res[-2], ay, up)  # y-neighbour below
    from_next = jax.lax.ppermute(res[1], ay, dn)  # y-neighbour above
    from_prev = jnp.where(dy > 0, from_prev, jnp.zeros_like(from_prev))
    from_next = jnp.where(dy < n_dy - 1, from_next,
                          jnp.zeros_like(from_next))
    r_ext = jnp.concatenate([from_prev[None], res, from_next[None]])
    upx = [(i, (i + 1) % n_dx) for i in range(n_dx)]
    dnx = [(i, (i - 1) % n_dx) for i in range(n_dx)]
    from_left = jax.lax.ppermute(r_ext[:, -2], ax, upx)
    from_right = jax.lax.ppermute(r_ext[:, 1], ax, dnx)
    from_left = jnp.where(dx > 0, from_left, jnp.zeros_like(from_left))
    from_right = jnp.where(dx < n_dx - 1, from_right,
                           jnp.zeros_like(from_right))
    c_ext = jnp.concatenate(
        [from_left[:, None], r_ext, from_right[:, None]], axis=1
    )  # [nyl+3, nxl+3]
    rows = _fw_rows(c_ext)  # [nyl/2+1, nxl+3]
    return _fw_rows(rows.T).T  # [nyl/2+1, nxl/2+1]


def _gather_grid_2d(c_block, n_dy, n_dx, ay, ax):
    """all_gather overlapping coarse blocks [nyc_loc+1, nxc_loc+1] into the
    full replicated coarse grid [nyc+1, nxc+1] (columns within each row
    slab first, then rows)."""
    cols = jax.lax.all_gather(c_block, ax)  # [n_dx, nyc_loc+1, nxc_loc+1]
    parts = [cols[i, :, :-1] for i in range(n_dx)]
    parts.append(cols[n_dx - 1, :, -1:])
    row_slab = jnp.concatenate(parts, axis=1)  # [nyc_loc+1, nxc+1]
    return _gather_grid(row_slab, n_dy, ay)


def _fine_pc(problem, precond, var, hx, hy, dtype, shape1, varparts, halo,
             interior, apply_free, diag):
    """Fine-level preconditioner operator for the distributed V-cycle:
    'mg' cycles on the true operator; 'shifted' on the SPD c -> |c|
    operator (variable diffusion kept exactly — only the reaction term is
    shifted).  Returns (apply_pc, diag_pc)."""
    from ..ops import assembly2d

    if precond != "shifted":
        return apply_free, diag
    c_pc = abs(problem.c)
    bx, by = problem.b
    if var:
        Sq, a_maps = varparts
        K_shift = None
        if c_pc != 0.0 or bx != 0.0 or by != 0.0:
            K_shift = jnp.asarray(
                assembly2d.q1_local_operator(hx, hy, 0.0, c_pc, bx, by),
                dtype,
            )

        def apply_pc_local(v):
            yv = assembly2d.apply_stiffness_var(v, Sq, a_maps)
            if K_shift is not None:
                yv = yv + assembly2d.apply_stiffness(v, K_shift)
            return yv

        diag_pc_l = assembly2d.stiffness_var_diag(shape1, Sq, a_maps, dtype)
        if K_shift is not None:
            diag_pc_l = diag_pc_l + assembly2d.stiffness_diag(
                shape1, K_shift, dtype)
    else:
        K_pc = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, problem.a0, c_pc, bx, by),
            dtype,
        )

        def apply_pc_local(v):
            return assembly2d.apply_stiffness(v, K_pc)

        diag_pc_l = assembly2d.stiffness_diag(shape1, K_pc, dtype)

    def apply_pc(v):
        return jnp.where(interior, halo(apply_pc_local(v * interior)), 0.0)

    return apply_pc, halo(diag_pc_l)


def _coarse_vcycle(problem, precond, var, hx, hy, dtype, nyc1, nxc1):
    """Serial V-cycle for the gathered (replicated) coarse grid, one level
    below the distributed fine level (spacing 2x fine; per-level
    rediscretisation; c -> |c| under 'shifted')."""
    from ..ops import assembly2d, multigrid

    c_pc = problem.c if precond == "mg" else abs(problem.c)
    if var:
        from ..models.hybrid2d import _varcoeff_mg_levels

        return multigrid.make_vcycle(
            nyc1, nxc1, None, dtype,
            apply_diag_for_level=_varcoeff_mg_levels(
                problem, hx, hy, dtype, lvl_offset=1, c_override=c_pc
            ),
        )
    return multigrid.make_vcycle(
        nyc1, nxc1,
        jnp.asarray(
            assembly2d.q1_local_operator(2.0 * hx, 2.0 * hy, problem.a0,
                                         c_pc, *problem.b),
            dtype,
        ),
        dtype,
        loc_for_level=lambda lvl: jnp.asarray(
            assembly2d.q1_local_operator(
                hx * 2.0 ** (lvl + 1), hy * 2.0 ** (lvl + 1),
                problem.a0, c_pc, *problem.b
            ),
            dtype,
        ),
    )


def _dist_fem_solve_2d(problem: Problem2D, cfg: Solver2DConfig, d, n_dev,
                       axis, xs, ys_loc, row0):
    """Distributed Q1 coarse solve on y-slabs: local matrix-free stiffness
    apply + one halo exchange per CG iteration; ownership-masked psum inner
    products.  Returns the slab's nodal values [ny_loc+1, nx+1]."""
    from ..ops import assembly2d, cg

    dtype = xs.dtype
    ny_loc = ys_loc.shape[0] - 1
    nx1 = xs.shape[0]
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    var = problem.a_var is not None
    if var:
        # Variable diffusion: per-element K_e = sum_q a(x_q) S_q with the
        # coefficient sampled at THIS slab's quadrature points; constant
        # reaction/advection terms compose additively (mirrors
        # hybrid2d.fem_solve_2d).
        Sq_np, dxq, dyq = assembly2d.q1_varcoeff_parts(hx, hy)
        Sq = jnp.asarray(Sq_np, dtype)
        a_maps = assembly2d.coeff_maps(xs, ys_loc, problem.a_var, dxq, dyq)
        K_const = None
        if problem.c != 0.0 or problem.b != (0.0, 0.0):
            K_const = jnp.asarray(
                assembly2d.q1_local_operator(hx, hy, 0.0, problem.c,
                                             *problem.b),
                dtype,
            )

        def apply_local(v):
            y = assembly2d.apply_stiffness_var(v, Sq, a_maps)
            if K_const is not None:
                y = y + assembly2d.apply_stiffness(v, K_const)
            return y

        diag_local = assembly2d.stiffness_var_diag((ny_loc + 1, nx1), Sq,
                                                   a_maps, dtype)
        if K_const is not None:
            diag_local = diag_local + assembly2d.stiffness_diag(
                (ny_loc + 1, nx1), K_const, dtype)
    else:
        if cfg.coarse == "compact":
            # Tensor-Numerov compact rows: same 9-point local-4x4
            # sparsity as Q1, so the identical halo-apply machinery
            # carries the O(h^4) scheme (constraints validated at build
            # time in make_sharded_solve_2d).
            K_loc = jnp.asarray(
                assembly2d.q1_numerov_locals(hx, hy, problem.a0,
                                             problem.c)[0],
                dtype,
            )
        else:
            K_loc = jnp.asarray(
                assembly2d.q1_local_operator(hx, hy, problem.a0,
                                             problem.c, *problem.b),
                dtype,
            )

        def apply_local(v):
            return assembly2d.apply_stiffness(v, K_loc)

        diag_local = assembly2d.stiffness_diag((ny_loc + 1, nx1), K_loc,
                                               dtype)
    spd = problem.b == (0.0, 0.0) and problem.c >= 0.0

    # Global interior mask for this slab's node rows.
    g_row = row0 + jnp.arange(ny_loc + 1)
    row_int = (g_row > 0) & (g_row < cfg.ny)
    col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
    interior = row_int[:, None] & col_int[None, :]
    own = jnp.where((jnp.arange(ny_loc + 1) > 0) | (d == 0), 1.0, 0.0)
    own = own.astype(dtype)[:, None]

    if not var and cfg.coarse == "compact":
        # Numerov-weighted load M f_nodal on the slab's nodes; the
        # interface rows' neighbour-element contributions arrive through
        # the same halo exchange as the Q1 quadrature load (nodal f
        # samples agree across the shared interface row, so the split
        # element sums add exactly).
        K_M = jnp.asarray(
            assembly2d.q1_numerov_locals(hx, hy, problem.a0,
                                         problem.c)[1],
            dtype,
        )
        Xl, Yl = jnp.meshgrid(xs, ys_loc)
        F_nodes = problem.f(Xl, Yl) * jnp.ones_like(Xl)
        b = _halo_add(assembly2d.apply_stiffness(F_nodes, K_M),
                      d, n_dev, axis)
    else:
        b = _halo_add(assembly2d.assemble_load(xs, ys_loc, problem.f),
                      d, n_dev, axis)
    X, Y = jnp.meshgrid(xs, ys_loc)
    u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))

    def apply_full(v):
        return _halo_add(apply_local(v), d, n_dev, axis)

    def apply_free(v):
        return jnp.where(interior, apply_full(v * interior), 0.0)

    def dist_dot(u, v):
        return jax.lax.psum(jnp.sum(u * v * own), axis)

    rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
    diag = _halo_add(diag_local, d, n_dev, axis)

    precond = cfg.precond
    if precond == "auto":
        if (cfg.ny % (2 * n_dev) == 0 and cfg.nx % 2 == 0
                and min(cfg.nx, cfg.ny) >= 8):
            # Indefinite Helmholtz: V-cycle of the SPD-shifted (c -> |c|)
            # operator preconditioning BiCGStab (see hybrid2d.fem_solve_2d);
            # variable diffusion kept exactly in the shifted cycle.
            precond = "mg" if problem.c >= 0.0 else "shifted"
        else:
            precond = "jacobi"
    if precond in ("mg", "shifted"):
        # Distributed V-cycle: fine-level smoothing + residual restriction
        # run on the slabs (one 2-row halo exchange); all coarser levels run
        # the serial V-cycle redundantly on the gathered (replicated) coarse
        # grid — the fine level carries ~all the work, the gather is one
        # all_gather of the half-resolution grid.
        from ..ops import multigrid

        def halo(v):
            return _halo_add(v, d, n_dev, axis)

        apply_pc, diag_pc = _fine_pc(
            problem, precond, var, hx, hy, dtype, (ny_loc + 1, nx1),
            (Sq, a_maps) if var else None, halo, interior, apply_free, diag,
        )
        nyc, nxc = cfg.ny // 2, cfg.nx // 2
        nyc_loc = ny_loc // 2
        serial_vcycle = _coarse_vcycle(problem, precond, var, hx, hy,
                                       dtype, nyc + 1, nxc + 1)
        omega, nu = 0.8, 2
        row0c = row0 // 2

        def smooth(u, r):
            for _ in range(nu):
                u = u + omega * jnp.where(
                    interior, (r - apply_pc(u)) / diag_pc, 0.0
                )
            return u

        def M_inv(r):
            u = smooth(jnp.zeros_like(r), r)
            res_f = jnp.where(interior, r - apply_pc(u), 0.0)
            rc_slab = _restrict_slab(res_f, d, n_dev, axis)
            rc_full = _gather_grid(rc_slab, n_dev, axis)
            ec_full = serial_vcycle(rc_full)
            ec_slab = jax.lax.dynamic_slice(
                ec_full, (row0c, jnp.zeros_like(row0c)),
                (nyc_loc + 1, nxc + 1),
            )
            u = u + jnp.where(
                interior, multigrid.prolong_bilinear(ec_slab), 0.0
            )
            return smooth(u, r)
    elif precond == "adi":
        # Distributed ADI (Ulysses pattern, SURVEY 2.3): the y-slab
        # interior residual transposes to x-slabs via the in-shard_map
        # all_to_all block transpose, line solves run batched Thomas with
        # lines as the (sharded) batch axis, and the pad-aware sweeps
        # keep zero-padded rows/columns exactly zero, so divisibility
        # padding never perturbs the true interior iteration.
        import numpy as np

        from .transpose import _local_transpose_block, adi_poisson_sweeps

        nx_int = cfg.nx - 1
        C_tot = -(-nx_int // n_dev) * n_dev
        hmin = min(hx, hy)
        tau = float(np.sqrt(np.pi**2 * 4.0 / hmin**2))
        scale = 1.0 / (hx * hy)
        dn_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        row_ids = row0 + 1 + jnp.arange(ny_loc)  # owned interior rows
        row_mask = (row_ids <= cfg.ny - 1).astype(dtype)[:, None]

        def tp(a):
            return _local_transpose_block(a, axis, n_dev)

        def M_inv(r):
            r_int = r[1:, 1:cfg.nx] * jnp.asarray(scale, dtype) * row_mask
            r_int = jnp.pad(r_int, ((0, 0), (0, C_tot - nx_int)))
            u_int = adi_poisson_sweeps(
                r_int, hx, hy, tau, n_sweeps=1,
                transpose_fn=tp, transpose_fn_T=tp,
                true_shape=(cfg.ny - 1, nx_int),
            )
            out = jnp.zeros((ny_loc + 1, nx1), dtype)
            out = out.at[1:, 1:cfg.nx].set(u_int[:, :nx_int])
            # Duplicated-interface consistency: row 0 (global row row0)
            # was computed by the previous device as its last owned row.
            from_prev = jax.lax.ppermute(u_int[-1, :nx_int], axis,
                                         dn_perm)
            out = out.at[0, 1:cfg.nx].set(
                jnp.where(d > 0, from_prev, out[0, 1:cfg.nx])
            )
            return jnp.where(interior, out, 0.0)
    else:
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def make_sharded_solve_2d(problem: Problem2D, cfg: Solver2DConfig, mesh,
                          axis: str = ELEMENT_AXIS,
                          distributed_fem: bool = True):
    """Jitted multi-chip 2D solve; cfg.ny must divide by the device count.

    ``distributed_fem=True`` runs the coarse CG stage distributed over
    the same y-slabs (halo exchange per stiffness apply, psum inner
    products); ``False`` replicates the coarse stage on every device (no
    communication — fine while the coarse grid is small).

    The O(h^4) route rides this path too (round 4): cfg.coarse='compact'
    swaps the local 4x4 for the tensor-Numerov operator (same 9-point
    sparsity, so the identical halo machinery applies) + the
    Numerov-weighted nodal load, and cfg.trace_lift >= 2 computes the
    tangential Lagrange lift on the GATHERED nodal grid (one all_gather
    of the tiny [ny+1, nx+1] array — global windows, sliced per slab)."""
    if any(t != "dirichlet" for t in problem.bc_edges):
        raise NotImplementedError(
            "this path eliminates all boundary edges structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver2D)"
        )
    if cfg.coarse == "compact":
        # Same constraints as the single-device compact scheme
        # (hybrid2d.fem_solve_2d) — validated here so a sharded run
        # fails loudly at build time instead of degrading to Q1.
        if problem.a_var is not None:
            raise ValueError("coarse='compact' needs constant diffusion "
                             "(a_var is set); use coarse='q1'")
        if problem.b != (0.0, 0.0):
            raise ValueError("coarse='compact' requires b == (0, 0)")
    n_dev = mesh.shape[axis]
    ny_loc = -(-cfg.ny // n_dev)  # ceil: tail slabs carry masked padding
    ny_pad = n_dev * ny_loc
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_2d(problem, cfg)
    shared, (t_int, bpts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    bpts = jax.device_put(bpts, repl)

    x0, x1, y0, y1 = problem.domain

    def local_step(shared, t_int, bpts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        hy = (y1 - y0) / cfg.ny
        # Padded node rows so every slab slice is in bounds; rows past
        # cfg.ny are masked out by the global-row interior/boundary masks.
        ys = y0 + hy * jnp.arange(ny_pad + 1, dtype=dtype)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        if distributed_fem:
            fem_loc, cg_res = _dist_fem_solve_2d(
                problem, cfg, d, n_dev, axis, xs, ys_loc, row0
            )
        else:
            fem_values, cg_res = fem_solve_2d(
                problem, cfg, xs, ys[: cfg.ny + 1]
            )
            fem_pad = jnp.pad(fem_values, ((0, ny_pad - cfg.ny), (0, 0)))
            fem_loc = jax.lax.dynamic_slice(
                fem_pad, (row0, jnp.zeros_like(row0)),
                (ny_loc + 1, cfg.nx + 1),
            )
        trace_rows = None
        if cfg.trace_lift >= 2:
            # High-order tangential lift: the Lagrange windows need
            # GLOBAL grid lines, so gather the (tiny) nodal grid — one
            # all_gather of [ny+1, nx+1] — lift on it with global
            # windows, and slice this slab's element rows.  The lift
            # itself is O(ny nx M) — cheaper to recompute everywhere
            # than to orchestrate stencil-wide halos.
            from ..models.hybrid2d import _lifted_trace_2d

            fem_full = _gather_grid(fem_loc, n_dev, axis)[: cfg.ny + 1]
            tr = _lifted_trace_2d(
                fem_full, cfg.M, cfg.nx, cfg.ny, stencil=cfg.trace_lift
            ).reshape(cfg.ny, cfg.nx, -1)
            tr = jnp.pad(tr, ((0, ny_pad - cfg.ny), (0, 0), (0, 0)))
            trace_rows = jax.lax.dynamic_slice(
                tr, (row0, jnp.zeros_like(row0), jnp.zeros_like(row0)),
                (ny_loc, cfg.nx, tr.shape[-1]),
            )
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0, trace_rows=trace_rows,
        )
        if problem.a_var is not None:
            # Per-element operators from THIS slab's coefficient samples +
            # the replicated host-f64 parts; batched null-space QR.
            D = _varcoeff_element_operators(problem, cfg, xs, ys_loc,
                                            shared, t_int)
            w, diags = kkt.solve_batched(
                D, shared.B, f_rows, bc_rows, cfg.gamma,
                formulation=cfg.formulation, ZP=(shared.Z, shared.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        M = cfg.M
        coeffs = w.reshape(ny_loc, cfg.nx, M, M)
        fb = _bilinear_fallback_coeffs(*corners, M)
        ok = diags.solve_ok.reshape(ny_loc, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        slack = diags.max_slack.reshape(ny_loc, cfg.nx)
        bcv = diags.bc_violation.reshape(ny_loc, cfg.nx)
        return (coeffs, fem_loc[None], ok, slack, bcv,
                cg_res.iters.reshape(1).astype(jnp.int32),
                cg_res.residual.reshape(1))

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(axis),) * 7,
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, res = sharded(
            shared, t_int, bpts
        )
        # Strip padded tail element rows (ny not divisible by devices).
        return ShardedSolution2D(
            coeffs[: cfg.ny], fem_local, ok[: cfg.ny],
            max_slack=slack[: cfg.ny], bc_violation=bcv[: cfg.ny],
            cg_iters=iters, cg_residual=res,
        )

    return run


def make_sharded_solve_2d_graded(problem: Problem2D, cfg: Solver2DConfig,
                                 mesh, xs, ys, axis: str = ELEMENT_AXIS):
    """Distributed GRADED tensor-product 2D solve: element rows of the
    graded mesh sharded as y-slabs (README roadmap item).  The node arrays
    are data — each slab slices its own ``ys`` rows, builds the matrix-free
    reference-part operators from its LOCAL spacings
    (``hybrid2d_graded.graded_fem_parts``), and runs the distributed
    Jacobi-CG/BiCGStab coarse stage (graded meshes have no nested uniform
    coarsening, so no V-cycle — same routing as the single-device graded
    path) followed by the per-element batched null-space enhancement with
    slab-global boundary masks.  Requires ny % n_devices == 0."""
    if any(t != "dirichlet" for t in problem.bc_edges):
        raise NotImplementedError(
            "this path eliminates all boundary edges structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver2D)"
        )
    if cfg.coarse != "q1" or cfg.trace_lift >= 2:
        raise NotImplementedError(
            "graded meshes run the Q1/bilinear route (the compact "
            "scheme and the tangential lift assume uniform spacing) — "
            "failing loudly instead of silently degrading to O(h^2)"
        )
    import dataclasses

    from ..models.hybrid2d import _element_data_2d as _edata
    from ..models.hybrid2d_graded import (
        _graded_element_operators, graded_fem_parts,
        prepare_shared_2d_graded,
    )
    from ..ops import assembly2d, cg

    n_dev = mesh.shape[axis]
    nx = len(xs) - 1
    ny = len(ys) - 1
    if ny % n_dev:
        raise ValueError(f"graded ny={ny} must divide by devices={n_dev}")
    ny_loc = ny // n_dev
    dtype = cfg.jnp_dtype()
    cfg = dataclasses.replace(cfg, nx=nx, ny=ny)
    gops, (t_int, bpts) = prepare_shared_2d_graded(problem, cfg)
    repl = jax.sharding.NamedSharding(mesh, P())
    gops = jax.device_put(gops, repl)
    t_int = jax.device_put(t_int, repl)
    bpts = jax.device_put(bpts, repl)
    xs_j = jax.device_put(jnp.asarray(xs, dtype), repl)
    ys_j = jax.device_put(jnp.asarray(ys, dtype), repl)
    bx, by = problem.b
    spd = bx == 0.0 and by == 0.0 and problem.c >= 0.0

    def local_step(gops, t_int, bpts, xs_a, ys_a):
        d = jax.lax.axis_index(axis)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys_a, (row0,), (ny_loc + 1,))
        Sq, a_maps = graded_fem_parts(problem, xs_a, ys_loc)

        g_row = row0 + jnp.arange(ny_loc + 1)
        row_int = (g_row > 0) & (g_row < ny)
        col_int = jnp.zeros(nx + 1, bool).at[1:-1].set(True)
        interior = row_int[:, None] & col_int[None, :]
        own = jnp.where((jnp.arange(ny_loc + 1) > 0) | (d == 0), 1.0, 0.0
                        ).astype(dtype)[:, None]

        def halo(v):
            return _halo_add(v, d, n_dev, axis)

        b = halo(assembly2d.assemble_load(xs_a, ys_loc, problem.f))
        X, Y = jnp.meshgrid(xs_a, ys_loc)
        u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))

        def apply_full(v):
            return halo(assembly2d.apply_stiffness_var(v, Sq, a_maps))

        def apply_free(v):
            return jnp.where(interior, apply_full(v * interior), 0.0)

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), axis)

        rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
        diag = halo(assembly2d.stiffness_var_diag(
            (ny_loc + 1, nx + 1), Sq, a_maps, dtype))
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        tol = cfg.cg_tol
        if tol is None:
            tol = 100.0 * float(jnp.finfo(dtype).eps)
        solver = cg.cg if spd else cg.bicgstab
        res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                     maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
        fem_loc = u_bc + jnp.where(interior, res.x, 0.0)

        f_rows, bc_rows, corners = _edata(
            problem, cfg, xs_a, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0,
        )
        D = _graded_element_operators(problem, cfg, xs_a, ys_loc, gops,
                                      t_int)
        w, diags = kkt.solve_batched(
            D, gops.B, f_rows, bc_rows, cfg.gamma,
            formulation=cfg.formulation, ZP=(gops.Z, gops.Pbc),
        )
        M = cfg.M
        coeffs = w.reshape(ny_loc, nx, M, M)
        fb = _bilinear_fallback_coeffs(*corners, M)
        ok = diags.solve_ok.reshape(ny_loc, nx)
        coeffs = jnp.where(
            ok[..., None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        return (coeffs, fem_loc[None], ok,
                diags.max_slack.reshape(ny_loc, nx),
                diags.bc_violation.reshape(ny_loc, nx),
                res.iters.reshape(1).astype(jnp.int32),
                res.residual.reshape(1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(axis),) * 7,
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, resid = sharded(
            gops, t_int, bpts, xs_j, ys_j
        )
        return ShardedSolution2D(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=resid,
        )

    return run


def make_sharded_evaluate_2d(problem: Problem2D, cfg: Solver2DConfig, mesh,
                             axis: str = ELEMENT_AXIS):
    """Distributed 2D read path (mirrors ``sharded.make_sharded_evaluate``):
    query points stay replicated; each device evaluates only the points
    whose element row falls in its y-slab against its LOCAL coefficient
    shard; one psum assembles the replicated result.  Clamp semantics match
    ``hybrid2d.evaluate_2d``.

    Returns a jitted fn(coeffs [ny, nx, M, M] (sharded over rows), x [P],
    y [P]) -> u [P] replicated."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    ny_loc = -(-cfg.ny // n_dev)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    M = cfg.M

    def local_eval(coeffs_loc, x, y):
        d = jax.lax.axis_index(axis)
        ix = jnp.clip(((x - x0) / hx).astype(jnp.int32), 0, cfg.nx - 1)
        iy = jnp.clip(((y - y0) / hy).astype(jnp.int32), 0, cfg.ny - 1)
        lo = d * ny_loc
        mine = (iy >= lo) & (iy < lo + ny_loc)
        iy_loc = jnp.clip(iy - lo, 0, ny_loc - 1)
        tx = (2.0 * (x - (jnp.asarray(x0, dtype)
                          + ix.astype(dtype) * jnp.asarray(hx, dtype)))
              / hx - 1.0)
        ty = (2.0 * (y - (jnp.asarray(y0, dtype)
                          + iy.astype(dtype) * jnp.asarray(hy, dtype)))
              / hy - 1.0)
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        W = coeffs_loc[iy_loc, ix]  # [P, M, M]
        val = jnp.einsum("pk,pkl,pl->p", Vy, W, Vx,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(jnp.where(mine, val, 0.0), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(axis), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y):
        pad = n_dev * ny_loc - coeffs.shape[0]
        if pad:
            coeffs = jnp.pad(coeffs, ((0, pad), (0, 0), (0, 0), (0, 0)))
        return sharded(coeffs, jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    return evaluate


class ShardedSolution2DGrid(NamedTuple):
    """Full observable solution of the 2-axis block-sharded solve (the grid
    analog of ``ShardedSolution2D`` — a convergence stall in the
    distributed CG surfaces in ``cg_iters``/``cg_residual``, not as
    silently bad coefficients)."""

    coeffs: jnp.ndarray  # [ny, nx, M, M] block-sharded
    fem_local: jnp.ndarray  # [n_dy, n_dx, ny_loc+1, nx_loc+1]
    solve_ok: jnp.ndarray  # [ny, nx]
    max_slack: jnp.ndarray = None  # [ny, nx]
    bc_violation: jnp.ndarray = None  # [ny, nx]
    cg_iters: jnp.ndarray = None  # [n_dy, n_dx]
    cg_residual: jnp.ndarray = None  # [n_dy, n_dx]

    def assemble_fem_grid(self):
        """Stitch the overlapping blocks back into [ny+1, nx+1]."""
        import numpy as np

        n_dy, n_dx, nyl1, nxl1 = self.fem_local.shape
        nyl, nxl = nyl1 - 1, nxl1 - 1
        grid = np.zeros((n_dy * nyl + 1, n_dx * nxl + 1))
        fl = np.asarray(self.fem_local)
        for by in range(n_dy):
            for bx in range(n_dx):
                grid[by * nyl:(by + 1) * nyl + 1,
                     bx * nxl:(bx + 1) * nxl + 1] = fl[by, bx]
        return grid


def _halo_add_2d(v, dy, dx, n_dy, n_dx, ay, ax):
    """Duplicated-interface sum for 2-axis block sharding: the first/last
    node row is shared with the y-neighbour, the first/last column with
    the x-neighbour, and each corner node with three other devices.  A
    row exchange followed by a column exchange yields the full sum — after
    the row phase both row copies contain their side's corner partials, so
    the column phase carries the diagonal contributions too."""
    up = [(i, (i - 1) % n_dy) for i in range(n_dy)]
    dn = [(i, (i + 1) % n_dy) for i in range(n_dy)]
    from_next = jax.lax.ppermute(v[0], ay, up)
    from_prev = jax.lax.ppermute(v[-1], ay, dn)
    v = v.at[-1].add(jnp.where(dy < n_dy - 1, from_next,
                               jnp.zeros_like(from_next)))
    v = v.at[0].add(jnp.where(dy > 0, from_prev, jnp.zeros_like(from_prev)))
    lt = [(i, (i - 1) % n_dx) for i in range(n_dx)]
    rt = [(i, (i + 1) % n_dx) for i in range(n_dx)]
    from_right = jax.lax.ppermute(v[:, 0], ax, lt)
    from_left = jax.lax.ppermute(v[:, -1], ax, rt)
    v = v.at[:, -1].add(jnp.where(dx < n_dx - 1, from_right,
                                  jnp.zeros_like(from_right)))
    v = v.at[:, 0].add(jnp.where(dx > 0, from_left,
                                 jnp.zeros_like(from_left)))
    return v


def make_sharded_solve_2d_grid(problem: Problem2D, cfg: Solver2DConfig,
                               mesh, axes=None):
    """Fully 2-axis-sharded 2D solve over a ``grid_mesh`` (SURVEY.md 7.1
    L8): both the coarse Q1 Jacobi-CG (block-halo stiffness apply,
    ownership-masked psum inner products over BOTH axes) and the
    enhancement (domain-boundary masks driven by global row AND column
    offsets) run on [ny/Dy, nx/Dx] blocks.  The coarse stage is
    preconditioned by a distributed V-cycle (block-halo restriction with
    corner-carrying column exchange + gathered serial coarse levels) when
    the grid divides down — 'auto' mirrors the slab path's routing.
    Requires cfg.ny % Dy == 0 and cfg.nx % Dx == 0.  Returns a
    zero-argument jitted callable producing a ``ShardedSolution2DGrid``."""
    if any(t != "dirichlet" for t in problem.bc_edges):
        raise NotImplementedError(
            "this path eliminates all boundary edges structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver2D)"
        )
    if cfg.coarse == "compact":
        # O(h^4) route on 2-axis blocks (round 5): the tensor-Numerov
        # locals keep the 9-point sparsity, so the identical block-halo
        # machinery applies; constraints match the slab path.
        if problem.a_var is not None:
            raise ValueError("coarse='compact' needs constant diffusion "
                             "(a_var is set); use coarse='q1'")
        if problem.b != (0.0, 0.0):
            raise ValueError("coarse='compact' requires b == (0, 0)")
    from .mesh import GRID_AXES

    if axes is None:
        axes = GRID_AXES
    ay, ax = axes
    n_dy, n_dx = mesh.shape[ay], mesh.shape[ax]
    if cfg.ny % n_dy or cfg.nx % n_dx:
        raise ValueError(
            f"ny={cfg.ny} / nx={cfg.nx} must divide by the mesh "
            f"({n_dy}, {n_dx})"
        )
    ny_loc, nx_loc = cfg.ny // n_dy, cfg.nx // n_dx
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_2d(problem, cfg)
    shared, (t_int, bpts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    bpts = jax.device_put(bpts, repl)
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny

    def local_step(shared, t_int, bpts):
        from ..ops import assembly2d, cg

        dy = jax.lax.axis_index(ay)
        dx = jax.lax.axis_index(ax)
        row0 = dy * ny_loc
        col0 = dx * nx_loc
        xs_loc = x0 + hx * (col0 + jnp.arange(nx_loc + 1, dtype=jnp.int32)
                            ).astype(dtype)
        ys_loc = y0 + hy * (row0 + jnp.arange(ny_loc + 1, dtype=jnp.int32)
                            ).astype(dtype)
        if problem.a_var is not None:
            Sq_np, dxq, dyq = assembly2d.q1_varcoeff_parts(hx, hy)
            Sq = jnp.asarray(Sq_np, dtype)
            a_maps = assembly2d.coeff_maps(xs_loc, ys_loc, problem.a_var,
                                           dxq, dyq)
            K_const = None
            if problem.c != 0.0 or problem.b != (0.0, 0.0):
                K_const = jnp.asarray(
                    assembly2d.q1_local_operator(hx, hy, 0.0, problem.c,
                                                 *problem.b),
                    dtype,
                )

            def apply_local(v):
                yv = assembly2d.apply_stiffness_var(v, Sq, a_maps)
                if K_const is not None:
                    yv = yv + assembly2d.apply_stiffness(v, K_const)
                return yv

            diag_local = assembly2d.stiffness_var_diag(
                (ny_loc + 1, nx_loc + 1), Sq, a_maps, dtype)
            if K_const is not None:
                diag_local = diag_local + assembly2d.stiffness_diag(
                    (ny_loc + 1, nx_loc + 1), K_const, dtype)
        else:
            K_M = None
            if cfg.coarse == "compact":
                # Tensor-Numerov compact rows: same 9-point local-4x4
                # sparsity as Q1, so the block-halo apply is unchanged.
                K_A_np, K_M_np = assembly2d.q1_numerov_locals(
                    hx, hy, problem.a0, problem.c)
                K_loc = jnp.asarray(K_A_np, dtype)
                K_M = jnp.asarray(K_M_np, dtype)
            else:
                K_loc = jnp.asarray(
                    assembly2d.q1_local_operator(hx, hy, problem.a0,
                                                 problem.c, *problem.b),
                    dtype,
                )

            def apply_local(v):
                return assembly2d.apply_stiffness(v, K_loc)

            diag_local = assembly2d.stiffness_diag(
                (ny_loc + 1, nx_loc + 1), K_loc, dtype)

        g_row = row0 + jnp.arange(ny_loc + 1)
        g_col = col0 + jnp.arange(nx_loc + 1)
        interior = ((g_row > 0) & (g_row < cfg.ny))[:, None] \
            & ((g_col > 0) & (g_col < cfg.nx))[None, :]
        own = (jnp.where((jnp.arange(ny_loc + 1) > 0) | (dy == 0), 1.0, 0.0
                         ).astype(dtype)[:, None]
               * jnp.where((jnp.arange(nx_loc + 1) > 0) | (dx == 0), 1.0,
                           0.0).astype(dtype)[None, :])

        def halo(v):
            return _halo_add_2d(v, dy, dx, n_dy, n_dx, ay, ax)

        if problem.a_var is None and cfg.coarse == "compact":
            # Numerov-weighted load M f_nodal (K_M from the single
            # locals call above); interface contributions arrive through
            # the same block halo as the Q1 load (nodal f samples agree
            # on shared rows/columns, so the split element sums add
            # exactly).
            Xl, Yl = jnp.meshgrid(xs_loc, ys_loc)
            F_nodes = problem.f(Xl, Yl) * jnp.ones_like(Xl)
            b = halo(assembly2d.apply_stiffness(F_nodes, K_M))
        else:
            b = halo(assembly2d.assemble_load(xs_loc, ys_loc, problem.f))
        X, Y = jnp.meshgrid(xs_loc, ys_loc)
        u_bc = jnp.where(interior, 0.0, problem.g(X, Y) * jnp.ones_like(X))

        def apply_full(v):
            return halo(apply_local(v))

        def apply_free(v):
            return jnp.where(interior, apply_full(v * interior), 0.0)

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), (ay, ax))

        rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
        diag = halo(diag_local)
        var = problem.a_var is not None
        precond = cfg.precond
        if precond == "auto":
            if (cfg.ny % (2 * n_dy) == 0 and cfg.nx % (2 * n_dx) == 0
                    and min(cfg.nx, cfg.ny) >= 8):
                precond = "mg" if problem.c >= 0.0 else "shifted"
            else:
                precond = "jacobi"
        if precond in ("mg", "shifted"):
            # Distributed V-cycle on 2-axis blocks: fine-level smoothing +
            # block-halo restriction (rows then corner-carrying columns);
            # coarser levels run the serial V-cycle redundantly on the
            # gathered half-resolution grid (same design as the slab path).
            from ..ops import multigrid

            apply_pc, diag_pc = _fine_pc(
                problem, precond, var, hx, hy, dtype,
                (ny_loc + 1, nx_loc + 1),
                (Sq, a_maps) if var else None, halo, interior,
                apply_free, diag,
            )
            serial_vcycle = _coarse_vcycle(
                problem, precond, var, hx, hy, dtype,
                cfg.ny // 2 + 1, cfg.nx // 2 + 1,
            )
            nyc_loc, nxc_loc = ny_loc // 2, nx_loc // 2
            row0c, col0c = row0 // 2, col0 // 2
            omega, nu = 0.8, 2

            def smooth(u, r):
                for _ in range(nu):
                    u = u + omega * jnp.where(
                        interior, (r - apply_pc(u)) / diag_pc, 0.0
                    )
                return u

            def M_inv(r):
                u = smooth(jnp.zeros_like(r), r)
                res_f = jnp.where(interior, r - apply_pc(u), 0.0)
                rc_blk = _restrict_block(res_f, dy, dx, n_dy, n_dx, ay, ax)
                rc_full = _gather_grid_2d(rc_blk, n_dy, n_dx, ay, ax)
                ec_full = serial_vcycle(rc_full)
                ec_blk = jax.lax.dynamic_slice(
                    ec_full, (row0c, col0c), (nyc_loc + 1, nxc_loc + 1)
                )
                u = u + jnp.where(
                    interior, multigrid.prolong_bilinear(ec_blk), 0.0
                )
                return smooth(u, r)
        else:
            M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        tol = cfg.cg_tol
        if tol is None:
            tol = 100.0 * float(jnp.finfo(dtype).eps)
        spd = problem.b == (0.0, 0.0) and problem.c >= 0.0
        solver = cg.cg if spd else cg.bicgstab
        res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                     maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
        fem_loc = u_bc + jnp.where(interior, res.x, 0.0)

        trace_rows = None
        if cfg.trace_lift >= 2:
            # High-order tangential lift on the GATHERED nodal grid (the
            # lift windows need whole grid lines — one all_gather of the
            # tiny [ny+1, nx+1] array over both axes), sliced back to
            # this block's element rows/columns.
            from ..models.hybrid2d import _lifted_trace_2d

            fem_full = _gather_grid_2d(fem_loc, n_dy, n_dx, ay, ax)
            tr = _lifted_trace_2d(
                fem_full, cfg.M, cfg.nx, cfg.ny, stencil=cfg.trace_lift
            ).reshape(cfg.ny, cfg.nx, -1)
            trace_rows = jax.lax.dynamic_slice(
                tr, (row0, col0, jnp.zeros_like(row0)),
                (ny_loc, nx_loc, tr.shape[-1]),
            )
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs_loc, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0, col_offset=col0, trace_rows=trace_rows,
        )
        if problem.a_var is not None:
            D = _varcoeff_element_operators(problem, cfg, xs_loc, ys_loc,
                                            shared, t_int)
            w, diags = kkt.solve_batched(
                D, shared.B, f_rows, bc_rows, cfg.gamma,
                formulation=cfg.formulation, ZP=(shared.Z, shared.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        M = cfg.M
        coeffs = w.reshape(ny_loc, nx_loc, M, M)
        fb = _bilinear_fallback_coeffs(*corners, M)
        ok = diags.solve_ok.reshape(ny_loc, nx_loc)
        coeffs = jnp.where(
            ok[..., None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        slack = diags.max_slack.reshape(ny_loc, nx_loc)
        bcv = diags.bc_violation.reshape(ny_loc, nx_loc)
        return (coeffs, fem_loc[None, None], ok, slack, bcv,
                res.iters.reshape(1, 1).astype(jnp.int32),
                res.residual.reshape(1, 1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(ay, ax), P(ay, ax, None, None)) + (P(ay, ax),) * 5,
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, cg_resid = sharded(
            shared, t_int, bpts
        )
        return ShardedSolution2DGrid(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=cg_resid,
        )

    return run


def make_sharded_evaluate_2d_grid(problem: Problem2D, cfg: Solver2DConfig,
                                  mesh, axes=None):
    """Distributed read path for the 2-axis block-sharded solve: each
    device evaluates the query points whose element falls in its
    (row-block, column-block); one psum over both axes assembles the
    replicated result.  Clamp semantics match ``hybrid2d.evaluate_2d``."""
    from ..ops import legendre
    from .mesh import GRID_AXES

    if axes is None:
        axes = GRID_AXES
    ay, ax = axes
    n_dy, n_dx = mesh.shape[ay], mesh.shape[ax]
    ny_loc, nx_loc = cfg.ny // n_dy, cfg.nx // n_dx
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    M = cfg.M

    def local_eval(coeffs_loc, x, y):
        dy = jax.lax.axis_index(ay)
        dx = jax.lax.axis_index(ax)
        ix = jnp.clip(((x - x0) / hx).astype(jnp.int32), 0, cfg.nx - 1)
        iy = jnp.clip(((y - y0) / hy).astype(jnp.int32), 0, cfg.ny - 1)
        mine = ((iy >= dy * ny_loc) & (iy < (dy + 1) * ny_loc)
                & (ix >= dx * nx_loc) & (ix < (dx + 1) * nx_loc))
        iy_l = jnp.clip(iy - dy * ny_loc, 0, ny_loc - 1)
        ix_l = jnp.clip(ix - dx * nx_loc, 0, nx_loc - 1)
        tx = 2.0 * (x - (jnp.asarray(x0, dtype)
                         + ix.astype(dtype) * jnp.asarray(hx, dtype))) \
            / hx - 1.0
        ty = 2.0 * (y - (jnp.asarray(y0, dtype)
                         + iy.astype(dtype) * jnp.asarray(hy, dtype))) \
            / hy - 1.0
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        W = coeffs_loc[iy_l, ix_l]
        val = jnp.einsum("pk,pkl,pl->p", Vy, W, Vx,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(jnp.where(mine, val, 0.0), (ay, ax))

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(ay, ax), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y):
        return sharded(coeffs, jnp.asarray(x, dtype), jnp.asarray(y, dtype))

    return evaluate


def make_sharded_evaluate_2d_graded(cfg: Solver2DConfig, mesh, xs, ys,
                                    axis: str = ELEMENT_AXIS):
    """Distributed read path for the GRADED y-slab solve: the node arrays
    are replicated data, so each device searchsorts the global arrays,
    masks to its own element rows, evaluates against its LOCAL coefficient
    shard, and one psum assembles the result (clamp semantics match
    ``hybrid2d_graded.evaluate_2d_graded``).  Requires
    ny % n_devices == 0 (the graded solve's own constraint)."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    if ny % n_dev:
        raise ValueError(f"graded ny={ny} must divide by devices={n_dev}")
    ny_loc = ny // n_dev
    dtype = cfg.jnp_dtype()
    M = cfg.M
    xs_j = jnp.asarray(xs, dtype)
    ys_j = jnp.asarray(ys, dtype)

    def local_eval(coeffs_loc, x, y):
        d = jax.lax.axis_index(axis)
        ix = jnp.clip(jnp.searchsorted(xs_j, x, side="right") - 1, 0,
                      nx - 1)
        iy = jnp.clip(jnp.searchsorted(ys_j, y, side="right") - 1, 0,
                      ny - 1)
        lo = d * ny_loc
        mine = (iy >= lo) & (iy < lo + ny_loc)
        iy_loc = jnp.clip(iy - lo, 0, ny_loc - 1)
        tx = (2.0 * x - xs_j[ix] - xs_j[ix + 1]) / (xs_j[ix + 1]
                                                    - xs_j[ix])
        ty = (2.0 * y - ys_j[iy] - ys_j[iy + 1]) / (ys_j[iy + 1]
                                                    - ys_j[iy])
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        W = coeffs_loc[iy_loc, ix]
        val = jnp.einsum("pk,pkl,pl->p", Vy, W, Vx,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(jnp.where(mine, val, 0.0), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(axis), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y):
        return sharded(coeffs, jnp.asarray(x, dtype),
                       jnp.asarray(y, dtype))

    return evaluate
