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
        K_loc = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, problem.a0, problem.c,
                                         *problem.b),
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
            # operator preconditioning BiCGStab (see hybrid2d.fem_solve_2d;
            # constant-coefficient only — var keeps jacobi below).
            precond = ("mg" if problem.c >= 0.0
                       else ("shifted" if not var else "jacobi"))
        else:
            precond = "jacobi"
    if precond in ("mg", "shifted"):
        # Distributed V-cycle: fine-level smoothing + residual restriction
        # run on the slabs (one 2-row halo exchange); all coarser levels run
        # the serial V-cycle redundantly on the gathered (replicated) coarse
        # grid — the fine level carries ~all the work, the gather is one
        # all_gather of the half-resolution grid.
        from ..ops import multigrid

        c_pc = problem.c if precond == "mg" else abs(problem.c)
        if precond == "shifted":
            # The preconditioner cycles on the SHIFTED operator throughout
            # (fine smoothing included); BiCGStab below iterates the true
            # indefinite operator.
            K_pc = jnp.asarray(
                assembly2d.q1_local_operator(hx, hy, problem.a0, c_pc,
                                             *problem.b),
                dtype,
            )

            def apply_pc(v):
                return jnp.where(
                    interior,
                    _halo_add(assembly2d.apply_stiffness(v * interior,
                                                         K_pc),
                              d, n_dev, axis),
                    0.0,
                )

            diag_pc = _halo_add(
                assembly2d.stiffness_diag((ny_loc + 1, nx1), K_pc, dtype),
                d, n_dev, axis,
            )
        else:
            apply_pc = apply_free
            diag_pc = diag
        nyc, nxc = cfg.ny // 2, cfg.nx // 2
        nyc_loc = ny_loc // 2
        # Rediscretise per level (mass/convection terms scale with h, and
        # variable coefficients need re-sampling; serial-vcycle level l
        # sits at spacing 2**(l+1) x fine).
        if var:
            from ..models.hybrid2d import _varcoeff_mg_levels

            serial_vcycle = multigrid.make_vcycle(
                nyc + 1, nxc + 1, None, dtype,
                apply_diag_for_level=_varcoeff_mg_levels(
                    problem, hx, hy, dtype, lvl_offset=1
                ),
            )
        else:
            serial_vcycle = multigrid.make_vcycle(
                nyc + 1, nxc + 1, K_loc, dtype,
                loc_for_level=lambda lvl: jnp.asarray(
                    assembly2d.q1_local_operator(
                        hx * 2.0 ** (lvl + 1), hy * 2.0 ** (lvl + 1),
                        problem.a0, c_pc, *problem.b
                    ),
                    dtype,
                ),
            )
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
    else:
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
    return u_bc + jnp.where(interior, res.x, 0.0)


def make_sharded_solve_2d(problem: Problem2D, cfg: Solver2DConfig, mesh,
                          axis: str = ELEMENT_AXIS,
                          distributed_fem: bool = True):
    """Jitted multi-chip 2D solve; cfg.ny must divide by the device count.

    ``distributed_fem=True`` runs the coarse Q1-CG stage distributed over
    the same y-slabs (halo exchange per stiffness apply, psum inner
    products); ``False`` replicates the coarse stage on every device (no
    communication — fine while the coarse grid is small)."""
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
            fem_loc = _dist_fem_solve_2d(
                problem, cfg, d, n_dev, axis, xs, ys_loc, row0
            )
        else:
            fem_values, _ = fem_solve_2d(
                problem, cfg, xs, ys[: cfg.ny + 1]
            )
            fem_pad = jnp.pad(fem_values, ((0, ny_pad - cfg.ny), (0, 0)))
            fem_loc = jax.lax.dynamic_slice(
                fem_pad, (row0, jnp.zeros_like(row0)),
                (ny_loc + 1, cfg.nx + 1),
            )
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0,
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
        return coeffs, fem_loc[None], ok

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok = sharded(shared, t_int, bpts)
        # Strip padded tail element rows (ny not divisible by devices).
        return ShardedSolution2D(coeffs[: cfg.ny], fem_local, ok[: cfg.ny])

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
    offsets) run on [ny/Dy, nx/Dx] blocks.  Requires cfg.ny % Dy == 0 and
    cfg.nx % Dx == 0.  Returns a zero-argument jitted callable producing
    (coeffs [ny, nx, M, M] block-sharded, solve_ok [ny, nx])."""
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
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        tol = cfg.cg_tol
        if tol is None:
            tol = 100.0 * float(jnp.finfo(dtype).eps)
        spd = problem.b == (0.0, 0.0) and problem.c >= 0.0
        solver = cg.cg if spd else cg.bicgstab
        res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                     maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
        fem_loc = u_bc + jnp.where(interior, res.x, 0.0)

        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs_loc, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0, col_offset=col0,
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
        return coeffs, ok

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(ay, ax), P(ay, ax)),
        check_vma=False,
    )

    @jax.jit
    def run():
        return sharded(shared, t_int, bpts)

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
