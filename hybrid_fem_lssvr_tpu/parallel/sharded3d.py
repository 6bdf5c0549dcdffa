"""Multi-chip 3D hybrid solve: element layers sharded as z-slabs.

The 2D y-slab design (``parallel/sharded2d.py``) lifts directly: the
coarse Q1 hex stage runs a fully distributed CG (one 2-plane halo
exchange per stiffness apply via ``ppermute``, ownership-masked ``psum``
inner products, fine-level-distributed V-cycle preconditioning with the
coarser levels gathered), and the enhancement shards its element layers —
every device builds and solves its own slab's batch through the shared
two-matmul LSE path with domain-boundary face masks driven by GLOBAL
layer indices.  Output coefficients are sharded over the leading
(element-layer) axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.hybrid3d import (
    Problem3D, Solver3DConfig, _element_data_3d, _trilinear_fallback_coeffs,
    prepare_shared_3d,
)
from ..ops import assembly3d, cg, kkt, multigrid
from ..ops.multigrid import _fw_rows
from .mesh import ELEMENT_AXIS


class ShardedSolution3D(NamedTuple):
    coeffs: jnp.ndarray  # [nz, ny, nx, M, M, M] sharded over layers
    fem_local: jnp.ndarray  # [n_dev, nz_loc+1, ny+1, nx+1] per-device
    solve_ok: jnp.ndarray  # [nz, ny, nx]
    max_slack: jnp.ndarray = None  # [nz, ny, nx]
    bc_violation: jnp.ndarray = None  # [nz, ny, nx]
    cg_iters: jnp.ndarray = None  # [n_dev]
    cg_residual: jnp.ndarray = None  # [n_dev]

    def assemble_fem_grid(self):
        """Stitch the overlapping slabs back into [nz+1, ny+1, nx+1]."""
        import numpy as np

        n_dev, nloc1, ny1, nx1 = self.fem_local.shape
        nz_loc = nloc1 - 1
        grid = np.zeros((n_dev * nz_loc + 1, ny1, nx1))
        fl = np.asarray(self.fem_local)
        for dd in range(n_dev):
            grid[dd * nz_loc:(dd + 1) * nz_loc + 1] = fl[dd]
        return grid


def _halo_add_3d(u_loc, d, n_dev, axis):
    """Sum duplicated-interface z-plane contributions across neighbouring
    slabs (3D lift of ``sharded2d._halo_add``: each device's first/last
    node plane is shared with a neighbour)."""
    up_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    dn_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    from_next = jax.lax.ppermute(u_loc[0], axis, up_perm)
    from_prev = jax.lax.ppermute(u_loc[-1], axis, dn_perm)
    u_loc = u_loc.at[-1].add(
        jnp.where(d < n_dev - 1, from_next, jnp.zeros_like(from_next))
    )
    u_loc = u_loc.at[0].add(
        jnp.where(d > 0, from_prev, jnp.zeros_like(from_prev))
    )
    return u_loc


def _restrict_slab_3d(res, d, n_dev, axis):
    """Full-weighting restriction of a z-slab residual [nzl+1, ny+1, nx+1]
    -> [nzl/2+1, ny/2+1, nx/2+1]: the two 1-plane halos needed by the
    interface coarse nodes come via ``ppermute`` (global-boundary sides
    extend with zeros — the interior residual vanishes there)."""
    up = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    dn = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    from_prev = jax.lax.ppermute(res[-2], axis, up)  # z-neighbour below
    from_next = jax.lax.ppermute(res[1], axis, dn)  # z-neighbour above
    from_prev = jnp.where(d > 0, from_prev, jnp.zeros_like(from_prev))
    from_next = jnp.where(d < n_dev - 1, from_next,
                          jnp.zeros_like(from_next))
    r_ext = jnp.concatenate([from_prev[None], res, from_next[None]])
    a = _fw_rows(r_ext)  # [nzl/2+1, ny+1, nx+1]
    b = jnp.moveaxis(
        _fw_rows(jnp.pad(jnp.moveaxis(a, 1, 0),
                         ((1, 1), (0, 0), (0, 0)))), 0, 1)
    return jnp.moveaxis(
        _fw_rows(jnp.pad(jnp.moveaxis(b, 2, 0),
                         ((1, 1), (0, 0), (0, 0)))), 0, 2)


def _gather_grid_3d(c_slab, n_dev, axis):
    """all_gather overlapping coarse z-slabs [ncl+1, nyc+1, nxc+1] into
    the full replicated coarse grid."""
    slabs = jax.lax.all_gather(c_slab, axis)
    parts = [slabs[dd, :-1] for dd in range(n_dev)]
    parts.append(slabs[n_dev - 1, -1:])
    return jnp.concatenate(parts, axis=0)


def _dist_fem_solve_3d(problem: Problem3D, cfg: Solver3DConfig, d, n_dev,
                       axis, xs, ys, zs_loc, lay0):
    """Distributed Q1 hex coarse solve on z-slabs; returns the slab's
    nodal values [nz_loc+1, ny+1, nx+1] and the CG result."""
    dtype = xs.dtype
    nz_loc = zs_loc.shape[0] - 1
    ny1, nx1 = ys.shape[0], xs.shape[0]
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    hz = float((problem.domain[5] - problem.domain[4]) / cfg.nz)
    bx, by, bz = problem.b
    var = problem.a_var is not None
    if var:
        # Slab-local coefficient sampling: zs_loc carries the physical
        # z coordinates, so the quadrature-point maps are exact.
        Sq_np, dxq, dyq, dzq = assembly3d.q1_varcoeff_parts_3d(hx, hy, hz)
        Sq = jnp.asarray(Sq_np, dtype)
        a_maps = assembly3d.coeff_maps_3d(xs, ys, zs_loc, problem.a_var,
                                          dxq, dyq, dzq)
        K_const = None
        if problem.c != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0:
            K_const = jnp.asarray(
                assembly3d.q1_local_operator_3d(hx, hy, hz, 0.0,
                                                problem.c, bx, by, bz),
                dtype,
            )

        def apply_local(v):
            y = assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)
            if K_const is not None:
                y = y + assembly3d.apply_stiffness_3d(v, K_const)
            return y

        diag_local = assembly3d.stiffness_var_diag_3d(
            (nz_loc + 1, ny1, nx1), Sq, a_maps, dtype
        )
        if K_const is not None:
            diag_local = diag_local + assembly3d.stiffness_diag_3d(
                (nz_loc + 1, ny1, nx1), K_const, dtype
            )
    else:
        if cfg.coarse == "compact":
            # Tensor-Numerov compact rows: same 27-point local-8x8
            # sparsity as Q1 hexes, so the identical plane-halo machinery
            # carries the O(h^4) scheme (constraints validated at build
            # time in make_sharded_solve_3d).
            K_loc = jnp.asarray(
                assembly3d.q1_numerov_locals_3d(hx, hy, hz, problem.a0,
                                                problem.c)[0],
                dtype,
            )
        else:
            K_loc = jnp.asarray(
                assembly3d.q1_local_operator_3d(hx, hy, hz, problem.a0,
                                                problem.c, bx, by, bz),
                dtype,
            )

        def apply_local(v):
            return assembly3d.apply_stiffness_3d(v, K_loc)

        diag_local = assembly3d.stiffness_diag_3d(
            (nz_loc + 1, ny1, nx1), K_loc, dtype
        )
    spd = bx == 0.0 and by == 0.0 and bz == 0.0 and problem.c >= 0.0

    # Global interior mask for this slab's node planes.
    g_lay = lay0 + jnp.arange(nz_loc + 1)
    lay_int = (g_lay > 0) & (g_lay < cfg.nz)
    yx_int = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
    interior = lay_int[:, None, None] & yx_int[None]
    own = jnp.where((jnp.arange(nz_loc + 1) > 0) | (d == 0), 1.0, 0.0)
    own = own.astype(dtype)[:, None, None]

    def halo(v):
        return _halo_add_3d(v, d, n_dev, axis)

    if not var and cfg.coarse == "compact":
        # Numerov-weighted load M f_nodal on the slab's nodes; interface
        # planes receive neighbour-element contributions through the same
        # halo exchange as the Q1 quadrature load (nodal f samples agree
        # across the shared plane, so the split element sums add exactly).
        K_M = jnp.asarray(
            assembly3d.q1_numerov_locals_3d(hx, hy, hz, problem.a0,
                                            problem.c)[1],
            dtype,
        )
        F_nodes = problem.f(xs[None, None, :], ys[None, :, None],
                            zs_loc[:, None, None])
        F_nodes = F_nodes * jnp.ones((nz_loc + 1, ny1, nx1), dtype)
        b = halo(assembly3d.apply_stiffness_3d(F_nodes, K_M))
    else:
        b = halo(assembly3d.assemble_load_3d(xs, ys, zs_loc, problem.f))
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs_loc[:, None, None]
    g_grid = problem.g(X, Y, Z) * jnp.ones((nz_loc + 1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, g_grid)

    def apply_full(v):
        return halo(apply_local(v))

    def apply_free(v):
        return jnp.where(interior, apply_full(v * interior), 0.0)

    def dist_dot(u, v):
        return jax.lax.psum(jnp.sum(u * v * own), axis)

    rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
    diag = halo(diag_local)

    precond = cfg.precond
    if precond == "auto":
        if (cfg.nz % (2 * n_dev) == 0 and cfg.nx % 2 == 0
                and cfg.ny % 2 == 0 and min(cfg.nx, cfg.ny, cfg.nz) >= 8):
            precond = "mg" if problem.c >= 0.0 else "shifted"
        else:
            precond = "jacobi"
    if precond in ("mg", "shifted"):
        # Distributed V-cycle: fine-level smoothing + halo restriction on
        # the slabs; all coarser levels run the serial 3D V-cycle
        # redundantly on the gathered half-resolution grid (the fine level
        # carries ~all the work — same design as the 2D slab path).
        c_eff = abs(problem.c) if precond == "shifted" else problem.c

        if precond == "shifted":
            # Fine-level SPD-shifted operator: variable diffusion kept
            # exactly, only the reaction term is shifted c -> |c|.
            if var:
                K_shift = None
                if c_eff != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0:
                    K_shift = jnp.asarray(
                        assembly3d.q1_local_operator_3d(
                            hx, hy, hz, 0.0, c_eff, bx, by, bz
                        ),
                        dtype,
                    )

                def apply_pc_local(v):
                    yv = assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)
                    if K_shift is not None:
                        yv = yv + assembly3d.apply_stiffness_3d(v, K_shift)
                    return yv

                diag_pc_l = assembly3d.stiffness_var_diag_3d(
                    (nz_loc + 1, ny1, nx1), Sq, a_maps, dtype
                )
                if K_shift is not None:
                    diag_pc_l = diag_pc_l + assembly3d.stiffness_diag_3d(
                        (nz_loc + 1, ny1, nx1), K_shift, dtype
                    )
            else:
                K_pc = jnp.asarray(
                    assembly3d.q1_local_operator_3d(
                        hx, hy, hz, problem.a0, c_eff, bx, by, bz
                    ),
                    dtype,
                )

                def apply_pc_local(v):
                    return assembly3d.apply_stiffness_3d(v, K_pc)

                diag_pc_l = assembly3d.stiffness_diag_3d(
                    (nz_loc + 1, ny1, nx1), K_pc, dtype
                )
        else:
            apply_pc_local = apply_local
            diag_pc_l = diag_local

        def apply_pc(v):
            return jnp.where(
                interior, halo(apply_pc_local(v * interior)), 0.0
            )

        diag_pc = halo(diag_pc_l)
        nzc_loc = nz_loc // 2
        if var:
            from ..models.hybrid3d import _varcoeff_mg_levels_3d

            serial_vcycle = multigrid.make_vcycle_3d(
                cfg.nz // 2 + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1,
                None, dtype,
                apply_diag_for_level=_varcoeff_mg_levels_3d(
                    problem, hx, hy, hz, dtype, lvl_offset=1,
                    c_override=(c_eff if precond == "shifted" else None),
                ),
            )
        else:
            def loc_for_level(lvl):
                # lvl is the COARSE cycle's level: global level lvl + 1.
                s = float(2 ** (lvl + 1))
                return jnp.asarray(
                    assembly3d.q1_local_operator_3d(
                        hx * s, hy * s, hz * s, problem.a0, c_eff,
                        bx, by, bz
                    ),
                    dtype,
                )

            serial_vcycle = multigrid.make_vcycle_3d(
                cfg.nz // 2 + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1,
                loc_for_level(0), dtype, loc_for_level=loc_for_level,
            )
        omega, nu = 0.8, 2
        lay0c = lay0 // 2

        def smooth(u, r):
            for _ in range(nu):
                u = u + omega * jnp.where(
                    interior, (r - apply_pc(u)) / diag_pc, 0.0
                )
            return u

        def M_inv(r):
            u = smooth(jnp.zeros_like(r), r)
            res_f = jnp.where(interior, r - apply_pc(u), 0.0)
            rc_slab = _restrict_slab_3d(res_f, d, n_dev, axis)
            rc_full = _gather_grid_3d(rc_slab, n_dev, axis)
            ec_full = serial_vcycle(rc_full)
            z0 = jnp.zeros_like(lay0c)
            ec_slab = jax.lax.dynamic_slice(
                ec_full, (lay0c, z0, z0),
                (nzc_loc + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1),
            )
            u = u + jnp.where(
                interior, multigrid.prolong_trilinear(ec_slab), 0.0
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
    return u_bc + jnp.where(interior, res.x, 0.0), res


class ShardedSolution3DGrid(NamedTuple):
    coeffs: jnp.ndarray  # [nz, ny, nx, M, M, M] sharded over (z, y) blocks
    fem_local: jnp.ndarray  # [n_dz, n_dy, nzl+1, nyl+1, nx+1]
    solve_ok: jnp.ndarray  # [nz, ny, nx]
    max_slack: jnp.ndarray = None
    bc_violation: jnp.ndarray = None
    cg_iters: jnp.ndarray = None  # [n_dz, n_dy]
    cg_residual: jnp.ndarray = None

    def assemble_fem_grid(self):
        """Stitch the overlapping (z, y) blocks into [nz+1, ny+1, nx+1]."""
        import numpy as np

        n_dz, n_dy, nzl1, nyl1, nx1 = self.fem_local.shape
        nz_loc, ny_loc = nzl1 - 1, nyl1 - 1
        grid = np.zeros((n_dz * nz_loc + 1, n_dy * ny_loc + 1, nx1))
        fl = np.asarray(self.fem_local)
        for dz in range(n_dz):
            for dy in range(n_dy):
                grid[dz * nz_loc:(dz + 1) * nz_loc + 1,
                     dy * ny_loc:(dy + 1) * ny_loc + 1] = fl[dz, dy]
        return grid


def _halo_add_3d_grid(v, dz, dy, n_dz, n_dy, az, ay):
    """Duplicated-interface sum for (z, y) block sharding of the node
    grid [nzl+1, nyl+1, nx+1]: first/last z-plane shared with the
    z-neighbour, first/last y-plane with the y-neighbour, each edge node
    with three other devices.  The z exchange runs first; the y exchange
    then runs on z-summed planes, so it carries the diagonal (edge)
    contributions too (the ``_halo_add_2d`` nested-halo argument, lifted
    one dimension)."""
    up = [(i, (i - 1) % n_dz) for i in range(n_dz)]
    dn = [(i, (i + 1) % n_dz) for i in range(n_dz)]
    from_next = jax.lax.ppermute(v[0], az, up)
    from_prev = jax.lax.ppermute(v[-1], az, dn)
    v = v.at[-1].add(jnp.where(dz < n_dz - 1, from_next,
                               jnp.zeros_like(from_next)))
    v = v.at[0].add(jnp.where(dz > 0, from_prev,
                              jnp.zeros_like(from_prev)))
    upy = [(i, (i - 1) % n_dy) for i in range(n_dy)]
    dny = [(i, (i + 1) % n_dy) for i in range(n_dy)]
    from_below = jax.lax.ppermute(v[:, 0], ay, upy)
    from_above = jax.lax.ppermute(v[:, -1], ay, dny)
    v = v.at[:, -1].add(jnp.where(dy < n_dy - 1, from_below,
                                  jnp.zeros_like(from_below)))
    v = v.at[:, 0].add(jnp.where(dy > 0, from_above,
                                 jnp.zeros_like(from_above)))
    return v


def _restrict_block_3d(res, dz, dy, n_dz, n_dy, az, ay):
    """Full-weighting restriction of a (z, y) block residual
    [nzl+1, nyl+1, nx+1] -> [nzl/2+1, nyl/2+1, nx/2+1].  The z halos are
    fetched first; the y exchange then runs on the Z-EXTENDED array so the
    edge entries it delivers are the diagonal neighbours' values (the
    ``_restrict_block`` nested-halo trick).  The unsharded x axis and all
    global-boundary sides extend with zeros (the interior residual
    vanishes there)."""
    up = [(i, (i + 1) % n_dz) for i in range(n_dz)]
    dn = [(i, (i - 1) % n_dz) for i in range(n_dz)]
    from_prev = jax.lax.ppermute(res[-2], az, up)  # z-neighbour below
    from_next = jax.lax.ppermute(res[1], az, dn)  # z-neighbour above
    from_prev = jnp.where(dz > 0, from_prev, jnp.zeros_like(from_prev))
    from_next = jnp.where(dz < n_dz - 1, from_next,
                          jnp.zeros_like(from_next))
    r_ext = jnp.concatenate([from_prev[None], res, from_next[None]])
    upy = [(i, (i + 1) % n_dy) for i in range(n_dy)]
    dny = [(i, (i - 1) % n_dy) for i in range(n_dy)]
    from_below = jax.lax.ppermute(r_ext[:, -2], ay, upy)
    from_above = jax.lax.ppermute(r_ext[:, 1], ay, dny)
    from_below = jnp.where(dy > 0, from_below, jnp.zeros_like(from_below))
    from_above = jnp.where(dy < n_dy - 1, from_above,
                           jnp.zeros_like(from_above))
    c_ext = jnp.concatenate(
        [from_below[:, None], r_ext, from_above[:, None]], axis=1
    )  # [nzl+3, nyl+3, nx+1]
    a = _fw_rows(c_ext)  # [nzl/2+1, nyl+3, nx+1]
    b = jnp.moveaxis(_fw_rows(jnp.moveaxis(a, 1, 0)), 0, 1)
    return jnp.moveaxis(
        _fw_rows(jnp.pad(jnp.moveaxis(b, 2, 0),
                         ((1, 1), (0, 0), (0, 0)))), 0, 2)


def _gather_grid_3d_blocks(c_block, n_dz, n_dy, az, ay):
    """all_gather overlapping coarse (z, y) blocks
    [nzc_loc+1, nyc_loc+1, nxc+1] into the full replicated coarse grid
    (y blocks within each z-slab first, then z-slabs)."""
    cols = jax.lax.all_gather(c_block, ay)
    parts = [cols[i, :, :-1] for i in range(n_dy)]
    parts.append(cols[n_dy - 1, :, -1:])
    z_slab = jnp.concatenate(parts, axis=1)  # [nzc_loc+1, nyc+1, nxc+1]
    return _gather_grid_3d(z_slab, n_dz, az)


def _serial_coarse_vcycle_3d(problem, precond, var, hx, hy, hz, dtype,
                             cfg):
    """Serial 3D V-cycle on the gathered half-resolution grid (shared by
    the slab and grid distributed preconditioners): exact per-level
    rediscretisation, c -> |c| when 'shifted'."""
    c_eff = abs(problem.c) if precond == "shifted" else problem.c
    bx, by, bz = problem.b
    if var:
        from ..models.hybrid3d import _varcoeff_mg_levels_3d

        return multigrid.make_vcycle_3d(
            cfg.nz // 2 + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1, None,
            dtype,
            apply_diag_for_level=_varcoeff_mg_levels_3d(
                problem, hx, hy, hz, dtype, lvl_offset=1,
                c_override=(c_eff if precond == "shifted" else None),
            ),
        )

    def loc_for_level(lvl):
        s = float(2 ** (lvl + 1))
        return jnp.asarray(
            assembly3d.q1_local_operator_3d(
                hx * s, hy * s, hz * s, problem.a0, c_eff, bx, by, bz
            ),
            dtype,
        )

    return multigrid.make_vcycle_3d(
        cfg.nz // 2 + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1,
        loc_for_level(0), dtype, loc_for_level=loc_for_level,
    )


def make_sharded_solve_3d_grid(problem: Problem3D, cfg: Solver3DConfig,
                               mesh, axes=None):
    """Fully 2-axis-sharded 3D solve over a ``grid_mesh_3d``: both the
    coarse Q1 hex CG (block-halo stiffness apply, ownership-masked psum
    inner products over BOTH mesh axes, distributed V-cycle
    preconditioning with block-halo restriction + gathered serial coarse
    levels) and the enhancement (face masks driven by global layer AND
    row offsets) run on [nz/Dz, ny/Dy, nx] blocks — the 3D lift of
    ``sharded2d.make_sharded_solve_2d_grid``.  Requires cfg.nz % Dz == 0
    and cfg.ny % Dy == 0."""
    if any(t != "dirichlet" for t in problem.bc_faces):
        raise NotImplementedError(
            "this path eliminates all boundary faces structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver3D)"
        )
    if cfg.coarse == "compact":
        # O(h^4) route on (z, y) blocks (round 5): the tensor-Numerov
        # locals keep the 27-point sparsity, so the identical block-halo
        # machinery applies; constraints match the z-slab path.
        if problem.a_var is not None:
            raise ValueError("coarse='compact' needs constant diffusion "
                             "(a_var is set); use coarse='q1'")
        if problem.b != (0.0, 0.0, 0.0):
            raise ValueError("coarse='compact' requires b == (0, 0, 0)")
    from .mesh import GRID_AXES_3D

    if axes is None:
        axes = GRID_AXES_3D
    az, ay = axes
    n_dz, n_dy = mesh.shape[az], mesh.shape[ay]
    if cfg.nz % n_dz or cfg.ny % n_dy:
        raise ValueError(
            f"nz={cfg.nz} / ny={cfg.ny} must divide by the mesh "
            f"({n_dz}, {n_dy})"
        )
    nz_loc, ny_loc = cfg.nz // n_dz, cfg.ny // n_dy
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_3d(problem, cfg)
    shared, (t_int, spts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    spts = jax.device_put(spts, repl)
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    bx, by, bz = problem.b
    var = problem.a_var is not None
    spd = bx == 0.0 and by == 0.0 and bz == 0.0 and problem.c >= 0.0
    nx1 = cfg.nx + 1

    def local_step(shared, t_int, spts):
        dz = jax.lax.axis_index(az)
        dy = jax.lax.axis_index(ay)
        lay0 = dz * nz_loc
        row0 = dy * ny_loc
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys_loc = y0 + hy * (row0 + jnp.arange(ny_loc + 1, dtype=jnp.int32)
                            ).astype(dtype)
        zs_loc = z0 + hz * (lay0 + jnp.arange(nz_loc + 1, dtype=jnp.int32)
                            ).astype(dtype)
        shape1 = (nz_loc + 1, ny_loc + 1, nx1)
        if var:
            Sq_np, dxq, dyq, dzq = assembly3d.q1_varcoeff_parts_3d(
                hx, hy, hz)
            Sq = jnp.asarray(Sq_np, dtype)
            a_maps = assembly3d.coeff_maps_3d(xs, ys_loc, zs_loc,
                                              problem.a_var, dxq, dyq, dzq)
            K_const = None
            if problem.c != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0:
                K_const = jnp.asarray(
                    assembly3d.q1_local_operator_3d(hx, hy, hz, 0.0,
                                                    problem.c, bx, by, bz),
                    dtype,
                )

            def apply_local(v):
                yv = assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)
                if K_const is not None:
                    yv = yv + assembly3d.apply_stiffness_3d(v, K_const)
                return yv

            diag_local = assembly3d.stiffness_var_diag_3d(shape1, Sq,
                                                          a_maps, dtype)
            if K_const is not None:
                diag_local = diag_local + assembly3d.stiffness_diag_3d(
                    shape1, K_const, dtype)
        else:
            K_M = None
            if cfg.coarse == "compact":
                # Tensor-Numerov compact rows: same 27-point local-8x8
                # sparsity as Q1 hexes — the block-halo apply is
                # unchanged.
                K_A_np, K_M_np = assembly3d.q1_numerov_locals_3d(
                    hx, hy, hz, problem.a0, problem.c)
                K_loc = jnp.asarray(K_A_np, dtype)
                K_M = jnp.asarray(K_M_np, dtype)
            else:
                K_loc = jnp.asarray(
                    assembly3d.q1_local_operator_3d(hx, hy, hz,
                                                    problem.a0,
                                                    problem.c, bx, by,
                                                    bz),
                    dtype,
                )

            def apply_local(v):
                return assembly3d.apply_stiffness_3d(v, K_loc)

            diag_local = assembly3d.stiffness_diag_3d(shape1, K_loc, dtype)

        g_lay = lay0 + jnp.arange(nz_loc + 1)
        g_row = row0 + jnp.arange(ny_loc + 1)
        x_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
        interior = (((g_lay > 0) & (g_lay < cfg.nz))[:, None, None]
                    & ((g_row > 0) & (g_row < cfg.ny))[None, :, None]
                    & x_int[None, None, :])
        own = (jnp.where((jnp.arange(nz_loc + 1) > 0) | (dz == 0), 1.0,
                         0.0).astype(dtype)[:, None, None]
               * jnp.where((jnp.arange(ny_loc + 1) > 0) | (dy == 0), 1.0,
                           0.0).astype(dtype)[None, :, None])

        def halo(v):
            return _halo_add_3d_grid(v, dz, dy, n_dz, n_dy, az, ay)

        if not var and cfg.coarse == "compact":
            # Numerov-weighted load M f_nodal (K_M from the single
            # locals call above); interface contributions arrive through
            # the same block halo as the Q1 load.
            F_nodes = problem.f(xs[None, None, :], ys_loc[None, :, None],
                                zs_loc[:, None, None])
            F_nodes = F_nodes * jnp.ones(shape1, dtype)
            b = halo(assembly3d.apply_stiffness_3d(F_nodes, K_M))
        else:
            b = halo(assembly3d.assemble_load_3d(xs, ys_loc, zs_loc,
                                                 problem.f))
        X = xs[None, None, :]
        Y = ys_loc[None, :, None]
        Z = zs_loc[:, None, None]
        g_grid = problem.g(X, Y, Z) * jnp.ones(shape1, dtype)
        u_bc = jnp.where(interior, 0.0, g_grid)

        def apply_full(v):
            return halo(apply_local(v))

        def apply_free(v):
            return jnp.where(interior, apply_full(v * interior), 0.0)

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), (az, ay))

        rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
        diag = halo(diag_local)
        precond = cfg.precond
        if precond == "auto":
            if (cfg.nz % (2 * n_dz) == 0 and cfg.ny % (2 * n_dy) == 0
                    and cfg.nx % 2 == 0
                    and min(cfg.nx, cfg.ny, cfg.nz) >= 8):
                precond = "mg" if problem.c >= 0.0 else "shifted"
            else:
                precond = "jacobi"
        if precond in ("mg", "shifted"):
            if precond == "shifted":
                c_pc = abs(problem.c)
                if var:
                    K_shift = None
                    if c_pc != 0.0 or bx != 0.0 or by != 0.0 or bz != 0.0:
                        K_shift = jnp.asarray(
                            assembly3d.q1_local_operator_3d(
                                hx, hy, hz, 0.0, c_pc, bx, by, bz),
                            dtype,
                        )

                    def apply_pc_local(v):
                        yv = assembly3d.apply_stiffness_var_3d(v, Sq,
                                                               a_maps)
                        if K_shift is not None:
                            yv = yv + assembly3d.apply_stiffness_3d(
                                v, K_shift)
                        return yv

                    diag_pc_l = assembly3d.stiffness_var_diag_3d(
                        shape1, Sq, a_maps, dtype)
                    if K_shift is not None:
                        diag_pc_l = diag_pc_l \
                            + assembly3d.stiffness_diag_3d(shape1, K_shift,
                                                           dtype)
                else:
                    K_pc = jnp.asarray(
                        assembly3d.q1_local_operator_3d(
                            hx, hy, hz, problem.a0, c_pc, bx, by, bz),
                        dtype,
                    )

                    def apply_pc_local(v):
                        return assembly3d.apply_stiffness_3d(v, K_pc)

                    diag_pc_l = assembly3d.stiffness_diag_3d(shape1, K_pc,
                                                             dtype)

                def apply_pc(v):
                    return jnp.where(
                        interior, halo(apply_pc_local(v * interior)), 0.0)

                diag_pc = halo(diag_pc_l)
            else:
                apply_pc, diag_pc = apply_free, diag
            serial_vcycle = _serial_coarse_vcycle_3d(
                problem, precond, var, hx, hy, hz, dtype, cfg)
            nzc_loc, nyc_loc = nz_loc // 2, ny_loc // 2
            lay0c, row0c = lay0 // 2, row0 // 2
            omega, nu = 0.8, 2

            def smooth(u, r):
                for _ in range(nu):
                    u = u + omega * jnp.where(
                        interior, (r - apply_pc(u)) / diag_pc, 0.0)
                return u

            def M_inv(r):
                u = smooth(jnp.zeros_like(r), r)
                res_f = jnp.where(interior, r - apply_pc(u), 0.0)
                rc_blk = _restrict_block_3d(res_f, dz, dy, n_dz, n_dy,
                                            az, ay)
                rc_full = _gather_grid_3d_blocks(rc_blk, n_dz, n_dy,
                                                 az, ay)
                ec_full = serial_vcycle(rc_full)
                z00 = jnp.zeros_like(lay0c)
                ec_blk = jax.lax.dynamic_slice(
                    ec_full, (lay0c, row0c, z00),
                    (nzc_loc + 1, nyc_loc + 1, cfg.nx // 2 + 1),
                )
                u = u + jnp.where(
                    interior, multigrid.prolong_trilinear(ec_blk), 0.0)
                return smooth(u, r)
        else:
            M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        tol = cfg.cg_tol
        if tol is None:
            tol = 100.0 * float(jnp.finfo(dtype).eps)
        solver = cg.cg if spd else cg.bicgstab
        res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                     maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
        fem_loc = u_bc + jnp.where(interior, res.x, 0.0)

        trace_rows = None
        if cfg.trace_lift >= 2:
            # Tensor-Lagrange plane lift on the GATHERED nodal grid (the
            # lift windows need whole grid planes — one all_gather over
            # both block axes), sliced back to this block's element
            # layers and rows.
            from ..models.hybrid3d import _lifted_trace_3d

            fem_full = _gather_grid_3d_blocks(fem_loc, n_dz, n_dy,
                                              az, ay)
            tr = _lifted_trace_3d(
                fem_full, cfg.M, cfg.nx, cfg.ny, cfg.nz,
                stencil=cfg.trace_lift,
            ).reshape(cfg.nz, cfg.ny, cfg.nx, -1)
            z00 = jnp.zeros_like(lay0)
            trace_rows = jax.lax.dynamic_slice(
                tr, (lay0, row0, z00, z00),
                (nz_loc, ny_loc, cfg.nx, tr.shape[-1]),
            )
        f_rows, bc_rows, cs = _element_data_3d(
            problem, cfg, xs, ys_loc, zs_loc, fem_loc, t_int, spts,
            layer_offset=lay0, row_offset=row0, trace_rows=trace_rows,
        )
        if var:
            from ..models.hybrid3d import _varcoeff_element_operators_3d

            D = _varcoeff_element_operators_3d(
                problem, cfg, xs, ys_loc, zs_loc, shared, t_int)
            w, diags = kkt.solve_batched(
                D, shared.B, f_rows, bc_rows, cfg.gamma,
                ZP=(shared.Z, shared.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        M = cfg.M
        coeffs = w.reshape(nz_loc, ny_loc, cfg.nx, M, M, M)
        fb = _trilinear_fallback_coeffs(cs, M)
        ok = diags.solve_ok.reshape(nz_loc, ny_loc, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        slack = diags.max_slack.reshape(nz_loc, ny_loc, cfg.nx)
        bcv = diags.bc_violation.reshape(nz_loc, ny_loc, cfg.nx)
        return (coeffs, fem_loc[None, None], ok, slack, bcv,
                res.iters.reshape(1, 1).astype(jnp.int32),
                res.residual.reshape(1, 1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(az, ay), P(az, ay, None, None, None))
        + (P(az, ay),) * 5,
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, cg_resid = sharded(
            shared, t_int, spts
        )
        return ShardedSolution3DGrid(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=cg_resid,
        )

    return run


def _dist_fem_solve_3d_graded(problem: Problem3D, cfg: Solver3DConfig,
                              d, n_dev, axis, xs, ys, zs_loc, lay0):
    """Distributed graded Q1 hex coarse solve on z-slabs: the
    reference-part per-element-scalar assembly is slab-local by
    construction (the geometric maps depend only on the local node
    positions), so only the plane-halo exchange and the ownership-masked
    inner products differ from the single-device graded solve.  Jacobi
    preconditioning (multigrid needs nested uniform coarsenings — the
    graded rule, as in ``hybrid3d_graded.fem_solve_3d_graded``)."""
    from ..models.hybrid3d_graded import graded_fem_parts_3d

    dtype = xs.dtype
    nz_loc = zs_loc.shape[0] - 1
    ny1, nx1 = ys.shape[0], xs.shape[0]
    bx, by, bz = problem.b
    Sq, a_maps = graded_fem_parts_3d(problem, xs, ys, zs_loc)

    def apply_local(v):
        return assembly3d.apply_stiffness_var_3d(v, Sq, a_maps)

    diag_local = assembly3d.stiffness_var_diag_3d(
        (nz_loc + 1, ny1, nx1), Sq, a_maps, dtype
    )
    spd = bx == 0.0 and by == 0.0 and bz == 0.0 and problem.c >= 0.0

    g_lay = lay0 + jnp.arange(nz_loc + 1)
    lay_int = (g_lay > 0) & (g_lay < cfg.nz)
    yx_int = jnp.zeros((ny1, nx1), bool).at[1:-1, 1:-1].set(True)
    interior = lay_int[:, None, None] & yx_int[None]
    own = jnp.where((jnp.arange(nz_loc + 1) > 0) | (d == 0), 1.0, 0.0)
    own = own.astype(dtype)[:, None, None]

    def halo(v):
        return _halo_add_3d(v, d, n_dev, axis)

    b = halo(assembly3d.assemble_load_3d(xs, ys, zs_loc, problem.f))
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs_loc[:, None, None]
    g_grid = problem.g(X, Y, Z) * jnp.ones((nz_loc + 1, ny1, nx1), dtype)
    u_bc = jnp.where(interior, 0.0, g_grid)

    def apply_full(v):
        return halo(apply_local(v))

    def apply_free(v):
        return jnp.where(interior, apply_full(v * interior), 0.0)

    def dist_dot(u, v):
        return jax.lax.psum(jnp.sum(u * v * own), axis)

    rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
    diag = halo(diag_local)
    M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    solver = cg.cg if spd else cg.bicgstab
    res = solver(apply_free, rhs, M_inv=M_inv, tol=tol,
                 maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def make_sharded_solve_3d_graded(problem: Problem3D, cfg: Solver3DConfig,
                                 mesh, xs, ys, zs,
                                 axis: str = ELEMENT_AXIS):
    """Jitted multi-chip GRADED 3D solve: z-slabs of a non-uniform
    tensor-product hex mesh (the distributed member of
    ``models/hybrid3d_graded.py``; == single-device asserted in
    tests/test_sharded3d.py).  The element-layer count ``len(zs) - 1``
    must divide by the device count; spacings are arbitrary."""
    if any(t != "dirichlet" for t in problem.bc_faces):
        raise NotImplementedError(
            "this path eliminates all boundary faces structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver3D)"
        )
    if cfg.coarse != "q1" or cfg.trace_lift >= 2:
        raise NotImplementedError(
            "graded meshes run the Q1/trilinear route (the compact "
            "scheme and the plane lift assume uniform spacing) — "
            "failing loudly instead of silently degrading to O(h^2)"
        )
    import dataclasses

    from ..models.hybrid3d_graded import (
        _graded_element_operators_3d, prepare_shared_3d_graded,
    )

    n_dev = mesh.shape[axis]
    nz = zs.shape[0] - 1
    if nz % n_dev != 0:
        raise ValueError(
            f"nz={nz} element layers must divide by the {n_dev}-device "
            f"mesh"
        )
    nz_loc = nz // n_dev
    dtype = cfg.jnp_dtype()
    cfg = dataclasses.replace(cfg, nx=xs.shape[0] - 1, ny=ys.shape[0] - 1,
                              nz=nz)
    gops, (t_int, spts) = prepare_shared_3d_graded(problem, cfg)
    repl = jax.sharding.NamedSharding(mesh, P())
    gops = jax.device_put(gops, repl)
    t_int = jax.device_put(t_int, repl)
    spts = jax.device_put(spts, repl)
    xs_r = jax.device_put(jnp.asarray(xs, dtype), repl)
    ys_r = jax.device_put(jnp.asarray(ys, dtype), repl)
    zs_r = jax.device_put(jnp.asarray(zs, dtype), repl)

    def local_step(gops, t_int, spts, xs, ys, zs):
        d = jax.lax.axis_index(axis)
        lay0 = d * nz_loc
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        fem_loc, cg_res = _dist_fem_solve_3d_graded(
            problem, cfg, d, n_dev, axis, xs, ys, zs_loc, lay0
        )
        f_rows, bc_rows, cs = _element_data_3d(
            problem, cfg, xs, ys, zs_loc, fem_loc, t_int, spts,
            layer_offset=lay0,
        )
        D = _graded_element_operators_3d(problem, cfg, xs, ys, zs_loc,
                                         gops, t_int)
        w, diags = kkt.solve_batched(
            D, gops.B, f_rows, bc_rows, cfg.gamma,
            formulation=cfg.formulation, ZP=(gops.Z, gops.Pbc),
        )
        M = cfg.M
        coeffs = w.reshape(nz_loc, cfg.ny, cfg.nx, M, M, M)
        fb = _trilinear_fallback_coeffs(cs, M)
        ok = diags.solve_ok.reshape(nz_loc, cfg.ny, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        slack = diags.max_slack.reshape(nz_loc, cfg.ny, cfg.nx)
        bcv = diags.bc_violation.reshape(nz_loc, cfg.ny, cfg.nx)
        return (coeffs, fem_loc[None], ok, slack, bcv,
                cg_res.iters.reshape(1).astype(jnp.int32),
                cg_res.residual.reshape(1))

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(axis),) * 7,
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, res = sharded(
            gops, t_int, spts, xs_r, ys_r, zs_r
        )
        return ShardedSolution3D(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=res,
        )

    return run


def make_sharded_evaluate_3d(problem: Problem3D, cfg: Solver3DConfig, mesh,
                             axis: str = ELEMENT_AXIS):
    """Distributed 3D read path (mirrors ``make_sharded_evaluate_2d``):
    query points stay replicated; each device evaluates only the points
    whose element layer falls in its z-slab against its LOCAL coefficient
    shard; one psum assembles the replicated result.  Clamp semantics
    match ``hybrid3d.evaluate_3d``.

    Returns a jitted fn(coeffs [nz, ny, nx, M, M, M] (sharded over
    layers), x [P], y [P], z [P]) -> u [P] replicated."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    M = cfg.M

    def local_eval(coeffs_loc, x, y, z):
        d = jax.lax.axis_index(axis)
        ix = jnp.clip(((x - x0) / hx).astype(jnp.int32), 0, cfg.nx - 1)
        iy = jnp.clip(((y - y0) / hy).astype(jnp.int32), 0, cfg.ny - 1)
        iz = jnp.clip(((z - z0) / hz).astype(jnp.int32), 0, cfg.nz - 1)
        lo = d * nz_loc
        mine = (iz >= lo) & (iz < lo + nz_loc)
        iz_loc = jnp.clip(iz - lo, 0, nz_loc - 1)
        tx = (2.0 * (x - (jnp.asarray(x0, dtype)
                          + ix.astype(dtype) * jnp.asarray(hx, dtype)))
              / hx - 1.0)
        ty = (2.0 * (y - (jnp.asarray(y0, dtype)
                          + iy.astype(dtype) * jnp.asarray(hy, dtype)))
              / hy - 1.0)
        tz = (2.0 * (z - (jnp.asarray(z0, dtype)
                          + iz.astype(dtype) * jnp.asarray(hz, dtype)))
              / hz - 1.0)
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
        W = coeffs_loc[iz_loc, iy, ix]  # [P, M, M, M]
        val = jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(jnp.where(mine, val, 0.0), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y, z):
        return sharded(coeffs, jnp.asarray(x, dtype),
                       jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    return evaluate


def make_sharded_solve_3d(problem: Problem3D, cfg: Solver3DConfig, mesh,
                          axis: str = ELEMENT_AXIS,
                          distributed_fem: bool = True):
    """Jitted multi-chip 3D solve; ``cfg.nz`` must divide by the device
    count (z-slab layout).  ``distributed_fem=False`` replicates the
    coarse stage on every device (no communication).

    The O(h^4) route rides this path too (round 4, mirroring the 2D
    y-slab): ``cfg.coarse='compact'`` swaps the local 8x8 for the
    tensor-Numerov operator (same 27-point sparsity, so the identical
    plane-halo machinery applies) + the Numerov-weighted nodal load, and
    ``cfg.trace_lift >= 2`` computes the tensor-Lagrange plane lift on
    the GATHERED nodal grid (one all_gather of the tiny
    [nz+1, ny+1, nx+1] array — global windows, sliced per slab)."""
    if any(t != "dirichlet" for t in problem.bc_faces):
        raise NotImplementedError(
            "this path eliminates all boundary faces structurally "
            "(Dirichlet only); mixed-BC problems run on the "
            "single-device uniform path (HybridSolver3D)"
        )
    if cfg.coarse == "compact":
        # Same constraints as the single-device compact scheme
        # (hybrid3d.fem_solve_3d) — validated here so a sharded run
        # fails loudly at build time instead of degrading to Q1.
        if problem.a_var is not None:
            raise ValueError("coarse='compact' needs constant diffusion "
                             "(a_var is set); use coarse='q1'")
        if problem.b != (0.0, 0.0, 0.0):
            raise ValueError("coarse='compact' requires b == (0, 0, 0)")
    n_dev = mesh.shape[axis]
    if cfg.nz % n_dev != 0:
        raise ValueError(
            f"nz={cfg.nz} must divide by the {n_dev}-device mesh"
        )
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_3d(problem, cfg)
    shared, (t_int, spts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    spts = jax.device_put(spts, repl)

    x0, x1, y0, y1, z0, z1 = problem.domain

    def local_step(shared, t_int, spts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        hz = (z1 - z0) / cfg.nz
        zs = z0 + hz * jnp.arange(cfg.nz + 1, dtype=dtype)
        lay0 = d * nz_loc
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        if distributed_fem:
            fem_loc, cg_res = _dist_fem_solve_3d(
                problem, cfg, d, n_dev, axis, xs, ys, zs_loc, lay0
            )
        else:
            from ..models.hybrid3d import fem_solve_3d

            fem_values, cg_res = fem_solve_3d(problem, cfg, xs, ys, zs)
            z00 = jnp.zeros_like(lay0)
            fem_loc = jax.lax.dynamic_slice(
                fem_values, (lay0, z00, z00),
                (nz_loc + 1, cfg.ny + 1, cfg.nx + 1),
            )
        trace_rows = None
        if cfg.trace_lift >= 2:
            # High-order tensor-Lagrange plane lift: the windows need
            # GLOBAL grid planes, so gather the (tiny) nodal grid — one
            # all_gather of [nz+1, ny+1, nx+1] — lift on it with global
            # windows, and slice this slab's element layers.  The lift is
            # cheaper to recompute everywhere than to orchestrate
            # stencil-wide plane halos (same call as the 2D y-slab path).
            from ..models.hybrid3d import _lifted_trace_3d

            fem_full = _gather_grid_3d(fem_loc, n_dev, axis)
            tr = _lifted_trace_3d(
                fem_full, cfg.M, cfg.nx, cfg.ny, cfg.nz,
                stencil=cfg.trace_lift,
            ).reshape(cfg.nz, cfg.ny, cfg.nx, -1)
            z00 = jnp.zeros_like(lay0)
            trace_rows = jax.lax.dynamic_slice(
                tr, (lay0, z00, z00, z00),
                (nz_loc, cfg.ny, cfg.nx, tr.shape[-1]),
            )
        f_rows, bc_rows, cs = _element_data_3d(
            problem, cfg, xs, ys, zs_loc, fem_loc, t_int, spts,
            layer_offset=lay0, trace_rows=trace_rows,
        )
        if problem.a_var is not None:
            from ..models.hybrid3d import _varcoeff_element_operators_3d

            D = _varcoeff_element_operators_3d(
                problem, cfg, xs, ys, zs_loc, shared, t_int
            )
            w, diags = kkt.solve_batched(
                D, shared.B, f_rows, bc_rows, cfg.gamma,
                ZP=(shared.Z, shared.Pbc),
            )
        else:
            w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        M = cfg.M
        coeffs = w.reshape(nz_loc, cfg.ny, cfg.nx, M, M, M)
        fb = _trilinear_fallback_coeffs(cs, M)
        ok = diags.solve_ok.reshape(nz_loc, cfg.ny, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        slack = diags.max_slack.reshape(nz_loc, cfg.ny, cfg.nx)
        bcv = diags.bc_violation.reshape(nz_loc, cfg.ny, cfg.nx)
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
            shared, t_int, spts
        )
        return ShardedSolution3D(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=res,
        )

    return run


def make_sharded_evaluate_3d_grid(problem: Problem3D, cfg: Solver3DConfig,
                                  mesh, axes=None):
    """Distributed read path for the (z, y) block-sharded solve: each
    device evaluates the query points whose element falls in its
    (layer-block, row-block); one psum over both axes assembles the
    replicated result.  Clamp semantics match ``hybrid3d.evaluate_3d``."""
    from ..ops import legendre
    from .mesh import GRID_AXES_3D

    if axes is None:
        axes = GRID_AXES_3D
    az, ay = axes
    n_dz, n_dy = mesh.shape[az], mesh.shape[ay]
    nz_loc, ny_loc = cfg.nz // n_dz, cfg.ny // n_dy
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    M = cfg.M

    def local_eval(coeffs_loc, x, y, z):
        dz = jax.lax.axis_index(az)
        dy = jax.lax.axis_index(ay)
        ix = jnp.clip(((x - x0) / hx).astype(jnp.int32), 0, cfg.nx - 1)
        iy = jnp.clip(((y - y0) / hy).astype(jnp.int32), 0, cfg.ny - 1)
        iz = jnp.clip(((z - z0) / hz).astype(jnp.int32), 0, cfg.nz - 1)
        mine = ((iz >= dz * nz_loc) & (iz < (dz + 1) * nz_loc)
                & (iy >= dy * ny_loc) & (iy < (dy + 1) * ny_loc))
        iz_l = jnp.clip(iz - dz * nz_loc, 0, nz_loc - 1)
        iy_l = jnp.clip(iy - dy * ny_loc, 0, ny_loc - 1)
        tx = 2.0 * (x - (jnp.asarray(x0, dtype)
                         + ix.astype(dtype) * jnp.asarray(hx, dtype))) \
            / hx - 1.0
        ty = 2.0 * (y - (jnp.asarray(y0, dtype)
                         + iy.astype(dtype) * jnp.asarray(hy, dtype))) \
            / hy - 1.0
        tz = 2.0 * (z - (jnp.asarray(z0, dtype)
                         + iz.astype(dtype) * jnp.asarray(hz, dtype))) \
            / hz - 1.0
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
        W = coeffs_loc[iz_l, iy_l, ix]
        val = jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                         precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(jnp.where(mine, val, 0.0), (az, ay))

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(az, ay), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y, z):
        return sharded(coeffs, jnp.asarray(x, dtype),
                       jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    return evaluate


def make_sharded_evaluate_3d_graded(cfg: Solver3DConfig, mesh, xs, ys,
                                    zs, axis: str = ELEMENT_AXIS):
    """Distributed read path for the GRADED z-slab solve (3D lift of
    ``sharded2d.make_sharded_evaluate_2d_graded``): searchsorted on the
    replicated node arrays, local-slab tensor-Legendre evaluation, one
    psum.  Requires nz % n_devices == 0."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    nx = xs.shape[0] - 1
    ny = ys.shape[0] - 1
    nz = zs.shape[0] - 1
    if nz % n_dev:
        raise ValueError(f"graded nz={nz} must divide by devices={n_dev}")
    nz_loc = nz // n_dev
    dtype = cfg.jnp_dtype()
    M = cfg.M
    xs_j = jnp.asarray(xs, dtype)
    ys_j = jnp.asarray(ys, dtype)
    zs_j = jnp.asarray(zs, dtype)

    def local_eval(coeffs_loc, x, y, z):
        d = jax.lax.axis_index(axis)
        ix = jnp.clip(jnp.searchsorted(xs_j, x, side="right") - 1, 0,
                      nx - 1)
        iy = jnp.clip(jnp.searchsorted(ys_j, y, side="right") - 1, 0,
                      ny - 1)
        iz = jnp.clip(jnp.searchsorted(zs_j, z, side="right") - 1, 0,
                      nz - 1)
        lo = d * nz_loc
        mine = (iz >= lo) & (iz < lo + nz_loc)
        iz_loc = jnp.clip(iz - lo, 0, nz_loc - 1)
        tx = (2.0 * x - xs_j[ix] - xs_j[ix + 1]) / (xs_j[ix + 1]
                                                    - xs_j[ix])
        ty = (2.0 * y - ys_j[iy] - ys_j[iy + 1]) / (ys_j[iy + 1]
                                                    - ys_j[iy])
        tz = (2.0 * z - zs_j[iz] - zs_j[iz + 1]) / (zs_j[iz + 1]
                                                    - zs_j[iz])
        (Vx,) = legendre.legendre_vandermonde(tx, M, num_derivs=0)
        (Vy,) = legendre.legendre_vandermonde(ty, M, num_derivs=0)
        (Vz,) = legendre.legendre_vandermonde(tz, M, num_derivs=0)
        W = coeffs_loc[iz_loc, iy, ix]  # [P, M, M, M]
        hi = jax.lax.Precision.HIGHEST
        val = jnp.einsum("pk,pklm,pl,pm->p", Vz, W, Vy, Vx,
                         precision=hi)
        return jax.lax.psum(jnp.where(mine, val, 0.0), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y, z):
        return sharded(coeffs, jnp.asarray(x, dtype),
                       jnp.asarray(y, dtype), jnp.asarray(z, dtype))

    return evaluate
