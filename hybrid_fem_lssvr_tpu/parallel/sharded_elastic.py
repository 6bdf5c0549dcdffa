"""Multi-chip VECTOR elasticity: y-slab (2D) and z-slab (3D) sharding.

The reference's element loop (``/root/reference/1D-Possion/
Hybrid-FEM-LSSVR.py:151-176``) parallelised across devices is this
framework's core DP thesis (SURVEY.md 2.3); this module extends it to the
vector-valued elasticity family (``models/elastic.py`` /
``models/elastic3d.py``) so the newest family rides the same slab layout
as every scalar family:

* Coarse stage — fully distributed block Q1 CG: the [2, ., .] (2D) /
  [3, ., ., .] (3D) displacement field lives on overlapping slabs; each
  block stiffness apply does the component-coupled local applies and one
  duplicated-interface halo exchange PER COMPONENT (``sharded2d._halo_add``
  / ``sharded3d._halo_add_3d``), with ownership-masked ``psum`` inner
  products.  Preconditioning is block-diagonal and component-wise, exactly
  as the single-device stage (``elastic.fem_solve_elastic``): in 2D each
  component runs the distributed V-cycle (fine-level slab smoothing +
  halo'd full-weighting restriction, coarser levels gathered and cycled
  serially) on its own anisotropic diagonal block — pure-stiffness 2D
  locals are scale-invariant, so every level reuses the fine 4x4; in 3D
  the hex locals scale as 2^l per level (``elastic3d`` scaling rule).
* Enhancement — the coupled block LSE sharded over element rows/layers:
  every device stacks its slab's per-component collocation rhs and trace
  rows (domain-boundary override masks driven by GLOBAL offsets) and
  solves through the SAME replicated host-f64 shared operators
  (``kkt.precompute_shared_lse_host`` of the [2C^2, 2M^2] / [3C^3, 3M^3]
  block operator) in two MXU matmuls.

Output coefficients are [d, E_rows, ...] with the ELEMENT axis (axis 1)
sharded; component axis replicated (``P(None, axis)``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.elastic import (
    ElasticConfig2D, ElasticProblem2D, _block_locals, _component_problem,
    prepare_shared_elastic,
)
from ..models.hybrid2d import _bilinear_fallback_coeffs, _element_data_2d
from ..ops import kkt
from .mesh import ELEMENT_AXIS
from .sharded2d import _gather_grid, _halo_add, _restrict_slab


class ShardedElasticSolution2D(NamedTuple):
    """Distributed 2D elasticity solution with the scalar slab path's full
    observability (``ShardedSolution2D``): per-element slack/trace
    residuals plus the distributed CG's iteration count and final residual
    per device."""

    coeffs: jnp.ndarray  # [2, ny, nx, M, M]; axis 1 sharded
    fem_local: jnp.ndarray  # [n_dev, 2, ny_loc+1, nx+1]
    solve_ok: jnp.ndarray  # [ny, nx]
    max_slack: jnp.ndarray = None  # [ny, nx]
    bc_violation: jnp.ndarray = None  # [ny, nx]
    cg_iters: jnp.ndarray = None  # [n_dev]
    cg_residual: jnp.ndarray = None  # [n_dev]

    def assemble_fem_grid(self, total_ny=None):
        """Stitch overlapping slabs into the [2, ny+1, nx+1] grid."""
        import numpy as np

        n_dev, _, nloc1, nx1 = self.fem_local.shape
        ny_loc = nloc1 - 1
        grid = np.zeros((2, n_dev * ny_loc + 1, nx1))
        fl = np.asarray(self.fem_local)
        for dd in range(n_dev):
            grid[:, dd * ny_loc:(dd + 1) * ny_loc + 1] = fl[dd]
        if total_ny is not None:
            grid = grid[:, : total_ny + 1]
        return grid


def _halo_vec(v, d, n_dev, axis):
    """Duplicated-interface halo sum applied per displacement component
    (leading axis is the static component count)."""
    return jnp.stack([_halo_add(v[c], d, n_dev, axis)
                      for c in range(v.shape[0])])


def _dist_fem_solve_elastic_2d(problem: ElasticProblem2D,
                               cfg: ElasticConfig2D, d, n_dev, axis,
                               xs, ys_loc, row0):
    """Distributed block Q1 coarse solve on y-slabs: component-coupled
    local stiffness applies + one halo exchange per component per CG
    iteration; component-wise distributed V-cycle preconditioning.
    Returns ([2, ny_loc+1, nx+1] slab nodal displacements, CGResult)."""
    from ..ops import assembly2d, cg, multigrid

    dtype = xs.dtype
    ny_loc = ys_loc.shape[0] - 1
    nx1 = xs.shape[0]
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    A11, A12, A22 = _block_locals(problem, hx, hy, dtype)

    def apply_local(u):
        r1 = (assembly2d.apply_stiffness(u[0], A11)
              + assembly2d.apply_stiffness(u[1], A12))
        r2 = (assembly2d.apply_stiffness(u[0], A12.T)
              + assembly2d.apply_stiffness(u[1], A22))
        return jnp.stack([r1, r2])

    g_row = row0 + jnp.arange(ny_loc + 1)
    row_int = (g_row > 0) & (g_row < cfg.ny)
    col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
    interior = row_int[:, None] & col_int[None, :]
    own = jnp.where((jnp.arange(ny_loc + 1) > 0) | (d == 0), 1.0, 0.0)
    own = own.astype(dtype)[:, None]

    b = _halo_vec(
        jnp.stack([assembly2d.assemble_load(xs, ys_loc, problem.f1),
                   assembly2d.assemble_load(xs, ys_loc, problem.f2)]),
        d, n_dev, axis,
    )
    X, Y = jnp.meshgrid(xs, ys_loc)
    u_bc = jnp.stack([
        jnp.where(interior, 0.0, problem.g1(X, Y) * jnp.ones_like(X)),
        jnp.where(interior, 0.0, problem.g2(X, Y) * jnp.ones_like(X)),
    ])

    def apply_full(v):
        return _halo_vec(apply_local(v), d, n_dev, axis)

    def apply_free(v):
        return jnp.where(interior, apply_full(v * interior), 0.0)

    def dist_dot(u, v):
        return jax.lax.psum(jnp.sum(u * v * own[None]), axis)

    rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
    diag = _halo_vec(
        jnp.stack([
            assembly2d.stiffness_diag((ny_loc + 1, nx1), A11, dtype),
            assembly2d.stiffness_diag((ny_loc + 1, nx1), A22, dtype),
        ]),
        d, n_dev, axis,
    )

    precond = cfg.precond
    mg_ok = (cfg.ny % (2 * n_dev) == 0 and cfg.nx % 2 == 0
             and min(cfg.nx, cfg.ny) >= 8)
    if precond == "auto":
        precond = "mg" if mg_ok else "jacobi"
    if precond == "mg":
        if not mg_ok:
            raise ValueError(
                "distributed precond='mg' needs ny % (2*devices) == 0, "
                "even nx and an >= 8 grid; use precond='jacobi'"
            )
        # Component-wise distributed V-cycle: fine-level slab smoothing on
        # the component's own anisotropic diagonal block + halo'd
        # restriction; coarser levels gathered + serial (2D pure-stiffness
        # locals are scale-invariant, so every level reuses the fine 4x4).
        nyc, nxc = cfg.ny // 2, cfg.nx // 2
        nyc_loc = ny_loc // 2
        row0c = row0 // 2
        omega, nu = 0.8, 2

        def comp_cycle(Acc, diag_c):
            def apply_pc(v):
                return jnp.where(
                    interior,
                    _halo_add(assembly2d.apply_stiffness(v * interior,
                                                         Acc),
                              d, n_dev, axis),
                    0.0,
                )

            serial_vcycle = multigrid.make_vcycle(
                nyc + 1, nxc + 1, Acc, dtype,
                loc_for_level=lambda lvl: Acc,
            )

            def smooth(u, r):
                for _ in range(nu):
                    u = u + omega * jnp.where(
                        interior, (r - apply_pc(u)) / diag_c, 0.0
                    )
                return u

            def cycle(r):
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

            return cycle

        cycles = [comp_cycle(A11, diag[0]), comp_cycle(A22, diag[1])]

        def M_inv(r):
            return jnp.where(
                interior,
                jnp.stack([cycles[c](r[c]) for c in range(2)]),
                0.0,
            )
    else:
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def make_sharded_solve_elastic_2d(problem: ElasticProblem2D,
                                  cfg: ElasticConfig2D, mesh,
                                  axis: str = ELEMENT_AXIS):
    """Jitted multi-chip 2D elasticity solve (module docstring); element
    rows padded to a slab multiple, padded tail rows masked out by the
    global-row boundary masks and stripped from the outputs."""
    n_dev = mesh.shape[axis]
    ny_loc = -(-cfg.ny // n_dev)
    ny_pad = n_dev * ny_loc
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_elastic(problem, cfg)
    shared, (t_int, bpts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    bpts = jax.device_put(bpts, repl)
    x0, x1, y0, y1 = problem.domain
    M = cfg.M

    def local_step(shared, t_int, bpts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        hy = (y1 - y0) / cfg.ny
        ys = y0 + hy * jnp.arange(ny_pad + 1, dtype=dtype)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        if cfg.coarse == "richardson":
            # Two distributed block solves (h and h/2): fine slabs align
            # exactly with coarse slabs (2x rows per device), and the
            # h^2-term cancellation (4 u_{h/2} - u_h)/3 happens on the
            # shared coarse nodes of each slab — the O(h^4) vector
            # nodal route, distributed (single-device:
            # elastic.hybrid_solve_elastic's richardson branch).
            import dataclasses as _dc

            cfg_f = _dc.replace(cfg, nx=2 * cfg.nx, ny=2 * cfg.ny)
            xs_f = jnp.linspace(x0, x1, 2 * cfg.nx + 1, dtype=dtype)
            hy_f = (y1 - y0) / (2 * cfg.ny)
            ys_f = y0 + hy_f * jnp.arange(2 * ny_pad + 1, dtype=dtype)
            row0_f = 2 * row0
            ys_loc_f = jax.lax.dynamic_slice(ys_f, (row0_f,),
                                             (2 * ny_loc + 1,))
            fem_f, cg_res = _dist_fem_solve_elastic_2d(
                problem, cfg_f, d, n_dev, axis, xs_f, ys_loc_f, row0_f
            )
            fem_h, _ = _dist_fem_solve_elastic_2d(
                problem, cfg, d, n_dev, axis, xs, ys_loc, row0
            )
            fem_loc = (4.0 * fem_f[:, ::2, ::2] - fem_h) / 3.0
        else:
            fem_loc, cg_res = _dist_fem_solve_elastic_2d(
                problem, cfg, d, n_dev, axis, xs, ys_loc, row0
            )
        tr_comp = [None, None]
        if cfg.trace_lift >= 2:
            # Tangential Lagrange lift per component on the GATHERED
            # nodal grid (global windows), sliced per slab — the same
            # recipe as the scalar sharded2d path.
            from ..models.hybrid2d import _lifted_trace_2d

            z0 = jnp.zeros_like(row0)
            for comp in range(2):
                fem_full = _gather_grid(fem_loc[comp], n_dev,
                                        axis)[: cfg.ny + 1]
                tr = _lifted_trace_2d(
                    fem_full, M, cfg.nx, cfg.ny,
                    stencil=cfg.trace_lift,
                ).reshape(cfg.ny, cfg.nx, -1)
                tr = jnp.pad(tr, ((0, ny_pad - cfg.ny), (0, 0), (0, 0)))
                tr_comp[comp] = jax.lax.dynamic_slice(
                    tr, (row0, z0, z0),
                    (ny_loc, cfg.nx, tr.shape[-1]),
                )
        rows, traces, corners = [], [], []
        for comp in range(2):
            f_rows, bc_rows, cs = _element_data_2d(
                _component_problem(problem, comp), cfg, xs, ys_loc,
                fem_loc[comp], t_int, bpts, row_offset=row0,
                trace_rows=tr_comp[comp],
            )
            rows.append(f_rows)
            traces.append(bc_rows)
            corners.append(cs)
        f_all = jnp.concatenate(rows, axis=1)  # [E_loc, 2 C^2]
        bc_all = jnp.concatenate(traces, axis=1)
        w, diags = kkt.solve_primal_shared(shared, f_all, bc_all)
        coeffs = w.reshape(-1, 2, M, M)
        ok = diags.solve_ok
        out = []
        for comp in range(2):
            fb = _bilinear_fallback_coeffs(*corners[comp], M)
            c = coeffs[:, comp].reshape(ny_loc, cfg.nx, M, M)
            c = jnp.where(
                ok.reshape(ny_loc, cfg.nx)[..., None, None],
                jnp.where(jnp.isfinite(c), c, 0.0), fb,
            )
            out.append(c)
        return (jnp.stack(out), fem_loc[None],
                ok.reshape(ny_loc, cfg.nx),
                diags.max_slack.reshape(ny_loc, cfg.nx),
                diags.bc_violation.reshape(ny_loc, cfg.nx),
                cg_res.iters.reshape(1).astype(jnp.int32),
                cg_res.residual.reshape(1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, axis), P(axis), P(axis), P(axis), P(axis),
                   P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, resid = sharded(
            shared, t_int, bpts
        )
        return ShardedElasticSolution2D(
            coeffs[:, : cfg.ny], fem_local, ok[: cfg.ny],
            max_slack=slack[: cfg.ny], bc_violation=bcv[: cfg.ny],
            cg_iters=iters, cg_residual=resid,
        )

    return run


def make_sharded_evaluate_elastic_2d(problem: ElasticProblem2D,
                                     cfg: ElasticConfig2D, mesh,
                                     axis: str = ELEMENT_AXIS):
    """Distributed vector read path: replicated query points, each device
    evaluates the points whose element row falls in its slab against its
    LOCAL coefficient shard per component, one psum assembles (u1, u2)
    (clamp semantics match ``elastic.evaluate_elastic_2d``)."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    ny_loc = -(-cfg.ny // n_dev)
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    M = cfg.M
    hi = jax.lax.Precision.HIGHEST

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
        vals = []
        for comp in range(2):
            W = coeffs_loc[comp][iy_loc, ix]  # [P, M, M]
            v = jnp.einsum("pk,pkl,pl->p", Vy, W, Vx, precision=hi)
            vals.append(jnp.where(mine, v, 0.0))
        return jax.lax.psum(jnp.stack(vals), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(None, axis), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y):
        pad = n_dev * ny_loc - coeffs.shape[1]
        if pad:
            coeffs = jnp.pad(
                coeffs, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0))
            )
        u = sharded(coeffs, jnp.asarray(x, dtype), jnp.asarray(y, dtype))
        return u[0], u[1]

    return evaluate


# ---------------------------------------------------------------------------
# 3D: element layers sharded as z-slabs (mirror of the 2D path on the
# nine-block hex operator from models/elastic3d.py).
# ---------------------------------------------------------------------------


class ShardedElasticSolution3D(NamedTuple):
    coeffs: jnp.ndarray  # [3, nz, ny, nx, M, M, M]; axis 1 sharded
    fem_local: jnp.ndarray  # [n_dev, 3, nz_loc+1, ny+1, nx+1]
    solve_ok: jnp.ndarray  # [nz, ny, nx]
    max_slack: jnp.ndarray = None
    bc_violation: jnp.ndarray = None
    cg_iters: jnp.ndarray = None  # [n_dev]
    cg_residual: jnp.ndarray = None  # [n_dev]


def _halo_vec_3d(v, d, n_dev, axis):
    from .sharded3d import _halo_add_3d

    return jnp.stack([_halo_add_3d(v[c], d, n_dev, axis)
                      for c in range(v.shape[0])])


def _dist_fem_solve_elastic_3d(problem, cfg, d, n_dev, axis, xs, ys,
                               zs_loc, lay0):
    """Distributed nine-block hex coarse solve on z-slabs: plane-halo
    exchange per component per block apply; component-wise distributed
    V-cycle preconditioning (hex locals scale as 2^l per level).
    Returns ([3, nz_loc+1, ny+1, nx+1], CGResult)."""
    from ..models.elastic3d import _block_locals_3d
    from ..ops import assembly3d, cg, multigrid
    from .sharded3d import _gather_grid_3d, _halo_add_3d, _restrict_slab_3d

    dtype = xs.dtype
    nz_loc = zs_loc.shape[0] - 1
    ny1, nx1 = ys.shape[0], xs.shape[0]
    hx = float((problem.domain[1] - problem.domain[0]) / cfg.nx)
    hy = float((problem.domain[3] - problem.domain[2]) / cfg.ny)
    hz = float((problem.domain[5] - problem.domain[4]) / cfg.nz)
    diag_loc, off_loc = _block_locals_3d(problem, hx, hy, hz, dtype)
    A = assembly3d.apply_stiffness_3d
    Axy, Axz, Ayz = off_loc["xy"], off_loc["xz"], off_loc["yz"]

    def apply_local(u):
        r1 = A(u[0], diag_loc["x"]) + A(u[1], Axy) + A(u[2], Axz)
        r2 = A(u[0], Axy.T) + A(u[1], diag_loc["y"]) + A(u[2], Ayz)
        r3 = A(u[0], Axz.T) + A(u[1], Ayz.T) + A(u[2], diag_loc["z"])
        return jnp.stack([r1, r2, r3])

    g_lay = lay0 + jnp.arange(nz_loc + 1)
    lay_int = (g_lay > 0) & (g_lay < cfg.nz)
    row_int = jnp.zeros(ny1, bool).at[1:-1].set(True)
    col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
    interior = (lay_int[:, None, None] & row_int[None, :, None]
                & col_int[None, None, :])
    own = jnp.where((jnp.arange(nz_loc + 1) > 0) | (d == 0), 1.0, 0.0)
    own = own.astype(dtype)[:, None, None]

    b = _halo_vec_3d(
        jnp.stack([assembly3d.assemble_load_3d(xs, ys, zs_loc, fc)
                   for fc in problem.f]),
        d, n_dev, axis,
    )
    X = xs[None, None, :]
    Y = ys[None, :, None]
    Z = zs_loc[:, None, None]
    ones = jnp.ones((nz_loc + 1, ny1, nx1), dtype)
    u_bc = jnp.stack([jnp.where(interior, 0.0, gc(X, Y, Z) * ones)
                      for gc in problem.g])

    def apply_full(v):
        return _halo_vec_3d(apply_local(v), d, n_dev, axis)

    def apply_free(v):
        return jnp.where(interior, apply_full(v * interior), 0.0)

    def dist_dot(u, v):
        return jax.lax.psum(jnp.sum(u * v * own[None]), axis)

    rhs = jnp.where(interior, b - apply_full(u_bc), 0.0)
    diag = _halo_vec_3d(
        jnp.stack([
            assembly3d.stiffness_diag_3d((nz_loc + 1, ny1, nx1),
                                         diag_loc[dd], dtype)
            for dd in ("x", "y", "z")
        ]),
        d, n_dev, axis,
    )

    precond = cfg.precond
    mg_ok = (cfg.nz % (2 * n_dev) == 0 and cfg.nx % 2 == 0
             and cfg.ny % 2 == 0 and min(cfg.nx, cfg.ny, cfg.nz) >= 8)
    if precond == "auto":
        precond = "mg" if mg_ok else "jacobi"
    if precond == "mg":
        if not mg_ok:
            raise ValueError(
                "distributed precond='mg' needs nz % (2*devices) == 0, "
                "even nx/ny and an >= 8 grid; use precond='jacobi'"
            )
        nzc_loc = nz_loc // 2
        lay0c = lay0 // 2
        omega, nu = 0.8, 2

        def comp_cycle(Acc, diag_c):
            def apply_pc(v):
                return jnp.where(
                    interior,
                    _halo_add_3d(A(v * interior, Acc), d, n_dev, axis),
                    0.0,
                )

            serial_vcycle = multigrid.make_vcycle_3d(
                cfg.nz // 2 + 1, cfg.ny // 2 + 1, cfg.nx // 2 + 1,
                2.0 * Acc, dtype,
                loc_for_level=lambda lvl: (2.0 ** (lvl + 1)) * Acc,
            )

            def smooth(u, r):
                for _ in range(nu):
                    u = u + omega * jnp.where(
                        interior, (r - apply_pc(u)) / diag_c, 0.0
                    )
                return u

            def cycle(r):
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

            return cycle

        cycles = [comp_cycle(diag_loc[dd], diag[i])
                  for i, dd in enumerate(("x", "y", "z"))]

        def M_inv(r):
            return jnp.where(
                interior,
                jnp.stack([cycles[c](r[c]) for c in range(3)]),
                0.0,
            )
    else:
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)
    res = cg.cg(apply_free, rhs, M_inv=M_inv, tol=tol,
                maxiter=cfg.cg_maxiter, dot_fn=dist_dot)
    return u_bc + jnp.where(interior, res.x, 0.0), res


def make_sharded_solve_elastic_3d(problem, cfg, mesh,
                                  axis: str = ELEMENT_AXIS):
    """Jitted multi-chip 3D elasticity solve: z-slab layout
    (``cfg.nz % n_devices == 0``), distributed nine-block hex CG +
    block-LSE enhancement with GLOBAL layer-offset face masks."""
    from ..models.elastic3d import (
        _component_problem_3d, prepare_shared_elastic_3d,
    )
    from ..models.hybrid3d import (
        _element_data_3d, _trilinear_fallback_coeffs,
    )

    n_dev = mesh.shape[axis]
    if cfg.nz % n_dev != 0:
        raise ValueError(
            f"nz={cfg.nz} must divide by the {n_dev}-device mesh"
        )
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    shared_bundle = prepare_shared_elastic_3d(problem, cfg)
    shared, (t_int, spts) = shared_bundle
    repl = jax.sharding.NamedSharding(mesh, P())
    shared = jax.device_put(shared, repl)
    t_int = jax.device_put(t_int, repl)
    spts = jax.device_put(spts, repl)
    x0, x1, y0, y1, z0, z1 = problem.domain
    M = cfg.M

    def local_step(shared, t_int, spts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        hz = (z1 - z0) / cfg.nz
        zs = z0 + hz * jnp.arange(cfg.nz + 1, dtype=dtype)
        lay0 = d * nz_loc
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        if cfg.coarse == "richardson":
            # Distributed two-grid nodal extrapolation (the 2D note,
            # lifted): fine z-slabs align exactly (2x layers/device).
            import dataclasses as _dc

            cfg_f = _dc.replace(cfg, nx=2 * cfg.nx, ny=2 * cfg.ny,
                                nz=2 * cfg.nz)
            xs_f = jnp.linspace(x0, x1, 2 * cfg.nx + 1, dtype=dtype)
            ys_f = jnp.linspace(y0, y1, 2 * cfg.ny + 1, dtype=dtype)
            hz_f = (z1 - z0) / (2 * cfg.nz)
            zs_f = z0 + hz_f * jnp.arange(2 * cfg.nz + 1, dtype=dtype)
            lay0_f = 2 * lay0
            zs_loc_f = jax.lax.dynamic_slice(zs_f, (lay0_f,),
                                             (2 * nz_loc + 1,))
            fem_f, cg_res = _dist_fem_solve_elastic_3d(
                problem, cfg_f, d, n_dev, axis, xs_f, ys_f, zs_loc_f,
                lay0_f
            )
            fem_h, _ = _dist_fem_solve_elastic_3d(
                problem, cfg, d, n_dev, axis, xs, ys, zs_loc, lay0
            )
            fem_loc = (4.0 * fem_f[:, ::2, ::2, ::2] - fem_h) / 3.0
        else:
            fem_loc, cg_res = _dist_fem_solve_elastic_3d(
                problem, cfg, d, n_dev, axis, xs, ys, zs_loc, lay0
            )
        tr_comp = [None, None, None]
        if cfg.trace_lift >= 2:
            # Plane lift per component on the gathered nodal grid
            # (global windows), sliced per slab — the scalar sharded3d
            # recipe per displacement component.
            from ..models.hybrid3d import _lifted_trace_3d
            from .sharded3d import _gather_grid_3d

            z00 = jnp.zeros_like(lay0)
            for comp in range(3):
                fem_full = _gather_grid_3d(fem_loc[comp], n_dev, axis)
                tr = _lifted_trace_3d(
                    fem_full, M, cfg.nx, cfg.ny, cfg.nz,
                    stencil=cfg.trace_lift,
                ).reshape(cfg.nz, cfg.ny, cfg.nx, -1)
                tr_comp[comp] = jax.lax.dynamic_slice(
                    tr, (lay0, z00, z00, z00),
                    (nz_loc, cfg.ny, cfg.nx, tr.shape[-1]),
                )
        rows, traces, corners = [], [], []
        for comp in range(3):
            f_rows, bc_rows, cs = _element_data_3d(
                _component_problem_3d(problem, comp), cfg, xs, ys,
                zs_loc, fem_loc[comp], t_int, spts, layer_offset=lay0,
                trace_rows=tr_comp[comp],
            )
            rows.append(f_rows)
            traces.append(bc_rows)
            corners.append(cs)
        f_all = jnp.concatenate(rows, axis=1)
        bc_all = jnp.concatenate(traces, axis=1)
        w, diags = kkt.solve_primal_shared(shared, f_all, bc_all)
        shp = (nz_loc, cfg.ny, cfg.nx)
        coeffs = w.reshape(-1, 3, M, M, M)
        ok = diags.solve_ok.reshape(shp)
        out = []
        for comp in range(3):
            fb = _trilinear_fallback_coeffs(corners[comp], M)
            c = coeffs[:, comp].reshape(*shp, M, M, M)
            c = jnp.where(ok[..., None, None, None],
                          jnp.where(jnp.isfinite(c), c, 0.0), fb)
            out.append(c)
        return (jnp.stack(out), fem_loc[None], ok,
                diags.max_slack.reshape(shp),
                diags.bc_violation.reshape(shp),
                cg_res.iters.reshape(1).astype(jnp.int32),
                cg_res.residual.reshape(1))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, axis), P(axis), P(axis), P(axis), P(axis),
                   P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_local, ok, slack, bcv, iters, resid = sharded(
            shared, t_int, spts
        )
        return ShardedElasticSolution3D(
            coeffs, fem_local, ok, max_slack=slack, bc_violation=bcv,
            cg_iters=iters, cg_residual=resid,
        )

    return run


def make_sharded_evaluate_elastic_3d(problem, cfg, mesh,
                                     axis: str = ELEMENT_AXIS):
    """Distributed 3D vector read path: (u1, u2, u3) via local z-slab
    evaluation + psum (clamp semantics match
    ``elastic3d.evaluate_elastic_3d``)."""
    from ..ops import legendre

    n_dev = mesh.shape[axis]
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = problem.domain
    hx = (x1 - x0) / cfg.nx
    hy = (y1 - y0) / cfg.ny
    hz = (z1 - z0) / cfg.nz
    M = cfg.M
    hi = jax.lax.Precision.HIGHEST

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
        vals = []
        for comp in range(3):
            W = coeffs_loc[comp][iz_loc, iy, ix]  # [P, M, M, M]
            v = jnp.einsum("pk,pl,pm,pklm->p", Vz, Vy, Vx, W,
                           precision=hi)
            vals.append(jnp.where(mine, v, 0.0))
        return jax.lax.psum(jnp.stack(vals), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x, y, z):
        u = sharded(coeffs, jnp.asarray(x, dtype), jnp.asarray(y, dtype),
                    jnp.asarray(z, dtype))
        return u[0], u[1], u[2]

    return evaluate
