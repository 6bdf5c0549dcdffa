"""Distributed 3D transient marches: z-slab sharding of the Q1 hex
theta-scheme and the LSSVR-enhanced CN march — the 3D lift of
``parallel/transient2d.py`` (per step one distributed plane-halo
Jacobi-CG solve + the batched shared-LSE CN solve on this slab's element
layers), in the same chunked-carry architecture: the march state
round-trips through the jit boundary so ``utils.checkpoint.chunked_scan``
can checkpoint/resume a multi-chip march (see the 2D module docstring).
== single-device asserted in tests/test_transient.py."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.transient import (TransientConfig, TransientProblem3D,
                                TransientSolution3D, _check_3d_dirichlet,
                                _locals_3d, _shared_cn_ops_3d)
from ..ops import assembly3d, cg, kkt
from ..utils.checkpoint import chunked_scan, march_fingerprint
from .sharded import ELEMENT_AXIS
from .sharded3d import _halo_add_3d


def make_sharded_transient_3d(problem: TransientProblem3D, cfg,
                              tcfg: TransientConfig, mesh,
                              axis: str = ELEMENT_AXIS,
                              enhanced: bool = True):
    """Zero-argument callable -> TransientSolution3D with fem_values
    [n_dev, nz_loc+1, ny+1, nx+1] slabs and, when ``enhanced``, coeffs
    [nz, ny, nx, M, M, M] sharded over element layers.  Requires
    nz % n_devices == 0 and all-Dirichlet faces.  ``tcfg.checkpoint``
    makes the march resumable."""
    p = problem.elliptic
    _check_3d_dirichlet(p)
    if enhanced and tcfg.theta != 0.5:
        raise ValueError("the enhanced march collocates Crank-Nicolson; "
                         "theta must be 0.5")
    n_dev = mesh.shape[axis]
    if cfg.nz % n_dev:
        raise ValueError(f"nz={cfg.nz} must divide by devices={n_dev}")
    nz_loc = cfg.nz // n_dev
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1, z0, z1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    hz = float((z1 - z0) / cfg.nz)
    dt = tcfg.t_final / tcfg.n_steps
    th = tcfg.theta
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + th * dt * K_A
    K_rhs = K_M - (1.0 - th) * dt * K_A
    repl = jax.sharding.NamedSharding(mesh, P())
    # Semilinear (IMEX CNAB) variant: a SemilinearTransientProblem3D
    # carries ``s`` — same treatment as parallel/transient2d.py.
    s_fn = getattr(problem, "s", None)
    if enhanced:
        shared, proj, R_op, t_int, spts = _shared_cn_ops_3d(p, cfg, dt)
        shared = jax.device_put(shared, repl)
        proj = jax.device_put(proj, repl)
        R_op = jax.device_put(R_op, repl)
        t_int_j = jax.device_put(jnp.asarray(t_int), repl)
        spts_j = jax.device_put(jnp.asarray(spts), repl)
        if s_fn is not None:
            import numpy as np

            from ..ops import legendre as leg

            V0i = leg.vandermonde_host(tuple(np.asarray(t_int)), cfg.M)[0]
            Mass_op = jax.device_put(jnp.asarray(
                np.einsum("zk,yl,xm->zyxklm", V0i, V0i, V0i).reshape(
                    cfg.n_colloc ** 3, cfg.M ** 3), dtype), repl)
        else:
            Mass_op = jnp.zeros((1,), dtype)
    else:
        shared = proj = R_op = t_int_j = spts_j = jnp.zeros((1,), dtype)
        Mass_op = jnp.zeros((1,), dtype)
    hi = jax.lax.Precision.HIGHEST
    C = cfg.n_colloc
    M = cfg.M
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def _ctx(shared, proj, R_op, t_int, spts, Mass_op):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = z0 + hz * jnp.arange(cfg.nz + 1, dtype=dtype)
        lay0 = d * nz_loc
        zs_loc = jax.lax.dynamic_slice(zs, (lay0,), (nz_loc + 1,))
        nx1, ny1 = cfg.nx + 1, cfg.ny + 1
        g_lay = lay0 + jnp.arange(nz_loc + 1)
        lay_int = (g_lay > 0) & (g_lay < cfg.nz)
        row_int = jnp.zeros(ny1, bool).at[1:-1].set(True)
        col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
        interior = (lay_int[:, None, None] & row_int[None, :, None]
                    & col_int[None, None, :])
        own = jnp.where((jnp.arange(nz_loc + 1) > 0) | (d == 0), 1.0,
                        0.0).astype(dtype)[:, None, None]
        X = xs[None, None, :]
        Y = ys[None, :, None]
        Z = zs_loc[:, None, None]
        ones = jnp.ones((nz_loc + 1, ny1, nx1), dtype)
        u_bc = jnp.where(interior, 0.0, p.g(X, Y, Z) * ones)

        def halo(v):
            return _halo_add_3d(v, d, n_dev, axis)

        def apply_free(v):
            return jnp.where(
                interior,
                halo(assembly3d.apply_stiffness_3d(v * interior,
                                                   K_lhs)), 0.0)

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), axis)

        diag = halo(assembly3d.stiffness_diag_3d(
            (nz_loc + 1, ny1, nx1), K_lhs, dtype))
        M_inv = jnp.where(interior, 1.0 / diag, 1.0)
        bc_term = jnp.where(
            interior, halo(assembly3d.apply_stiffness_3d(u_bc, K_lhs)),
            0.0)

        if tcfg.mass == "numerov":
            def load_at(t):
                return assembly3d.apply_stiffness_3d(
                    problem.f(X, Y, Z, t) * ones, K_M)
        else:
            def load_at(t):
                return assembly3d.assemble_load_3d(
                    xs, ys, zs_loc,
                    lambda x, y, z: problem.f(x, y, z, t))

        if enhanced:
            from ..models.hybrid3d import _element_data_3d

            t_j = jnp.asarray(t_int, dtype)
            xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
            yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
            zq = zs_loc[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
            E_loc = cfg.nx * cfg.ny * nz_loc
            ones6 = jnp.ones((nz_loc, cfg.ny, cfg.nx, C, C, C), dtype)

            def f_rows_at(t):
                F = problem.f(
                    xq[None, None, :, None, None, :],
                    yq[None, :, None, None, :, None],
                    zq[:, None, None, :, None, None], t)
                return (F * ones6).reshape(E_loc, C * C * C)

        def fem_step(u, s_ex, t):
            r = (halo(assembly3d.apply_stiffness_3d(u, K_rhs))
                 + dt * halo(th * load_at(t + dt)
                             + (1.0 - th) * load_at(t)))
            if s_fn is not None:
                r = r - dt * halo(
                    assembly3d.apply_stiffness_3d(s_ex, K_M))
            rhs = jnp.where(interior, r, 0.0) - bc_term
            res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                        M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter,
                        dot_fn=dist_dot)
            return u_bc + jnp.where(interior, res.x, 0.0), res.iters

        def scan_step(carry, t):
            u, s_prev, w, sc_prev = carry
            if s_fn is not None:
                s_n = s_fn(u)
                u1, iters = fem_step(u, 1.5 * s_n - 0.5 * s_prev, t)
            else:
                s_n = s_prev
                u1, iters = fem_step(u, None, t)
            if enhanced:
                _, bc_rows, _ = _element_data_3d(
                    p, cfg, xs, ys, zs_loc, u1, t_int, spts,
                    layer_offset=lay0)
                rhs = (jnp.dot(w, R_op.T, precision=hi)
                       + f_rows_at(t) + f_rows_at(t + dt))
                if s_fn is not None:
                    sc_n = s_fn(jnp.dot(w, Mass_op.T, precision=hi))
                    rhs = rhs - (3.0 * sc_n - sc_prev)
                else:
                    sc_n = sc_prev
                w1, _ = kkt.solve_primal_shared(shared, rhs, bc_rows)
            else:
                w1, sc_n = w, sc_prev
            return (u1, s_n, w1, sc_n), iters

        def init_carry():
            u0g = jnp.where(interior,
                            problem.u0(X, Y, Z) * ones, u_bc
                            ).astype(dtype)
            if enhanced:
                F0 = problem.u0(
                    xq[None, None, :, None, None, :]
                    * jnp.ones((nz_loc, cfg.ny, 1, 1, 1, 1)),
                    yq[None, :, None, None, :, None]
                    * jnp.ones((nz_loc, 1, cfg.nx, 1, 1, 1)),
                    zq[:, None, None, :, None, None]
                    * jnp.ones((1, cfg.ny, cfg.nx, 1, 1, 1)))
                f0 = (F0 * ones6).reshape(E_loc, C * C * C)
                _, bc0, _ = _element_data_3d(p, cfg, xs, ys, zs_loc,
                                             u0g, t_int, spts,
                                             layer_offset=lay0)
                w0, _ = kkt.solve_primal_shared(proj, f0, bc0)
            else:
                w0 = jnp.zeros((1,), dtype)
            s0 = s_fn(u0g) if s_fn is not None else jnp.zeros((1,), dtype)
            sc0 = (s_fn(jnp.dot(w0, Mass_op.T, precision=hi))
                   if (enhanced and s_fn is not None)
                   else jnp.zeros((1,), dtype))
            return u0g, s0, w0, sc0

        return scan_step, init_carry

    def local_init(shared, proj, R_op, t_int, spts, Mass_op):
        _, init_carry = _ctx(shared, proj, R_op, t_int, spts, Mass_op)
        return init_carry()

    def local_chunk(shared, proj, R_op, t_int, spts, Mass_op,
                    u, s, w, sc, ts):
        scan_step, _ = _ctx(shared, proj, R_op, t_int, spts, Mass_op)
        (u, s, w, sc), iters = jax.lax.scan(scan_step, (u, s, w, sc), ts)
        return u, s, w, sc, iters[:, None]

    op_specs = (P(),) * 6
    carry_specs = (P(axis),) * 4
    sharded_init = jax.shard_map(
        local_init, mesh=mesh, in_specs=op_specs,
        out_specs=carry_specs, check_vma=False,
    )
    sharded_chunk = jax.shard_map(
        local_chunk, mesh=mesh,
        in_specs=op_specs + carry_specs + (P(),),
        out_specs=carry_specs + (P(None, axis),),
        check_vma=False,
    )

    @jax.jit
    def init_fn():
        return sharded_init(shared, proj, R_op, t_int_j, spts_j, Mass_op)

    @jax.jit
    def chunk_fn(carry, ts):
        u, s, w, sc = carry
        u, s, w, sc, iters = sharded_chunk(
            shared, proj, R_op, t_int_j, spts_j, Mass_op, u, s, w, sc, ts)
        return (u, s, w, sc), iters

    ts_all = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    tag = ("sharded_transient_3d_enh" if enhanced
           else "sharded_transient_3d_fem")

    def run():
        if tcfg.checkpoint:
            # init_fn passed LAZILY: a resumed march never recomputes
            # the distributed step-0 solves (structure via eval_shape).
            fp = march_fingerprint(problem.name, cfg, tcfg, tag)
            carry, iters = chunked_scan(
                chunk_fn, init_fn, ts_all, path=tcfg.checkpoint,
                chunk=tcfg.checkpoint_chunk, fingerprint=fp)
        else:
            carry, iters = chunk_fn(init_fn(), ts_all)
        uN, _, wN, _ = carry
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
        fem_local = uN.reshape(n_dev, nz_loc + 1, cfg.ny + 1, cfg.nx + 1)
        coeffs = (wN.reshape(cfg.nz, cfg.ny, cfg.nx, M, M, M)
                  if enhanced else None)
        return TransientSolution3D(
            xs, ys, zs, fem_local, coeffs, tcfg.t_final, jnp.max(iters))

    return run
