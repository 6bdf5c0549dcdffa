"""Distributed wave marches: Newmark-beta on y-slabs (2D) / z-slabs (3D)
for the scalar second-order family and for elastodynamics — the round-4
VERDICT's top gap (the longest-running jobs were the only ones outside
the core element-DP thesis, SURVEY.md 2.3 / reference
``Hybrid-FEM-LSSVR.py:151-176``).

Per step, every march does ONE distributed halo-CG solve of the
mass-dominated Newmark LHS (M + beta dt^2 K) for the acceleration —
Jacobi-preconditioned, as the single-device marches
(``models/transient.py::wave_march_2d`` etc.,
``models/elastic_wave.py``): the LHS is mass-dominated at practical dt,
so a V-cycle buys nothing — plus, for the enhanced variants, one batched
shared-LSE solve for the per-element acceleration POLYNOMIALS on this
slab's element rows, with the trace pinning transferred to the
acceleration: a_trace = (u_trace - pred_trace) / (beta dt^2).

The march state (u, v, a grids + (wu, wv, wa) coefficient triples) is a
carry that round-trips the jit boundary, so ``tcfg.checkpoint`` makes
every distributed wave march resumable through
``utils.checkpoint.chunked_scan`` (same architecture as
``parallel/transient2d.py``; bitwise kill-and-resume asserted in
tests/test_sharded_wave.py).

Scalar marches support ``trace_lift >= 2`` by computing the tangential
Lagrange lift on the GATHERED nodal grid (one all_gather of the tiny
grid per step, global windows, sliced per slab — the same route as
``parallel/sharded2d.py``).  The elastodynamics marches keep the
bilinear/trilinear vector trace, as ``parallel/sharded_elastic.py``.

== the single-device marches asserted in tests/test_sharded_wave.py.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.transient import (TransientConfig, TransientSolution2D,
                                TransientSolution3D, WaveProblem2D,
                                WaveProblem3D, _check_2d_dirichlet,
                                _check_3d_dirichlet, _locals_3d,
                                _mass_dl_b_2d, _mass_dl_b_3d,
                                _numerov_locals_2d)
from ..ops import assembly2d, assembly3d, cg, kkt
from ..utils.checkpoint import chunked_scan, march_fingerprint
from .sharded import ELEMENT_AXIS
from .sharded2d import _gather_grid, _halo_add
from .sharded3d import _gather_grid_3d, _halo_add_3d
from .sharded_elastic import _halo_vec, _halo_vec_3d

HI = jax.lax.Precision.HIGHEST


def _march(init_fn, chunk_fn, ts_all, tcfg, problem_name, cfg, tag):
    """Shared chunked-run plumbing: one dispatch when uncheckpointed,
    else ``chunked_scan`` over the compiled shard_map chunk.  ``init_fn``
    is passed LAZILY so a resumed march never recomputes the distributed
    step-0 solves (``chunked_scan`` recovers the carry structure via
    ``jax.eval_shape`` and loads the state from disk)."""
    if tcfg.checkpoint:
        fp = march_fingerprint(problem_name, cfg, tcfg, tag)
        return chunked_scan(chunk_fn, init_fn, ts_all,
                            path=tcfg.checkpoint,
                            chunk=tcfg.checkpoint_chunk, fingerprint=fp)
    return chunk_fn(init_fn(), ts_all)


# ---------------------------------------------------------------- scalar 2D


def make_sharded_wave_2d(problem: WaveProblem2D, cfg,
                         tcfg: TransientConfig, mesh,
                         axis: str = ELEMENT_AXIS, beta: float = 0.25,
                         gamma_n: float = 0.5, enhanced: bool = True,
                         trace_lift: int = 0):
    """Distributed 2D scalar Newmark march (module docstring).  Returns a
    zero-argument callable -> (TransientSolution2D with fem_values
    [n_dev, ny_loc+1, nx+1] slabs and, when ``enhanced``, coeffs
    [ny, nx, M, M], velocity slabs [n_dev, ny_loc+1, nx+1]).  Requires
    ny % n_devices == 0, all-Dirichlet edges, beta > 0 when enhanced."""
    p = problem.elliptic
    _check_2d_dirichlet(p)
    if enhanced and beta <= 0.0:
        raise ValueError("the enhanced march needs beta > 0 (trace "
                         "recovery divides by beta dt^2)")
    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(f"ny={cfg.ny} must divide by devices={n_dev}")
    ny_loc = cfg.ny // n_dev
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    dt = tcfg.t_final / tcfg.n_steps
    bdt2 = beta * dt * dt
    M, C = cfg.M, cfg.n_colloc
    if tcfg.mass == "numerov":
        if p.b != (0.0, 0.0):
            raise NotImplementedError("numerov mass requires b == 0")
        K_A_np, K_M_np = _numerov_locals_2d(hx, hy, p.a0, p.c)
        K_A = jnp.asarray(np.asarray(K_A_np), dtype)
        K_M = jnp.asarray(np.asarray(K_M_np), dtype)
    else:
        K_A = jnp.asarray(
            assembly2d.q1_local_operator(hx, hy, p.a0, p.c, *p.b), dtype)
        K_M = jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    K_lhs = K_M + bdt2 * K_A
    repl = jax.sharding.NamedSharding(mesh, P())
    if enhanced:
        Mass64, D_L64, B64, t_int, bpts = _mass_dl_b_2d(p, cfg)
        shared = jax.device_put(kkt.precompute_shared_lse_host(
            Mass64 + bdt2 * D_L64, B64, dtype), repl)
        proj = jax.device_put(kkt.precompute_shared_lse_host(
            Mass64, B64, dtype), repl)
        D_L = jax.device_put(jnp.asarray(D_L64, dtype), repl)
        Bj = jax.device_put(jnp.asarray(B64, dtype), repl)
        t_int_j = jax.device_put(jnp.asarray(t_int), repl)
        bpts_j = jax.device_put(jnp.asarray(bpts), repl)
    else:
        shared = proj = D_L = Bj = jnp.zeros((1,), dtype)
        t_int_j = bpts_j = jnp.zeros((1,), dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def _ctx(shared, proj, D_L, Bj, t_int, bpts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = y0 + hy * jnp.arange(cfg.ny + 1, dtype=dtype)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        nx1 = cfg.nx + 1
        g_row = row0 + jnp.arange(ny_loc + 1)
        row_int = (g_row > 0) & (g_row < cfg.ny)
        col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
        interior = row_int[:, None] & col_int[None, :]
        own = jnp.where((jnp.arange(ny_loc + 1) > 0) | (d == 0), 1.0,
                        0.0).astype(dtype)[:, None]
        X, Y = jnp.meshgrid(xs, ys_loc)
        u_bc = jnp.where(interior, 0.0, p.g(X, Y) * jnp.ones_like(X))

        def halo(v):
            return _halo_add(v, d, n_dev, axis)

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), axis)

        def free_solve(K, rhs):
            def apply_free(v):
                return jnp.where(
                    interior,
                    halo(assembly2d.apply_stiffness(v * interior, K)),
                    0.0)

            diag = halo(assembly2d.stiffness_diag((ny_loc + 1, nx1), K,
                                                  dtype))
            M_inv = jnp.where(interior, 1.0 / diag, 1.0)
            res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                        M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter,
                        dot_fn=dist_dot)
            return jnp.where(interior, res.x, 0.0), res.iters

        if tcfg.mass == "numerov":
            def load_at(t):
                return halo(assembly2d.apply_stiffness(
                    problem.f(X, Y, t) * jnp.ones_like(X), K_M))
        else:
            def load_at(t):
                return halo(assembly2d.assemble_load(
                    xs, ys_loc, lambda x, y: problem.f(x, y, t)))

        def apply_KA(u):
            return halo(assembly2d.apply_stiffness(u, K_A))

        if enhanced:
            from ..models.hybrid2d import (_element_data_2d,
                                           _lifted_trace_2d)

            t_j = jnp.asarray(t_int, dtype)
            xm = 0.5 * (xs[1:] + xs[:-1])
            ym = 0.5 * (ys_loc[1:] + ys_loc[:-1])
            xq = xm[:, None] + 0.5 * hx * t_j[None, :]
            yq = ym[:, None] + 0.5 * hy * t_j[None, :]
            E_loc = cfg.nx * ny_loc
            ones4 = jnp.ones((ny_loc, cfg.nx, C, C), dtype)

            def grid_rows(fn, *a):
                return (fn(xq[None, :, None, :], yq[:, None, :, None],
                           *a) * ones4).reshape(E_loc, C * C)

            def f_rows_at(t):
                return grid_rows(problem.f, t)

            def bc_of(u_slab, prob):
                trace_rows = None
                if trace_lift >= 2:
                    fem_full = _gather_grid(u_slab, n_dev, axis)
                    tr = _lifted_trace_2d(
                        fem_full, M, cfg.nx, cfg.ny, stencil=trace_lift
                    ).reshape(cfg.ny, cfg.nx, -1)
                    trace_rows = jax.lax.dynamic_slice(
                        tr, (row0, jnp.zeros_like(row0),
                             jnp.zeros_like(row0)),
                        (ny_loc, cfg.nx, tr.shape[-1]))
                _, bc, _ = _element_data_2d(
                    prob, cfg, xs, ys_loc, u_slab, t_int, bpts,
                    row_offset=row0, trace_rows=trace_rows, skip_f=True)
                return bc

            p0 = dataclasses.replace(
                p, g=lambda x, y: jnp.zeros_like(x + y))

        def scan_step(carry, t):
            u, v, a, wu, wv, wa = carry
            pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
            rhs = load_at(t + dt) - apply_KA(pred)
            a1, iters = free_solve(K_lhs, rhs)
            u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
            v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
            if enhanced:
                w_pred = wu + dt * wv \
                    + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
                f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_L.T,
                                                     precision=HI)
                bc_a = (bc_of(u1, p)
                        - jnp.dot(w_pred, Bj.T, precision=HI)) / bdt2
                wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
                wu1 = w_pred + bdt2 * wa1
                wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
            else:
                wu1, wv1, wa1 = wu, wv, wa
            return (u1, v1, a1, wu1, wv1, wa1), iters

        def init_carry():
            u0g = jnp.where(interior,
                            problem.u0(X, Y) * jnp.ones_like(X), u_bc
                            ).astype(dtype)
            v0g = jnp.where(interior,
                            problem.v0(X, Y) * jnp.ones_like(X), 0.0
                            ).astype(dtype)
            rhs0 = load_at(jnp.asarray(0.0, dtype)) - apply_KA(u0g)
            a0g, _ = free_solve(K_M, rhs0)
            if enhanced:
                F0u = grid_rows(problem.u0)
                F0v = grid_rows(problem.v0)
                wu0, _ = kkt.solve_primal_shared(proj, F0u,
                                                 bc_of(u0g, p))
                wv0, _ = kkt.solve_primal_shared(proj, F0v,
                                                 bc_of(v0g, p0))
                fa0 = f_rows_at(jnp.asarray(0.0, dtype)) \
                    - jnp.dot(wu0, D_L.T, precision=HI)
                wa0, _ = kkt.solve_primal_shared(proj, fa0,
                                                 bc_of(a0g, p0))
            else:
                wu0 = wv0 = wa0 = jnp.zeros((1,), dtype)
            return u0g, v0g, a0g, wu0, wv0, wa0

        return scan_step, init_carry

    def local_init(shared, proj, D_L, Bj, t_int, bpts):
        _, init_carry = _ctx(shared, proj, D_L, Bj, t_int, bpts)
        return init_carry()

    def local_chunk(shared, proj, D_L, Bj, t_int, bpts,
                    u, v, a, wu, wv, wa, ts):
        scan_step, _ = _ctx(shared, proj, D_L, Bj, t_int, bpts)
        carry, iters = jax.lax.scan(scan_step, (u, v, a, wu, wv, wa), ts)
        return carry + (iters[:, None],)

    op_specs = (P(),) * 6
    carry_specs = (P(axis),) * 6
    sharded_init = jax.shard_map(local_init, mesh=mesh, in_specs=op_specs,
                                 out_specs=carry_specs, check_vma=False)
    sharded_chunk = jax.shard_map(
        local_chunk, mesh=mesh, in_specs=op_specs + carry_specs + (P(),),
        out_specs=carry_specs + (P(None, axis),), check_vma=False)

    @jax.jit
    def init_fn():
        return sharded_init(shared, proj, D_L, Bj, t_int_j, bpts_j)

    @jax.jit
    def chunk_fn(carry, ts):
        out = sharded_chunk(shared, proj, D_L, Bj, t_int_j, bpts_j,
                            *carry, ts)
        return out[:6], out[6]

    ts_all = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    tag = f"sharded_wave_2d_{'enh' if enhanced else 'fem'}_{trace_lift}"

    def run():
        carry, iters = _march(init_fn, chunk_fn, ts_all, tcfg,
                              problem.name, cfg, tag)
        uN, vN, _, wuN, _, _ = carry
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        fem_local = uN.reshape(n_dev, ny_loc + 1, cfg.nx + 1)
        v_local = vN.reshape(n_dev, ny_loc + 1, cfg.nx + 1)
        coeffs = (wuN.reshape(cfg.ny, cfg.nx, M, M) if enhanced else None)
        return TransientSolution2D(
            xs, ys, fem_local, coeffs, tcfg.t_final,
            jnp.max(iters)), v_local

    return run


# ---------------------------------------------------------------- scalar 3D


def make_sharded_wave_3d(problem: WaveProblem3D, cfg,
                         tcfg: TransientConfig, mesh,
                         axis: str = ELEMENT_AXIS, beta: float = 0.25,
                         gamma_n: float = 0.5, enhanced: bool = True,
                         trace_lift: int = 0):
    """Distributed 3D scalar Newmark march on z-slabs (the tensor lift of
    ``make_sharded_wave_2d``).  Requires nz % n_devices == 0."""
    p = problem.elliptic
    _check_3d_dirichlet(p)
    if enhanced and beta <= 0.0:
        raise ValueError("the enhanced march needs beta > 0 (trace "
                         "recovery divides by beta dt^2)")
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
    bdt2 = beta * dt * dt
    M, C = cfg.M, cfg.n_colloc
    K_A_np, K_M_np = _locals_3d(hx, hy, hz, p, tcfg.mass)
    K_A = jnp.asarray(K_A_np, dtype)
    K_M = jnp.asarray(K_M_np, dtype)
    K_lhs = K_M + bdt2 * K_A
    repl = jax.sharding.NamedSharding(mesh, P())
    if enhanced:
        Mass64, D_L64, B64, t_int, spts = _mass_dl_b_3d(p, cfg)
        shared = jax.device_put(kkt.precompute_shared_lse_host(
            Mass64 + bdt2 * D_L64, B64, dtype), repl)
        proj = jax.device_put(kkt.precompute_shared_lse_host(
            Mass64, B64, dtype), repl)
        D_L = jax.device_put(jnp.asarray(D_L64, dtype), repl)
        Bj = jax.device_put(jnp.asarray(B64, dtype), repl)
        t_int_j = jax.device_put(jnp.asarray(t_int), repl)
        spts_j = jax.device_put(jnp.asarray(spts), repl)
    else:
        shared = proj = D_L = Bj = jnp.zeros((1,), dtype)
        t_int_j = spts_j = jnp.zeros((1,), dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def _ctx(shared, proj, D_L, Bj, t_int, spts):
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

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own), axis)

        def free_solve(K, rhs):
            def apply_free(v):
                return jnp.where(
                    interior,
                    halo(assembly3d.apply_stiffness_3d(v * interior,
                                                       K)), 0.0)

            diag = halo(assembly3d.stiffness_diag_3d(
                (nz_loc + 1, ny1, nx1), K, dtype))
            M_inv = jnp.where(interior, 1.0 / diag, 1.0)
            res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                        M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter,
                        dot_fn=dist_dot)
            return jnp.where(interior, res.x, 0.0), res.iters

        if tcfg.mass == "numerov":
            def load_at(t):
                return halo(assembly3d.apply_stiffness_3d(
                    problem.f(X, Y, Z, t) * ones, K_M))
        else:
            def load_at(t):
                return halo(assembly3d.assemble_load_3d(
                    xs, ys, zs_loc,
                    lambda x, y, z: problem.f(x, y, z, t)))

        def apply_KA(u):
            return halo(assembly3d.apply_stiffness_3d(u, K_A))

        if enhanced:
            from ..models.hybrid3d import (_element_data_3d,
                                           _lifted_trace_3d)

            t_j = jnp.asarray(t_int, dtype)
            xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
            yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
            zq = zs_loc[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
            E_loc = cfg.nx * cfg.ny * nz_loc
            ones6 = jnp.ones((nz_loc, cfg.ny, cfg.nx, C, C, C), dtype)

            def grid_rows(fn, *a):
                return (fn(xq[None, None, :, None, None, :],
                           yq[None, :, None, None, :, None],
                           zq[:, None, None, :, None, None], *a)
                        * ones6).reshape(E_loc, C * C * C)

            def f_rows_at(t):
                return grid_rows(problem.f, t)

            def bc_of(u_slab, prob):
                trace_rows = None
                if trace_lift >= 2:
                    fem_full = _gather_grid_3d(u_slab, n_dev, axis)
                    tr = _lifted_trace_3d(
                        fem_full, M, cfg.nx, cfg.ny, cfg.nz,
                        stencil=trace_lift,
                    ).reshape(cfg.nz, cfg.ny, cfg.nx, -1)
                    z00 = jnp.zeros_like(lay0)
                    trace_rows = jax.lax.dynamic_slice(
                        tr, (lay0, z00, z00, z00),
                        (nz_loc, cfg.ny, cfg.nx, tr.shape[-1]))
                _, bc, _ = _element_data_3d(
                    prob, cfg, xs, ys, zs_loc, u_slab, t_int, spts,
                    layer_offset=lay0, trace_rows=trace_rows,
                    skip_f=True)
                return bc

            p0 = dataclasses.replace(
                p, g=lambda x, y, z: jnp.zeros_like(x + y + z))

        def scan_step(carry, t):
            u, v, a, wu, wv, wa = carry
            pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
            rhs = load_at(t + dt) - apply_KA(pred)
            a1, iters = free_solve(K_lhs, rhs)
            u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
            v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
            if enhanced:
                w_pred = wu + dt * wv \
                    + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
                f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_L.T,
                                                     precision=HI)
                bc_a = (bc_of(u1, p)
                        - jnp.dot(w_pred, Bj.T, precision=HI)) / bdt2
                wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
                wu1 = w_pred + bdt2 * wa1
                wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
            else:
                wu1, wv1, wa1 = wu, wv, wa
            return (u1, v1, a1, wu1, wv1, wa1), iters

        def init_carry():
            u0g = jnp.where(interior, problem.u0(X, Y, Z) * ones, u_bc
                            ).astype(dtype)
            v0g = jnp.where(interior, problem.v0(X, Y, Z) * ones, 0.0
                            ).astype(dtype)
            rhs0 = load_at(jnp.asarray(0.0, dtype)) - apply_KA(u0g)
            a0g, _ = free_solve(K_M, rhs0)
            if enhanced:
                F0u = grid_rows(problem.u0)
                F0v = grid_rows(problem.v0)
                wu0, _ = kkt.solve_primal_shared(proj, F0u,
                                                 bc_of(u0g, p))
                wv0, _ = kkt.solve_primal_shared(proj, F0v,
                                                 bc_of(v0g, p0))
                fa0 = f_rows_at(jnp.asarray(0.0, dtype)) \
                    - jnp.dot(wu0, D_L.T, precision=HI)
                wa0, _ = kkt.solve_primal_shared(proj, fa0,
                                                 bc_of(a0g, p0))
            else:
                wu0 = wv0 = wa0 = jnp.zeros((1,), dtype)
            return u0g, v0g, a0g, wu0, wv0, wa0

        return scan_step, init_carry

    def local_init(shared, proj, D_L, Bj, t_int, spts):
        _, init_carry = _ctx(shared, proj, D_L, Bj, t_int, spts)
        return init_carry()

    def local_chunk(shared, proj, D_L, Bj, t_int, spts,
                    u, v, a, wu, wv, wa, ts):
        scan_step, _ = _ctx(shared, proj, D_L, Bj, t_int, spts)
        carry, iters = jax.lax.scan(scan_step, (u, v, a, wu, wv, wa), ts)
        return carry + (iters[:, None],)

    op_specs = (P(),) * 6
    carry_specs = (P(axis),) * 6
    sharded_init = jax.shard_map(local_init, mesh=mesh, in_specs=op_specs,
                                 out_specs=carry_specs, check_vma=False)
    sharded_chunk = jax.shard_map(
        local_chunk, mesh=mesh, in_specs=op_specs + carry_specs + (P(),),
        out_specs=carry_specs + (P(None, axis),), check_vma=False)

    @jax.jit
    def init_fn():
        return sharded_init(shared, proj, D_L, Bj, t_int_j, spts_j)

    @jax.jit
    def chunk_fn(carry, ts):
        out = sharded_chunk(shared, proj, D_L, Bj, t_int_j, spts_j,
                            *carry, ts)
        return out[:6], out[6]

    ts_all = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    tag = f"sharded_wave_3d_{'enh' if enhanced else 'fem'}_{trace_lift}"

    def run():
        carry, iters = _march(init_fn, chunk_fn, ts_all, tcfg,
                              problem.name, cfg, tag)
        uN, vN, _, wuN, _, _ = carry
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)
        shp = (n_dev, nz_loc + 1, cfg.ny + 1, cfg.nx + 1)
        coeffs = (wuN.reshape(cfg.nz, cfg.ny, cfg.nx, M, M, M)
                  if enhanced else None)
        return TransientSolution3D(
            xs, ys, zs, uN.reshape(shp), coeffs, tcfg.t_final,
            jnp.max(iters)), vN.reshape(shp)

    return run


# -------------------------------------------------------- elastodynamics 2D


class ShardedElasticWaveSolution2D(NamedTuple):
    """Distributed elastodynamics result: slab-stacked grids (layout
    matches ``ShardedElasticSolution2D.fem_local``) + the energy
    conservation diagnostic, psum-assembled."""

    xs: jnp.ndarray
    ys: jnp.ndarray
    fem_local: jnp.ndarray  # [n_dev, 2, ny_loc+1, nx+1] at t_final
    velocity_local: jnp.ndarray  # same layout
    coeffs: Optional[jnp.ndarray]  # [2, ny, nx, M, M]
    t_final: float
    cg_iters: jnp.ndarray
    energy0: jnp.ndarray
    energyN: jnp.ndarray
    lam: float = 1.0
    mu: float = 1.0

    def assemble_fem_grid(self, which: str = "u"):
        src = self.fem_local if which == "u" else self.velocity_local
        n_dev, _, nloc1, nx1 = src.shape
        ny_loc = nloc1 - 1
        fl = np.asarray(src)
        grid = np.zeros((2, n_dev * ny_loc + 1, nx1), fl.dtype)
        for dd in range(n_dev):
            grid[:, dd * ny_loc:(dd + 1) * ny_loc + 1] = fl[dd]
        return grid


def make_sharded_elastic_wave_2d(problem, cfg, tcfg: TransientConfig,
                                 mesh, axis: str = ELEMENT_AXIS,
                                 beta: float = 0.25,
                                 gamma_n: float = 0.5,
                                 enhanced: bool = True):
    """Distributed 2D elastodynamics Newmark march on y-slabs: per step
    one distributed block CG of (M_rho + beta dt^2 K) — component-wise
    halo exchange (``sharded_elastic._halo_vec``), Jacobi precond (the
    LHS is mass-dominated; ``elastic_wave._march_pieces`` rationale) —
    plus, when ``enhanced``, one coupled block-LSE solve for the vector
    acceleration coefficients on this slab's element rows.
    ``problem`` is an ``ElasticWaveProblem2D``; single-device oracle:
    ``models/elastic_wave.py``.  Requires ny % n_devices == 0, beta > 0
    when enhanced, cfg.precond != 'mg', cfg.coarse == 'q1',
    cfg.trace_lift == 0 (vector lift windows need whole grid lines —
    same refusal as ``sharded_elastic``)."""
    from ..models.elastic import (_block_colloc_host, _block_locals,
                                  _component_problem)
    from ..models.hybrid2d import _element_data_2d

    p = problem.elastic
    if enhanced and beta <= 0.0:
        raise ValueError("the enhanced march needs beta > 0 (trace "
                         "recovery divides by beta dt^2)")
    if cfg.precond == "mg":
        raise ValueError(
            "the elastodynamics marches use Jacobi-preconditioned CG "
            "(mass-dominated Newmark LHS); precond='mg' is not supported")
    if cfg.coarse != "q1":
        raise ValueError("the elastodynamics marches run the q1 block "
                         "coarse stage per step")
    if cfg.trace_lift:
        raise NotImplementedError(
            "the sharded elastodynamics march keeps the bilinear vector "
            "trace (lift windows need whole grid lines); run trace_lift "
            "on the single-device hybrid_elastic_wave_march_2d")
    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(f"ny={cfg.ny} must divide by devices={n_dev}")
    ny_loc = cfg.ny // n_dev
    dtype = cfg.jnp_dtype()
    x0, x1, y0, y1 = p.domain
    hx = float((x1 - x0) / cfg.nx)
    hy = float((y1 - y0) / cfg.ny)
    dt = tcfg.t_final / tcfg.n_steps
    bdt2 = beta * dt * dt
    M, C = cfg.M, cfg.n_colloc
    rho = problem.rho
    A11, A12, A22 = _block_locals(p, hx, hy, dtype)
    Ms = rho * jnp.asarray(assembly2d.q1_local_mass(hx, hy), dtype)
    repl = jax.sharding.NamedSharding(mesh, P())
    if enhanced:
        D64, B64, Mass_s64, t_int, bpts = _block_colloc_host(p, cfg)
        Mass_blk = np.kron(np.eye(2), Mass_s64)
        shared = jax.device_put(kkt.precompute_shared_lse_host(
            rho * Mass_blk + bdt2 * D64, B64, dtype), repl)
        proj = jax.device_put(kkt.precompute_shared_lse_host(
            Mass_blk, B64, dtype), repl)
        D_j = jax.device_put(jnp.asarray(D64, dtype), repl)
        B_j = jax.device_put(jnp.asarray(B64, dtype), repl)
        t_int_j = jax.device_put(jnp.asarray(t_int), repl)
        bpts_j = jax.device_put(jnp.asarray(bpts), repl)
    else:
        shared = proj = D_j = B_j = jnp.zeros((1,), dtype)
        t_int_j = bpts_j = jnp.zeros((1,), dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def _ctx(shared, proj, D_j, B_j, t_int, bpts):
        d = jax.lax.axis_index(axis)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = y0 + hy * jnp.arange(cfg.ny + 1, dtype=dtype)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        nx1 = cfg.nx + 1
        g_row = row0 + jnp.arange(ny_loc + 1)
        row_int = (g_row > 0) & (g_row < cfg.ny)
        col_int = jnp.zeros(nx1, bool).at[1:-1].set(True)
        interior = row_int[:, None] & col_int[None, :]
        own = jnp.where((jnp.arange(ny_loc + 1) > 0) | (d == 0), 1.0,
                        0.0).astype(dtype)[:, None]
        X, Y = jnp.meshgrid(xs, ys_loc)
        u_bc = jnp.stack([
            jnp.where(interior, 0.0, p.g1(X, Y) * jnp.ones_like(X)),
            jnp.where(interior, 0.0, p.g2(X, Y) * jnp.ones_like(X)),
        ])

        def apply_K_local(u):
            r1 = (assembly2d.apply_stiffness(u[0], A11)
                  + assembly2d.apply_stiffness(u[1], A12))
            r2 = (assembly2d.apply_stiffness(u[0], A12.T)
                  + assembly2d.apply_stiffness(u[1], A22))
            return jnp.stack([r1, r2])

        def apply_M_local(u):
            return jnp.stack([assembly2d.apply_stiffness(u[0], Ms),
                              assembly2d.apply_stiffness(u[1], Ms)])

        def halo(v):
            return _halo_vec(v, d, n_dev, axis)

        def apply_K(u):
            return halo(apply_K_local(u))

        def apply_M(u):
            return halo(apply_M_local(u))

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own[None]), axis)

        shape = (ny_loc + 1, nx1)
        m_diag = halo(jnp.stack(
            [assembly2d.stiffness_diag(shape, Ms, dtype)] * 2))
        k_diag = halo(jnp.stack([
            assembly2d.stiffness_diag(shape, A11, dtype),
            assembly2d.stiffness_diag(shape, A22, dtype)]))

        def make_free_solve(apply_full, diag):
            def apply_free(v):
                return jnp.where(interior, apply_full(v * interior), 0.0)

            M_inv = jnp.where(interior, 1.0 / diag, 1.0)

            def free_solve(rhs):
                res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                            M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter,
                            dot_fn=dist_dot)
                return jnp.where(interior, res.x, 0.0), res.iters

            return free_solve

        solve_lhs = make_free_solve(
            lambda u: apply_M(u) + bdt2 * apply_K(u),
            m_diag + bdt2 * k_diag)
        solve_mass = make_free_solve(apply_M, m_diag)

        def load_at(t):
            return halo(jnp.stack([
                assembly2d.assemble_load(
                    xs, ys_loc, lambda x, y: problem.f1(x, y, t)),
                assembly2d.assemble_load(
                    xs, ys_loc, lambda x, y: problem.f2(x, y, t)),
            ]))

        def energy(u, v):
            """Distributed 1/2 v^T M v + 1/2 ud^T K ud + coupling term
            (``elastic_wave._energy`` with own-masked psum dots)."""
            ud = u - u_bc
            return 0.5 * (dist_dot(v, apply_M(v))
                          + dist_dot(ud, apply_K(ud))
                          + 2.0 * dist_dot(ud, apply_K(u_bc)))

        if enhanced:
            t_j = jnp.asarray(t_int, dtype)
            xq = 0.5 * (xs[1:] + xs[:-1])[:, None] \
                + 0.5 * hx * t_j[None, :]
            yq = 0.5 * (ys_loc[1:] + ys_loc[:-1])[:, None] \
                + 0.5 * hy * t_j[None, :]
            E_loc = cfg.nx * ny_loc
            ones4 = jnp.ones((ny_loc, cfg.nx, C, C), dtype)

            def grid_rows(fn, *a):
                return (fn(xq[None, :, None, :], yq[:, None, :, None],
                           *a) * ones4).reshape(E_loc, C * C)

            def f_rows_at(t):
                return jnp.concatenate([grid_rows(problem.f1, t),
                                        grid_rows(problem.f2, t)],
                                       axis=1)

            comp_p = [_component_problem(p, c) for c in range(2)]
            comp_p0 = [dataclasses.replace(
                q, g=lambda x, y: jnp.zeros_like(x + y)) for q in comp_p]

            def traces(u, probs):
                rows = [_element_data_2d(probs[c], cfg, xs, ys_loc,
                                         u[c], t_int, bpts,
                                         row_offset=row0,
                                         skip_f=True)[1]
                        for c in range(2)]
                return jnp.concatenate(rows, axis=1)

        def scan_step(carry, t):
            u, v, a, wu, wv, wa = carry
            pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
            a1, iters = solve_lhs(load_at(t + dt) - apply_K(pred))
            u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
            v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
            if enhanced:
                w_pred = wu + dt * wv \
                    + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
                f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_j.T,
                                                     precision=HI)
                bc_a = (traces(u1, comp_p)
                        - jnp.dot(w_pred, B_j.T, precision=HI)) / bdt2
                wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
                wu1 = w_pred + bdt2 * wa1
                wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
            else:
                wu1, wv1, wa1 = wu, wv, wa
            return (u1, v1, a1, wu1, wv1, wa1), iters

        def init_carry():
            u0g = u_bc + jnp.where(interior, jnp.stack([
                problem.u01(X, Y) * jnp.ones_like(X),
                problem.u02(X, Y) * jnp.ones_like(X)]), 0.0
            ).astype(dtype)
            v0g = jnp.where(interior, jnp.stack([
                problem.v01(X, Y) * jnp.ones_like(X),
                problem.v02(X, Y) * jnp.ones_like(X)]), 0.0
            ).astype(dtype)
            a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype))
                                - apply_K(u0g))
            if enhanced:
                u0_rows = jnp.concatenate([grid_rows(problem.u01),
                                           grid_rows(problem.u02)],
                                          axis=1)
                v0_rows = jnp.concatenate([grid_rows(problem.v01),
                                           grid_rows(problem.v02)],
                                          axis=1)
                wu0, _ = kkt.solve_primal_shared(proj, u0_rows,
                                                 traces(u0g, comp_p))
                wv0, _ = kkt.solve_primal_shared(proj, v0_rows,
                                                 traces(v0g, comp_p0))
                fa0 = (f_rows_at(jnp.asarray(0.0, dtype))
                       - jnp.dot(wu0, D_j.T, precision=HI)) / rho
                wa0, _ = kkt.solve_primal_shared(proj, fa0,
                                                 traces(a0g, comp_p0))
            else:
                wu0 = wv0 = wa0 = jnp.zeros((1,), dtype)
            return u0g, v0g, a0g, wu0, wv0, wa0

        return scan_step, init_carry, energy

    def local_init(shared, proj, D_j, B_j, t_int, bpts):
        _, init_carry, _ = _ctx(shared, proj, D_j, B_j, t_int, bpts)
        return init_carry()

    def local_chunk(shared, proj, D_j, B_j, t_int, bpts,
                    u, v, a, wu, wv, wa, ts):
        scan_step, _, _ = _ctx(shared, proj, D_j, B_j, t_int, bpts)
        carry, iters = jax.lax.scan(scan_step, (u, v, a, wu, wv, wa), ts)
        return carry + (iters[:, None],)

    def local_energy(shared, proj, D_j, B_j, t_int, bpts, u, v):
        _, _, energy = _ctx(shared, proj, D_j, B_j, t_int, bpts)
        return energy(u, v)

    op_specs = (P(),) * 6
    grid_spec = P(None, axis)  # component axis replicated, rows sharded
    carry_specs = (grid_spec,) * 3 + (P(axis),) * 3
    sharded_init = jax.shard_map(local_init, mesh=mesh, in_specs=op_specs,
                                 out_specs=carry_specs, check_vma=False)
    sharded_chunk = jax.shard_map(
        local_chunk, mesh=mesh, in_specs=op_specs + carry_specs + (P(),),
        out_specs=carry_specs + (P(None, axis),), check_vma=False)
    sharded_energy = jax.shard_map(
        local_energy, mesh=mesh,
        in_specs=op_specs + (grid_spec, grid_spec), out_specs=P(),
        check_vma=False)

    def _ops():
        return (shared, proj, D_j, B_j, t_int_j, bpts_j)

    @jax.jit
    def init_fn():
        return sharded_init(*_ops())

    @jax.jit
    def chunk_fn(carry, ts):
        out = sharded_chunk(*_ops(), *carry, ts)
        return out[:6], out[6]

    @jax.jit
    def energy_fn(u, v):
        return sharded_energy(*_ops(), u, v)

    ts_all = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    tag = f"sharded_elastic_wave_2d_{'enh' if enhanced else 'fem'}"

    def run():
        carry0 = init_fn()
        e0 = energy_fn(carry0[0], carry0[1])
        if tcfg.checkpoint:
            fp = march_fingerprint(problem.name, cfg, tcfg, tag)
            carry, iters = chunked_scan(
                chunk_fn, carry0, ts_all, path=tcfg.checkpoint,
                chunk=tcfg.checkpoint_chunk, fingerprint=fp)
        else:
            carry, iters = chunk_fn(carry0, ts_all)
        uN, vN, _, wuN, _, _ = carry
        eN = energy_fn(uN, vN)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)

        def slabs(g):
            return g.reshape(2, n_dev, ny_loc + 1, cfg.nx + 1
                             ).swapaxes(0, 1)

        coeffs = None
        if enhanced:
            M2 = M * M
            coeffs = jnp.stack([
                wuN[:, :M2].reshape(cfg.ny, cfg.nx, M, M),
                wuN[:, M2:].reshape(cfg.ny, cfg.nx, M, M)])
        return ShardedElasticWaveSolution2D(
            xs=xs, ys=ys, fem_local=slabs(uN),
            velocity_local=slabs(vN), coeffs=coeffs,
            t_final=tcfg.t_final, cg_iters=jnp.max(iters),
            energy0=e0, energyN=eN, lam=p.lam, mu=p.mu)

    return run


# -------------------------------------------------------- elastodynamics 3D


class ShardedElasticWaveSolution3D(NamedTuple):
    xs: jnp.ndarray
    ys: jnp.ndarray
    zs: jnp.ndarray
    fem_local: jnp.ndarray  # [n_dev, 3, nz_loc+1, ny+1, nx+1]
    velocity_local: jnp.ndarray
    coeffs: Optional[jnp.ndarray]  # [3, nz, ny, nx, M, M, M]
    t_final: float
    cg_iters: jnp.ndarray
    energy0: jnp.ndarray
    energyN: jnp.ndarray
    lam: float = 1.0
    mu: float = 1.0


def make_sharded_elastic_wave_3d(problem, cfg, tcfg: TransientConfig,
                                 mesh, axis: str = ELEMENT_AXIS,
                                 beta: float = 0.25,
                                 gamma_n: float = 0.5,
                                 enhanced: bool = True):
    """Distributed 3D elastodynamics Newmark march on z-slabs: the
    nine-block hex operator (``elastic3d._block_locals_3d``) with
    plane-halo exchange per component; otherwise the exact mirror of
    ``make_sharded_elastic_wave_2d``.  Single-device oracle:
    ``elastic_wave.hybrid_elastic_wave_march_3d``."""
    from ..models.elastic3d import (_block_colloc_host_3d,
                                    _block_locals_3d,
                                    _component_problem_3d)
    from ..models.hybrid3d import _element_data_3d

    p = problem.elastic
    if enhanced and beta <= 0.0:
        raise ValueError("the enhanced march needs beta > 0 (trace "
                         "recovery divides by beta dt^2)")
    if cfg.precond == "mg":
        raise ValueError(
            "the elastodynamics marches use Jacobi-preconditioned CG "
            "(mass-dominated Newmark LHS); precond='mg' is not supported")
    if cfg.coarse != "q1":
        raise ValueError("the elastodynamics marches run the q1 block "
                         "coarse stage per step")
    if cfg.trace_lift:
        raise NotImplementedError(
            "the sharded elastodynamics march keeps the trilinear vector "
            "trace; run trace_lift on the single-device march")
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
    bdt2 = beta * dt * dt
    M, C = cfg.M, cfg.n_colloc
    rho = problem.rho
    diag_loc, off_loc = _block_locals_3d(p, hx, hy, hz, dtype)
    Ms = rho * jnp.asarray(
        assembly3d.q1_local_operator_3d(hx, hy, hz, a0=0.0, c=1.0), dtype)
    A = assembly3d.apply_stiffness_3d
    Axy, Axz, Ayz = off_loc["xy"], off_loc["xz"], off_loc["yz"]
    repl = jax.sharding.NamedSharding(mesh, P())
    if enhanced:
        D64, B64, Mass_s64, t_int, spts = _block_colloc_host_3d(p, cfg)
        Mass_blk = np.kron(np.eye(3), Mass_s64)
        shared = jax.device_put(kkt.precompute_shared_lse_host(
            rho * Mass_blk + bdt2 * D64, B64, dtype), repl)
        proj = jax.device_put(kkt.precompute_shared_lse_host(
            Mass_blk, B64, dtype), repl)
        D_j = jax.device_put(jnp.asarray(D64, dtype), repl)
        B_j = jax.device_put(jnp.asarray(B64, dtype), repl)
        t_int_j = jax.device_put(jnp.asarray(t_int), repl)
        spts_j = jax.device_put(jnp.asarray(spts), repl)
    else:
        shared = proj = D_j = B_j = jnp.zeros((1,), dtype)
        t_int_j = spts_j = jnp.zeros((1,), dtype)
    tol = cfg.cg_tol
    if tol is None:
        tol = 100.0 * float(jnp.finfo(dtype).eps)

    def _ctx(shared, proj, D_j, B_j, t_int, spts):
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
        u_bc = jnp.stack([jnp.where(interior, 0.0, gc(X, Y, Z) * ones)
                          for gc in p.g])

        def apply_K_local(u):
            r1 = A(u[0], diag_loc["x"]) + A(u[1], Axy) + A(u[2], Axz)
            r2 = A(u[0], Axy.T) + A(u[1], diag_loc["y"]) + A(u[2], Ayz)
            r3 = A(u[0], Axz.T) + A(u[1], Ayz.T) + A(u[2], diag_loc["z"])
            return jnp.stack([r1, r2, r3])

        def apply_M_local(u):
            return jnp.stack([A(u[c], Ms) for c in range(3)])

        def halo(v):
            return _halo_vec_3d(v, d, n_dev, axis)

        def apply_K(u):
            return halo(apply_K_local(u))

        def apply_M(u):
            return halo(apply_M_local(u))

        def dist_dot(u, v):
            return jax.lax.psum(jnp.sum(u * v * own[None]), axis)

        shape = (nz_loc + 1, ny1, nx1)
        m_diag = halo(jnp.stack(
            [assembly3d.stiffness_diag_3d(shape, Ms, dtype)] * 3))
        k_diag = halo(jnp.stack([
            assembly3d.stiffness_diag_3d(shape, diag_loc[dd], dtype)
            for dd in ("x", "y", "z")]))

        def make_free_solve(apply_full, diag):
            def apply_free(v):
                return jnp.where(interior, apply_full(v * interior), 0.0)

            M_inv = jnp.where(interior, 1.0 / diag, 1.0)

            def free_solve(rhs):
                res = cg.cg(apply_free, jnp.where(interior, rhs, 0.0),
                            M_inv=M_inv, tol=tol, maxiter=cfg.cg_maxiter,
                            dot_fn=dist_dot)
                return jnp.where(interior, res.x, 0.0), res.iters

            return free_solve

        solve_lhs = make_free_solve(
            lambda u: apply_M(u) + bdt2 * apply_K(u),
            m_diag + bdt2 * k_diag)
        solve_mass = make_free_solve(apply_M, m_diag)

        def load_at(t):
            return halo(jnp.stack([
                assembly3d.assemble_load_3d(
                    xs, ys, zs_loc,
                    lambda x, y, z, fc=fc: fc(x, y, z, t))
                for fc in problem.f]))

        def energy(u, v):
            ud = u - u_bc
            return 0.5 * (dist_dot(v, apply_M(v))
                          + dist_dot(ud, apply_K(ud))
                          + 2.0 * dist_dot(ud, apply_K(u_bc)))

        if enhanced:
            t_j = jnp.asarray(t_int, dtype)
            xq = xs[:-1][:, None] + 0.5 * hx * (t_j[None, :] + 1.0)
            yq = ys[:-1][:, None] + 0.5 * hy * (t_j[None, :] + 1.0)
            zq = zs_loc[:-1][:, None] + 0.5 * hz * (t_j[None, :] + 1.0)
            E_loc = cfg.nx * cfg.ny * nz_loc
            ones6 = jnp.ones((nz_loc, cfg.ny, cfg.nx, C, C, C), dtype)

            def grid_rows(fn, *a):
                return (fn(xq[None, None, :, None, None, :],
                           yq[None, :, None, None, :, None],
                           zq[:, None, None, :, None, None], *a)
                        * ones6).reshape(E_loc, C * C * C)

            def f_rows_at(t):
                return jnp.concatenate(
                    [grid_rows(fc, t) for fc in problem.f], axis=1)

            comp_p = [_component_problem_3d(p, c) for c in range(3)]
            comp_p0 = [dataclasses.replace(
                q, g=lambda x, y, z: jnp.zeros_like(x + y + z))
                for q in comp_p]

            def traces(u, probs):
                rows = [_element_data_3d(probs[c], cfg, xs, ys, zs_loc,
                                         u[c], t_int, spts,
                                         layer_offset=lay0,
                                         skip_f=True)[1]
                        for c in range(3)]
                return jnp.concatenate(rows, axis=1)

        def scan_step(carry, t):
            u, v, a, wu, wv, wa = carry
            pred = u + dt * v + 0.5 * dt * dt * (1.0 - 2.0 * beta) * a
            a1, iters = solve_lhs(load_at(t + dt) - apply_K(pred))
            u1 = u_bc + jnp.where(interior, pred + bdt2 * a1, 0.0)
            v1 = v + dt * ((1.0 - gamma_n) * a + gamma_n * a1)
            if enhanced:
                w_pred = wu + dt * wv \
                    + 0.5 * dt * dt * (1.0 - 2.0 * beta) * wa
                f_rows = f_rows_at(t + dt) - jnp.dot(w_pred, D_j.T,
                                                     precision=HI)
                bc_a = (traces(u1, comp_p)
                        - jnp.dot(w_pred, B_j.T, precision=HI)) / bdt2
                wa1, _ = kkt.solve_primal_shared(shared, f_rows, bc_a)
                wu1 = w_pred + bdt2 * wa1
                wv1 = wv + dt * ((1.0 - gamma_n) * wa + gamma_n * wa1)
            else:
                wu1, wv1, wa1 = wu, wv, wa
            return (u1, v1, a1, wu1, wv1, wa1), iters

        def init_carry():
            u0g = u_bc + jnp.where(interior, jnp.stack(
                [uc(X, Y, Z) * ones for uc in problem.u0]), 0.0
            ).astype(dtype)
            v0g = jnp.where(interior, jnp.stack(
                [vc(X, Y, Z) * ones for vc in problem.v0]), 0.0
            ).astype(dtype)
            a0g, _ = solve_mass(load_at(jnp.asarray(0.0, dtype))
                                - apply_K(u0g))
            if enhanced:
                u0_rows = jnp.concatenate(
                    [grid_rows(uc) for uc in problem.u0], axis=1)
                v0_rows = jnp.concatenate(
                    [grid_rows(vc) for vc in problem.v0], axis=1)
                wu0, _ = kkt.solve_primal_shared(proj, u0_rows,
                                                 traces(u0g, comp_p))
                wv0, _ = kkt.solve_primal_shared(proj, v0_rows,
                                                 traces(v0g, comp_p0))
                fa0 = (f_rows_at(jnp.asarray(0.0, dtype))
                       - jnp.dot(wu0, D_j.T, precision=HI)) / rho
                wa0, _ = kkt.solve_primal_shared(proj, fa0,
                                                 traces(a0g, comp_p0))
            else:
                wu0 = wv0 = wa0 = jnp.zeros((1,), dtype)
            return u0g, v0g, a0g, wu0, wv0, wa0

        return scan_step, init_carry, energy

    def local_init(shared, proj, D_j, B_j, t_int, spts):
        _, init_carry, _ = _ctx(shared, proj, D_j, B_j, t_int, spts)
        return init_carry()

    def local_chunk(shared, proj, D_j, B_j, t_int, spts,
                    u, v, a, wu, wv, wa, ts):
        scan_step, _, _ = _ctx(shared, proj, D_j, B_j, t_int, spts)
        carry, iters = jax.lax.scan(scan_step, (u, v, a, wu, wv, wa), ts)
        return carry + (iters[:, None],)

    def local_energy(shared, proj, D_j, B_j, t_int, spts, u, v):
        _, _, energy = _ctx(shared, proj, D_j, B_j, t_int, spts)
        return energy(u, v)

    op_specs = (P(),) * 6
    grid_spec = P(None, axis)
    carry_specs = (grid_spec,) * 3 + (P(axis),) * 3
    sharded_init = jax.shard_map(local_init, mesh=mesh, in_specs=op_specs,
                                 out_specs=carry_specs, check_vma=False)
    sharded_chunk = jax.shard_map(
        local_chunk, mesh=mesh, in_specs=op_specs + carry_specs + (P(),),
        out_specs=carry_specs + (P(None, axis),), check_vma=False)
    sharded_energy = jax.shard_map(
        local_energy, mesh=mesh,
        in_specs=op_specs + (grid_spec, grid_spec), out_specs=P(),
        check_vma=False)

    def _ops():
        return (shared, proj, D_j, B_j, t_int_j, spts_j)

    @jax.jit
    def init_fn():
        return sharded_init(*_ops())

    @jax.jit
    def chunk_fn(carry, ts):
        out = sharded_chunk(*_ops(), *carry, ts)
        return out[:6], out[6]

    @jax.jit
    def energy_fn(u, v):
        return sharded_energy(*_ops(), u, v)

    ts_all = jnp.arange(tcfg.n_steps, dtype=dtype) * jnp.asarray(dt, dtype)
    tag = f"sharded_elastic_wave_3d_{'enh' if enhanced else 'fem'}"

    def run():
        carry0 = init_fn()
        e0 = energy_fn(carry0[0], carry0[1])
        if tcfg.checkpoint:
            fp = march_fingerprint(problem.name, cfg, tcfg, tag)
            carry, iters = chunked_scan(
                chunk_fn, carry0, ts_all, path=tcfg.checkpoint,
                chunk=tcfg.checkpoint_chunk, fingerprint=fp)
        else:
            carry, iters = chunk_fn(carry0, ts_all)
        uN, vN, _, wuN, _, _ = carry
        eN = energy_fn(uN, vN)
        xs = jnp.linspace(x0, x1, cfg.nx + 1, dtype=dtype)
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        zs = jnp.linspace(z0, z1, cfg.nz + 1, dtype=dtype)

        def slabs(g):
            return g.reshape(3, n_dev, nz_loc + 1, cfg.ny + 1,
                             cfg.nx + 1).swapaxes(0, 1)

        coeffs = None
        if enhanced:
            M3 = M * M * M
            shp = (cfg.nz, cfg.ny, cfg.nx, M, M, M)
            coeffs = jnp.stack([
                wuN[:, c * M3:(c + 1) * M3].reshape(shp)
                for c in range(3)])
        return ShardedElasticWaveSolution3D(
            xs=xs, ys=ys, zs=zs, fem_local=slabs(uN),
            velocity_local=slabs(vN), coeffs=coeffs,
            t_final=tcfg.t_final, cg_iters=jnp.max(iters),
            energy0=e0, energyN=eN, lam=p.lam, mu=p.mu)

    return run
