"""Pallas TPU kernels: fused LSSVR enhancement (L7 of the build plan).

The jnp shared-operator path materialises x_colloc [E, C] and f [E, C] in
HBM between the data-build and matmul stages (~100 MB of avoidable traffic
at E = 1e6).  This kernel fuses, per element tile, entirely in VMEM:

    element index -> mapped collocation points -> f(x) (VPU transcendental)
    -> w = f @ Wf^T + bc @ Wbc^T (MXU)
    -> slack/bc diagnostics (reduced in-register)

HBM traffic becomes: read fem values [E+1] (8 MB as two shifted views),
write w [E, M] + two diagnostic vectors — within ~2x of the pure-output
lower bound.

Correctness notes: matmuls run at HIGHEST precision (the MXU's default f32
path is bf16-based, ~4e-4 rel error — see ops/kkt.py); the kernel matches
the jnp path to ~1e-6 relative (validated in tests/test_pallas.py, which
runs the kernel in interpreter mode on CPU and natively on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kkt, legendre


def fused_enhance_shared(
    fem_values: jnp.ndarray,  # [E+1] nodal values (Dirichlet-consistent)
    ops: kkt.SharedOperators,
    f_fn,  # rhs callable f(x), jnp-traceable
    x0: float,
    h: float,
    n_colloc: int,
    tile: int = 8192,
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,  # optional structured f(xl + d) (Problem1D.f_shifted)
):
    """Fused shared-operator enhancement: (w, max_slack, bc_violation).

    Requires a uniform mesh: element e spans [x0 + e h, x0 + (e+1) h].
    E must be a multiple of ``tile`` (pad upstream; 2^k sizes always work).
    ``with_diagnostics=False`` skips the slack/bc residual dots (the
    reference computed-and-discarded these, ``Hybrid-FEM-LSSVR.py:102-103``)
    — measured 32% faster; returns (w, None, None).
    """
    E = fem_values.shape[0] - 1
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    dtype = fem_values.dtype
    C = n_colloc
    M = ops.Wf.shape[0]
    t_colloc = legendre.collocation_points(C, dtype=dtype)  # [C]

    # Element axis on the LANE dimension: every block uses full 128-lane
    # rows (an element-major layout wastes 127/128 of each vector register
    # on the [tile, 1] and [tile, M] blocks — measured 8x slower).
    fem_l = fem_values[:-1][None, :]  # [1, E]
    fem_r = fem_values[1:][None, :]
    Wf = ops.Wf  # [M, C]
    Wbc = ops.Wbc  # [M, 2]
    D = ops.D  # [C, M]
    B = ops.B  # [2, M]

    hi = jax.lax.Precision.HIGHEST

    def kernel(t_colloc_ref, fl_ref, fr_ref, wf_ref, wbc_ref, d_ref,
               b_ref, w_ref, *diag_refs):
        i = pl.program_id(0)
        # x_colloc[c, e] = x0 + (i*tile + e) h + (t[c]+1)/2 h
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        e_idx = e_idx + i * tile
        xl = jnp.asarray(x0, dtype) + e_idx.astype(dtype) * jnp.asarray(
            h, dtype
        )  # [1, tile]
        tloc = (t_colloc_ref[:, 0:1] + 1.0) * jnp.asarray(0.5 * h, dtype)
        if f_shifted_fn is not None:
            # Structured rhs: per-element transcendental count is O(1), the
            # per-offset factors are static [C, 1] vectors.
            f = f_shifted_fn(xl, tloc)
        else:
            xq = xl + tloc  # [C, tile]
            f = f_fn(xq)  # VPU transcendentals, fused in VMEM
        bc = jnp.concatenate([fl_ref[:], fr_ref[:]], axis=0)  # [2, tile]
        w = jnp.dot(wf_ref[:], f, precision=hi,
                    preferred_element_type=dtype)
        w = w + jnp.dot(wbc_ref[:], bc, precision=hi,
                        preferred_element_type=dtype)
        w_ref[:] = w  # [M, tile]
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            e_res = f - jnp.dot(d_ref[:], w, precision=hi,
                                preferred_element_type=dtype)
            slack_ref[:] = jnp.max(jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - jnp.dot(b_ref[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

    grid = (E // tile,)
    col = lambda i: (0, i)
    out_shape = [jax.ShapeDtypeStruct((M, E), dtype)]
    out_specs = [pl.BlockSpec((M, tile), col, memory_space=pltpu.VMEM)]
    if with_diagnostics:
        out_shape += [jax.ShapeDtypeStruct((1, E), dtype)] * 2
        out_specs += [
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
        ] * 2
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # collocation points
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wf (replicated)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Wbc
            pl.BlockSpec(memory_space=pltpu.VMEM),  # D
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * M * (2 * C + 2 + 2),
            bytes_accessed=4 * (2 * E + E * M + 2 * E),
            transcendentals=E * C,
        ),
    )(t_colloc[:, None], fem_l, fem_r, Wf, Wbc, D, B)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


def fused_enhance_shared_2d(
    fem_values: jnp.ndarray,  # [ny+1, nx+1] nodal grid
    ops: kkt.SharedOperators,
    f_fn,  # rhs f(x, y), jnp-traceable
    g_fn,  # Dirichlet data g(x, y)
    geom,  # (x0, hx, y0, hy) Python floats
    nx: int,
    ny: int,
    t_int,  # [C] interior collocation offsets (reference coords)
    bpts,  # [K, 2] (ty, tx) boundary-trace points
    tile: int = 4096,
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,  # optional structured f(xl+dx, yl+dy) evaluation
):
    """Fused 2D shared-operator enhancement over row-major quads.

    Per element tile, entirely in VMEM: quad index -> (ey, ex) -> mapped
    collocation/trace coordinates -> f(x, y) + bilinear FEM trace (with
    Dirichlet override on domain-boundary edges) -> the two shared matmuls
    -> optional slack/bc diagnostics.  Eliminates the [E, C^2] + [E, 4M-4]
    HBM round-trips of the XLA path (~600 MB at 1M quads).
    """
    E = nx * ny
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    dtype = fem_values.dtype
    x0, hx, y0, hy = geom
    M2 = ops.Wf.shape[0]
    C = int(np.sqrt(ops.Wf.shape[1]) + 0.5)
    K = ops.Wbc.shape[1]

    # Corner-value views, flattened row-major over quads: [1, E] each.
    u00 = fem_values[:-1, :-1].reshape(1, E)
    u10 = fem_values[:-1, 1:].reshape(1, E)
    u01 = fem_values[1:, :-1].reshape(1, E)
    u11 = fem_values[1:, 1:].reshape(1, E)

    t = jnp.asarray(t_int, dtype)
    # In-element offsets of the C x C collocation grid, flattened (iy, ix)
    # row-major to match prepare_shared_2d's D: [C^2, 1] each.
    dX = (jnp.tile(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hx, dtype)
    dY = (jnp.repeat(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hy, dtype)
    # Trace points: [K, 1] offsets + static bilinear shape factors.
    ty = jnp.asarray(bpts[:, 0], dtype)[:, None]
    tx = jnp.asarray(bpts[:, 1], dtype)[:, None]
    N00 = 0.25 * (1 - tx) * (1 - ty)
    N10 = 0.25 * (1 + tx) * (1 - ty)
    N01 = 0.25 * (1 - tx) * (1 + ty)
    N11 = 0.25 * (1 + tx) * (1 + ty)
    bX = (tx + 1.0) * jnp.asarray(0.5 * hx, dtype)
    bY = (ty + 1.0) * jnp.asarray(0.5 * hy, dtype)
    on_l = tx == -1.0
    on_r = tx == 1.0
    on_b = ty == -1.0
    on_t = ty == 1.0

    hi = jax.lax.Precision.HIGHEST

    def kernel(dX_r, dY_r, n_r, bxy_r, u00_r, u10_r, u01_r, u11_r,
               wf_r, wbc_r, d_r, b_r, w_ref, *diag_refs):
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
        nx32 = jnp.int32(nx)  # keep int32 under jax_enable_x64
        ex = (e_idx % nx32).astype(dtype)
        ey = (e_idx // nx32).astype(dtype)
        xl = jnp.asarray(x0, dtype) + ex * jnp.asarray(hx, dtype)
        yl = jnp.asarray(y0, dtype) + ey * jnp.asarray(hy, dtype)
        # PDE rows: f at the C^2 interior points.  A naive f(x, y) on the
        # [C^2, tile] broadcast costs C^2 transcendentals per quad; the
        # structured hook (e.g. trig angle addition for separable rhs)
        # reduces that to O(1) per quad.
        if f_shifted_fn is not None:
            f = f_shifted_fn(xl, dX_r[:], yl, dY_r[:])
        else:
            f = f_fn(xl + dX_r[:], yl + dY_r[:])  # [C^2, tile]
        # Trace rows: bilinear FEM trace, Dirichlet override on the domain
        # boundary (element-position masks x static point masks).
        n00, n10, n01, n11 = (n_r[0:K], n_r[K:2 * K], n_r[2 * K:3 * K],
                              n_r[3 * K:4 * K])
        trace = (n00 * u00_r[:] + n10 * u10_r[:] + n01 * u01_r[:]
                 + n11 * u11_r[:])  # [K, tile]
        xb = xl + bxy_r[0:K]
        yb = yl + bxy_r[K:2 * K]
        gv = g_fn(xb, yb) * jnp.ones_like(trace)
        is_l = (e_idx % nx32) == 0
        is_r = (e_idx % nx32) == nx32 - 1
        is_b = (e_idx // nx32) == 0
        is_t = (e_idx // nx32) == jnp.int32(ny) - 1
        # masks packed as floats in bxy_r rows 2K..6K: l, r, b, t
        mask = (
            ((bxy_r[2 * K:3 * K] > 0.5) & is_l)
            | ((bxy_r[3 * K:4 * K] > 0.5) & is_r)
            | ((bxy_r[4 * K:5 * K] > 0.5) & is_b)
            | ((bxy_r[5 * K:6 * K] > 0.5) & is_t)
        )
        bc = jnp.where(mask, gv, trace)
        w = jnp.dot(wf_r[:], f, precision=hi, preferred_element_type=dtype)
        w = w + jnp.dot(wbc_r[:], bc, precision=hi,
                        preferred_element_type=dtype)
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            e_res = f - jnp.dot(d_r[:], w, precision=hi,
                                preferred_element_type=dtype)
            slack_ref[:] = jnp.max(jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - jnp.dot(b_r[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

    n_pack = jnp.concatenate([N00, N10, N01, N11], axis=0)  # [4K, 1]
    bxy_pack = jnp.concatenate(
        [bX, bY,
         on_l.astype(dtype), on_r.astype(dtype),
         on_b.astype(dtype), on_t.astype(dtype)],
        axis=0,
    )  # [6K, 1]

    grid = (E // tile,)
    col = lambda i: (0, i)
    out_shape = [jax.ShapeDtypeStruct((M2, E), dtype)]
    out_specs = [pl.BlockSpec((M2, tile), col, memory_space=pltpu.VMEM)]
    if with_diagnostics:
        out_shape += [jax.ShapeDtypeStruct((1, E), dtype)] * 2
        out_specs += [
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
        ] * 2
    repl = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[repl, repl, repl, repl,
                  row_block, row_block, row_block, row_block,
                  repl, repl, repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(dX, dY, n_pack, bxy_pack, u00, u10, u01, u11,
      ops.Wf, ops.Wbc, ops.D, ops.B)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


def pick_tile(E: int, max_tile: int = 8192) -> int:
    """Largest power-of-two tile (multiple of 128) dividing E, or 0 if E has
    no 128-aligned power-of-two factor (caller falls back to the XLA path)."""
    t = E & (-E)  # largest power-of-2 divisor
    t = min(t, max_tile)
    return t if t >= 128 else 0
