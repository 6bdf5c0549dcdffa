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

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kkt, legendre


def _mosaic_x64_safe(fn):
    """Trace the kernel invocation under a scoped ``jax.enable_x64(False)``.

    Mosaic fails to legalize GRIDDED pallas_calls when the global x64 flag
    is on (remote-compile 'failed to legalize func.return'; gridless kernels
    compile fine — bisected on hardware, NUMERICS.md 12/18).  The scope
    flips only Python-literal/index promotion during tracing — every array
    these kernels touch is explicitly f32/int32, so semantics are unchanged
    — and restores the Pallas fast path for accuracy-focused runs that
    enable x64 for the coarse stage (``fem_dtype='float64'``)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapped


@_mosaic_x64_safe
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


@_mosaic_x64_safe
def fused_enhance_separable(
    fem_values: jnp.ndarray,  # [E+1] nodal values (Dirichlet-consistent)
    ops: kkt.SharedOperators,  # must carry WfF / PF / Qres
    f_elem_factors_fn,  # xl [1, T] -> list of R traced [1, T] factors
    x0,  # left domain edge: Python float OR traced scalar (per-shard
    # offset inside shard_map — the kernel takes it as a [1, 1] input)
    h: float,
    tile: int = 8192,
    interpret: bool = False,
    with_diagnostics: bool = True,
    with_fallback: bool = False,
    f_translation=None,  # Problem1D.f_translation (static mixing matrix)
):
    """Fused shared-operator enhancement for SEPARABLE rhs — the fastest
    1D hot path.

    With ``f_translation`` (factor family closed under translation, e.g.
    trig), the R element factors are evaluated at ONE base point per grid
    step and spanned across the tile by static mixing vectors: the
    per-element transcendental count drops to zero (R scalar sin/cos per
    step).  Measured: transcendentals on [1, tile] rows cost 0.22 ms of the
    0.50 ms kernel at E = 2^20 — this removes them.

    ``with_fallback=True`` additionally fuses the solve_ok gate (tolerance
    scaled by boundary-data magnitude, see ``kkt._diagnostics``) and the
    linear-interpolant fallback masking (reference ``:171-176``) into the
    kernel — the XLA ``apply_fallback`` otherwise re-reads and re-writes
    the full [E, M] coefficient array (~64 MB at E = 2^20).  Returns
    (w, max_slack, bc_violation, ok) with ok a float 0/1 row.

    With f(xl + d) = sum_r a_r(xl) b_r(d) and the static b_r contracted
    against the affine map on the host in f64 (``kkt._rhs_factor_fields``),
    no [C, tile] rhs is ever materialised:

        w     = WfF^T a + Wbc bc               (a: [R, tile], R ~ 2)
        slack = max_c | PF^T a + Qres bc |      (f64-exact residual algebra)
        bcv   = max | B w - bc |                (REAL computed w: this is
                                                 the fault-detection signal)

    Per element: ~R (M + C) multiply-adds + 2 transcendentals, vs the
    generic kernel's C-point rhs build + [M, C] matmul.  The slack floor
    also improves: the generic path's f - D w cancels in f32 (~1e-6 |f|);
    here the residual comes out of host-f64 operators multiplicatively.
    """
    E = fem_values.shape[0] - 1
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    if ops.WfF is None:
        raise ValueError("ops has no rank-factored rhs fields; precompute "
                         "with rhs_colloc_factors")
    dtype = fem_values.dtype
    M = ops.Wf.shape[0]
    fem_l = fem_values[:-1][None, :]
    fem_r = fem_values[1:][None, :]
    WfFT = ops.WfF.T  # [M, R]
    PFT = ops.PF.T  # [C, R]
    R = WfFT.shape[1]
    if f_translation is not None:
        import numpy as np

        offs = np.arange(tile, dtype=np.float64) * float(h)
        Tm = np.asarray(f_translation(offs), np.float64)  # [R, R, tile]
        if Tm.shape != (R, R, tile):
            raise ValueError(f"f_translation returned {Tm.shape}, "
                             f"expected {(R, R, tile)}")
        tpack = jnp.asarray(Tm.reshape(R * R, tile), dtype)
    else:
        tpack = jnp.zeros((1, tile), dtype)  # unused placeholder

    # ALL contractions below are unrolled VPU broadcast-FMAs, never MXU
    # dots: at these shapes (K = R or 2 or M, padded to 128) a HIGHEST-
    # precision MXU dot costs like a full K=128 matmul x6 bf16 passes —
    # measured 0.36 ms for the slack dots alone at E = 2^20, vs ~0.01 ms
    # as FMAs.  The FMAs are also true-f32, i.e. MORE accurate than the
    # MXU's bf16x6 HIGHEST emulation.
    def kernel(x0_ref, fl_ref, fr_ref, wfft_ref, wbc_ref, pft_ref,
               qres_ref, b_ref, tp_ref, w_ref, *diag_refs):
        i = pl.program_id(0)
        x0v = x0_ref[0:1, 0:1]  # [1, 1] (traced per-shard inside shard_map)
        if f_translation is not None:
            # One base point per grid step; static mixing spans the tile.
            xb = x0v + (i * tile).astype(dtype) * jnp.asarray(h, dtype)
            base = f_elem_factors_fn(xb)  # R x [1, 1]
            a = [
                sum(tp_ref[r * R + s:r * R + s + 1, :] * base[s]
                    for s in range(R))
                for r in range(R)
            ]
        else:
            e_idx = jax.lax.broadcasted_iota(
                jnp.int32, (1, tile), 1
            ) + i * tile
            xl = x0v + e_idx.astype(dtype) * jnp.asarray(h, dtype)
            a = f_elem_factors_fn(xl)  # list of R [1, tile] factors
        bcs = (fl_ref[:], fr_ref[:])  # 2 x [1, tile]
        w = wfft_ref[:, 0:1] * a[0]  # [M, 1] x [1, tile] outer
        for r in range(1, R):
            w = w + wfft_ref[:, r:r + 1] * a[r]
        for j in range(2):
            w = w + wbc_ref[:, j:j + 1] * bcs[j]
        if not with_diagnostics:
            w_ref[:] = w  # [M, tile]
            return
        slack_ref, bcv_ref = diag_refs[0], diag_refs[1]
        e_res = pft_ref[:, 0:1] * a[0]  # [C, tile]
        for r in range(1, R):
            e_res = e_res + pft_ref[:, r:r + 1] * a[r]
        for j in range(2):
            e_res = e_res + qres_ref[:, j:j + 1] * bcs[j]
        slack = jnp.max(jnp.abs(e_res), axis=0, keepdims=True)
        slack_ref[:] = slack
        # bc violation from the REAL computed w (fault detection):
        # row k of B w = sum_m B[k, m] w[m] — a lane-broadcast multiply
        # plus a sublane reduction per boundary row.
        b0 = jnp.sum(b_ref[:, 0:1] * w, axis=0, keepdims=True)
        b1 = jnp.sum(b_ref[:, 1:2] * w, axis=0, keepdims=True)
        bcv = jnp.maximum(jnp.abs(bcs[0] - b0), jnp.abs(bcs[1] - b1))
        bcv_ref[:] = bcv
        if with_fallback:
            ok_ref = diag_refs[2]
            finite = jnp.isfinite(slack) & jnp.isfinite(bcv)
            scale = 1.0 + jnp.maximum(jnp.abs(bcs[0]), jnp.abs(bcs[1]))
            ok = finite & (bcv <= 0.01 * scale)
            ok_ref[:] = ok.astype(dtype)
            # Linear-interpolant fallback (reference ``:171-176``): Legendre
            # coeffs [ (ul+ur)/2, (ur-ul)/2, 0, ... ] via static masks.
            m_idx = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
            half = jnp.asarray(0.5, dtype)
            wf = (m_idx == 0) * half * (bcs[0] + bcs[1]) \
                + (m_idx == 1) * half * (bcs[1] - bcs[0])
            w_safe = jnp.where(jnp.isfinite(w), w, 0.0)
            w = jnp.where(ok, w_safe, wf)
        w_ref[:] = w  # [M, tile]

    if with_fallback and not with_diagnostics:
        raise ValueError("with_fallback requires with_diagnostics")
    grid = (E // tile,)
    col = lambda i: (0, i)
    n_rows = (2 if with_diagnostics else 0) + (1 if with_fallback else 0)
    out_shape = [jax.ShapeDtypeStruct((M, E), dtype)]
    out_specs = [pl.BlockSpec((M, tile), col, memory_space=pltpu.VMEM)]
    out_shape += [jax.ShapeDtypeStruct((1, E), dtype)] * n_rows
    out_specs += [
        pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
    ] * n_rows
    repl = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
    C = PFT.shape[0]
    x0_arr = jnp.asarray(x0, dtype).reshape(1, 1)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[repl, row_block, row_block,
                  repl, repl, repl, repl, repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * (R * (M + C) + 2 * M + 2 * C + 2 * M),
            bytes_accessed=4 * (2 * E + E * M + 2 * E),
            transcendentals=(R * (E // tile) if f_translation is not None
                             else R * E),
        ),
    )(x0_arr, fem_l, fem_r, WfFT, ops.Wbc, PFT, ops.Qres, ops.B.T, tpack)
    if with_fallback:
        wT, slack, bcv, ok = outs
        return wT.T, slack[0], bcv[0], ok[0]
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


@_mosaic_x64_safe
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


@_mosaic_x64_safe
def fused_enhance_stacked_2d(
    fem_values: jnp.ndarray,  # [ny+1, nx+1] nodal grid
    ops: kkt.SharedOperators,  # must carry Pres / Qres
    f_fn,  # rhs f(x, y)
    g_fn,  # Dirichlet data g(x, y)
    geom,  # (x0, hx, y0, hy) Python floats
    nx: int,
    ny: int,
    t_int,  # [C] interior collocation offsets (reference coords)
    bpts,  # [K, 2] (ty, tx) boundary-trace points
    tile: int = 4096,
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,
    precision=None,  # None -> HIGHEST.  NOTE: Mosaic legalises only
    # DEFAULT/HIGHEST on hardware (NUMERICS.md 21) — HIGH compiles only in
    # interpret mode; the real pass-count lever is a manual bf16 hi/lo
    # split (see the SNE kernel's NZ contraction)
):
    """Fused 2D enhancement with ONE stacked MXU contraction.

    The generic kernel pays 4 separately K-padded HIGHEST dots (w = Wf f +
    Wbc bc, then D w and B w for diagnostics) — each pads its tiny K to the
    MXU's 128 systolic depth, measured ~1.4 ms of 1.73 ms at 1M quads.
    Here the affine map and the exact-algebra residual stack into one
    operator applied to one stacked operand:

        [ w ]   [ Wf    Wbc  ] [ f  ]
        [ e ] = [ Pres  Qres ] [ bc ]     (Pres = I - D Wf, Qres = -D Wbc,
                                           both host-f64 -> exact slack)

    — [M2+C2, C2+K] @ [C2+K, tile]: one padded dot instead of three.  The
    bc violation keeps a REAL-computed-w dot (B w — the fault-detection
    signal).  An FMA-unrolled variant was measured 2x SLOWER here (K = 20,
    M2 = 36 is past the VPU/MXU crossover; contrast the 1D kernel where
    K <= 2).  Returns (w [E, M2], max_slack [E], bc_violation [E]).
    """
    E = nx * ny
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    if ops.Pres is None:
        raise ValueError("ops has no residual operators; use a host "
                         "precompute (precompute_shared_*_host)")
    dtype = fem_values.dtype
    x0, hx, y0, hy = geom
    M2 = ops.Wf.shape[0]
    C2 = ops.Pres.shape[0]
    C = int(np.sqrt(C2) + 0.5)
    K = ops.Wbc.shape[1]

    u00 = fem_values[:-1, :-1].reshape(1, E)
    u10 = fem_values[:-1, 1:].reshape(1, E)
    u01 = fem_values[1:, :-1].reshape(1, E)
    u11 = fem_values[1:, 1:].reshape(1, E)

    t = jnp.asarray(t_int, dtype)
    dX = (jnp.tile(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hx, dtype)
    dY = (jnp.repeat(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hy, dtype)
    ty = jnp.asarray(bpts[:, 0], dtype)[:, None]
    tx = jnp.asarray(bpts[:, 1], dtype)[:, None]
    N00 = 0.25 * (1 - tx) * (1 - ty)
    N10 = 0.25 * (1 + tx) * (1 - ty)
    N01 = 0.25 * (1 - tx) * (1 + ty)
    N11 = 0.25 * (1 + tx) * (1 + ty)
    bX = (tx + 1.0) * jnp.asarray(0.5 * hx, dtype)
    bY = (ty + 1.0) * jnp.asarray(0.5 * hy, dtype)
    n_pack = jnp.concatenate([N00, N10, N01, N11], axis=0)  # [4K, 1]
    bxy_pack = jnp.concatenate(
        [bX, bY,
         (tx == -1.0).astype(dtype), (tx == 1.0).astype(dtype),
         (ty == -1.0).astype(dtype), (ty == 1.0).astype(dtype)],
        axis=0,
    )  # [6K, 1]
    # The stacked operator (operators are host-f64, cast to run dtype).
    top = jnp.concatenate([ops.Wf, ops.Wbc], axis=1)  # [M2, C2+K]
    if with_diagnostics:
        bottom = jnp.concatenate([ops.Pres, ops.Qres], axis=1)
        O = jnp.concatenate([top, bottom], axis=0)  # [M2+C2, C2+K]
    else:
        O = top

    hi = jax.lax.Precision.HIGHEST if precision is None else precision

    def kernel(dX_r, dY_r, n_r, bxy_r, u00_r, u10_r, u01_r, u11_r,
               o_ref, b_ref, w_ref, *diag_refs):
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
        nx32 = jnp.int32(nx)
        ex = (e_idx % nx32).astype(dtype)
        ey = (e_idx // nx32).astype(dtype)
        xl = jnp.asarray(x0, dtype) + ex * jnp.asarray(hx, dtype)
        yl = jnp.asarray(y0, dtype) + ey * jnp.asarray(hy, dtype)
        if f_shifted_fn is not None:
            f = f_shifted_fn(xl, dX_r[:], yl, dY_r[:])
        else:
            f = f_fn(xl + dX_r[:], yl + dY_r[:])  # [C2, tile]
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
        mask = (
            ((bxy_r[2 * K:3 * K] > 0.5) & is_l)
            | ((bxy_r[3 * K:4 * K] > 0.5) & is_r)
            | ((bxy_r[4 * K:5 * K] > 0.5) & is_b)
            | ((bxy_r[5 * K:6 * K] > 0.5) & is_t)
        )
        bc = jnp.where(mask, gv, trace)
        z = jnp.concatenate([f, bc], axis=0)  # [C2+K, tile]
        out = jnp.dot(o_ref[:], z, precision=hi,
                      preferred_element_type=dtype)
        w = out[:M2]
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            slack_ref[:] = jnp.max(jnp.abs(out[M2:]), axis=0,
                                   keepdims=True)
            b_res = bc - jnp.dot(b_ref[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

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
                  repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * (M2 + C2) * (C2 + K),
            bytes_accessed=4 * (4 * E + E * M2 + 2 * E),
            transcendentals=4 * E if f_shifted_fn is not None else E * C2,
        ),
    )(dX, dY, n_pack, bxy_pack, u00, u10, u01, u11, O, ops.B)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


@_mosaic_x64_safe
def fused_enhance_stacked_3d(
    fem_values: jnp.ndarray,  # [nz+1, ny+1, nx+1] nodal grid
    ops: kkt.SharedOperators,  # must carry Pres / Qres
    f_fn,  # rhs f(x, y, z)
    g_fn,  # Dirichlet data g(x, y, z)
    geom,  # (x0, hx, y0, hy, z0, hz) Python floats
    nx: int,
    ny: int,
    nz: int,
    t_int,  # [C] interior collocation offsets (reference coords)
    spts,  # [S, 3] (tz, ty, tx) surface-trace points
    tile: int = 8192,
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,  # structured f(xl+dx, yl+dy, zl+dz) hook — without
    # it the naive in-kernel f pays C^3 = 64 transcendental rows per tile,
    # measured SLOWER than the XLA path at 64^3 (RESULTS.md).  No
    # precision knob: Mosaic legalises only DEFAULT/HIGHEST dot
    # precisions (NUMERICS.md 21), so HIGHEST is the only accurate option
):
    """Fused 3D enhancement with ONE stacked MXU contraction (the 3D lift
    of ``fused_enhance_stacked_2d``).

    Per element tile, entirely in VMEM: hex index -> (ez, ey, ex) ->
    mapped collocation coordinates -> f(x, y, z) + trilinear FEM trace
    (Dirichlet override on domain-boundary faces) -> the stacked
    [w; e] = [Wf Wbc; Pres Qres] @ [f; bc] MXU dot -> slack/bc
    diagnostics.  At M = C = 4 the stacked operator is [128, 120] — an
    exactly-MXU-shaped single dot; the XLA path's [E, C^3] + [E, S] HBM
    round trips (~250 MB at 64^3) disappear.  Measured (interleaved
    head-to-head at 64^3, v5e): XLA 2.6e8 -> fused 4.2e8 elements/sec at
    tile=8192 WITH the structured-rhs hook; withOUT the hook the naive
    in-kernel f (64 transcendental rows/tile) makes the kernel ~1.2x
    SLOWER than XLA — the hook is the whole win (RESULTS.md).
    """
    E = nx * ny * nz
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    if ops.Pres is None:
        raise ValueError("ops has no residual operators; use a host "
                         "precompute (precompute_shared_*_host)")
    dtype = fem_values.dtype
    x0, hx, y0, hy, z0, hz = geom
    M3 = ops.Wf.shape[0]
    C3 = ops.Pres.shape[0]
    C = int(round(C3 ** (1.0 / 3.0)))
    S = ops.Wbc.shape[1]

    # 8 corner-value views, flattened z-major over hexes: [1, E] each,
    # corner order a = 4cz + 2cy + cx (assembly3d._corners_3d).
    sl = (slice(None, -1), slice(1, None))
    u_corner = [
        fem_values[sl[cz]][:, sl[cy]][:, :, sl[cx]].reshape(1, E)
        for cz in range(2) for cy in range(2) for cx in range(2)
    ]

    t = jnp.asarray(t_int, dtype)
    # In-element offsets of the C^3 collocation grid, flattened
    # (cz, cy, cx) row-major (x fastest) to match prepare_shared_3d's t3
    # ordering: [C^3, 1] each (jnp ops: t_int/spts may be traced).
    dX = (jnp.tile(t, C * C)[:, None] + 1.0) * jnp.asarray(0.5 * hx, dtype)
    dY = (jnp.tile(jnp.repeat(t, C), C)[:, None] + 1.0) * jnp.asarray(
        0.5 * hy, dtype)
    dZ = (jnp.repeat(t, C * C)[:, None] + 1.0) * jnp.asarray(0.5 * hz,
                                                             dtype)
    # Trace points: [S, 1] offsets + trilinear shape factors.
    sp = jnp.asarray(spts, dtype)
    tz = sp[:, 0][:, None]
    ty = sp[:, 1][:, None]
    tx = sp[:, 2][:, None]
    n_pack = jnp.concatenate(
        [0.125 * (1 + sxn * tx) * (1 + syn * ty) * (1 + szn * tz)
         for szn in (-1.0, 1.0) for syn in (-1.0, 1.0)
         for sxn in (-1.0, 1.0)],
        axis=0,
    )  # [8S, 1], corner order a = 4cz + 2cy + cx
    bxyz_pack = jnp.concatenate(
        [(tx + 1.0) * jnp.asarray(0.5 * hx, dtype),
         (ty + 1.0) * jnp.asarray(0.5 * hy, dtype),
         (tz + 1.0) * jnp.asarray(0.5 * hz, dtype),
         (tx == -1.0).astype(dtype), (tx == 1.0).astype(dtype),
         (ty == -1.0).astype(dtype), (ty == 1.0).astype(dtype),
         (tz == -1.0).astype(dtype), (tz == 1.0).astype(dtype)],
        axis=0,
    )  # [9S, 1]
    # The stacked operator (host-f64 fields, cast to run dtype).
    top = jnp.concatenate([ops.Wf, ops.Wbc], axis=1)  # [M3, C3+S]
    if with_diagnostics:
        bottom = jnp.concatenate([ops.Pres, ops.Qres], axis=1)
        O = jnp.concatenate([top, bottom], axis=0)  # [M3+C3, C3+S]
    else:
        O = top

    hi = jax.lax.Precision.HIGHEST

    def kernel(dX_r, dY_r, dZ_r, n_r, bxyz_r, *rest):
        u_refs = rest[:8]
        o_ref, b_ref, w_ref = rest[8], rest[9], rest[10]
        diag_refs = rest[11:]
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
        nx32 = jnp.int32(nx)
        ny32 = jnp.int32(ny)
        ex = e_idx % nx32
        ey = (e_idx // nx32) % ny32
        ez = e_idx // (nx32 * ny32)
        xl = jnp.asarray(x0, dtype) + ex.astype(dtype) * jnp.asarray(
            hx, dtype)
        yl = jnp.asarray(y0, dtype) + ey.astype(dtype) * jnp.asarray(
            hy, dtype)
        zl = jnp.asarray(z0, dtype) + ez.astype(dtype) * jnp.asarray(
            hz, dtype)
        # PDE rows: f at the C^3 interior points, [C^3, tile].  The
        # structured hook evaluates transcendentals only on [1, tile] and
        # [C^3, 1] factors (angle addition); the naive route pays them on
        # the full [C^3, tile] product.
        if f_shifted_fn is not None:
            f = f_shifted_fn(xl, dX_r[:], yl, dY_r[:], zl, dZ_r[:])
        else:
            f = f_fn(xl + dX_r[:], yl + dY_r[:], zl + dZ_r[:])
        f = f * jnp.ones((C3, tile), dtype)
        # Trace rows: trilinear FEM trace + Dirichlet override on the
        # domain-boundary faces.
        trace = 0.0
        for a in range(8):
            trace = trace + n_r[a * S:(a + 1) * S] * u_refs[a][:]
        xb = xl + bxyz_r[0:S]
        yb = yl + bxyz_r[S:2 * S]
        zb = zl + bxyz_r[2 * S:3 * S]
        gv = g_fn(xb, yb, zb) * jnp.ones_like(trace)
        mask = (
            ((bxyz_r[3 * S:4 * S] > 0.5) & (ex == 0))
            | ((bxyz_r[4 * S:5 * S] > 0.5) & (ex == nx32 - 1))
            | ((bxyz_r[5 * S:6 * S] > 0.5) & (ey == 0))
            | ((bxyz_r[6 * S:7 * S] > 0.5) & (ey == ny32 - 1))
            | ((bxyz_r[7 * S:8 * S] > 0.5) & (ez == 0))
            | ((bxyz_r[8 * S:9 * S] > 0.5) & (ez == jnp.int32(nz) - 1))
        )
        bc = jnp.where(mask, gv, trace)
        z = jnp.concatenate([f, bc], axis=0)  # [C3+S, tile]
        out = jnp.dot(o_ref[:], z, precision=hi,
                      preferred_element_type=dtype)
        w = out[:M3]
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            slack_ref[:] = jnp.max(jnp.abs(out[M3:]), axis=0,
                                   keepdims=True)
            b_res = bc - jnp.dot(b_ref[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

    grid = (E // tile,)
    col = lambda i: (0, i)
    out_shape = [jax.ShapeDtypeStruct((M3, E), dtype)]
    out_specs = [pl.BlockSpec((M3, tile), col, memory_space=pltpu.VMEM)]
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
        in_specs=[repl] * 5 + [row_block] * 8 + [repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * (M3 + C3) * (C3 + S),
            bytes_accessed=4 * (8 * E + E * M3 + 2 * E),
            transcendentals=E * C3,
        ),
    )(dX, dY, dZ, n_pack, bxyz_pack, *u_corner, O, ops.B)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


class VarCoeffOperators:
    """Static host-precomputed operators for the fused variable-coefficient
    kernel (plain attributes, not a pytree — everything is trace-constant).

    All operator rows are globally scaled by 1/s^2 (s = 2/h): the LSE
    minimiser is scale-invariant, and the static scaling keeps every f32
    intermediate O(1)-conditioned at any element count (the per-element
    RMS normalisation of ``kkt.solve_primal_lse`` serves the same purpose).
    """

    def __init__(self, M, n_colloc, h, dtype):
        import numpy as np

        from . import kkt as _kkt

        V0, V1, V2 = legendre.collocation_vandermonde_host(M, n_colloc)
        B = np.stack([V0[0], V0[-1]])
        Z, Pbc = _kkt.nullspace_host(B)
        s = 2.0 / float(h)
        Ws = (V2, V1 / s, V0 / s**2)  # D/s^2 = a2 W2 + a1 W1 + a0 W0
        self.AZ = jnp.asarray(np.stack([w @ Z for w in Ws]), dtype)  # [3,C,K]
        self.AP = jnp.asarray(np.stack([w @ Pbc for w in Ws]), dtype)
        self.Z = jnp.asarray(Z, dtype)  # [M, K]
        self.Pbc = jnp.asarray(Pbc, dtype)  # [M, 2]
        self.B = jnp.asarray(B, dtype)  # [2, M]
        self.K = Z.shape[1]
        self.s2 = s * s


@_mosaic_x64_safe
def fused_enhance_varcoeff(
    fem_values: jnp.ndarray,  # [E+1] nodal values (Dirichlet-consistent)
    problem,  # Problem1D: colloc_coeffs / f / f_shifted, jnp-traceable
    host: VarCoeffOperators,
    x0: float,
    h: float,
    n_colloc: int,
    tile: int = 8192,
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,
    nodes=None,  # [E+1] traced node positions: GRADED-mesh mode (see below)
):
    """Fused per-element-operator (variable-coefficient) enhancement.

    ``nodes`` switches to graded-mesh mode: element positions and widths
    come from the traced node array instead of (x0, h) index arithmetic.
    The chain-factor algebra folds into the per-element coefficients —
    with rho_e = h_ref / h_e, D_e / s_ref^2 = (a2 rho^2) W2 + (a1 rho) W1
    + a0 W0 against the SAME static host operators (built at the reference
    width ``h``) — so adaptive / non-uniform meshes run the identical
    fused kernel (this path backs ``hybrid_solve_general`` on TPU).

    Closes the 33x gap of the unfused XLA MGS-QR path (``kkt.
    solve_primal_lse`` + ``_batched_mgs_qr_solve``): that path's ~60 small
    batched elementwise ops each round-trip [E, C] arrays through HBM
    (~9 GB at E = 2^20).  Here the whole per-element pipeline — coefficient
    evaluation a(x), b(x), c(x), rhs f(x), D-row build from three static
    ``Vq @ Z`` operators, CGS2 QR, back-substitution, null-space recovery,
    diagnostics — lives in VMEM per element tile, elements on lanes.

    Same algebra as the XLA path (null-space LSE, CGS2), so accuracy is
    identical by construction; replaces the reference's per-element SLSQP
    (``Hybrid-FEM-LSSVR.py:90``) for non-shared operators (SURVEY.md
    section 7.1 L7, section 2.2).
    Returns (w [E, M], max_slack [E], bc_violation [E], cond [E]) — the
    last three None when ``with_diagnostics=False``.
    """
    E = fem_values.shape[0] - 1
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    dtype = fem_values.dtype
    C = n_colloc
    K = host.K
    M = host.Z.shape[0]
    if K < 1:
        raise ValueError("fused varcoeff kernel needs M >= 3 (K = M-2 >= 1)")

    t_colloc = legendre.collocation_points(C, dtype=dtype)
    graded = nodes is not None
    if graded:
        # Half-offsets in reference coords; element width applied in-kernel.
        dloc = ((t_colloc + 1.0) * 0.5)[:, None]  # [C, 1]
        xl_row = nodes[:-1][None, :]
        h_row = (nodes[1:] - nodes[:-1])[None, :]
    else:
        dloc = ((t_colloc + 1.0) * jnp.asarray(0.5 * h, dtype))[:, None]
    fem_l = fem_values[:-1][None, :]
    fem_r = fem_values[1:][None, :]
    AZ2, AZ1, AZ0 = host.AZ[0], host.AZ[1], host.AZ[2]
    AP = host.AP.reshape(3 * C, 2)  # stacked [W2 Pbc; W1 Pbc; W0 Pbc]
    inv_s2_f = float(1.0 / host.s2)  # Python floats: compile-time constants
    s2_f = float(host.s2)
    eps_f = 1e-30

    hi = jax.lax.Precision.HIGHEST

    def kernel(dloc_ref, fl_ref, fr_ref, az2_ref, az1_ref, az0_ref,
               ap_ref, z_ref, pbc_ref, b_ref, *rest):
        if graded:
            xl_ref, h_ref = rest[0], rest[1]
            w_ref, diag_refs = rest[2], rest[3:]
            xl = xl_ref[:]  # [1, tile]
            he = h_ref[:]
            d = dloc_ref[:] * he  # [C, tile] in-element offsets
            rho = jnp.asarray(h, dtype) / he  # h_ref / h_e
        else:
            w_ref, diag_refs = rest[0], rest[1:]
            i = pl.program_id(0)
            e_idx = jax.lax.broadcasted_iota(
                jnp.int32, (1, tile), 1
            ) + i * tile
            xl = jnp.asarray(x0, dtype) + e_idx.astype(dtype) * jnp.asarray(
                h, dtype
            )  # [1, tile]
            d = dloc_ref[:]  # [C, 1]
            rho = None
        xq = xl + d  # [C, tile] mapped collocation points
        a2, a1, a0 = problem.colloc_coeffs(xq)  # each [C, tile] (VPU)
        if rho is not None:
            # Fold the per-element chain factors into the coefficients:
            # D_e / s_ref^2 = (a2 rho^2) W2 + (a1 rho) W1 + a0 W0.
            a2 = a2 * (rho * rho)
            a1 = a1 * rho
        if f_shifted_fn is not None and not graded:
            f = f_shifted_fn(xl, d)
        else:
            f = problem.f(xq) * jnp.ones_like(xq)
        bc = jnp.concatenate([fl_ref[:], fr_ref[:]], axis=0)  # [2, tile]
        wp = jnp.dot(pbc_ref[:], bc, precision=hi,
                     preferred_element_type=dtype)  # [M, tile]
        # D~ wp via the three static Wq Pbc blocks: [3C, 2] @ [2, tile].
        apbc = jnp.dot(ap_ref[:], bc, precision=hi,
                       preferred_element_type=dtype)  # [3C, tile]
        Dwp = a2 * apbc[0:C] + a1 * apbc[C:2 * C] + a0 * apbc[2 * C:3 * C]
        g = f * jnp.asarray(inv_s2_f, dtype) - Dwp  # [C, tile] scaled residual rhs
        # G~ columns: G_k = a2 (W2 Z)_k + a1 (W1 Z)_k + a0 (W0 Z)_k.
        G = [
            a2 * az2_ref[:, k:k + 1] + a1 * az1_ref[:, k:k + 1]
            + a0 * az0_ref[:, k:k + 1]
            for k in range(K)
        ]
        # CGS2 QR over the K columns — identical algebra to
        # kkt._batched_mgs_qr_solve, but every intermediate stays in VMEM.
        Qc = []
        R = [[None] * K for _ in range(K)]
        for j in range(K):
            v = G[j]
            for _pass in range(2):
                for i2 in range(j):
                    rij = jnp.sum(Qc[i2] * v, axis=0, keepdims=True)
                    R[i2][j] = rij if R[i2][j] is None else R[i2][j] + rij
                    v = v - rij * Qc[i2]
            rjj = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            R[j][j] = rjj
            Qc.append(v / (rjj + jnp.asarray(eps_f, dtype)))
        qtg = [jnp.sum(Qc[j] * g, axis=0, keepdims=True) for j in range(K)]
        y = [None] * K
        for j in reversed(range(K)):
            acc = qtg[j]
            for i2 in range(j + 1, K):
                acc = acc - R[j][i2] * y[i2]
            y[j] = acc / (R[j][j] + jnp.asarray(eps_f, dtype))
        ystack = jnp.concatenate(y, axis=0)  # [K, tile]
        w = wp + jnp.dot(z_ref[:], ystack, precision=hi,
                         preferred_element_type=dtype)  # [M, tile]
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref, cond_ref = diag_refs
            e_res = g
            for k in range(K):
                e_res = e_res - G[k] * y[k]
            # Back to the original row scale: f - D w = s^2 (g~ - G~ y).
            slack_ref[:] = jnp.asarray(s2_f, dtype) * jnp.max(
                jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - jnp.dot(b_ref[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)
            # Per-element condition monitor: max|R_jj| / min|R_jj| of the
            # CGS2 factor — same lower bound on kappa(G) as the XLA path
            # (kkt._batched_mgs_qr_solve); one extra output row.
            dR = jnp.concatenate([R[j][j] for j in range(K)], axis=0)
            cond_ref[:] = jnp.max(dR, axis=0, keepdims=True) / jnp.maximum(
                jnp.min(dR, axis=0, keepdims=True),
                jnp.asarray(eps_f, dtype),
            )

    grid = (E // tile,)
    col = lambda i: (0, i)
    out_shape = [jax.ShapeDtypeStruct((M, E), dtype)]
    out_specs = [pl.BlockSpec((M, tile), col, memory_space=pltpu.VMEM)]
    if with_diagnostics:
        out_shape += [jax.ShapeDtypeStruct((1, E), dtype)] * 3
        out_specs += [
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
        ] * 3
    repl = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
    in_specs = [repl, row_block, row_block,
                repl, repl, repl, repl, repl, repl, repl]
    inputs = [dloc, fem_l, fem_r, AZ2, AZ1, AZ0, AP, host.Z, host.Pbc,
              host.B]
    if graded:
        in_specs += [row_block, row_block]
        inputs += [xl_row, h_row]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * C * (3 * K + 2 * K * K + 12),
            bytes_accessed=4 * (2 * E + E * M + 2 * E),
            transcendentals=(2 * E if f_shifted_fn is not None
                             and not graded else E * C),
        ),
    )(*inputs)
    if with_diagnostics:
        wT, slack, bcv, cond = outs
        return wT.T, slack[0], bcv[0], cond[0]
    return outs[0].T, None, None, None


@_mosaic_x64_safe
def fused_enhance_varcoeff_2d(
    fem_values: jnp.ndarray,  # [ny+1, nx+1] nodal grid
    vops,  # models.hybrid2d.VarCoeff2DOperators (AZ/AP precompute required)
    a_fn,  # diffusion coefficient a(x, y), jnp-traceable
    grad_a,  # (da/dx, da/dy) callables (analytic chain-rule coefficients)
    f_fn,  # rhs f(x, y)
    g_fn,  # Dirichlet data g(x, y)
    geom,  # (x0, hx, y0, hy) Python floats
    nx: int,
    ny: int,
    t_int,  # [C] interior collocation offsets (reference coords)
    bpts,  # [Kb, 2] (ty, tx) boundary-trace points
    s2: float,  # static row scale sx^2 + sy^2 (recomputed from geom by
    #             the caller: the pytree copy in vops may be traced)
    tile: int = 1024,  # measured fastest of 256/512/1024 on v5e (~7% over
    #                    512); ~5.3 MB of [C^2, tile] live arrays at M=6
    interpret: bool = False,
    with_diagnostics: bool = True,
    f_shifted_fn=None,  # optional structured f(xl+dx, yl+dy) evaluation
    method: str = "qr",  # 'qr' (CGS2, VPU) | 'sne' (semi-normal equations,
    #                      MXU — see the docstring's accuracy discussion)
    refine: bool = True,  # 'sne' only: one refinement step in the factored
    #                      normal equations (Bjorck semi-normal method)
):
    """Fused per-element-operator (variable-coefficient) 2D enhancement.

    2D composition of ``fused_enhance_varcoeff`` (per-element null-space
    CGS2 QR, elements on lanes) and ``fused_enhance_shared_2d`` (quad index
    -> mapped coordinates -> rhs + bilinear FEM trace with Dirichlet
    override).  Per element tile, entirely in VMEM: sample the coefficient
    fields a, da/dx, da/dy at the C^2 collocation points, assemble the
    projected operator columns G_k = -a (Lap Z)_k - a_x (Gx Z)_k
    - a_y (Gy Z)_k + (Dconst Z)_k from the four static host-f64 parts
    (``VarCoeff2DOperators.AZ``, statically scaled by 1/s2), CGS2-QR the
    K-column LSE, recover w = Pbc bc + Z y, and emit diagnostics.

    Same algebra as the XLA path (``kkt.solve_primal_lse`` with per-element
    D — the 2D branch of ``hybrid_solve_2d``), so accuracy is identical up
    to the row-scaling convention (static 1/s2 here vs per-element RMS
    there; the LSE minimiser is invariant to either).  Avoids that path's
    [E, C^2, M^2] D-tensor materialisation (~5.3 GB at 1M quads, M=6) and
    its ~60 batched-op HBM round trips.  Replaces the reference's
    per-element SLSQP (``Hybrid-FEM-LSSVR.py:90``) for per-element
    operators in 2D (SURVEY.md section 7.1 L7, section 2.2).

    ``method='sne'`` — semi-normal equations on the MXU.  G is a
    coefficient-weighted sum of static blocks, so N = G^T G is a static
    pair-product matrix (``VarCoeff2DOperators.NZ``, host-f64) contracted
    against the per-element coefficient pair fields in ONE MXU dot; y then
    comes from an unrolled lane-batched Cholesky (K^3/3 VPU flops vs the
    QR's 2 K^2 C^2), with one refinement step in the factored system
    (Bjorck's semi-normal method, ``refine=True``).  Moves the O(K^2 C^2)
    orthogonalisation work from the VPU to the MXU.  Numerically safe
    because the null-space projection keeps kappa(G) tiny — measured <= 6
    for M <= 8 on the shipped problems — so kappa(N) = kappa(G)^2 <= ~40
    and the f32 normal equations lose < 1e-5 relative; the refinement step
    restores QR-level residuals.  Both methods are asserted equal to the
    XLA path in tests/test_pallas.py.

    VMEM footprint is dominated by 2K+6 [C^2, tile] f32 live arrays
    (~5.3 MB at M=6, C=6, tile=1024; 'sne' peaks similarly on the [K^2,
    tile] N block plus pair fields), hence the smaller default tile than
    the shared kernels.  Returns (w [E, M^2], max_slack [E], bcv [E]).
    """
    E = nx * ny
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    if vops.AZ is None or vops.AP is None:
        raise ValueError("vops must carry the AZ/AP fused precompute")
    if method not in ("qr", "sne"):
        raise ValueError(f"unknown method {method!r}")
    dtype = fem_values.dtype
    x0, hx, y0, hy = geom
    M2, K = vops.Z.shape
    Kb = vops.B.shape[0]
    C2 = vops.AZ.shape[0] // 4
    if method == "sne":
        if vops.NZ is None:
            raise ValueError("method='sne' needs the NZ precompute")
        # Term count from the (static) pair-block count: P = S (S+1) / 2.
        P = vops.NZ.shape[1] // C2
        S = {3: 2, 6: 3, 10: 4}[P]
        pairs = [(s, t) for s in range(S) for t in range(s, S)]
    if grad_a is None:
        raise ValueError(
            "fused_enhance_varcoeff_2d requires analytic grad_a "
            "(problem.grad_a); use the XLA backend for AD-derived gradients"
        )
    ax_fn, ay_fn = grad_a

    # Corner-value views, flattened row-major over quads: [1, E] each.
    u00 = fem_values[:-1, :-1].reshape(1, E)
    u10 = fem_values[:-1, 1:].reshape(1, E)
    u01 = fem_values[1:, :-1].reshape(1, E)
    u11 = fem_values[1:, 1:].reshape(1, E)

    t = jnp.asarray(t_int, dtype)
    C = t.shape[0]
    # In-element offsets of the C x C collocation grid, flattened (iy, ix)
    # row-major to match prepare_shared_2d's operator rows: [C^2, 1].
    dX = (jnp.tile(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hx, dtype)
    dY = (jnp.repeat(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hy, dtype)
    # Trace points: [Kb, 1] offsets + static bilinear shape factors +
    # domain-boundary masks (same packing as fused_enhance_shared_2d).
    ty = jnp.asarray(bpts[:, 0], dtype)[:, None]
    tx = jnp.asarray(bpts[:, 1], dtype)[:, None]
    N00 = 0.25 * (1 - tx) * (1 - ty)
    N10 = 0.25 * (1 + tx) * (1 - ty)
    N01 = 0.25 * (1 - tx) * (1 + ty)
    N11 = 0.25 * (1 + tx) * (1 + ty)
    n_pack = jnp.concatenate([N00, N10, N01, N11], axis=0)  # [4Kb, 1]
    bxy_pack = jnp.concatenate(
        [(tx + 1.0) * jnp.asarray(0.5 * hx, dtype),
         (ty + 1.0) * jnp.asarray(0.5 * hy, dtype),
         (tx == -1.0).astype(dtype), (tx == 1.0).astype(dtype),
         (ty == -1.0).astype(dtype), (ty == 1.0).astype(dtype)],
        axis=0,
    )  # [6Kb, 1]

    inv_s2_f = float(1.0 / s2)
    s2_f = float(s2)
    eps_f = 1e-30
    hi = jax.lax.Precision.HIGHEST

    def kernel(dX_r, dY_r, n_r, bxy_r, u00_r, u10_r, u01_r, u11_r,
               az_r, ap_r, z_r, pbc_r, b_r, *rest):
        if method == "sne":
            nz_r, w_ref, diag_refs = rest[0], rest[1], rest[2:]
        else:
            w_ref, diag_refs = rest[0], rest[1:]
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
        nx32 = jnp.int32(nx)  # keep int32 under jax_enable_x64
        ex = (e_idx % nx32).astype(dtype)
        ey = (e_idx // nx32).astype(dtype)
        xl = jnp.asarray(x0, dtype) + ex * jnp.asarray(hx, dtype)
        yl = jnp.asarray(y0, dtype) + ey * jnp.asarray(hy, dtype)
        xq = xl + dX_r[:]  # [C^2, tile] mapped collocation points
        yq = yl + dY_r[:]
        ones = jnp.ones_like(xq)
        a = a_fn(xq, yq) * ones  # coefficient fields on the VPU
        ax = ax_fn(xq, yq) * ones
        ay = ay_fn(xq, yq) * ones
        if f_shifted_fn is not None:
            f = f_shifted_fn(xl, dX_r[:], yl, dY_r[:])
        else:
            f = f_fn(xq, yq) * ones  # [C^2, tile]
        # Trace rows: bilinear FEM trace, Dirichlet override on the domain
        # boundary (element-position masks x static point masks).
        n00, n10, n01, n11 = (n_r[0:Kb], n_r[Kb:2 * Kb], n_r[2 * Kb:3 * Kb],
                              n_r[3 * Kb:4 * Kb])
        trace = (n00 * u00_r[:] + n10 * u10_r[:] + n01 * u01_r[:]
                 + n11 * u11_r[:])  # [Kb, tile]
        xb = xl + bxy_r[0:Kb]
        yb = yl + bxy_r[Kb:2 * Kb]
        gv = g_fn(xb, yb) * jnp.ones_like(trace)
        is_l = (e_idx % nx32) == 0
        is_r = (e_idx % nx32) == nx32 - 1
        is_b = (e_idx // nx32) == 0
        is_t = (e_idx // nx32) == jnp.int32(ny) - 1
        mask = (
            ((bxy_r[2 * Kb:3 * Kb] > 0.5) & is_l)
            | ((bxy_r[3 * Kb:4 * Kb] > 0.5) & is_r)
            | ((bxy_r[4 * Kb:5 * Kb] > 0.5) & is_b)
            | ((bxy_r[5 * Kb:6 * Kb] > 0.5) & is_t)
        )
        bc = jnp.where(mask, gv, trace)
        # Particular solution + its (scaled) operator image in ONE stacked
        # MXU contraction ([Pbc; AP] @ bc): each K ~ 20 HIGHEST dot pads K
        # to 128, so fusing them halves the padded passes (the
        # fused_enhance_stacked_2d trick, NUMERICS.md 13).
        wpap = jnp.dot(jnp.concatenate([pbc_r[:], ap_r[:]], axis=0), bc,
                       precision=hi, preferred_element_type=dtype)
        wp = wpap[0:M2]  # [M^2, tile]
        apbc = wpap[M2:M2 + 4 * C2]  # [4 C^2, tile]
        Dwp = (-a * apbc[0:C2] - ax * apbc[C2:2 * C2]
               - ay * apbc[2 * C2:3 * C2] + apbc[3 * C2:4 * C2])
        g = f * jnp.asarray(inv_s2_f, dtype) - Dwp  # scaled residual rhs
        eps = jnp.asarray(eps_f, dtype)
        if method == "qr":
            # Projected operator columns, one per null-space direction.
            G = [
                -a * az_r[0:C2, k:k + 1] - ax * az_r[C2:2 * C2, k:k + 1]
                - ay * az_r[2 * C2:3 * C2, k:k + 1]
                + az_r[3 * C2:4 * C2, k:k + 1]
                for k in range(K)
            ]
            # CGS2 QR over the K columns — identical algebra to
            # kkt._batched_mgs_qr_solve, every intermediate in VMEM.
            Qc = []
            R = [[None] * K for _ in range(K)]
            for j in range(K):
                v = G[j]
                for _pass in range(2):
                    for i2 in range(j):
                        rij = jnp.sum(Qc[i2] * v, axis=0, keepdims=True)
                        R[i2][j] = (rij if R[i2][j] is None
                                    else R[i2][j] + rij)
                        v = v - rij * Qc[i2]
                rjj = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
                R[j][j] = rjj
                Qc.append(v / (rjj + eps))
            qtg = [jnp.sum(Qc[j] * g, axis=0, keepdims=True)
                   for j in range(K)]
            y = [None] * K
            for j in reversed(range(K)):
                acc = qtg[j]
                for i2 in range(j + 1, K):
                    acc = acc - R[j][i2] * y[i2]
                y[j] = acc / (R[j][j] + eps)
            ystack = jnp.concatenate(y, axis=0)  # [K, tile]
            if with_diagnostics:
                e_res = g
                for k in range(K):
                    e_res = e_res - G[k] * y[k]
        else:  # 'sne' — semi-normal equations on the MXU
            cs = [-a, -ax, -ay, ones][:S]

            def apply_G(yv):  # [K, tile] -> [C^2, tile]
                Ay = jnp.dot(az_r[0:S * C2], yv, precision=hi,
                             preferred_element_type=dtype)
                out = cs[0] * Ay[0:C2]
                for s in range(1, S):
                    out = out + cs[s] * Ay[s * C2:(s + 1) * C2]
                return out

            def apply_GT(rv):  # [C^2, tile] -> [K, tile]
                st = jnp.concatenate([cs[s] * rv for s in range(S)],
                                     axis=0)
                return jax.lax.dot_general(
                    az_r[0:S * C2], st, (((0,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=dtype,
                )

            # N = G^T G for every element in ONE MXU contraction of the
            # coefficient pair-product fields against the static
            # pair-symmetrised AZ products.  Manual 3-pass bf16 split
            # (hi/lo error-free-ish decomposition, lo x lo dropped): the
            # HIGHEST f32 dot costs 6 bf16 MXU passes — measured exactly
            # its speed-of-light 4.2 ms of the 13 ms kernel at 1024^2 —
            # while 3 passes lose only ~4e-6 relative in N, a
            # kappa(N) <= 40 perturbation the semi-normal refinement step
            # (refine=True) corrects to second order.  Mosaic exposes no
            # BF16_X3 preset (probe: only DEFAULT/HIGHEST legalise).
            pf = jnp.concatenate([cs[s] * cs[t] for (s, t) in pairs],
                                 axis=0)  # [P C^2, tile]
            bf = jnp.bfloat16
            nz_hi = nz_r[:].astype(bf)
            nz_lo = (nz_r[:] - nz_hi.astype(dtype)).astype(bf)
            pf_hi = pf.astype(bf)
            pf_lo = (pf - pf_hi.astype(dtype)).astype(bf)
            lo = jax.lax.Precision.DEFAULT

            def d1(a, b):  # one-pass bf16 MXU dot, f32 accumulate
                return jnp.dot(a, b, precision=lo,
                               preferred_element_type=dtype)

            Nf = d1(nz_hi, pf_hi) + d1(nz_hi, pf_lo) + d1(nz_lo, pf_hi)
            # Unrolled lane-batched Cholesky N = L L^T (SPD by
            # construction; kappa(N) = kappa(G)^2 stays tiny — see
            # docstring).  RIGHT-LOOKING form (NUMERICS.md 19's identified
            # fix): the serial dependency chain through the factorisation
            # is the (j+1, j+1) update path only — ~5 dependent ops per
            # column instead of the left-looking j-long subtract chains
            # (K^2/2 total); all other trailing updates are mutually
            # independent [1, tile] ops the scheduler can overlap.
            Ncur = {}
            for i3 in range(K):
                for k2 in range(i3 + 1):
                    Ncur[(i3, k2)] = Nf[i3 * K + k2:i3 * K + k2 + 1]
            L = [[None] * K for _ in range(K)]
            Ld_inv = [None] * K
            for j in range(K):
                Ljj = jnp.sqrt(jnp.maximum(Ncur[(j, j)], 0.0))
                L[j][j] = Ljj
                Ld_inv[j] = 1.0 / (Ljj + eps)
                for i3 in range(j + 1, K):
                    L[i3][j] = Ncur[(i3, j)] * Ld_inv[j]
                for i3 in range(j + 1, K):
                    for k2 in range(j + 1, i3 + 1):
                        Ncur[(i3, k2)] = (
                            Ncur[(i3, k2)] - L[i3][j] * L[k2][j]
                        )

            def chol_solve(bv):  # [K, tile] -> list of K [1, tile]
                # Column-oriented substitution, same chain-shortening: the
                # rank-1 updates after each pivot are independent rows.
                zz = [None] * K
                rem = [bv[j:j + 1] for j in range(K)]
                for j in range(K):
                    zz[j] = rem[j] * Ld_inv[j]
                    for i3 in range(j + 1, K):
                        rem[i3] = rem[i3] - L[i3][j] * zz[j]
                yy = [None] * K
                remb = [zz[j] for j in range(K)]
                for j in reversed(range(K)):
                    yy[j] = remb[j] * Ld_inv[j]
                    for i3 in range(j):
                        remb[i3] = remb[i3] - L[j][i3] * yy[j]
                return yy

            ystack = jnp.concatenate(chol_solve(apply_GT(g)), axis=0)
            if refine or with_diagnostics:
                e_res = g - apply_G(ystack)
            if refine:
                dstack = jnp.concatenate(chol_solve(apply_GT(e_res)),
                                         axis=0)
                ystack = ystack + dstack
                if with_diagnostics:
                    e_res = e_res - apply_G(dstack)
        w = wp + jnp.dot(z_r[:], ystack, precision=hi,
                         preferred_element_type=dtype)  # [M^2, tile]
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            # Back to the original row scale: f - D w = s2 (g~ - G~ y).
            slack_ref[:] = jnp.asarray(s2_f, dtype) * jnp.max(
                jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - jnp.dot(b_r[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

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
    in_specs = [repl, repl, repl, repl,
                row_block, row_block, row_block, row_block,
                repl, repl, repl, repl, repl]
    inputs = [dX, dY, n_pack, bxy_pack, u00, u10, u01, u11,
              vops.AZ, vops.AP, vops.Z, vops.Pbc, vops.B]
    if method == "sne":
        in_specs.append(repl)
        inputs.append(vops.NZ)
        flops = 2 * E * (K * K * P * C2 + 3 * S * C2 * K
                         + K * K * K // 3 + C2 * (4 * Kb + 16))
    else:
        flops = 2 * E * C2 * (4 * K + 2 * K * K + 4 * Kb + 16)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (4 * E + E * M2 + 2 * E),
            transcendentals=4 * E if f_shifted_fn is not None else E * C2,
        ),
    )(*inputs)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None


@_mosaic_x64_safe
def fused_enhance_graded_2d(
    fem_values: jnp.ndarray,  # [ny+1, nx+1] nodal grid
    gops,  # models.hybrid2d_graded.Graded2DOperators (AZ/AP required)
    problem,  # Problem2D: a0/b/c statics, a_var/grad_a optional, f, g
    xs: jnp.ndarray,  # [nx+1] traced node positions
    ys: jnp.ndarray,  # [ny+1]
    nx: int,
    ny: int,
    t_int,  # [C] interior collocation offsets (reference coords)
    bpts,  # [Kb, 2] (ty, tx) boundary-trace points
    tile: int = 512,  # the five-block working set OOMs the 16 MB scoped
    #                   VMEM at tile=1024 (measured 16.31M at M=6)
    interpret: bool = False,
    with_diagnostics: bool = True,
):
    """Fused graded-mesh 2D enhancement (per-element chain factors).

    2D analog of ``fused_enhance_varcoeff``'s graded mode: element
    geometry comes from row inputs (xl, yl, hx_e, hy_e) instead of index
    arithmetic, and the projected operator columns are per-element-scalar
    combinations of FIVE unit-scale reference blocks
    (``Graded2DOperators.AZ`` = [W20; W02; W10; W01; W00] Z):

        G_k = inv_s2_e [ -a sx^2 (W20 Z)_k - a sy^2 (W02 Z)_k
                         + (bx - a_x) sx (W10 Z)_k
                         + (by - a_y) sy (W01 Z)_k + c (W00 Z)_k ]

    with sx = 2/hx_e, sy = 2/hy_e and the per-element row scale
    inv_s2_e = 1/(sx^2 + sy^2) applied dynamically (a per-element SCALAR,
    so the LSE minimiser is unchanged — same invariance the XLA path's
    per-element RMS normalisation uses).  Solves by the K-column CGS2 QR
    (``method='qr'`` algebra of ``fused_enhance_varcoeff_2d``).

    This is what makes graded/adaptive tensor-product meshes viable at
    production scale: the XLA graded path (``hybrid2d_graded.
    _graded_element_operators`` + ``kkt.solve_batched``) materialises the
    [E, C^2, M^2] D tensor — 5.3 GB at 2^20 quads, M=6.
    Returns (w [E, M^2], max_slack [E], bcv [E]).
    """
    E = nx * ny
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    if gops.AZ is None or gops.AP is None:
        raise ValueError("gops must carry the AZ/AP fused precompute")
    dtype = fem_values.dtype
    M2, K = gops.Z.shape
    Kb = gops.B.shape[0]
    C2 = gops.AZ.shape[0] // 5
    var = problem.a_var is not None
    if var:
        if problem.grad_a is None:
            raise ValueError(
                "fused graded kernel needs analytic grad_a (AD fallback "
                "is the XLA path)")
        ax_fn, ay_fn = problem.grad_a
    bx_c, by_c = problem.b

    # Corner-value views + per-element geometry rows: [1, E] each.
    u00 = fem_values[:-1, :-1].reshape(1, E)
    u10 = fem_values[:-1, 1:].reshape(1, E)
    u01 = fem_values[1:, :-1].reshape(1, E)
    u11 = fem_values[1:, 1:].reshape(1, E)
    hx_e = (xs[1:] - xs[:-1])[None, :] * jnp.ones((ny, 1), dtype)
    hy_e = (ys[1:] - ys[:-1])[:, None] * jnp.ones((1, nx), dtype)
    xl_e = xs[:-1][None, :] * jnp.ones((ny, 1), dtype)
    yl_e = ys[:-1][:, None] * jnp.ones((1, nx), dtype)
    geom_pack = jnp.concatenate(
        [xl_e.reshape(1, E), yl_e.reshape(1, E),
         hx_e.reshape(1, E), hy_e.reshape(1, E)], axis=0)  # [4, E]

    t = jnp.asarray(t_int, dtype)
    C = t.shape[0]
    # HALF-offsets in reference coords (element width applied in-kernel),
    # (iy, ix) row-major like the operator rows: [C^2, 1].
    dX0 = ((jnp.tile(t, C) + 1.0) * 0.5)[:, None]
    dY0 = ((jnp.repeat(t, C) + 1.0) * 0.5)[:, None]
    ty = jnp.asarray(bpts[:, 0], dtype)[:, None]
    tx = jnp.asarray(bpts[:, 1], dtype)[:, None]
    N00 = 0.25 * (1 - tx) * (1 - ty)
    N10 = 0.25 * (1 + tx) * (1 - ty)
    N01 = 0.25 * (1 - tx) * (1 + ty)
    N11 = 0.25 * (1 + tx) * (1 + ty)
    n_pack = jnp.concatenate([N00, N10, N01, N11], axis=0)  # [4Kb, 1]
    bxy_pack = jnp.concatenate(
        [(tx + 1.0) * 0.5, (ty + 1.0) * 0.5,
         (tx == -1.0).astype(dtype), (tx == 1.0).astype(dtype),
         (ty == -1.0).astype(dtype), (ty == 1.0).astype(dtype)],
        axis=0,
    )  # [6Kb, 1] (offsets are half-offsets; width applied in-kernel)

    eps_f = 1e-30
    hi = jax.lax.Precision.HIGHEST

    def kernel(dX_r, dY_r, n_r, bxy_r, u00_r, u10_r, u01_r, u11_r,
               geom_r, az_r, ap_r, z_r, pbc_r, b_r, w_ref, *diag_refs):
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + i * tile
        nx32 = jnp.int32(nx)  # keep int32 under jax_enable_x64
        xl = geom_r[0:1]  # [1, tile]
        yl = geom_r[1:2]
        hx = geom_r[2:3]
        hy = geom_r[3:4]
        sx = 2.0 / hx
        sy = 2.0 / hy
        sx2 = sx * sx
        sy2 = sy * sy
        inv_s2 = 1.0 / (sx2 + sy2)  # per-element row scale
        xq = xl + dX_r[:] * hx  # [C^2, tile] mapped collocation points
        yq = yl + dY_r[:] * hy
        ones = jnp.ones_like(xq)
        if var:
            a = problem.a_var(xq, yq) * ones
            cx = (bx_c - ax_fn(xq, yq)) * ones
            cy = (by_c - ay_fn(xq, yq)) * ones
        else:
            a = jnp.asarray(problem.a0, dtype) * ones
            cx = jnp.asarray(bx_c, dtype) * ones
            cy = jnp.asarray(by_c, dtype) * ones
        f = problem.f(xq, yq) * ones  # [C^2, tile]
        # Per-element term fields against the five unit-scale blocks.
        c1 = -a * sx2 * inv_s2
        c2 = -a * sy2 * inv_s2
        c3 = cx * sx * inv_s2
        c4 = cy * sy * inv_s2
        c5 = jnp.asarray(problem.c, dtype) * inv_s2 * ones
        # Trace rows: bilinear FEM trace, Dirichlet override on the domain
        # boundary.
        n00, n10, n01, n11 = (n_r[0:Kb], n_r[Kb:2 * Kb], n_r[2 * Kb:3 * Kb],
                              n_r[3 * Kb:4 * Kb])
        trace = (n00 * u00_r[:] + n10 * u10_r[:] + n01 * u01_r[:]
                 + n11 * u11_r[:])  # [Kb, tile]
        xb = xl + bxy_r[0:Kb] * hx
        yb = yl + bxy_r[Kb:2 * Kb] * hy
        gv = problem.g(xb, yb) * jnp.ones_like(trace)
        is_l = (e_idx % nx32) == 0
        is_r = (e_idx % nx32) == nx32 - 1
        is_b = (e_idx // nx32) == 0
        is_t = (e_idx // nx32) == jnp.int32(ny) - 1
        mask = (
            ((bxy_r[2 * Kb:3 * Kb] > 0.5) & is_l)
            | ((bxy_r[3 * Kb:4 * Kb] > 0.5) & is_r)
            | ((bxy_r[4 * Kb:5 * Kb] > 0.5) & is_b)
            | ((bxy_r[5 * Kb:6 * Kb] > 0.5) & is_t)
        )
        bc = jnp.where(mask, gv, trace)
        wpap = jnp.dot(jnp.concatenate([pbc_r[:], ap_r[:]], axis=0), bc,
                       precision=hi, preferred_element_type=dtype)
        wp = wpap[0:M2]  # [M^2, tile]
        apbc = wpap[M2:M2 + 5 * C2]  # [5 C^2, tile]
        cs = [c1, c2, c3, c4, c5]
        Dwp = sum(cs[s] * apbc[s * C2:(s + 1) * C2] for s in range(5))
        g = f * inv_s2 - Dwp  # scaled residual rhs
        eps = jnp.asarray(eps_f, dtype)
        G = [
            sum(cs[s] * az_r[s * C2:(s + 1) * C2, k:k + 1]
                for s in range(5))
            for k in range(K)
        ]
        # CGS2 QR — identical algebra to kkt._batched_mgs_qr_solve.
        Qc = []
        R = [[None] * K for _ in range(K)]
        for j in range(K):
            v = G[j]
            for _pass in range(2):
                for i2 in range(j):
                    rij = jnp.sum(Qc[i2] * v, axis=0, keepdims=True)
                    R[i2][j] = (rij if R[i2][j] is None
                                else R[i2][j] + rij)
                    v = v - rij * Qc[i2]
            rjj = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            R[j][j] = rjj
            Qc.append(v / (rjj + eps))
        qtg = [jnp.sum(Qc[j] * g, axis=0, keepdims=True) for j in range(K)]
        y = [None] * K
        for j in reversed(range(K)):
            acc = qtg[j]
            for i2 in range(j + 1, K):
                acc = acc - R[j][i2] * y[i2]
            y[j] = acc / (R[j][j] + eps)
        ystack = jnp.concatenate(y, axis=0)  # [K, tile]
        w = wp + jnp.dot(z_r[:], ystack, precision=hi,
                         preferred_element_type=dtype)  # [M^2, tile]
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            e_res = g
            for k in range(K):
                e_res = e_res - G[k] * y[k]
            # Back to the original row scale: f - D w = s2_e (g~ - G~ y).
            slack_ref[:] = (sx2 + sy2) * jnp.max(
                jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - jnp.dot(b_r[:], w, precision=hi,
                                 preferred_element_type=dtype)
            bcv_ref[:] = jnp.max(jnp.abs(b_res), axis=0, keepdims=True)

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
    geom_block = pl.BlockSpec((4, tile), col, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[repl, repl, repl, repl,
                  row_block, row_block, row_block, row_block,
                  geom_block, repl, repl, repl, repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * E * C2 * (5 * K + 2 * K * K + 4 * Kb + 24),
            bytes_accessed=4 * (8 * E + E * M2 + 2 * E),
            transcendentals=E * C2,
        ),
    )(dX0, dY0, n_pack, bxy_pack, u00, u10, u01, u11, geom_pack,
      gops.AZ, gops.AP, gops.Z, gops.Pbc, gops.B)
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


@_mosaic_x64_safe
def fused_enhance_elastic_2d(
    fem_values: jnp.ndarray,  # [2, ny+1, nx+1] nodal displacement grids
    ops: kkt.SharedOperators,  # block LSE maps (prepare_shared_elastic)
    f_fns,  # (f1, f2) body-force components
    g_fns,  # (g1, g2) Dirichlet data per component
    geom,  # (x0, hx, y0, hy) Python floats
    nx: int,
    ny: int,
    t_int,  # [C] interior collocation offsets
    bpts,  # [K, 2] (ty, tx) boundary-trace points
    tile: int = 4096,
    interpret: bool = False,
    with_diagnostics: bool = True,
):
    """Fused VECTOR (elasticity) enhancement: the 2-component analog of
    ``fused_enhance_shared_2d``.

    Per element tile, entirely in VMEM: both components' collocation rhs
    [2C^2, tile] and bilinear traces with Dirichlet override [2K, tile]
    are built in-kernel from the two nodal grids, then ONE stacked MXU
    dot w = [Wf | Wbc] [f; bc] -> [2M^2, tile] (NUMERICS.md 13: the
    two-dot layout measured 0.31x of XLA; stacking brought it to 0.87x).

    MEASURED OUTCOME (round 5, NUMERICS.md 35): this kernel LOSES to the
    XLA route on-chip — same-run A/B at 512^2 M=4: XLA 0.623 ms vs
    stacked kernel 0.720 ms (no-diag: 0.496 vs 0.763); tile 2048/8192
    worse.  Both paths sit at ~10x the 47 us pure-bandwidth SOL — the
    cost is the per-element data build + small-K HIGHEST dots, which XLA
    schedules better here than the VMEM-resident kernel.  'auto' routing
    therefore selects XLA; this kernel stays selectable
    (backend='pallas') as the recorded alternative, correctness-gated by
    tests/test_pallas.py::test_fused_elastic_matches_xla_path.
    """
    E = nx * ny
    if E % tile:
        raise ValueError(f"E={E} not a multiple of tile={tile}")
    if tile % 128:
        raise ValueError(f"tile={tile} must be a multiple of 128 lanes")
    dtype = fem_values.dtype
    x0, hx, y0, hy = geom
    M2x2 = ops.Wf.shape[0]  # 2 M^2
    K = bpts.shape[0]
    f1_fn, f2_fn = f_fns
    g1_fn, g2_fn = g_fns

    # Corner-value views per component, [1, E] each (8 row streams).
    corners = []
    for c in range(2):
        fv = fem_values[c]
        corners += [fv[:-1, :-1].reshape(1, E), fv[:-1, 1:].reshape(1, E),
                    fv[1:, :-1].reshape(1, E), fv[1:, 1:].reshape(1, E)]

    t = jnp.asarray(t_int, dtype)
    C = t.shape[0]
    dX = (jnp.tile(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hx, dtype)
    dY = (jnp.repeat(t, C)[:, None] + 1.0) * jnp.asarray(0.5 * hy, dtype)
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

    def kernel(dX_r, dY_r, n_r, bxy_r,
               u00a, u10a, u01a, u11a, u00b, u10b, u01b, u11b,
               wfb_r, db_r, w_ref, *diag_refs):
        i = pl.program_id(0)
        e_idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) \
            + i * tile
        nx32 = jnp.int32(nx)
        ex = (e_idx % nx32).astype(dtype)
        ey = (e_idx // nx32).astype(dtype)
        xl = jnp.asarray(x0, dtype) + ex * jnp.asarray(hx, dtype)
        yl = jnp.asarray(y0, dtype) + ey * jnp.asarray(hy, dtype)
        xq = xl + dX_r[:]
        yq = yl + dY_r[:]
        f = jnp.concatenate(
            [f1_fn(xq, yq), f2_fn(xq, yq)], axis=0)  # [2 C^2, tile]
        n00, n10, n01, n11 = (n_r[0:K], n_r[K:2 * K], n_r[2 * K:3 * K],
                              n_r[3 * K:4 * K])
        xb = xl + bxy_r[0:K]
        yb = yl + bxy_r[K:2 * K]
        is_l = (e_idx % nx32) == 0
        is_r = (e_idx % nx32) == nx32 - 1
        is_b = (e_idx // nx32) == 0
        is_t = (e_idx // nx32) == jnp.int32(ny) - 1
        mask = (
            ((bxy_r[2 * K:3 * K] > 0.5) & is_l)
            | ((bxy_r[3 * K:4 * K] > 0.5) & is_r)
            | ((bxy_r[4 * K:5 * K] > 0.5) & is_b)
            | ((bxy_r[5 * K:6 * K] > 0.5) & is_t)
        )
        tr1 = (n00 * u00a[:] + n10 * u10a[:] + n01 * u01a[:]
               + n11 * u11a[:])
        tr2 = (n00 * u00b[:] + n10 * u10b[:] + n01 * u01b[:]
               + n11 * u11b[:])
        gv1 = g1_fn(xb, yb) * jnp.ones_like(tr1)
        gv2 = g2_fn(xb, yb) * jnp.ones_like(tr2)
        bc = jnp.concatenate(
            [jnp.where(mask, gv1, tr1), jnp.where(mask, gv2, tr2)],
            axis=0)  # [2K, tile]
        # ONE stacked MXU dot (NUMERICS.md 13: separately K-padded
        # HIGHEST dots dominate generic-kernel cost): [Wf | Wbc] against
        # [f; bc] — K-dim 2C^2 + 2K pads to one 128 tile instead of two.
        fb = jnp.concatenate([f, bc], axis=0)  # [2C^2 + 2K, tile]
        w = jnp.dot(wfb_r[:], fb, precision=hi,
                    preferred_element_type=dtype)
        w_ref[:] = w
        if with_diagnostics:
            slack_ref, bcv_ref = diag_refs
            # stacked residual projector [D; B] w in one dot too
            db = jnp.dot(db_r[:], w, precision=hi,
                         preferred_element_type=dtype)
            nC2 = f.shape[0]
            e_res = f - db[:nC2]
            slack_ref[:] = jnp.max(jnp.abs(e_res), axis=0, keepdims=True)
            b_res = bc - db[nC2:]
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
    out_shape = [jax.ShapeDtypeStruct((M2x2, E), dtype)]
    out_specs = [pl.BlockSpec((M2x2, tile), col,
                              memory_space=pltpu.VMEM)]
    if with_diagnostics:
        out_shape += [jax.ShapeDtypeStruct((1, E), dtype)] * 2
        out_specs += [
            pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
        ] * 2
    repl = pl.BlockSpec(memory_space=pltpu.VMEM)
    row_block = pl.BlockSpec((1, tile), col, memory_space=pltpu.VMEM)
    Wfb = jnp.concatenate([ops.Wf, ops.Wbc], axis=1)  # [2M^2, 2C^2+2K]
    DB = jnp.concatenate([ops.D, ops.B], axis=0)  # [2C^2+2K, 2M^2]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[repl, repl, repl, repl]
        + [row_block] * 8 + [repl, repl],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
    )(dX, dY, n_pack, bxy_pack, *corners, Wfb, DB)
    if with_diagnostics:
        wT, slack, bcv = outs
        return wT.T, slack[0], bcv[0]
    return outs[0].T, None, None
