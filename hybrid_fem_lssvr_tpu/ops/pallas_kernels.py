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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kkt, legendre


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


def pick_tile(E: int, max_tile: int = 8192) -> int:
    """Largest power-of-two tile (multiple of 128) dividing E, or 0 if E has
    no 128-aligned power-of-two factor (caller falls back to the XLA path)."""
    t = E & (-E)  # largest power-of-2 divisor
    t = min(t, max_tile)
    return t if t >= 128 else 0
