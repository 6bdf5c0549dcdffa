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
    fem_solve_2d, prepare_shared_2d,
)
from ..ops import kkt
from .mesh import ELEMENT_AXIS


class ShardedSolution2D(NamedTuple):
    coeffs: jnp.ndarray  # [ny, nx, M, M] sharded over element rows
    fem_values: jnp.ndarray  # [ny+1, nx+1] replicated
    solve_ok: jnp.ndarray  # [ny, nx]


def make_sharded_solve_2d(problem: Problem2D, cfg: Solver2DConfig, mesh,
                          axis: str = ELEMENT_AXIS):
    """Jitted multi-chip 2D solve; cfg.ny must divide by the device count."""
    n_dev = mesh.shape[axis]
    if cfg.ny % n_dev:
        raise ValueError(f"ny={cfg.ny} not divisible by {n_dev} devices")
    ny_loc = cfg.ny // n_dev
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
        ys = jnp.linspace(y0, y1, cfg.ny + 1, dtype=dtype)
        # Replicated coarse stage: every device computes the same nodal grid.
        fem_values, _ = fem_solve_2d(problem, cfg, xs, ys)
        row0 = d * ny_loc
        ys_loc = jax.lax.dynamic_slice(ys, (row0,), (ny_loc + 1,))
        fem_loc = jax.lax.dynamic_slice(
            fem_values, (row0, jnp.zeros_like(row0)),
            (ny_loc + 1, cfg.nx + 1),
        )
        f_rows, bc_rows, corners = _element_data_2d(
            problem, cfg, xs, ys_loc, fem_loc, t_int, bpts,
            row_offset=row0,
        )
        w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
        M = cfg.M
        coeffs = w.reshape(ny_loc, cfg.nx, M, M)
        fb = _bilinear_fallback_coeffs(*corners, M)
        ok = diags.solve_ok.reshape(ny_loc, cfg.nx)
        coeffs = jnp.where(
            ok[..., None, None],
            jnp.where(jnp.isfinite(coeffs), coeffs, 0.0), fb,
        )
        return coeffs, fem_values[None], ok

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(axis), P(), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run():
        coeffs, fem_rep, ok = sharded(shared, t_int, bpts)
        return ShardedSolution2D(coeffs, fem_rep[0], ok)

    return run
