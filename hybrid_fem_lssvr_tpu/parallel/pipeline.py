"""GPipe-style two-stage pipeline over a ``('stage',)`` mesh axis.

SURVEY.md section 2.3 (PP row) prescribes a two-stage software pipeline:
stage A = coarse FEM solve, stage B = LSSVR enhancement.  The round-2
implementation was host-side async dispatch (``models.hybrid.sweep_solve``
+ donation), whose overlap the ~30 ms host tunnel swamps (RESULTS.md).
This module is the genuine *device-level* pipeline: microbatches (load
cases / parametric-family instances) stream through a 2-device ``stage``
group; the activation (the FEM nodal-value vector) hops stage 0 -> 1 via
one ``ppermute`` per tick inside ``lax.scan``, so in steady state the FEM
solve of case ``i`` runs on device 0 concurrently with the enhancement of
case ``i-1`` on device 1 — true inter-stage overlap, not queue-level
dispatch.  Schedule: ``T = B + 1`` ticks for ``B`` microbatches and
``S = 2`` stages; bubble fraction ``(S-1)/(B+S-1)`` -> 0 as the campaign
grows.

Composition with the other axes: the stage group is independent of the
element axis, so a ``Mesh(('stage', 'elements'))`` runs this pipeline with
each stage's work itself element-sharded (DP x PP) — the element axis is
simply vmapped/sharded inside each stage function.

The reference has no analog (its per-element loop is sequential,
``Hybrid-FEM-LSSVR.py:151-176``); this is the TPU-native pattern for
many-load-case campaigns (uncertainty quantification, frequency sweeps)
where the serial tridiagonal FEM stage and the MXU-heavy KKT batch have
complementary hardware footprints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.hybrid import (Solution, fem_solve, lssvr_enhance,
                             uniform_nodes)

STAGE_AXIS = "stage"


DATA_AXIS = "data"


def stage_mesh(n_stages: int = 2, devices=None):
    """A 1-axis ('stage',) mesh of the first ``n_stages`` devices."""
    if devices is None:
        devices = jax.devices()[:n_stages]
    return jax.sharding.Mesh(devices, (STAGE_AXIS,))


def data_stage_mesh(n_data: int, n_stages: int = 2, devices=None):
    """A ('data', 'stage') mesh: ``n_data`` independent 2-stage pipelines
    (DP x PP composition — each data-group streams its own shard of the
    load-case batch through its own FEM->enhancement stage pair)."""
    import numpy as np

    if devices is None:
        devices = jax.devices()[: n_data * n_stages]
    dev = np.asarray(devices).reshape(n_data, n_stages)
    return jax.sharding.Mesh(dev, (DATA_AXIS, STAGE_AXIS))


def pipeline_schedule(n_micro: int, n_stages: int = 2):
    """(ticks, bubble_fraction) for the 1F GPipe schedule."""
    ticks = n_micro + n_stages - 1
    return ticks, (n_stages - 1) / ticks


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def pipelined_family_solve(family, cfg, mesh, thetas: jnp.ndarray):
    """Two-stage pipelined sweep over a parametric family's load cases.

    Equivalent to ``models.batched.solve_family`` (one vmapped solve) but
    executed as a streaming pipeline over the ``('stage',)`` mesh: device 0
    owns the coarse FEM stage, device 1 the enhancement stage.  Returns a
    ``Solution`` with a leading microbatch axis ``[B, ...]``, equal to the
    vmapped reference path (asserted in tests/test_pipeline.py).

    DP x PP composition: pass a ``('data', 'stage')`` mesh
    (``data_stage_mesh``) and the load-case batch shards contiguously
    over the data axis — each data-group runs an independent 2-stage
    pipeline on its ``B / n_data`` cases.

    thetas: [B] or [B, d] parameter batch; B static (divisible by the
    data-axis size).
    """
    if mesh.shape[STAGE_AXIS] != 2:
        raise ValueError(
            f"the FEM->enhancement pipeline has 2 stages; got a "
            f"{mesh.shape[STAGE_AXIS]}-device '{STAGE_AXIS}' mesh"
        )
    n_data = mesh.shape.get(DATA_AXIS, 1)
    dtype = cfg.jnp_dtype()
    B_total = thetas.shape[0]
    if B_total % n_data:
        raise ValueError(
            f"load-case batch {B_total} must divide by the "
            f"{n_data}-group '{DATA_AXIS}' axis"
        )
    B = B_total // n_data  # microbatches per pipeline
    N = cfg.num_nodes
    E = N - 1
    M = cfg.M
    ticks = B + 1  # S=2 stages

    def local(thetas_r):
        s = jax.lax.axis_index(STAGE_AXIS)

        def tick(act_in, t):
            # --- stage 0: FEM coarse solve of microbatch t ------------
            def stage0(_act):
                theta = thetas_r[jnp.clip(t, 0, B - 1)]
                problem = family.instantiate(theta)
                nodes = uniform_nodes(problem, N, dtype)
                fem = fem_solve(problem, nodes, cfg)
                zero = (jnp.zeros((E, M), dtype), jnp.zeros((E,), dtype),
                        jnp.zeros((E,), dtype), jnp.zeros((E,), bool))
                return fem, zero

            # --- stage 1: LSSVR enhancement of microbatch t-1 ---------
            def stage1(act):
                theta = thetas_r[jnp.clip(t - 1, 0, B - 1)]
                problem = family.instantiate(theta)
                nodes = uniform_nodes(problem, N, dtype)
                w, diags = lssvr_enhance(problem, nodes, act, cfg,
                                         shared_ops=None)
                out = (w, diags.max_slack, diags.bc_violation,
                       diags.solve_ok)
                return jnp.zeros((N,), dtype), out

            act_out, res = jax.lax.cond(s == 0, stage0, stage1, act_in)
            # Rotate the activation one stage forward (0 -> 1); device 0
            # receives zeros (no upstream stage).
            act_next = jax.lax.ppermute(act_out, STAGE_AXIS, [(0, 1)])
            # Stage 0 also forwards its fem values as a *result* so the
            # caller can report them; ride the same rotation.
            fem_fwd = jax.lax.ppermute(
                jax.lax.cond(s == 0, lambda: act_out,
                             lambda: jnp.zeros((N,), dtype)),
                STAGE_AXIS, [(0, 1)])
            return act_next, (res, fem_fwd)

        act0 = jnp.zeros((N,), dtype)
        _, (results, fems) = jax.lax.scan(tick, act0,
                                          jnp.arange(ticks))
        # Stack this device's per-tick outputs behind leading axes of
        # size 1 so the out_specs concatenate data-group and stage rows.
        lead = (1, 1) if has_data else (1,)
        leaves = [r.reshape(lead + r.shape) for r in results]
        leaves.append(fems.reshape(lead + fems.shape))
        return tuple(leaves)

    has_data = DATA_AXIS in mesh.shape
    spec = P(DATA_AXIS, STAGE_AXIS) if has_data else P(STAGE_AXIS)
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS) if has_data else P(),),
        out_specs=(spec,) * 5,
        check_vma=False,
    )
    outs = sharded(jnp.asarray(thetas))
    if not has_data:
        outs = tuple(o[None] for o in outs)  # fake data axis of size 1
    w2, slack2, bcv2, ok2, fem2 = outs
    # Stage row 1 = the enhancement stage's outputs; tick t holds
    # microbatch t-1, so drop the warm-up bubble tick 0; then flatten the
    # (data-group, local-microbatch) axes back to the contiguous batch.
    def fold(a):  # [D, B, ...] -> [B_total, ...]
        return a.reshape((B_total,) + a.shape[2:])

    w, slack, bcv, ok = (fold(w2[:, 1, 1:]), fold(slack2[:, 1, 1:]),
                         fold(bcv2[:, 1, 1:]), fold(ok2[:, 1, 1:]))
    # The fem ride-along permutes within tick t, so stage 1's record at
    # tick t is microbatch t's nodal values: ticks 0..B-1 align with the
    # enhancement rows above.
    fem = fold(fem2[:, 1, :-1])
    x0, x1 = family.domain
    nodes = jnp.broadcast_to(jnp.linspace(x0, x1, N, dtype=dtype),
                             (B_total, N))
    return Solution(nodes, fem, w, slack, bcv, ok)
