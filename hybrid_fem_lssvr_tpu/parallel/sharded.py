"""Multi-chip hybrid solve: distributed assembly, SPIKE tridiagonal solve,
sharded LSSVR enhancement — all inside one ``shard_map``.

The reference's analog of sequence length is the element count E, scaled as
a sequential Python loop at ~15 elements/sec (SURVEY.md section 5,
``Hybrid-FEM-LSSVR.py:151``).  Here E shards contiguously over a 1-D device
mesh:

* **Distributed assembly**: each device computes its local elements' 2x2
  stiffness blocks; interface-node contributions arrive from the right
  neighbour via one ``ppermute`` (halo width 1 — the ring pattern).
* **Distributed tridiagonal solve (SPIKE)**: local Thomas elimination with 3
  right-hand sides (rhs + the two coupling spikes), one ``all_gather`` of 6
  scalars per device, a redundantly-solved reduced system of size
  2*n_devices, local back-substitution.  Depth: one local O(E/D) scan + an
  O(1)-sized collective, vs O(E) sequential.
* **Sharded enhancement**: every device runs the batched KKT/matmul path on
  its own element range; the only remote data it needs — the nodal value at
  its left interface — is already in the gathered reduced solution, so the
  enhancement needs NO extra communication.

Dirichlet rows are eliminated before distribution: the global interior
system has E-1 unknowns, padded with one dummy identity row to E so every
device owns exactly E/D rows (static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.hybrid import SolverConfig, lssvr_enhance, prepare_shared_host
from ..models.problem import Problem1D
from ..ops import assembly, tridiag
from .mesh import ELEMENT_AXIS


class ShardedSolution(NamedTuple):
    coeffs: jnp.ndarray  # [E_total, M] sharded over elements
    fem_local: jnp.ndarray  # [n_dev, E_loc + 1] per-device nodal values
    max_slack: jnp.ndarray  # [E_total]
    bc_violation: jnp.ndarray  # [E_total]
    solve_ok: jnp.ndarray  # [E_total]


def _local_nodes(problem, E_total, E_loc, d, dtype):
    x0, x1 = problem.domain
    h = (x1 - x0) / E_total
    base = x0 + (d * E_loc).astype(dtype) * h
    idx = jnp.arange(E_loc + 1, dtype=dtype)
    return base + idx * h


def _local_assembly(problem, cfg, nodes_loc, d, n_dev, axis, E_total):
    """Local rows of the Dirichlet-eliminated interior tridiagonal system.

    Device d owns interior rows [d*E_loc, (d+1)*E_loc) of the padded
    E_total-row system (interior node j = row + 1); returns local diagonals
    (a, b, c), rhs, and the SPIKE couplings (l to the left neighbour's last
    unknown, u to the right neighbour's first unknown).
    """
    dtype = nodes_loc.dtype
    E_loc = nodes_loc.shape[0] - 1
    K, bvec = assembly.element_contributions(
        nodes_loc, problem.a, problem.b, problem.c, problem.f,
        quad_order=cfg.fem_quad_order,
    )  # [E_loc, 2, 2], [E_loc, 2]

    # Halo: row r needs element r+1's (K00, K01, b0); the last row needs the
    # right neighbour's first element -> one ppermute shifting left.
    first_elem = jnp.stack([K[0, 0, 0], K[0, 0, 1], bvec[0, 0]])
    halo = jax.lax.ppermute(
        first_elem, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    K00_next = jnp.concatenate([K[1:, 0, 0], halo[0][None]])
    K01_next = jnp.concatenate([K[1:, 0, 1], halo[1][None]])
    b0_next = jnp.concatenate([bvec[1:, 0], halo[2][None]])

    diag = K[:, 1, 1] + K00_next
    sub = K[:, 1, 0]  # couples row r to interior unknown r-1
    sup = K01_next  # couples row r to interior unknown r+1
    rhs = bvec[:, 1] + b0_next

    g_l = jnp.asarray(problem.g_left, dtype)
    g_r = jnp.asarray(problem.g_right, dtype)
    is_first = d == 0
    # Global padded interior index of each local row (interior unknowns are
    # nodes 1..E_total-1, i.e. indices 0..E_total-2; everything at or past
    # E_total-1 is a dummy padding row).  E_total need not divide evenly:
    # dummies fill the tail slabs (SURVEY.md section 4 #6 pad-mask).
    i_glob = d * E_loc + jnp.arange(E_loc)
    dummy = i_glob >= E_total - 1
    last_true = i_glob == E_total - 2  # couples to the right boundary node

    # Dirichlet column elimination.
    rhs = rhs.at[0].add(jnp.where(is_first, -sub[0] * g_l, 0.0))
    rhs = rhs + jnp.where(last_true, -sup * g_r, 0.0)
    diag = jnp.where(dummy, 1.0, diag)
    rhs = jnp.where(dummy, 0.0, rhs)
    sub = jnp.where(dummy, 0.0, sub)
    sup = jnp.where(dummy | last_true, 0.0, sup)

    # SPIKE couplings: strip the inter-device entries out of the local block.
    l_coup = jnp.where(is_first | dummy[0], 0.0, sub[0])
    u_coup = jnp.where(dummy[-1] | last_true[-1], 0.0, sup[-1])
    sub = sub.at[0].set(0.0)
    sup = sup.at[-1].set(0.0)
    return sub, diag, sup, rhs, l_coup, u_coup


def _spike_solve(sub, diag, sup, rhs, l_coup, u_coup, d, n_dev, axis):
    """Distributed tridiagonal solve; returns the local interior unknowns
    plus the left-interface value (the left neighbour's last unknown)."""
    E_loc = diag.shape[0]
    dtype = diag.dtype
    e0 = jnp.zeros(E_loc, dtype).at[0].set(1.0)
    eR = jnp.zeros(E_loc, dtype).at[-1].set(1.0)
    rhs3 = jnp.stack([rhs, l_coup * e0, u_coup * eR], axis=1)  # [E_loc, 3]
    # 'auto': Thomas for small slabs, blocked SPIKE beyond 8192 rows — a
    # length-E_loc sequential scan serialises the TPU (measured ~7 s for
    # one 2^20-row slab on a 1-device mesh vs ~ms blocked).
    sol3 = tridiag.solve(sub, diag, sup, rhs3, method="auto")
    g, v, w = sol3[:, 0], sol3[:, 1], sol3[:, 2]

    # Reduced system over boundary unknowns (x_first, x_last) per device:
    #   x_first + v[0] x_last(d-1)  + w[0] x_first(d+1)  = g[0]
    #   x_last  + v[-1] x_last(d-1) + w[-1] x_first(d+1) = g[-1]
    locals6 = jnp.stack([v[0], v[-1], w[0], w[-1], g[0], g[-1]])
    allv = jax.lax.all_gather(locals6, axis)  # [n_dev, 6]
    n2 = 2 * n_dev
    R = jnp.eye(n2, dtype=dtype)
    rr = jnp.zeros(n2, dtype)
    for dd in range(n_dev):
        v1, vR, w1, wR, g1, gR = (allv[dd, k] for k in range(6))
        if dd > 0:
            R = R.at[2 * dd, 2 * (dd - 1) + 1].set(v1)
            R = R.at[2 * dd + 1, 2 * (dd - 1) + 1].set(vR)
        if dd < n_dev - 1:
            R = R.at[2 * dd, 2 * (dd + 1)].set(w1)
            R = R.at[2 * dd + 1, 2 * (dd + 1)].set(wR)
        rr = rr.at[2 * dd].set(g1).at[2 * dd + 1].set(gR)
    # 2*n_dev unknowns, solved redundantly per device; unrolled pivoted
    # Gauss keeps the path TPU-emulated-f64-legal (LU is not).
    y = tridiag.gauss_small(R, rr)

    xl = jnp.where(d > 0, y[jnp.maximum(2 * (d - 1) + 1, 0)], 0.0)
    xr = jnp.where(
        d < n_dev - 1, y[jnp.minimum(2 * (d + 1), n2 - 1)], 0.0
    )
    x_loc = g - v * xl - w * xr
    return x_loc, xl


def make_sharded_solve(problem: Problem1D, cfg: SolverConfig, mesh,
                       axis: str = ELEMENT_AXIS,
                       enhance_backend: str = "auto"):
    """Build the jitted multi-chip hybrid solve over ``mesh``.

    Uniform mesh; any element count (tail slabs carry masked dummy padding
    when E_total does not divide by the device count — outputs are sliced
    back to E_total).  Returns a zero-argument jitted callable producing a
    ShardedSolution (coeffs sharded over the element axis).

    ``enhance_backend``: 'auto' runs the fused separable Pallas kernel per
    shard on TPU when the problem/config support it (per-shard x0 enters
    the kernel as a traced input), else the XLA shared-matmul path;
    'xla' forces XLA; 'pallas-interpret' forces the kernel in interpreter
    mode (CI equality testing on virtual CPU meshes).
    """
    n_dev = mesh.shape[axis]
    E_total = cfg.num_nodes - 1
    E_loc = -(-E_total // n_dev)  # ceil: tail slabs carry dummy padding
    if E_loc < 2:
        raise ValueError("need at least 2 elements per device")
    if problem.bc_left != "dirichlet" or problem.bc_right != "dirichlet":
        raise NotImplementedError(
            "the distributed 1D solve eliminates boundary unknowns "
            "structurally (Dirichlet only); Neumann/Robin problems run "
            "on the single-device path (models.hybrid.HybridSolver)"
        )
    if cfg.fem_dtype is not None:
        from ..utils.checks import require_x64

        require_x64(cfg.fem_dtype, "SolverConfig.fem_dtype")
    dtype = cfg.jnp_dtype()
    shared = prepare_shared_host(problem, cfg)
    if shared is not None:
        # Pin the replicated operators to THIS mesh's devices (the mesh may
        # live on a non-default backend, e.g. virtual CPU devices in tests).
        shared = jax.device_put(
            shared, jax.sharding.NamedSharding(mesh, P())
        )

    def local_step(shared_ops):
        d = jax.lax.axis_index(axis)
        # Coarse-stage dtype override (cfg.fem_dtype — the FEM system's
        # kappa ~ N^2 makes a pure-f32 coarse solve meaningless past ~1e3
        # elements, models/hybrid.py): assembly + SPIKE run in fd
        # (TPU-emulated f64 is elementwise/scan-legal), nodal values cast
        # back to the run dtype for the enhancement fast path.
        fd = jnp.dtype(cfg.fem_dtype) if cfg.fem_dtype is not None \
            else dtype
        nodes_f = _local_nodes(problem, E_total, E_loc, d, fd)
        sub, diag, sup, rhs, l_coup, u_coup = _local_assembly(
            problem, cfg, nodes_f, d, n_dev, axis, E_total
        )
        x_loc, xl = _spike_solve(
            sub, diag, sup, rhs, l_coup, u_coup, d, n_dev, axis
        )
        nodes_loc = nodes_f.astype(dtype)
        # Local nodal values (E_loc + 1): left interface then local interior;
        # edge devices overwrite their outermost value with Dirichlet data.
        g_l = jnp.asarray(problem.g_left, fd)
        g_r = jnp.asarray(problem.g_right, fd)
        left_val = jnp.where(d == 0, g_l, xl)
        fem_loc = jnp.concatenate([left_val[None], x_loc]).astype(dtype)
        # The global right-boundary node (index E_total) may sit mid-slab
        # when E_total does not divide evenly; mask by global node id.
        node_ids = d * E_loc + jnp.arange(E_loc + 1)
        fem_loc = jnp.where(node_ids == E_total, g_r.astype(dtype),
                            fem_loc)
        # Boundary-element bc overrides are no-ops here because fem_loc holds
        # the exact Dirichlet data at the boundary nodes (masked above);
        # touches_right=False avoids overriding a padded tail element.
        use_pallas = enhance_backend == "pallas-interpret" or (
            enhance_backend == "auto"
            and jax.default_backend() == "tpu"
            and cfg.jnp_dtype() == jnp.float32  # kernels are f32-only
            and cfg.backend in ("auto", "pallas")
        )
        if (
            use_pallas
            and shared_ops is not None
            and shared_ops.WfF is not None
            and problem.f_elem_factors is not None
            and cfg.diagnostics
        ):
            from ..ops import pallas_kernels as pk

            tile = pk.pick_tile(E_loc)
            if tile >= 128:
                # Per-shard left edge as a traced kernel input; fem_loc
                # already holds Dirichlet-correct boundary values.
                x0g, x1g = problem.domain
                h = (x1g - x0g) / E_total
                x0_loc = jnp.asarray(x0g, dtype) \
                    + (d * E_loc).astype(dtype) * jnp.asarray(h, dtype)
                w, slack, bcv, okf = pk.fused_enhance_separable(
                    fem_loc, shared_ops, problem.f_elem_factors,
                    x0_loc, h, tile=tile, with_fallback=True,
                    f_translation=problem.f_translation,
                    interpret=(enhance_backend == "pallas-interpret"),
                )
                return w, fem_loc[None], slack, bcv, okf > 0.5
        if (
            use_pallas
            and shared_ops is None
            and cfg.M >= 3
            and cfg.kkt_method in ("auto", "qr")
        ):
            # Distributed variable-coefficient enhancement through the fused
            # CGS2-QR kernel in graded mode: per-shard element positions
            # enter as the traced local node array, so no compile-time
            # origin is needed and every shard runs the identical kernel
            # (previously this fell back to the ~60-op XLA MGS-QR path).
            from ..models.hybrid import _pallas_finalize
            from ..ops import pallas_kernels as pk

            tile = pk.pick_tile(E_loc)
            if tile >= 128:
                x0g, x1g = problem.domain
                h = (x1g - x0g) / E_total  # true width: rho == 1 in-kernel
                host = pk.VarCoeffOperators(cfg.M, cfg.n_colloc, h, dtype)
                w, slack, bcv, cond = pk.fused_enhance_varcoeff(
                    fem_loc, problem, host, x0g, h, cfg.n_colloc,
                    tile=tile, with_diagnostics=cfg.diagnostics,
                    nodes=nodes_loc,
                    interpret=(enhance_backend == "pallas-interpret"),
                )
                w, diags = _pallas_finalize(
                    w, slack, bcv, fem_loc[:-1], fem_loc[1:], cfg,
                    cond=cond,
                )
                return (w, fem_loc[None], diags.max_slack,
                        diags.bc_violation, diags.solve_ok)
        w, diags = lssvr_enhance(
            problem, nodes_loc, fem_loc, cfg, shared_ops=shared_ops,
            touches_left=(d == 0), touches_right=False,
        )
        return (
            w,
            fem_loc[None],
            diags.max_slack,
            diags.bc_violation,
            diags.solve_ok,
        )

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(),),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run():
        w, fem_loc, slack, bcv, ok = sharded(shared)
        # Strip padded tail elements (present when E_total % n_dev != 0).
        return ShardedSolution(
            w[:E_total], fem_loc, slack[:E_total], bcv[:E_total],
            ok[:E_total],
        )

    return run


def make_sharded_evaluate(problem: Problem1D, cfg: SolverConfig, mesh,
                          axis: str = ELEMENT_AXIS):
    """Distributed read path: query points stay replicated; every device
    evaluates only the points inside its element range against its LOCAL
    coefficient shard; one psum assembles the full result (reference clamp
    semantics preserved via the global element clip).

    Returns a jitted fn(coeffs_sharded [E_total_padded_or_not, M], x [P])
    -> u [P] (replicated).  Pass the coeffs from make_sharded_solve's
    output padded back to n_dev * E_loc if E_total was indivisible."""
    import numpy as np

    from ..ops import legendre as lg

    n_dev = mesh.shape[axis]
    E_total = cfg.num_nodes - 1
    E_loc = -(-E_total // n_dev)
    dtype = cfg.jnp_dtype()
    x0, x1 = problem.domain
    h = (x1 - x0) / E_total

    def local_eval(coeffs_loc, x):
        d = jax.lax.axis_index(axis)
        e = jnp.clip(((x - x0) / h).astype(jnp.int32), 0, E_total - 1)
        lo = d * E_loc
        mine = (e >= lo) & (e < lo + E_loc)
        e_loc = jnp.clip(e - lo, 0, E_loc - 1)
        xl = jnp.asarray(x0, dtype) + e.astype(dtype) * jnp.asarray(h,
                                                                    dtype)
        t = (2.0 * (x - xl)) / h - 1.0
        val = lg.evaluate_series(coeffs_loc[e_loc], t)
        return jax.lax.psum(jnp.where(mine, val, 0.0), axis)

    sharded = jax.shard_map(
        local_eval, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def evaluate(coeffs, x):
        pad = n_dev * E_loc - coeffs.shape[0]
        if pad:
            coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
        return sharded(coeffs, jnp.asarray(x, dtype))

    return evaluate
