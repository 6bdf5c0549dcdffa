"""Hybrid FEM + LSSVR orchestration: the framework's main entry point.

TPU-native re-design of the reference's ``FEMLSSVRPrimalSolver``
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:107-211``):

* ``solve_fem``            -> jit-compiled P1 assembly + tridiagonal solve
                              (reference ``:117-145``).
* ``solve_lssvr_subproblems`` (sequential SLSQP loop, ``:147-176``)
                           -> one batched KKT solve over all elements, with
                              the shared-operator two-matmul fast path when
                              the mesh is uniform and coefficients constant.
* ``evaluate_solution``    -> searchsorted + batched Legendre evaluation
                              (reference ``:184-211``).

The core is a pure, jittable function ``hybrid_solve``; ``HybridSolver`` is
a thin stateful facade with the reference's API shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import assembly, eval as ops_eval, kkt, legendre, tridiag
from .problem import Problem1D


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """All reference hard-coded literals as named fields (SURVEY.md 5:
    config): 12 collocation points ``:40``, SLSQP options ``:91`` are
    subsumed by the closed-form solve, defaults from ``__main__`` ``:220``."""

    num_nodes: int = 25
    M: int = 8  # Legendre coefficients per element (reference lssvr_M)
    gamma: float = 1.0e4  # regularisation (reference lssvr_gamma)
    n_colloc: int = 12  # PDE collocation points per element (ref ``:40``)
    formulation: str = "primal"  # 'primal' | 'dual'
    kkt_method: str = "auto"  # 'auto' | 'cholesky' | 'qr' | 'dual_aug'
    backend: str = "auto"  # 'auto' | 'xla' | 'pallas' (shared path on TPU)
    diagnostics: bool = True  # slack/bc residual outputs (skip: ~32% faster)
    tridiag_method: str = "auto"  # 'auto'|'thomas'|'pcr'|'spike'|'dense'
    fem_quad_order: int = 3
    refine_steps: int = 0  # iterative refinement on f32 paths
    dtype: Optional[str] = None  # 'float32' | 'float64' | None (=x64 default)
    # Coarse-stage dtype override: the FEM system's conditioning grows like
    # N^2, so beyond ~1e3 elements an f32 coarse solve returns garbage
    # (measured 0.23 Linf at E=1e4).  'float64' runs the FEM stage in
    # (TPU-emulated) f64 — requires jax_enable_x64 — and casts nodal values
    # back to the run dtype; the enhancement stays on the f32 fast path.
    fem_dtype: Optional[str] = None

    def __post_init__(self):
        if self.num_nodes < 2:
            raise ValueError(f"num_nodes must be >= 2, got {self.num_nodes}")
        if self.M < 1:
            raise ValueError(f"M must be >= 1, got {self.M}")
        if self.n_colloc < 2:
            raise ValueError(
                f"n_colloc must be >= 2, got {self.n_colloc}"
            )
        if self.n_colloc + 2 < self.M:
            raise ValueError(
                f"n_colloc={self.n_colloc} under-determines M={self.M} "
                f"coefficients (need n_colloc + 2 >= M: the 2 boundary rows "
                f"plus the PDE rows must reach the basis size)"
            )
        if self.gamma <= 0:
            raise ValueError(f"gamma must be positive, got {self.gamma}")
        if self.formulation not in ("primal", "dual"):
            raise ValueError(f"unknown formulation: {self.formulation!r}")
        if self.kkt_method not in ("auto", "cholesky", "qr", "dual_aug"):
            raise ValueError(f"unknown kkt_method: {self.kkt_method!r}")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend: {self.backend!r}")
        if self.tridiag_method not in ("auto", "thomas", "pcr", "spike",
                                       "dense"):
            raise ValueError(
                f"unknown tridiag_method: {self.tridiag_method!r}"
            )

    def jnp_dtype(self):
        if self.dtype is not None:
            return jnp.dtype(self.dtype)
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


class Solution(NamedTuple):
    nodes: jnp.ndarray  # [N]
    fem_values: jnp.ndarray  # [N] coarse P1 nodal values
    coeffs: jnp.ndarray  # [E, M] per-element Legendre coefficients
    max_slack: jnp.ndarray  # [E] (reference computed+discarded, ``:102``)
    bc_violation: jnp.ndarray  # [E]
    solve_ok: jnp.ndarray  # [E] bool fallback mask
    # Condition monitor on the enhancement factorisation (SURVEY.md
    # section 5 failure detection; see kkt.KKTDiagnostics.cond_estimate).
    # The fused variable-coefficient Pallas path emits the same R-diagonal
    # ratio in-kernel (one extra output row).
    cond_estimate: jnp.ndarray = None


def uniform_nodes(problem: Problem1D, num_nodes: int, dtype) -> jnp.ndarray:
    x0, x1 = problem.domain
    return jnp.linspace(x0, x1, num_nodes, dtype=dtype)


def fem_solve(problem: Problem1D, nodes: jnp.ndarray, cfg: SolverConfig):
    """Coarse P1 FEM nodal values (reference ``solve_fem``, ``:117-145``).

    P1 dofs ARE nodal values, so the reference's interpolator round-trip
    (``:140-143``) is dropped (SURVEY.md section 2.1 #4).
    """
    sub, main, sup, rhs = assembly.assemble_p1(
        nodes,
        problem.a,
        problem.b if problem.b is not None else None,
        problem.c,
        problem.f,
        quad_order=cfg.fem_quad_order,
    )
    sub, main, sup, rhs = assembly.apply_bcs(sub, main, sup, rhs, problem)
    return tridiag.solve(sub, main, sup, rhs, method=cfg.tridiag_method)


def _element_data(problem: Problem1D, nodes, fem_values, cfg: SolverConfig,
                  touches_left=True, touches_right=True):
    """Per-element collocation data: mapped points, rhs, endpoint bc values.

    ``touches_left``/``touches_right``: whether the first/last local element
    touches the global domain boundary — static True on a single device,
    traced booleans inside a sharded (shard_map) solve where only the edge
    devices own boundary elements.
    """
    dtype = nodes.dtype
    xl, xr = nodes[:-1], nodes[1:]
    h = xr - xl  # [E]
    t = legendre.collocation_points(cfg.n_colloc, dtype=dtype)  # [C]
    x_colloc = 0.5 * (xl + xr)[:, None] + 0.5 * h[:, None] * t[None, :]
    f_colloc = problem.f(x_colloc) * jnp.ones_like(x_colloc)  # [E, C]

    u_left = fem_values[:-1]
    u_right = fem_values[1:]
    # Boundary elements pin to the global Dirichlet data instead of the FEM
    # value (reference ``:67-79``) — by construction these coincide after
    # Dirichlet enforcement; the explicit override mirrors the reference's
    # semantics with a mask, not float equality (defect (b)).  Neumann /
    # Robin ends have no exact value to pin: keep the FEM nodal value
    # (the flux data already entered via ``assembly.apply_bcs``).
    if problem.bc_left == "dirichlet":
        g_l = jnp.asarray(problem.g_left, dtype)
        u_left = u_left.at[0].set(jnp.where(touches_left, g_l, u_left[0]))
    if problem.bc_right == "dirichlet":
        g_r = jnp.asarray(problem.g_right, dtype)
        u_right = u_right.at[-1].set(
            jnp.where(touches_right, g_r, u_right[-1]))
    bc = jnp.stack([u_left, u_right], axis=-1)  # [E, 2]
    return x_colloc, f_colloc, bc, h, u_left, u_right


def prepare_shared_host(problem: Problem1D, cfg: SolverConfig):
    """Setup-time float64 precompute of the shared affine enhancement map.

    Valid when the mesh is uniform and the operator coefficients are
    x-independent: every element shares one collocation matrix D, so
    (f, bc) -> w is one affine operator, factorised here in numpy f64 (host)
    and applied on-chip as two matmuls — the factorisation precision problem
    (SURVEY.md 7.4 hard part 1) never touches the accelerator.
    """
    if not problem.constant_coeffs:
        return None
    import numpy as np

    x0, x1 = problem.domain
    h = (x1 - x0) / (cfg.num_nodes - 1)
    V0, V1, V2 = legendre.collocation_vandermonde_host(cfg.M, cfg.n_colloc)
    t = np.linspace(-1.0, 1.0, cfg.n_colloc)
    xc = x0 + (t + 1.0) * 0.5 * h  # element-0 collocation points
    a2, a1, a0 = problem.colloc_coeffs(jnp.asarray(xc))
    a2, a1, a0 = (np.asarray(v, np.float64) for v in (a2, a1, a0))
    scale = 2.0 / h
    D0 = (
        a2[:, None] * scale**2 * V2
        + a1[:, None] * scale * V1
        + a0[:, None] * V0
    )
    B = np.stack([V0[0], V0[-1]])
    rhs_factors = None
    if problem.f_colloc_factors is not None:
        # Static in-element offsets (f64) matching the fused kernel's dloc.
        rhs_factors = problem.f_colloc_factors((t + 1.0) * 0.5 * h)
    if cfg.formulation == "dual":
        # Extracting the dual affine operator from the augmented inverse is
        # limited to ~1e-3 relative operator accuracy (the system's
        # conditioning hits the unit-vector columns even in f64, though
        # physical data stays accurate).  That is dtype noise in f32 — use
        # the fast path there — but would cap f64 dual accuracy at ~1e-7,
        # so f64 keeps the per-element augmented LU (full 1e-13 parity).
        if cfg.jnp_dtype() == jnp.float32:
            return kkt.precompute_shared_dual_host(
                D0, B, cfg.gamma, cfg.jnp_dtype(),
                rhs_colloc_factors=rhs_factors,
            )
        return None
    return kkt.precompute_shared_host(D0, B, cfg.gamma, cfg.jnp_dtype(),
                                      rhs_colloc_factors=rhs_factors)


def _resolve_backend(cfg: SolverConfig, E: int) -> str:
    if cfg.backend != "auto":
        return cfg.backend
    from ..ops import pallas_kernels as pk

    # The kernels are f32-only; a global x64 flag alone no longer disables
    # them (they trace inside a scoped enable_x64(False) —
    # pallas_kernels._mosaic_x64_safe), but genuinely-f64 enhancement data
    # still routes to XLA.
    if (
        jax.default_backend() == "tpu"
        and pk.pick_tile(E) >= 128
        and cfg.jnp_dtype() == jnp.float32
    ):
        return "pallas"
    return "xla"


def _dirichlet_consistent(problem, fem_values, touches_left=True,
                          touches_right=True):
    """Nodal values with boundary nodes pinned to the Dirichlet data.

    ``touches_left``/``touches_right`` may be traced booleans inside a
    sharded solve — only the edge devices' outermost nodes are global
    boundary nodes; interior interfaces keep their FEM/SPIKE values.
    Non-Dirichlet (Neumann/Robin) ends keep their FEM value: there is no
    exact boundary value to pin to — the flux data already shaped the FEM
    solve through the natural boundary term (``assembly.apply_bcs``)."""
    fv = fem_values
    if problem.bc_left == "dirichlet":
        g_l = jnp.asarray(problem.g_left, fem_values.dtype)
        fv = fv.at[0].set(jnp.where(touches_left, g_l, fv[0]))
    if problem.bc_right == "dirichlet":
        g_r = jnp.asarray(problem.g_right, fem_values.dtype)
        fv = fv.at[-1].set(jnp.where(touches_right, g_r, fv[-1]))
    return fv


def _pallas_finalize(w, slack, bcv, u_left, u_right, cfg, cond=None):
    """Diagnostics gate + fallback for the fused-kernel paths (tolerance
    scales with boundary-data magnitude, as in ``kkt._diagnostics``)."""
    E = w.shape[0]
    if cond is not None:
        cond = jnp.broadcast_to(cond, (E,))
    if cfg.diagnostics:
        finite = jnp.isfinite(slack) & jnp.isfinite(bcv)
        scale = 1.0 + jnp.maximum(jnp.abs(u_left), jnp.abs(u_right))
        ok = finite & (bcv <= 1e-2 * scale)
        diags = kkt.KKTDiagnostics(slack, bcv, ok, cond)
    else:
        ok = jnp.all(jnp.isfinite(w), axis=-1)
        z = jnp.zeros((E,), w.dtype)
        diags = kkt.KKTDiagnostics(z, z, ok, cond)
    w = kkt.apply_fallback(w, diags, u_left, u_right)
    return w, diags


def lssvr_enhance(problem: Problem1D, nodes, fem_values, cfg: SolverConfig,
                  shared_ops=None, touches_left=True, touches_right=True,
                  uniform_geom=None):
    """Batched enhancement of all elements (replaces ``:147-176``).

    ``uniform_geom``: static (x0, h) Python floats when the mesh is uniform
    — unlocks the fused Pallas kernels on TPU (shared-operator two-matmul
    kernel for constant coefficients, fused CGS2-QR kernel for
    variable-coefficient operators).
    """
    E = nodes.shape[0] - 1
    if (
        shared_ops is not None
        and uniform_geom is not None
        and _resolve_backend(cfg, E) == "pallas"
    ):
        from ..ops import pallas_kernels as pk

        x0, h = uniform_geom
        tile = pk.pick_tile(E)
        fv = _dirichlet_consistent(problem, fem_values)
        if (shared_ops.WfF is not None
                and problem.f_elem_factors is not None):
            if cfg.diagnostics:
                # Gate + fallback fused in-kernel (saves the [E, M]
                # re-read/re-write of apply_fallback).
                w, slack, bcv, okf = pk.fused_enhance_separable(
                    fv, shared_ops, problem.f_elem_factors, x0, h,
                    tile=tile, with_fallback=True,
                    f_translation=problem.f_translation,
                )
                cond = None if shared_ops.cond is None else \
                    jnp.broadcast_to(shared_ops.cond, (E,))
                return w, kkt.KKTDiagnostics(slack, bcv, okf > 0.5, cond)
            w, slack, bcv = pk.fused_enhance_separable(
                fv, shared_ops, problem.f_elem_factors, x0, h, tile=tile,
                with_diagnostics=False,
                f_translation=problem.f_translation,
            )
        else:
            w, slack, bcv = pk.fused_enhance_shared(
                fv, shared_ops, problem.f, x0, h, cfg.n_colloc, tile=tile,
                with_diagnostics=cfg.diagnostics,
                f_shifted_fn=problem.f_shifted,
            )
        return _pallas_finalize(w, slack, bcv, fv[:-1], fv[1:], cfg,
                                cond=shared_ops.cond)
    if (
        shared_ops is None
        and cfg.kkt_method in ("auto", "qr")
        and cfg.M >= 3
        and _resolve_backend(cfg, E) == "pallas"
    ):
        # Variable-coefficient fused path: same null-space CGS2-QR algebra
        # as the XLA route below, entirely in VMEM (SURVEY.md 7.1 L7).
        # Without uniform_geom the kernel runs in graded-mesh mode (traced
        # node positions; chain factors folded into the coefficients) —
        # this is what backs hybrid_solve_general / adaptive meshes on TPU
        # AND the sharded variable-coefficient solves, where the touches
        # flags are traced booleans and the per-shard node positions enter
        # as the traced node array.
        from ..ops import pallas_kernels as pk

        tile = pk.pick_tile(E)
        fv = _dirichlet_consistent(problem, fem_values, touches_left,
                                   touches_right)
        x0d, x1d = problem.domain
        traced_touches = not (touches_left is True
                              and touches_right is True)
        if uniform_geom is not None and not traced_touches:
            x0, h = uniform_geom
            graded_nodes = None
        else:
            # Sharded/graded: element positions from the traced node array
            # (the non-graded kernel folds x0 into compile-time index
            # arithmetic, which a per-shard traced origin cannot use).
            x0, h = x0d, (x1d - x0d) / E  # h = reference (mean) width
            graded_nodes = nodes
        host = pk.VarCoeffOperators(cfg.M, cfg.n_colloc, h, fv.dtype)
        w, slack, bcv, cond = pk.fused_enhance_varcoeff(
            fv, problem, host, x0, h, cfg.n_colloc, tile=tile,
            with_diagnostics=cfg.diagnostics,
            f_shifted_fn=problem.f_shifted,
            nodes=graded_nodes,
        )
        return _pallas_finalize(w, slack, bcv, fv[:-1], fv[1:], cfg,
                                cond=cond)

    x_colloc, f_colloc, bc, h, u_left, u_right = _element_data(
        problem, nodes, fem_values, cfg,
        touches_left=touches_left, touches_right=touches_right,
    )
    if shared_ops is not None:
        w, diags = kkt.solve_primal_shared(shared_ops, f_colloc, bc)
    else:
        dtype = nodes.dtype
        V0, V1, V2 = legendre.collocation_vandermonde(cfg.M, cfg.n_colloc,
                                                      dtype)
        B = kkt.boundary_rows(V0)
        a2, a1, a0 = problem.colloc_coeffs(x_colloc)  # each [E, C]
        scale = (2.0 / h)[:, None, None]
        D = (
            a2[:, :, None] * scale**2 * V2[None]
            + a1[:, :, None] * scale * V1[None]
            + a0[:, :, None] * V0[None]
        )
        # Null-space/particular operators for the f32 LSE path are pure
        # functions of (M, n_colloc): precompute host-side f64 (B may be a
        # tracer here; the host Vandermonde is trace-independent).
        import numpy as np

        V0h, _, _ = legendre.collocation_vandermonde_host(cfg.M,
                                                          cfg.n_colloc)
        Z_np, Pbc_np = kkt.nullspace_host(np.stack([V0h[0], V0h[-1]]))
        ZP = (jnp.asarray(Z_np, dtype), jnp.asarray(Pbc_np, dtype))
        w, diags = kkt.solve_batched(
            D, B, f_colloc, bc, cfg.gamma,
            formulation=cfg.formulation, method=cfg.kkt_method,
            refine_steps=cfg.refine_steps, ZP=ZP,
        )

    w = kkt.apply_fallback(w, diags, u_left, u_right)
    return w, diags


def _hybrid_solve_impl(problem: Problem1D, cfg: SolverConfig,
                       nodes: jnp.ndarray, shared_ops=None,
                       uniform: bool = False) -> Solution:
    """Pure pipeline: coarse FEM then batched LSSVR enhancement
    (reference ``solve``, ``:178-181``).  ``shared_ops`` (from
    ``prepare_shared_host``) requires a uniform mesh; ``uniform=True``
    asserts uniformity for variable-coefficient problems too (no shared
    operator exists, but the fused per-element kernel still applies)."""
    with jax.named_scope("fem_coarse_solve"):
        if cfg.fem_dtype is not None:
            from ..utils.checks import require_x64

            require_x64(cfg.fem_dtype, "SolverConfig.fem_dtype")
            fd = jnp.dtype(cfg.fem_dtype)
            fem_values = fem_solve(
                problem, nodes.astype(fd), cfg
            ).astype(nodes.dtype)
        else:
            fem_values = fem_solve(problem, nodes, cfg)
    x0, x1 = problem.domain
    geom = (x0, (x1 - x0) / (cfg.num_nodes - 1)) \
        if (shared_ops is not None or uniform) else None
    with jax.named_scope("lssvr_enhancement"):
        w, diags = lssvr_enhance(problem, nodes, fem_values, cfg,
                                 shared_ops=shared_ops, uniform_geom=geom)
    return Solution(
        nodes=nodes,
        fem_values=fem_values,
        coeffs=w,
        max_slack=diags.max_slack,
        bc_violation=diags.bc_violation,
        solve_ok=diags.solve_ok,
        cond_estimate=diags.cond_estimate,
    )


hybrid_solve = functools.partial(
    jax.jit, static_argnums=(0, 1), static_argnames=("uniform",)
)(_hybrid_solve_impl)

# Sweep/pipeline variant: the caller's nodes buffer is DONATED (it is
# rebuilt per config anyway), so XLA can alias it into the Solution and the
# next config's dispatch never waits on a copy.  Kept separate from
# ``hybrid_solve`` because donation poisons repeated calls on the same
# array (e.g. the driver's compile-check entry).
hybrid_solve_donating = functools.partial(
    jax.jit, static_argnums=(0, 1), static_argnames=("uniform",),
    donate_argnums=(2,),
)(_hybrid_solve_impl)


def hybrid_solve_general(problem: Problem1D, cfg: SolverConfig,
                         nodes: jnp.ndarray) -> Solution:
    """Non-uniform-mesh path: always per-element batched KKT."""
    return hybrid_solve(problem, cfg, nodes, shared_ops=None)


def sweep_solve(problem: Problem1D, cfgs) -> list:
    """Pipelined multi-config solve (SURVEY.md section 2.3 PP row).

    Dispatches every config's full solve WITHOUT blocking between configs:
    JAX async dispatch lets config k+1's host-side work (shared-operator
    precompute, nodes build, dispatch) overlap config k's device execution,
    and each config's fresh nodes buffer is donated.  Returns the list of
    in-flight Solutions — block/read when needed; fetching results in order
    overlaps each fetch's round trip with later configs' device work.
    """
    sols = []
    for cfg in cfgs:
        shared = prepare_shared_host(problem, cfg)
        nodes = uniform_nodes(problem, cfg.num_nodes, cfg.jnp_dtype())
        sols.append(
            hybrid_solve_donating(problem, cfg, nodes, shared, uniform=True)
        )
    return sols


class HybridSolver:
    """Stateful facade with the reference class's API shape (``:107-211``)."""

    def __init__(self, problem: Problem1D, config: SolverConfig = SolverConfig(),
                 nodes: Optional[jnp.ndarray] = None):
        self.problem = problem
        self.config = config
        self._custom_nodes = nodes
        self.solution: Optional[Solution] = None

    @property
    def nodes(self):
        if self._custom_nodes is not None:
            return self._custom_nodes
        return uniform_nodes(self.problem, self.config.num_nodes,
                             self.config.jnp_dtype())

    def solve(self) -> Solution:
        if self._custom_nodes is not None:
            self.solution = hybrid_solve_general(
                self.problem, self.config, self._custom_nodes
            )
        else:
            # The shared fast path covers both formulations on a uniform
            # mesh with constant coefficients: the primal precompute goes
            # through Schur/Cholesky, the dual through the augmented
            # quasi-definite inverse — distinct algebra, identical hot path.
            shared = prepare_shared_host(self.problem, self.config)
            self.solution = hybrid_solve(
                self.problem, self.config, self.nodes, shared, uniform=True
            )
        return self.solution

    # Reference-API aliases -------------------------------------------------
    @property
    def fem_nodes(self):
        return self.solution.nodes if self.solution else None

    @property
    def fem_values(self):
        return self.solution.fem_values if self.solution else None

    def evaluate_solution(self, x_points):
        assert self.solution is not None, "call solve() first"
        x = jnp.asarray(x_points, self.solution.nodes.dtype)
        if self._custom_nodes is None:
            x0, x1 = self.problem.domain
            h = (x1 - x0) / (self.config.num_nodes - 1)
            return ops_eval.evaluate_uniform(
                x0, h, self.solution.coeffs, x
            )
        return ops_eval.evaluate(self.solution.nodes, self.solution.coeffs, x)

    def evaluate_fem(self, x_points):
        """Piecewise-linear coarse solution (for FEM-vs-hybrid comparisons)."""
        assert self.solution is not None
        x = jnp.asarray(x_points, self.solution.nodes.dtype)
        return jnp.interp(x, self.solution.nodes, self.solution.fem_values)

    def errors(self, x_points):
        """(linf, l2) of the hybrid solution vs the problem's exact oracle."""
        from ..utils import metrics

        assert self.problem.exact is not None
        u = self.evaluate_solution(x_points)
        ue = self.problem.exact(jnp.asarray(x_points, u.dtype))
        return metrics.linf_error(u, ue), metrics.l2_error(u, ue)
