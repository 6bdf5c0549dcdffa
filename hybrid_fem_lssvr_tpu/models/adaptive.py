"""Adaptive mesh refinement driven by the per-element slack diagnostics.

The reference computes per-element slack then discards it
(``Hybrid-FEM-LSSVR.py:102-103``).  Here the slack — the LSSVR's own PDE
residual at the collocation points — is an a-posteriori error indicator:
elements where the constrained polynomial cannot satisfy the PDE are under-
resolved.  Refinement bisects the worst fraction each round and re-solves on
the graded mesh through the general (per-element-operator) batched path.

This is a capability beyond the reference (which supports only uniform
meshes), enabled by diagnostics being first-class outputs.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .hybrid import HybridSolver, SolverConfig, Solution, uniform_nodes
from .problem import Problem1D


class AdaptiveResult(NamedTuple):
    solution: Solution
    nodes: jnp.ndarray
    history: List[dict]  # per-round {elements, max_slack, linf?}


def refine_nodes(nodes: np.ndarray, indicator: np.ndarray,
                 refine_frac: float = 0.3) -> np.ndarray:
    """Bisect the worst ``refine_frac`` of elements by ``indicator``."""
    E = nodes.shape[0] - 1
    n_ref = max(1, int(np.ceil(refine_frac * E)))
    worst = np.argsort(indicator)[-n_ref:]
    mids = 0.5 * (nodes[worst] + nodes[worst + 1])
    return np.sort(np.concatenate([nodes, mids]))


def adaptive_solve(problem: Problem1D, cfg: SolverConfig,
                   rounds: int = 4, refine_frac: float = 0.3,
                   eval_points: Optional[np.ndarray] = None) -> AdaptiveResult:
    """Solve-estimate-refine loop starting from cfg.num_nodes uniform nodes.

    Each round changes the node-array shape, so each round is a fresh jit
    specialisation (Python-level loop by design — mesh adaptation is
    inherently host-side control flow)."""
    dtype = cfg.jnp_dtype()
    nodes = np.asarray(uniform_nodes(problem, cfg.num_nodes, dtype))
    history = []
    solver = None
    for r in range(rounds + 1):
        solver = HybridSolver(problem, cfg, nodes=jnp.asarray(nodes, dtype))
        sol = solver.solve()
        rec = {
            "round": r,
            "elements": int(sol.coeffs.shape[0]),
            "max_slack": float(jnp.max(sol.max_slack)),
        }
        if problem.exact is not None and eval_points is not None:
            linf, _ = solver.errors(eval_points)
            rec["linf"] = float(linf)
        history.append(rec)
        if r == rounds:
            break
        indicator = np.asarray(sol.max_slack)
        nodes = refine_nodes(nodes, indicator, refine_frac)
    return AdaptiveResult(solution=solver.solution,
                          nodes=jnp.asarray(nodes, dtype), history=history)
