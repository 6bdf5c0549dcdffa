"""Checkpoint / resume for hybrid solves.

The reference recomputes everything each run; its only state is
``fem_nodes`` / ``fem_values`` / ``lssvr_functions`` held in memory
(``Hybrid-FEM-LSSVR.py:113-115``, SURVEY.md section 5).  The natural
checkpoint is tiny and well defined: (nodes, FEM nodal values, per-element
coefficient array, config fingerprint), stored as npz + a JSON manifest.

Two write paths over the same format:

* ``save_solution`` — synchronous.
* ``AsyncCheckpointer`` — a thread-offloaded writer: ``save()`` enqueues the
  (immutable) arrays and returns immediately; the device-to-host transfer
  and file IO happen on the writer thread, so the accelerator's next
  dispatch is never blocked on checkpoint IO (SURVEY.md section 5 "async
  save after each stage" — this matters at the >= 1M-element configs where
  the coefficient array is tens of MB).

Writes are atomic (tmp file + ``os.replace``, manifest last), so a crashed
save never looks like a complete checkpoint.

Resume semantics: ``load_or_solve`` skips straight to evaluation when a
checkpoint matching the config fingerprint exists — this is what makes the
1e6-element / h-sweep configs restartable mid-campaign.  ``load_or_run``
is the facade-free variant used by the sharded (multi-chip) solves.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import jax.numpy as jnp
import numpy as np


def config_fingerprint(problem_name: str, cfg) -> str:
    payload = json.dumps(
        {"problem": problem_name, **dataclasses.asdict(cfg)},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _write(path: str, problem_name: str, cfg_dict: dict, fingerprint: str,
           solution) -> None:
    """Write npz + manifest atomically (tmp + rename, manifest last).

    Runs on the writer thread for async saves: ``np.asarray`` on a jax
    array performs the device-to-host transfer here, off the main thread.
    """
    os.makedirs(path, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in solution._asdict().items()
              if v is not None}
    npz_tmp = os.path.join(path, ".solution.npz.tmp")
    with open(npz_tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(npz_tmp, os.path.join(path, "solution.npz"))
    manifest = {
        "fingerprint": fingerprint,
        "problem": problem_name,
        "config": cfg_dict,
        "arrays": sorted(arrays),
        "format": "npz-v1",
    }
    man_tmp = os.path.join(path, ".manifest.json.tmp")
    with open(man_tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, default=str)
    os.replace(man_tmp, os.path.join(path, "manifest.json"))


def save_solution(path: str, problem_name: str, cfg, solution) -> None:
    """Synchronous checkpoint write."""
    _write(path, problem_name, dataclasses.asdict(cfg),
           config_fingerprint(problem_name, cfg), solution)


class AsyncCheckpointer:
    """Thread-offloaded checkpoint writer.

    ``save()`` snapshots the manifest metadata on the caller thread (cheap,
    pure Python) and hands the immutable solution pytree to a single writer
    thread, returning a ``concurrent.futures.Future``.  ``wait()`` blocks
    until all pending saves are durable; it re-raises the first writer
    error.  Use as a context manager to guarantee a final ``wait()``.
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-writer"
        )
        self._pending = []

    def save(self, path: str, problem_name: str, cfg, solution):
        fut = self._executor.submit(
            _write, path, problem_name, dataclasses.asdict(cfg),
            config_fingerprint(problem_name, cfg), solution,
        )
        self._pending = [f for f in self._pending if not f.done()]
        self._pending.append(fut)
        return fut

    def wait(self) -> None:
        pending, self._pending = self._pending, []
        for f in pending:
            f.result()

    def close(self) -> None:
        self.wait()
        self._executor.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


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


def load_or_solve(path: Optional[str], solver, checkpointer=None):
    """Resume from ``path`` if compatible, else solve and checkpoint.

    Works for the 1D ``HybridSolver`` (Solution), 2D ``HybridSolver2D``
    (Solution2D) and 3D ``HybridSolver3D`` (Solution3D) facades.  Pass an
    ``AsyncCheckpointer`` to overlap the save with subsequent work
    (caller owns its lifetime)."""
    from ..models.hybrid import HybridSolver, Solution
    from ..models.hybrid2d import HybridSolver2D, Solution2D
    from ..models.hybrid3d import Solution3D

    if isinstance(solver, HybridSolver):
        cls = Solution
    elif isinstance(solver, HybridSolver2D):
        cls = Solution2D
    else:
        cls = Solution3D
    name = solver.problem.name
    if path:
        sol = load_solution(path, name, solver.config, cls)
        if sol is not None:
            solver.solution = sol
            return sol, True
    sol = solver.solve()
    if path:
        if checkpointer is not None:
            checkpointer.save(path, name, solver.config, sol)
        else:
            save_solution(path, name, solver.config, sol)
    return sol, False


def load_or_run(path: Optional[str], problem_name: str, cfg, run_fn,
                solution_cls, checkpointer=None):
    """Facade-free resume for the sharded (multi-chip) solves.

    ``run_fn`` is the zero-argument callable from
    ``parallel.sharded.make_sharded_solve`` /
    ``parallel.sharded2d.make_sharded_solve_2d``; ``solution_cls`` the
    matching NamedTuple (ShardedSolution / ShardedSolution2D).  On restore
    the arrays come back host-resident and replicated — shard or
    ``device_put`` downstream as needed."""
    if path:
        sol = load_solution(path, problem_name, cfg, solution_cls)
        if sol is not None:
            return sol, True
    sol = run_fn()
    if path:
        if checkpointer is not None:
            checkpointer.save(path, problem_name, cfg, sol)
        else:
            save_solution(path, problem_name, cfg, sol)
    return sol, False
