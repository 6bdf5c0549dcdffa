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

    def save_march(self, path: str, fingerprint: str, step: int, leaves,
                   ys_leaves):
        """Async mid-march state write (``scan_checkpointed``); the carry
        arrays are immutable jax arrays, so handing them to the writer
        thread is race-free."""
        fut = self._executor.submit(_write_march, path, fingerprint,
                                    step, leaves, ys_leaves)
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


# ------------------------------------------------------------ march state
#
# The steady checkpoints above snapshot a finished solution; the transient
# marches need MID-RUN state so a killed long run resumes from the last
# completed chunk instead of step 0 (SURVEY.md section 5 resume story —
# the marches are the only genuinely long-running jobs).  The scan is cut
# into chunks of K steps: one jitted lax.scan per chunk (same step body,
# so chunking does not change the floating-point sequence — resumed and
# uninterrupted runs are BITWISE identical, asserted in
# tests/test_transient.py), with an atomic (step, carry, ys) write after
# each chunk through the same tmp+rename discipline as the steady path.


def march_fingerprint(problem_name: str, cfg, tcfg, march: str) -> str:
    """Fingerprint of everything that determines the march trajectory.
    The checkpoint fields themselves (path, chunk size) are excluded —
    resuming with a different chunking is legal and bitwise-equal."""
    td = dataclasses.asdict(tcfg)
    td.pop("checkpoint", None)
    td.pop("checkpoint_chunk", None)
    payload = json.dumps(
        {"problem": problem_name, "march": march,
         "cfg": dataclasses.asdict(cfg), "tcfg": td},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _write_march(path: str, fingerprint: str, step: int, leaves,
                 ys_leaves) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {f"carry_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays.update({f"ys_{i}": np.asarray(v)
                   for i, v in enumerate(ys_leaves)})
    npz_tmp = os.path.join(path, ".march.npz.tmp")
    with open(npz_tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(npz_tmp, os.path.join(path, "march.npz"))
    manifest = {
        "fingerprint": fingerprint,
        "step": int(step),
        "n_carry": len(leaves),
        "n_ys": len(ys_leaves),
        "format": "march-v1",
    }
    man_tmp = os.path.join(path, ".march_manifest.json.tmp")
    with open(man_tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(man_tmp, os.path.join(path, "march_manifest.json"))


def load_march_state(path: str, fingerprint: str):
    """(step, carry_leaves, ys_leaves) or None (missing / mismatch)."""
    mpath = os.path.join(path, "march_manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        manifest = json.load(fh)
    if manifest.get("fingerprint") != fingerprint:
        return None
    with np.load(os.path.join(path, "march.npz")) as z:
        carry = [z[f"carry_{i}"] for i in range(manifest["n_carry"])]
        ys = [z[f"ys_{i}"] for i in range(manifest["n_ys"])]
    return manifest["step"], carry, ys


def scan_checkpointed(step_fn, carry0, ts, *, path=None, chunk=0,
                      fingerprint="", checkpointer=None):
    """``jax.lax.scan(step_fn, carry0, ts)`` with chunked checkpointing.

    With ``path=None`` this IS a single lax.scan.  Otherwise the time
    axis is cut into chunks of ``chunk`` steps (default: ~8 chunks);
    after each chunk the (next step index, carry pytree, accumulated ys)
    is written atomically, and a matching on-disk state resumes from its
    step index — completed chunks are never recomputed.  ``ys`` may be
    None (step emits no per-step output) or any pytree of per-step
    arrays; resumed ys are concatenated with the freshly computed tail.
    """
    import jax

    n = int(ts.shape[0])
    if not path:
        return jax.lax.scan(step_fn, carry0, ts)
    chunk = int(chunk) if chunk else max(1, -(-n // 8))
    treedef = jax.tree_util.tree_structure(carry0)
    start, carry = 0, carry0
    ys_chunks = []  # list of ys pytrees (leaves stacked [k, ...])
    ys_treedef = None
    state = load_march_state(path, fingerprint)
    if state is not None and 0 < state[0] <= n:
        start = state[0]
        carry = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in state[1]])

    scan = jax.jit(lambda c, t: jax.lax.scan(step_fn, c, t))
    i = start
    restored_ys = state[2] if state is not None and state[0] == start \
        else []
    while i < n:
        j = min(i + chunk, n)
        carry, ys_c = scan(carry, ts[i:j])
        if ys_c is not None:
            ys_treedef = jax.tree_util.tree_structure(ys_c)
            ys_chunks.append(ys_c)
        leaves = [v for v in jax.tree_util.tree_leaves(carry)]
        ys_leaves = _concat_ys(restored_ys, ys_chunks, ys_treedef)
        if checkpointer is not None:
            checkpointer.save_march(path, fingerprint, j, leaves,
                                    ys_leaves)
        else:
            _write_march(path, fingerprint, j, leaves, ys_leaves)
        i = j
    ys_all = _concat_ys(restored_ys, ys_chunks, ys_treedef)
    if ys_treedef is not None:
        ys = jax.tree_util.tree_unflatten(
            ys_treedef, [jnp.asarray(v) for v in ys_all])
    elif restored_ys:
        # Fully resumed (start == n): the ys structure is whatever was
        # saved — the marches here emit a single per-step array.
        ys = tuple(jnp.asarray(v) for v in restored_ys)
        ys = ys[0] if len(ys) == 1 else ys
    else:
        ys = None
    return carry, ys


def _concat_ys(restored_ys, ys_chunks, ys_treedef):
    """Flatten-and-concatenate per-chunk ys pytrees (plus any restored
    prefix) along the step axis; [] when the march emits no ys."""
    import jax

    if ys_treedef is None:
        return list(restored_ys)
    per_chunk = [jax.tree_util.tree_leaves(c) for c in ys_chunks]
    n_leaves = len(per_chunk[0]) if per_chunk else len(restored_ys)
    out = []
    for k in range(n_leaves):
        parts = []
        if restored_ys:
            parts.append(np.asarray(restored_ys[k]))
        parts.extend(np.asarray(c[k]) for c in per_chunk)
        out.append(np.concatenate(parts, axis=0))
    return out
