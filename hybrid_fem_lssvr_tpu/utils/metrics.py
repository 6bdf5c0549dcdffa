"""Error norms + structured JSON-line metrics.

The reference computes the exact solution but never prints an error norm
(``/root/reference/1D-Possion/Hybrid-FEM-LSSVR.py:224-225`` — validation is
purely visual, SURVEY.md section 3.5).  Here every stage emits structured
metrics.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Optional

import jax.numpy as jnp


def linf_error(u, u_exact):
    return jnp.max(jnp.abs(u - u_exact))


def l2_error(u, u_exact):
    """Discrete RMS error over the sample points (the BASELINE.md norm)."""
    return jnp.sqrt(jnp.mean((u - u_exact) ** 2))


def rel_l2_error(u, u_exact):
    return l2_error(u, u_exact) / jnp.sqrt(jnp.mean(u_exact**2))


def convergence_order(hs, errs):
    """Least-squares slope of log(err) vs log(h)."""
    import numpy as np

    lh, le = np.log(np.asarray(hs)), np.log(np.asarray(errs))
    return float(np.polyfit(lh, le, 1)[0])


class MetricsEmitter:
    """JSON-lines metrics sink (stdout by default)."""

    def __init__(self, stream=None, run_id: Optional[str] = None):
        self.stream = stream or sys.stdout
        self.run_id = run_id

    def emit(self, stage: str, **fields):
        rec = {"stage": stage, "t": time.time()}
        if self.run_id:
            rec["run_id"] = self.run_id
        for k, v in fields.items():
            if hasattr(v, "item"):
                v = v.item()
            rec[k] = v
        self.stream.write(json.dumps(rec) + "\n")
        self.stream.flush()
        return rec
