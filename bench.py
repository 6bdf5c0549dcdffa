"""Headline benchmark: batched LSSVR enhancement throughput on one chip.

Metric (BASELINE.json): elements/sec for the per-element LSSVR enhancement
stage — FEM nodal values in, per-element Legendre coefficients out, including
collocation-data build, the batched KKT solve (shared-operator two-matmul
path), diagnostics and fallback masking.  Reference: scipy SLSQP at
~14.5 elements/sec on CPU (BASELINE.md); north star: 1e6 elements < 1 s.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "elements/sec", "vs_baseline": N}
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import SolverConfig, problems
from hybrid_fem_lssvr_tpu.models import hybrid as H

REFERENCE_ELEMENTS_PER_SEC = 14.5  # measured, BASELINE.md
NUM_ELEMENTS = 1 << 20  # ~1.05e6
M = 8
GAMMA = 1e4


def main():
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=NUM_ELEMENTS + 1, M=M, gamma=GAMMA,
                       dtype="float32")
    dtype = cfg.jnp_dtype()
    nodes = H.uniform_nodes(problem, cfg.num_nodes, dtype)
    # Coarse nodal values: exact-to-f32 stand-in for the FEM stage output
    # (the FEM stage is benchmarked separately; this stage's contract is
    # nodal values -> coefficients).
    fem_values = jnp.sin(jnp.pi * nodes)
    shared = H.prepare_shared_host(problem, cfg)

    @functools.partial(jax.jit, donate_argnums=())
    def enhance(nodes, fem_values, shared):
        w, diags = H.lssvr_enhance(problem, nodes, fem_values, cfg, shared)
        return w, diags.solve_ok

    # Warmup / compile
    w, ok = enhance(nodes, fem_values, shared)
    w.block_until_ready()

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        w, ok = enhance(nodes, fem_values, shared)
        w.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    eps = NUM_ELEMENTS / dt

    # Accuracy sanity on a subsample (not timed)
    xs = jnp.linspace(-1.0, 1.0, 100001, dtype=dtype)
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    u = ops_eval.evaluate(nodes, w, xs)
    linf = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * xs))))
    assert bool(ok.all()), "fallback triggered during bench"
    assert linf < 1e-4, f"accuracy regression in bench: linf={linf}"

    print(json.dumps({
        "metric": "lssvr_enhancement_throughput_1M_elements",
        "value": eps,
        "unit": "elements/sec",
        "vs_baseline": eps / REFERENCE_ELEMENTS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
