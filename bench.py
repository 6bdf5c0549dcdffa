"""Headline benchmark: batched LSSVR enhancement throughput on one chip.

Metric (BASELINE.json): elements/sec for the per-element LSSVR enhancement
stage — FEM nodal values in, per-element Legendre coefficients out, including
collocation-data build, the fused Pallas solve (shared-operator path),
diagnostics and fallback masking.  Reference: scipy SLSQP at ~14.5
elements/sec on CPU (BASELINE.md); north star: 1e6 elements < 1 s.

Measurement methodology (this environment routes the TPU through a tunnel
with ~30 ms round-trip latency, and repeated identical dispatches can be
memoized): K iterations are chained on-device inside one jitted fori_loop
with a runtime-value dependency between iterations, each timing run uses a
fresh input, and the per-iteration cost is the SLOPE between K=25 and K=100
loops — fixed costs (latency, reductions) cancel exactly.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "elements/sec", "vs_baseline": N}
"""

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
    # Coarse nodal values: exact-to-dtype stand-in for the FEM stage output
    # (this stage's contract is nodal values -> coefficients).
    fem_base = jnp.sin(jnp.pi * nodes)
    shared = H.prepare_shared_host(problem, cfg)
    x0, x1 = problem.domain
    geom = (x0, (x1 - x0) / NUM_ELEMENTS)

    def step(fem):
        w, diags = H.lssvr_enhance(problem, nodes, fem, cfg, shared,
                                   uniform_geom=geom)
        return w

    def make_loop(K):
        @jax.jit
        def loop(fem, alpha):
            def body(i, fem):
                w = step(fem)
                return fem + alpha * jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, K, body, fem)
        return loop

    Ks = (25, 100)
    loops = {K: make_loop(K) for K in Ks}
    alpha = jnp.asarray(1e-30, dtype)
    times = {}
    seq = 0.0
    for K in Ks:
        # Force completion via a scalar fetch: the tunnel's
        # block_until_ready has been observed returning early (CLAUDE.md).
        float(jnp.sum(loops[K](fem_base + 0.01, alpha)))  # compile
        ts = []
        for _ in range(7):
            seq += 1e-3
            t0 = time.perf_counter()
            float(jnp.sum(loops[K](fem_base + seq, alpha)))
            ts.append(time.perf_counter() - t0)
        # median over 7 fresh-input runs: the tunnel adds tens-of-ms jitter
        # per dispatch which the K-slope cancels only in expectation
        times[K] = float(np.median(ts))
    dt = (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])
    eps = NUM_ELEMENTS / dt

    # Accuracy gate (not timed): the benched path must actually solve.
    w = jax.block_until_ready(step(fem_base))
    xs = jnp.linspace(-1.0, 1.0, 100001, dtype=dtype)
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    u = ops_eval.evaluate(nodes, w, xs)
    linf = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * xs))))
    # Gate at ~10x the measured floor (6.6e-7 on-chip, RESULTS.md) so a
    # genuine accuracy regression in the benched kernel fails the artifact.
    assert linf < 1e-5, f"accuracy regression in bench: linf={linf}"

    print(json.dumps({
        "metric": "lssvr_enhancement_throughput_1M_elements",
        "value": eps,
        "unit": "elements/sec",
        "vs_baseline": eps / REFERENCE_ELEMENTS_PER_SEC,
    }))


if __name__ == "__main__":
    main()
