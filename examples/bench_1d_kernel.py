"""1D separable-kernel throughput experiments on TPU (NUMERICS.md 17).

Variants:
  dep=w      — loop dependency via max|w| (reads the [M, E] output back:
               bench.py's historical harness, ~32 B/elem extra traffic)
  dep=slack  — dependency via max(slack) (a [1, E] row already produced;
               the kernel still writes w — pallas outputs are not DCE'd
               per-output)
  tile sweep — grid-step amortisation beyond pick_tile's 8192 default

Usage: python examples/bench_1d_kernel.py [--E 20] [--tiles 8192 16384]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu import SolverConfig, problems
from hybrid_fem_lssvr_tpu.models import hybrid as H


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--E", type=int, default=20, help="log2 element count")
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--deps", nargs="+", default=["w", "slack"])
    args = ap.parse_args()

    E = 1 << args.E
    problem = problems.poisson_1d()
    cfg = SolverConfig(num_nodes=E + 1, M=8, gamma=1e4, dtype="float32")
    dtype = cfg.jnp_dtype()
    nodes = H.uniform_nodes(problem, cfg.num_nodes, dtype)
    fem_base = jnp.sin(jnp.pi * nodes)
    shared = H.prepare_shared_host(problem, cfg)
    x0, x1 = problem.domain
    h = (x1 - x0) / E

    from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk

    fv_fixed = None

    for tile in args.tiles:
        if E % tile:
            continue
        for dep in args.deps:
            def step(fem):
                fv = fem.at[0].set(0.0).at[-1].set(0.0)
                w, slack, bcv, okf = pk.fused_enhance_separable(
                    fv, shared, problem.f_elem_factors, x0, h,
                    tile=tile, with_fallback=True,
                    f_translation=problem.f_translation,
                )
                return w, slack

            def make_loop(K, dep):
                @jax.jit
                def loop(fem, alpha):
                    def body(i, fem):
                        w, slack = step(fem)
                        r = jnp.max(jnp.abs(w)) if dep == "w" \
                            else jnp.max(slack)
                        return fem + alpha * r
                    return jax.lax.fori_loop(0, K, body, fem)
                return loop

            try:
                Ks = (25, 100)
                loops = {K: make_loop(K, dep) for K in Ks}
                alpha = jnp.asarray(1e-30, dtype)
                times = {}
                seq = 0.0
                for K in Ks:
                    float(jnp.sum(loops[K](fem_base + 0.01, alpha)))
                    ts = []
                    for _ in range(7):
                        seq += 1e-3
                        t0 = time.perf_counter()
                        float(jnp.sum(loops[K](fem_base + seq, alpha)))
                        ts.append(time.perf_counter() - t0)
                    times[K] = float(np.median(ts))
                dt = (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])
                print(f"tile={tile} dep={dep}: {dt * 1e6:.1f} us/iter = "
                      f"{E / dt / 1e9:.2f}e9 el/s")
            except Exception as e:
                print(f"tile={tile} dep={dep}: FAILED {type(e).__name__}: "
                      f"{str(e)[:140]}")


if __name__ == "__main__":
    main()
