"""Benchmark the fused 2D variable-coefficient enhancement kernel on TPU.

Reproduces the RESULTS.md "2D variable-coefficient path" row: 1024x1024
quads, M=6, tile sweep, method in {sne, qr}.  Methodology per CLAUDE.md:
K iterations chained on-device with a runtime-value dependency, fresh
inputs per run, per-iteration cost = the slope between two K values,
completion forced by a scalar fetch.

Usage:  python examples/bench_varcoeff2d.py [--n 1024] [--M 6]
        [--tiles 512 1024 2048] [--methods sne qr]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu.models.hybrid2d import (
    Solver2DConfig, get_problem_2d, prepare_shared_2d,
)
from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--M", type=int, default=6)
    ap.add_argument("--tiles", type=int, nargs="+", default=[1024])
    ap.add_argument("--methods", nargs="+", default=["sne", "qr"])
    ap.add_argument("--no-diagnostics", action="store_true")
    args = ap.parse_args()

    n = args.n
    problem = get_problem_2d("variable_coeff_elliptic_2d")
    cfg = Solver2DConfig(nx=n, ny=n, M=args.M, n_colloc=args.M,
                         dtype="float32")
    shared, (t_int, bpts) = prepare_shared_2d(problem, cfg)
    x0, x1, y0, y1 = problem.domain
    hx = (x1 - x0) / n
    hy = (y1 - y0) / n
    sx, sy = 2.0 / hx, 2.0 / hy
    xs = jnp.linspace(x0, x1, n + 1, dtype=jnp.float32)
    ys = jnp.linspace(y0, y1, n + 1, dtype=jnp.float32)
    fem0 = (jnp.sin(jnp.pi * xs)[None, :]
            * jnp.sin(jnp.pi * ys)[:, None]).astype(jnp.float32)

    for method in args.methods:
        for tile in args.tiles:
            def step(fem):
                w, slack, bcv = pk.fused_enhance_varcoeff_2d(
                    fem, shared, problem.a_var, problem.grad_a,
                    problem.f, problem.g, (x0, hx, y0, hy), n, n,
                    t_int, bpts, s2=sx * sx + sy * sy, tile=tile,
                    with_diagnostics=not args.no_diagnostics,
                    f_shifted_fn=problem.f_shifted, method=method,
                )
                return w, slack

            def make_loop(K):
                @jax.jit
                def loop(fem, alpha):
                    def body(i, fem):
                        w, slack = step(fem)
                        return fem + alpha * jnp.max(jnp.abs(w))
                    return jax.lax.fori_loop(0, K, body, fem)
                return loop

            try:
                Ks = (4, 12)
                loops = {K: make_loop(K) for K in Ks}
                alpha = jnp.asarray(1e-30, jnp.float32)
                times = {}
                seq = 0.0
                for K in Ks:
                    float(jnp.sum(loops[K](fem0 + 0.01, alpha)))  # compile
                    ts = []
                    for _ in range(5):
                        seq += 1e-3
                        t0 = time.perf_counter()
                        float(jnp.sum(loops[K](fem0 + seq, alpha)))
                        ts.append(time.perf_counter() - t0)
                    times[K] = float(np.median(ts))
                dt = (times[Ks[1]] - times[Ks[0]]) / (Ks[1] - Ks[0])
                print(f"method={method} tile={tile}: {dt * 1e3:.2f} ms "
                      f"({n * n / dt / 1e6:.1f}M quads/s)")
            except Exception as e:
                print(f"method={method} tile={tile}: FAILED "
                      f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
