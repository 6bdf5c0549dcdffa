"""3D enhancement-stage throughput probe on the real chip (slope method,
same methodology as bench.py: K iterations chained on-device with a
runtime-value dependency, fresh inputs per run, per-iteration cost =
slope between K=6 and K=24, completion forced by a scalar fetch)."""
import time
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hybrid_fem_lssvr_tpu.models import hybrid3d as H3

N = 64  # 64^3 = 262,144 elements
problem = H3.poisson_3d()
cfg = H3.Solver3DConfig(nx=N, ny=N, nz=N, M=4, n_colloc=4,
                        dtype="float32")
dtype = cfg.jnp_dtype()
shared_bundle = H3.prepare_shared_3d(problem, cfg)
shared, (t_int, spts) = shared_bundle
xs = jnp.linspace(-1, 1, N + 1, dtype=dtype)
E = N * N * N


def step(fem):
    f_rows, bc_rows, cs = H3._element_data_3d(
        problem, cfg, xs, xs, xs, fem, t_int, spts)
    from hybrid_fem_lssvr_tpu.ops import kkt
    w, diags = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    return w


def make_loop(K):
    @jax.jit
    def loop(fem, alpha):
        def body(i, fem):
            w = step(fem)
            return fem + alpha * jnp.max(jnp.abs(w))
        return jax.lax.fori_loop(0, K, body, fem)
    return loop


X = xs[None, None, :]
Y = xs[None, :, None]
Z = xs[:, None, None]
base = jnp.sin(jnp.pi * X) * jnp.sin(jnp.pi * Y) * jnp.sin(jnp.pi * Z)
rng = np.random.default_rng(0)


def run(K, loop):
    fem = base * (1.0 + 1e-6 * float(rng.uniform()))
    a = jnp.asarray(1e-9, dtype)
    t0 = time.perf_counter()
    out = loop(fem, a)
    s = float(jnp.sum(out))
    t1 = time.perf_counter()
    assert np.isfinite(s)
    return t1 - t0


loops = {K: make_loop(K) for K in (6, 24)}
for K, lp in loops.items():
    run(K, lp)  # compile
ts = {K: min(run(K, loops[K]) for _ in range(3)) for K in (6, 24)}
per_iter = (ts[24] - ts[6]) / 18.0
print({"elements": E, "per_iter_sec": per_iter,
       "elements_per_sec": E / per_iter,
       "t6": ts[6], "t24": ts[24]})


# --- decomposition: matmul-only (precomputed rows) vs full step ---
def step_mm(f_rows, bc_rows):
    from hybrid_fem_lssvr_tpu.ops import kkt
    w, _ = kkt.solve_primal_shared(shared, f_rows, bc_rows)
    return w


def make_loop_mm(K):
    @jax.jit
    def loop(f_rows, bc_rows, alpha):
        def body(i, fr):
            w = step_mm(fr, bc_rows)
            return fr + alpha * jnp.max(jnp.abs(w))
        return jax.lax.fori_loop(0, K, body, f_rows)
    return loop


fem0 = base
f_rows0, bc_rows0, _ = jax.jit(
    lambda fem: H3._element_data_3d(problem, cfg, xs, xs, xs, fem,
                                    t_int, spts)
)(fem0)


def run_mm(K, loop):
    fr = f_rows0 * (1.0 + 1e-6 * float(rng.uniform()))
    a = jnp.asarray(1e-9, dtype)
    t0 = time.perf_counter()
    out = loop(fr, bc_rows0, a)
    s = float(jnp.sum(out))
    t1 = time.perf_counter()
    assert np.isfinite(s)
    return t1 - t0


loops_mm = {K: make_loop_mm(K) for K in (6, 24)}
for K, lp in loops_mm.items():
    run_mm(K, lp)
ts_mm = {K: min(run_mm(K, loops_mm[K]) for _ in range(3)) for K in (6, 24)}
per_iter_mm = (ts_mm[24] - ts_mm[6]) / 18.0
print({"solve_only_per_iter_sec": per_iter_mm,
       "solve_only_elements_per_sec": E / per_iter_mm})

# --- coarse FEM stage (MG-CG) steady state: fresh zs per run ---
fem_jit = jax.jit(lambda xsv, ysv, zsv: H3.fem_solve_3d(
    problem, cfg, xsv, ysv, zsv)[0])
fem_jit(xs, xs, xs).block_until_ready()
best = 1e9
for r in range(4):
    zs_p = xs * (1.0 + 1e-7 * (r + 1))
    t0 = time.perf_counter()
    out = fem_jit(xs, xs, zs_p)
    s = float(jnp.sum(out))
    t1 = time.perf_counter()
    best = min(best, t1 - t0)
print({"fem_stage_sec_64cubed": best})


# --- fused Pallas stacked kernel ---
from hybrid_fem_lssvr_tpu.ops import pallas_kernels as pk

geom = (-1.0, 2.0 / N, -1.0, 2.0 / N, -1.0, 2.0 / N)


def step_pallas(fem):
    w, slack, bcv = pk.fused_enhance_stacked_3d(
        fem, shared, problem.f, problem.g, geom, N, N, N, t_int, spts,
        tile=pk.pick_tile(E, 4096))
    return w


def make_loop_p(K):
    @jax.jit
    def loop(fem, alpha):
        def body(i, fem):
            w = step_pallas(fem)
            return fem + alpha * jnp.max(jnp.abs(w))
        return jax.lax.fori_loop(0, K, body, fem)
    return loop


loops_p = {K: make_loop_p(K) for K in (6, 24)}
for K, lp in loops_p.items():
    run(K, lp)
ts_p = {K: min(run(K, loops_p[K]) for _ in range(3)) for K in (6, 24)}
per_iter_p = (ts_p[24] - ts_p[6]) / 18.0
print({"pallas_per_iter_sec": per_iter_p,
       "pallas_elements_per_sec": E / per_iter_p})


# --- fused kernel with the structured-rhs hook ---
def step_pallas_fs(fem):
    w, slack, bcv = pk.fused_enhance_stacked_3d(
        fem, shared, problem.f, problem.g, geom, N, N, N, t_int, spts,
        tile=pk.pick_tile(E, 4096), f_shifted_fn=problem.f_shifted)
    return w


def make_loop_pf(K):
    @jax.jit
    def loop(fem, alpha):
        def body(i, fem):
            w = step_pallas_fs(fem)
            return fem + alpha * jnp.max(jnp.abs(w))
        return jax.lax.fori_loop(0, K, body, fem)
    return loop


loops_pf = {K: make_loop_pf(K) for K in (6, 24)}
for K, lp in loops_pf.items():
    run(K, lp)
ts_pf = {K: min(run(K, loops_pf[K]) for _ in range(3)) for K in (6, 24)}
per_iter_pf = (ts_pf[24] - ts_pf[6]) / 18.0
print({"pallas_fshifted_per_iter_sec": per_iter_pf,
       "pallas_fshifted_elements_per_sec": E / per_iter_pf})
