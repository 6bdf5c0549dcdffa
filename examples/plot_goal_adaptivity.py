"""Goal-oriented (DWR) adaptivity demo: refine a 2D mesh toward a local
quantity of interest J(u) = int j u (j a Gaussian bump) and plot the
final graded mesh, the per-element DWR indicator, and the estimate-vs-
true goal-error convergence (a driver output far beyond the reference,
which plots only the solution overlay, Hybrid-FEM-LSSVR.py:229-237).

Usage: python examples/plot_goal_adaptivity.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from hybrid_fem_lssvr_tpu.models.goal import (
    _bisect, adjoint_problem_2d, dwr_estimate_2d, goal_adaptive_solve_2d,
)
from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig, poisson_2d
from hybrid_fem_lssvr_tpu.models.hybrid2d_graded import HybridSolver2DGraded

X0, S = 0.55, 0.08


def j(x, y):
    return jnp.exp(-0.5 * (((x - X0) / S) ** 2 + ((y - X0) / S) ** 2))


def main(out="goal_adaptivity.png"):
    p = poisson_2d()
    tq, wq = np.polynomial.legendre.leggauss(200)
    X, Y = np.meshgrid(tq, tq)
    W = np.outer(wq, wq)
    Jex = float(np.sum(W * np.sin(np.pi * X) * np.sin(np.pi * Y)
                       * np.asarray(j(X, Y))))
    cfg = Solver2DConfig(nx=8, ny=8, M=6, n_colloc=6, dtype="float64",
                         precond="jacobi")
    res = goal_adaptive_solve_2d(p, j, cfg, rounds=4, refine_frac=0.3,
                                 exact_goal=Jex)

    # Final-mesh indicator for the heat map.
    psol = HybridSolver2DGraded(p, cfg, res.xs, res.ys).solve()
    asol = HybridSolver2DGraded(adjoint_problem_2d(p, j), cfg,
                                _bisect(res.xs), _bisect(res.ys)).solve()
    est = dwr_estimate_2d(p, psol, asol)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
    ax = axes[0]
    for x in res.xs:
        ax.axvline(x, color="k", lw=0.4)
    for y in res.ys:
        ax.axhline(y, color="k", lw=0.4)
    th = np.linspace(0, 2 * np.pi, 100)
    ax.plot(X0 + 2 * S * np.cos(th), X0 + 2 * S * np.sin(th), "r-", lw=2,
            label="goal support (2 sigma)")
    ax.set_title(f"goal-refined mesh ({len(res.xs) - 1}x{len(res.ys) - 1})")
    ax.set_aspect("equal")
    ax.legend(loc="lower left")

    ax = axes[1]
    im = ax.pcolormesh(np.asarray(res.xs), np.asarray(res.ys),
                       np.log10(np.abs(np.asarray(est.indicator)) + 1e-18),
                       cmap="viridis")
    fig.colorbar(im, ax=ax, label="log10 |DWR indicator|")
    ax.set_title("per-element error contribution")
    ax.set_aspect("equal")

    ax = axes[2]
    rounds = [r["round"] for r in res.history]
    ax.semilogy(rounds, [abs(r["true_error"]) for r in res.history],
                "o-", label="|J(u) - J(u_h)| true")
    ax.semilogy(rounds, [abs(r["est_error"]) for r in res.history],
                "s--", label="|DWR estimate|")
    ax.set_xlabel("refinement round")
    ax.set_title("goal error: estimate tracks truth")
    ax.grid(True, alpha=0.3)
    ax.legend()

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    for r in res.history:
        print(r)


if __name__ == "__main__":
    main(*sys.argv[1:2])
