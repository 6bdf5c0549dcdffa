"""2D demo: solve a structured-quad problem and save a three-panel figure
(hybrid solution surface, pointwise error, per-element slack map).

The reference has no 2D driver (its only visualization is the 1D overlay,
``Hybrid-FEM-LSSVR.py:229-237``); this is the 2D analog of
``plot_solution.py`` plus the diagnostic map the reference computed and
discarded (``:102-103``).

Usage: python examples/plot_solution_2d.py [problem] [out.png]
         problem in {poisson_2d, helmholtz_2d, advection_diffusion_2d,
                     reaction_diffusion_2d, variable_coeff_elliptic_2d}
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hybrid_fem_lssvr_tpu.models.hybrid2d import (
    HybridSolver2D, Solver2DConfig, get_problem_2d,
)


def main(problem_name="poisson_2d", out="hybrid_solution_2d.png", n=32):
    problem = get_problem_2d(problem_name)
    solver = HybridSolver2D(problem, Solver2DConfig(nx=n, ny=n, M=6))
    sol = solver.solve()

    g = np.linspace(problem.domain[0], problem.domain[1], 161)
    gy = np.linspace(problem.domain[2], problem.domain[3], 161)
    X, Y = np.meshgrid(g, gy)
    u = np.asarray(
        solver.evaluate_solution(X.ravel(), Y.ravel())
    ).reshape(X.shape)

    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))
    im0 = axes[0].pcolormesh(X, Y, u, shading="auto", cmap="viridis")
    axes[0].set_title(f"{problem_name}: hybrid solution ({n}x{n} quads)")
    fig.colorbar(im0, ax=axes[0])

    if problem.exact is not None:
        import jax.numpy as jnp

        err = np.abs(u - np.asarray(problem.exact(jnp.asarray(X.ravel()),
                                                  jnp.asarray(Y.ravel()))
                                    ).reshape(X.shape))
        im1 = axes[1].pcolormesh(X, Y, err, shading="auto", cmap="magma")
        axes[1].set_title(f"|error|  (Linf = {err.max():.2e})")
        fig.colorbar(im1, ax=axes[1])
    else:
        axes[1].set_visible(False)

    im2 = axes[2].imshow(
        np.asarray(sol.max_slack), origin="lower", cmap="cividis",
        extent=problem.domain, aspect="auto",
    )
    axes[2].set_title("per-element max slack (PDE residual)")
    fig.colorbar(im2, ax=axes[2])

    for ax in axes:
        if ax.get_visible():
            ax.set_xlabel("x")
            ax.set_ylabel("y")
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"saved {out}; solve_ok = {bool(sol.solve_ok.all())}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args or []))
