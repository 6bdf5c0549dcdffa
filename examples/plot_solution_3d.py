"""3D demo: solve a structured-hex problem and save a three-panel figure
of mid-plane slices (hybrid solution at z = z_mid, pointwise error, and
the per-hex max-slack map on the same plane).

The reference is 1D-only (its only visualization is the overlay at
``Hybrid-FEM-LSSVR.py:229-237``); this is the 3D analog of
``plot_solution_2d.py`` — slices are the standard way to look at a box
solution.

Usage: python examples/plot_solution_3d.py [problem] [out.png]
         problem in {poisson_3d, poisson_3d_inhomogeneous, helmholtz_3d,
                     advection_diffusion_3d, variable_coeff_elliptic_3d}
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hybrid_fem_lssvr_tpu.models.hybrid3d import (
    HybridSolver3D, Solver3DConfig, get_problem_3d,
)


def main(problem_name="poisson_3d", out="hybrid_solution_3d.png", n=16):
    problem = get_problem_3d(problem_name)
    solver = HybridSolver3D(problem, Solver3DConfig(nx=n, ny=n, nz=n, M=4,
                                                    n_colloc=4))
    sol = solver.solve()

    d = problem.domain
    gx = np.linspace(d[0], d[1], 161)
    gy = np.linspace(d[2], d[3], 161)
    z_mid = 0.5 * (d[4] + d[5]) + 0.01 * (d[5] - d[4])  # off the element
    # face so the slice lands inside hexes, not on a trace plane
    X, Y = np.meshgrid(gx, gy)
    Z = np.full_like(X, z_mid)
    u = np.asarray(
        solver.evaluate_solution(X.ravel(), Y.ravel(), Z.ravel())
    ).reshape(X.shape)

    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))
    im0 = axes[0].pcolormesh(X, Y, u, shading="auto", cmap="viridis")
    axes[0].set_title(
        f"{problem_name}: hybrid solution, z = {z_mid:.2f} ({n}^3 hexes)"
    )
    fig.colorbar(im0, ax=axes[0])

    if problem.exact is not None:
        ue = np.asarray(problem.exact(X, Y, Z))
        im1 = axes[1].pcolormesh(X, Y, np.abs(u - ue), shading="auto",
                                 cmap="magma")
        axes[1].set_title(
            f"|error| on the slice (max {np.abs(u - ue).max():.2e})"
        )
        fig.colorbar(im1, ax=axes[1])
    else:
        axes[1].set_axis_off()

    # Per-hex max-slack map on the element layer containing z_mid —
    # the diagnostic the reference computed and discarded (:102-103).
    kz = min(int((z_mid - d[4]) / ((d[5] - d[4]) / n)), n - 1)
    slack = np.asarray(sol.max_slack)[kz]
    im2 = axes[2].imshow(slack, origin="lower", cmap="inferno",
                         extent=(d[0], d[1], d[2], d[3]), aspect="auto")
    axes[2].set_title(f"max slack, element layer kz = {kz}")
    fig.colorbar(im2, ax=axes[2])

    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
