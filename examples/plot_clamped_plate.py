"""Clamped-plate demo (round 5): solve Lap^2 u = f with u = du/dn = 0 on
[-1, 1]^2 through the BFS-coarse + fourth-order-enhancement route
(models/biharmonic.py clamped-2D section) and save the solution surface
and the pointwise error map.

Usage: python examples/plot_clamped_plate.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import jax

jax.config.update("jax_enable_x64", True)

import matplotlib.pyplot as plt
import numpy as np

from hybrid_fem_lssvr_tpu.models import biharmonic as BH
from hybrid_fem_lssvr_tpu.models.hybrid2d import Solver2DConfig


def main(out="clamped_plate.png"):
    problem = BH.clamped_sin2_2d()
    cfg = Solver2DConfig(nx=16, ny=16, M=10, n_colloc=10,
                         dtype="float64")
    sol = BH.solve_clamped_biharmonic_2d(problem, cfg)
    g = np.linspace(-1.0, 1.0, 161)
    X, Y = np.meshgrid(g, g)
    u = np.asarray(
        BH.evaluate_clamped_2d(sol, X.ravel(), Y.ravel())
    ).reshape(X.shape)
    err = np.abs(u - np.asarray(problem.exact(X, Y)))

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    im0 = axes[0].pcolormesh(X, Y, u, shading="auto")
    axes[0].set_title("clamped plate u (BFS + 4th-order enhancement)")
    fig.colorbar(im0, ax=axes[0])
    im1 = axes[1].pcolormesh(X, Y, err, shading="auto")
    axes[1].set_title(f"|u - exact|  (Linf {err.max():.2e})")
    fig.colorbar(im1, ax=axes[1])
    for ax in axes:
        ax.set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print(f"wrote {out}; Linf {err.max():.3e}, "
          f"cg_iters {int(sol.cg_iters)}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
