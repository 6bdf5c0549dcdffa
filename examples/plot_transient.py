"""Transient demo: the enhanced Crank-Nicolson march (Numerov traces)
for the 1D heat equation, with per-snapshot error curves against the
exact u = e^{-t} sin(pi x), plus the semilinear Bratu solve's Newton
history (beyond-reference capabilities — the reference solves steady 1D
Poisson only).

Usage: python examples/plot_transient.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hybrid_fem_lssvr_tpu.models.hybrid import SolverConfig
from hybrid_fem_lssvr_tpu.models.nonlinear import (
    bratu_1d, evaluate_semilinear, hybrid_solve_semilinear,
)
from hybrid_fem_lssvr_tpu.models.transient import (
    TransientConfig, heat_1d, hybrid_march,
)
from hybrid_fem_lssvr_tpu.ops import eval as ev


def main(out="transient.png"):
    x = np.linspace(-1, 1, 401)
    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))

    # panel 1: enhanced CN snapshots
    p = heat_1d()
    cfg = SolverConfig(num_nodes=17, M=8, gamma=1e4)
    for T in (0.25, 0.5, 1.0):
        sol = hybrid_march(p, cfg, TransientConfig(
            t_final=T, n_steps=max(64, int(256 * T)), mass="numerov"))
        u = np.asarray(ev.evaluate(sol.nodes, sol.coeffs, x))
        axes[0].plot(x, u, label=f"t = {T}")
        axes[0].plot(x, np.exp(-T) * np.sin(np.pi * x), "k:", lw=0.7)
    axes[0].set_title("enhanced CN march (dots: exact)")
    axes[0].legend()

    # panel 2: error curves
    for T in (0.25, 0.5, 1.0):
        sol = hybrid_march(p, cfg, TransientConfig(
            t_final=T, n_steps=max(64, int(256 * T)), mass="numerov"))
        u = np.asarray(ev.evaluate(sol.nodes, sol.coeffs, x))
        axes[1].semilogy(x, np.abs(u - np.exp(-T) * np.sin(np.pi * x))
                         + 1e-18, label=f"t = {T}")
    axes[1].set_title("|error| (floor = Numerov nodal)")
    axes[1].legend()

    # panel 3: semilinear Newton history + solution error
    sol = hybrid_solve_semilinear(
        bratu_1d(), SolverConfig(num_nodes=33, M=8, gamma=1e4),
        scheme="numerov")
    axes[2].semilogy(np.asarray(sol.newton_residuals), "o-",
                     label="FEM Newton |R|")
    u = np.asarray(evaluate_semilinear(sol, x))
    axes[2].semilogy([len(sol.newton_residuals) - 1],
                     [np.abs(u - np.sin(np.pi * x)).max()], "s",
                     label="final Linf")
    axes[2].set_title("Bratu: quadratic Newton")
    axes[2].set_xlabel("iteration")
    axes[2].legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
