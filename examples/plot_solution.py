"""Reference-parity demo: solve the reference's __main__ config and save the
exact / hybrid / FEM-nodes overlay figure (the reference's only driver
output, Hybrid-FEM-LSSVR.py:229-237) — plus the error curve the reference
never plotted.

Usage: python examples/plot_solution.py [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from hybrid_fem_lssvr_tpu import HybridSolver, SolverConfig, problems


def main(out="hybrid_solution.png"):
    solver = HybridSolver(
        problems.poisson_1d(),
        SolverConfig(num_nodes=25, M=8, gamma=1e4),
    )
    solver.solve()
    x = np.linspace(-1, 1, 201)
    u = np.asarray(solver.evaluate_solution(x))
    exact = np.sin(np.pi * x)

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(10, 8), sharex=True)
    ax1.plot(x, exact, "r-", label="Exact Solution", linewidth=2)
    ax1.plot(x, u, "b--", label="FEM+LSSVR Solution", linewidth=2)
    ax1.scatter(np.asarray(solver.fem_nodes), np.asarray(solver.fem_values),
                c="green", s=50, label="FEM Nodes", zorder=5)
    ax1.set_ylabel("u(x)")
    ax1.legend()
    ax1.grid(True)

    ax2.semilogy(x, np.abs(u - exact) + 1e-18, "k-")
    ax2.set_xlabel("x")
    ax2.set_ylabel("|error|")
    ax2.grid(True)
    fig.suptitle(
        f"1D Poisson, 25 nodes, M=8: Linf = {np.abs(u - exact).max():.2e}"
    )
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
