"""hybrid_fem_lssvr_tpu — TPU-native hybrid FEM + LSSVR elliptic-PDE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``maryambabaei/hybrid-FEM-LSSVR`` (see SURVEY.md): a coarse P1 finite-element
solve produces nodal values; an independent LSSVR problem per element
(Legendre trial space, PDE collocation constraints, endpoints pinned to the
FEM values) reconstructs a high-order solution, lifting O(h^2) FEM accuracy
to the O(h^4) nodal-superconvergence floor.  All per-element problems are
solved as one batched bordered-KKT system on the MXU; primal and dual
formulations live behind one API; the element axis shards over a device mesh.
"""

from .models.hybrid import HybridSolver, SolverConfig, Solution, hybrid_solve
from .models.hybrid2d import (
    HybridSolver2D, Problem2D, Solver2DConfig, poisson_2d,
)
from .models.problem import Problem1D
from .models import problems
from .models.adaptive import adaptive_solve
from .models.goal import (
    goal_adaptive_solve, goal_adaptive_solve_2d, goal_adaptive_solve_3d,
)
from .models.batched import ParametricFamily1D, solve_family, solve_groups

__version__ = "0.1.0"

__all__ = [
    "HybridSolver",
    "SolverConfig",
    "Solution",
    "hybrid_solve",
    "Problem1D",
    "problems",
    "HybridSolver2D",
    "Problem2D",
    "Solver2DConfig",
    "poisson_2d",
    "adaptive_solve",
    "goal_adaptive_solve",
    "goal_adaptive_solve_2d",
    "goal_adaptive_solve_3d",
    "ParametricFamily1D",
    "solve_family",
    "solve_groups",
]
