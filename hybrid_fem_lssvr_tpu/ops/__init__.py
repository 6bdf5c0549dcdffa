"""Compute kernels: Legendre basis, FEM assembly, banded solves, batched KKT."""
