"""ctypes bindings for the native C++ oracle library (native/oracle.cpp).

Loads ``native/liboracle.so``, building it with ``make`` on first use if the
toolchain is available.  All entry points are float64 and self-contained
(no BLAS/LAPACK) — an implementation of the numerical core that shares no
code with the JAX path, used as an independent cross-validation oracle and
host-side reference runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "liboracle.so")
_lib = None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def load(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the oracle library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.thomas_f64.restype = ctypes.c_int
    lib.kkt_solve_f64.restype = ctypes.c_int
    lib.enhance_shared_f64.restype = ctypes.c_int
    lib.legendre_vandermonde_f64.restype = None
    lib.evaluate_f64.restype = None
    _lib = lib
    return lib


def thomas(a, b, c, rhs) -> np.ndarray:
    lib = load()
    assert lib is not None, "native oracle unavailable"
    a, b, c, rhs = (np.ascontiguousarray(v, np.float64)
                    for v in (a, b, c, rhs))
    n = b.shape[0]
    x = np.empty(n)
    ret = lib.thomas_f64(_dptr(a), _dptr(b), _dptr(c), _dptr(rhs),
                         _dptr(x), n)
    assert ret == 0, "native Thomas hit a zero pivot"
    return x


def legendre_vandermonde(t, M: int):
    lib = load()
    assert lib is not None
    t = np.ascontiguousarray(t, np.float64)
    nt = t.shape[0]
    V0, V1, V2 = (np.empty((nt, M)) for _ in range(3))
    lib.legendre_vandermonde_f64(_dptr(t), nt, M, _dptr(V0), _dptr(V1),
                                 _dptr(V2))
    return V0, V1, V2


def kkt_solve(D, B, f, bc, gamma: float) -> np.ndarray:
    lib = load()
    assert lib is not None
    D, B, f, bc = (np.ascontiguousarray(v, np.float64)
                   for v in (D, B, f, bc))
    C, M = D.shape
    K = B.shape[0]
    w = np.empty(M)
    ret = lib.kkt_solve_f64(_dptr(D), _dptr(B), _dptr(f), _dptr(bc),
                            ctypes.c_double(gamma), C, M, K, _dptr(w))
    assert ret == 0, "native KKT solve reported a singular system"
    return w


def enhance_shared(D, B, f_all, bc_all, gamma: float) -> np.ndarray:
    lib = load()
    assert lib is not None
    D, B, f_all, bc_all = (np.ascontiguousarray(v, np.float64)
                           for v in (D, B, f_all, bc_all))
    E, C = f_all.shape
    M = D.shape[1]
    w = np.empty((E, M))
    fails = lib.enhance_shared_f64(_dptr(D), _dptr(B), _dptr(f_all),
                                   _dptr(bc_all), ctypes.c_double(gamma),
                                   E, C, M, _dptr(w))
    assert fails == 0, f"{fails} native element solves failed"
    return w


def evaluate(nodes, coeffs, x) -> np.ndarray:
    lib = load()
    assert lib is not None
    nodes, coeffs, x = (np.ascontiguousarray(v, np.float64)
                        for v in (nodes, coeffs, x))
    out = np.empty(x.shape[0])
    lib.evaluate_f64(_dptr(nodes), nodes.shape[0], _dptr(coeffs),
                     coeffs.shape[1], _dptr(x), x.shape[0], _dptr(out))
    return out


def _register_2d(lib):
    lib.q1_apply_f64.restype = None
    lib.q1_cg_solve_f64.restype = ctypes.c_int
    lib.enhance_lse2d_f64.restype = ctypes.c_int
    lib.evaluate2d_f64.restype = None
    lib.q1_apply_var_f64.restype = None
    lib.enhance_lse2d_var_f64.restype = ctypes.c_int


def q1_apply(u, K_loc) -> np.ndarray:
    """Matrix-free Q1 stiffness apply on a [ny1, nx1] nodal grid."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    u, K_loc = (np.ascontiguousarray(v, np.float64) for v in (u, K_loc))
    ny1, nx1 = u.shape
    out = np.empty((ny1, nx1))
    lib.q1_apply_f64(_dptr(u), _dptr(K_loc), ny1, nx1, _dptr(out))
    return out


def q1_cg_solve(b, K_loc, u_bc, tol: float = 1e-12,
                maxiter: int = 10000) -> np.ndarray:
    """Interior Dirichlet Q1 solve via Jacobi-CG; u_bc carries the boundary
    values (interior entries ignored)."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    b, K_loc = (np.ascontiguousarray(v, np.float64) for v in (b, K_loc))
    u = np.ascontiguousarray(u_bc, np.float64).copy()
    ny1, nx1 = u.shape
    it = lib.q1_cg_solve_f64(_dptr(b), _dptr(K_loc), ny1, nx1,
                             ctypes.c_double(tol), maxiter, _dptr(u))
    assert it >= 0, "native Q1 CG did not converge"
    return u


def enhance_lse2d(D, B, f_all, bc_all) -> np.ndarray:
    """2D LSE element enhancement (min ||D w - f|| s.t. B w = bc) via the
    bordered normal-equation KKT — the gamma-form is unusable in 2D
    (docs/NUMERICS.md 3)."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    D, B, f_all, bc_all = (np.ascontiguousarray(v, np.float64)
                           for v in (D, B, f_all, bc_all))
    E, C2 = f_all.shape
    M2 = D.shape[1]
    K = B.shape[0]
    w = np.empty((E, M2))
    fails = lib.enhance_lse2d_f64(_dptr(D), _dptr(B), _dptr(f_all),
                                  _dptr(bc_all), E, C2, M2, K, _dptr(w))
    assert fails == 0, f"{fails} native 2D element solves failed"
    return w


def q1_apply_var(u, Sq, a_maps) -> np.ndarray:
    """Variable-coefficient matrix-free Q1 apply: per-element
    K_e = sum_q a_q S_q (oracle for ``assembly2d.apply_stiffness_var``)."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    u, Sq, a_maps = (np.ascontiguousarray(v, np.float64)
                     for v in (u, Sq, a_maps))
    ny1, nx1 = u.shape
    Q = Sq.shape[0]
    out = np.empty((ny1, nx1))
    lib.q1_apply_var_f64(_dptr(u), _dptr(Sq), _dptr(a_maps), Q, ny1, nx1,
                         _dptr(out))
    return out


def enhance_lse2d_var(D_all, B, f_all, bc_all) -> np.ndarray:
    """Per-element-operator 2D LSE enhancement (oracle for the
    variable-coefficient branch of ``hybrid_solve_2d``)."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    D_all, B, f_all, bc_all = (np.ascontiguousarray(v, np.float64)
                               for v in (D_all, B, f_all, bc_all))
    E, C2 = f_all.shape
    M2 = D_all.shape[2]
    K = B.shape[0]
    w = np.empty((E, M2))
    fails = lib.enhance_lse2d_var_f64(_dptr(D_all), _dptr(B), _dptr(f_all),
                                      _dptr(bc_all), E, C2, M2, K,
                                      _dptr(w))
    assert fails == 0, f"{fails} native 2D var element solves failed"
    return w


def evaluate2d(x0, hx, nx, y0, hy, ny, coeffs, x, y) -> np.ndarray:
    """Tensor-Legendre evaluation on the uniform quad grid (clamped)."""
    lib = load()
    assert lib is not None
    _register_2d(lib)
    coeffs, x, y = (np.ascontiguousarray(v, np.float64)
                    for v in (coeffs, x, y))
    out = np.empty(x.shape[0])
    lib.evaluate2d_f64(ctypes.c_double(x0), ctypes.c_double(hx), nx,
                       ctypes.c_double(y0), ctypes.c_double(hy), ny,
                       _dptr(coeffs), coeffs.shape[-1], _dptr(x), _dptr(y),
                       x.shape[0], _dptr(out))
    return out


def _register_3d(lib):
    lib.q1_apply3d_f64.restype = None
    lib.evaluate3d_f64.restype = None


def q1_apply3d(u, K_loc) -> np.ndarray:
    """Matrix-free Q1 hex stiffness apply on a [nz1, ny1, nx1] node grid
    (oracle for ``assembly3d.apply_stiffness_3d``)."""
    lib = load()
    assert lib is not None
    _register_3d(lib)
    u, K_loc = (np.ascontiguousarray(v, np.float64) for v in (u, K_loc))
    nz1, ny1, nx1 = u.shape
    out = np.empty((nz1, ny1, nx1))
    lib.q1_apply3d_f64(_dptr(u), _dptr(K_loc), nz1, ny1, nx1, _dptr(out))
    return out


def evaluate3d(x0, hx, nx, y0, hy, ny, z0, hz, nz, coeffs, x, y,
               z) -> np.ndarray:
    """Tensor-Legendre evaluation on the uniform hex grid (clamped;
    oracle for ``hybrid3d.evaluate_3d``)."""
    lib = load()
    assert lib is not None
    _register_3d(lib)
    coeffs, x, y, z = (np.ascontiguousarray(v, np.float64)
                       for v in (coeffs, x, y, z))
    out = np.empty(x.shape[0])
    lib.evaluate3d_f64(ctypes.c_double(x0), ctypes.c_double(hx), nx,
                       ctypes.c_double(y0), ctypes.c_double(hy), ny,
                       ctypes.c_double(z0), ctypes.c_double(hz), nz,
                       _dptr(coeffs), coeffs.shape[-1], _dptr(x),
                       _dptr(y), _dptr(z), x.shape[0], _dptr(out))
    return out
