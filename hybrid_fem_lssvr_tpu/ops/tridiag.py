"""Tridiagonal solvers: Thomas (scan) and parallel cyclic reduction (PCR).

TPU-native replacement for the reference's sparse direct solve
(``scipy``'s SuperLU reached via ``Hybrid-FEM-LSSVR.py:138``): 1D P1 FEM
systems are tridiagonal, so a banded solve is exact.  Two algorithms:

* ``thomas``: classic O(N) forward/backward elimination expressed as two
  ``lax.scan``s — numerically the reference algorithm, sequential depth N.
  Good for modest N and as the local solver inside the distributed SPIKE
  scheme (``parallel/sharded.py``).
* ``pcr``: parallel cyclic reduction — log2(N) fully-vectorised sweeps, each
  an elementwise update over the whole system (VPU-friendly, no sequential
  dependency), the idiomatic TPU formulation for large N.

Conventions: a system is given by three length-N diagonals
``a`` (sub, a[0] == 0), ``b`` (main), ``c`` (super, c[-1] == 0) and a right
hand side ``rhs`` of shape [N] or [N, R] (R simultaneous right-hand sides).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ensure_2d(rhs):
    if rhs.ndim == 1:
        return rhs[:, None], True
    return rhs, False


def thomas(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, rhs: jnp.ndarray):
    """Thomas algorithm via two scans. rhs: [N] or [N, R] -> same shape."""
    rhs2, squeeze = _ensure_2d(rhs)
    N = b.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        ai, bi, ci, ri = inp
        denom = bi - ai * cp_prev
        cp = ci / denom
        dp = (ri - ai * dp_prev) / denom
        return (cp, dp), (cp, dp)

    init = (jnp.zeros((), b.dtype), jnp.zeros((rhs2.shape[1],), b.dtype))
    _, (cp, dp) = jax.lax.scan(fwd, init, (a, b, c, rhs2))

    def bwd(x_next, inp):
        cpi, dpi = inp
        x = dpi - cpi[None] * x_next
        return x, x

    _, xs = jax.lax.scan(
        bwd, jnp.zeros((rhs2.shape[1],), b.dtype), (cp, dp), reverse=True
    )
    return xs[:, 0] if squeeze else xs


def pcr(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, rhs: jnp.ndarray):
    """Parallel cyclic reduction: log2(N) vectorised elimination sweeps.

    Out-of-range neighbours are treated as identity rows (b=1, a=c=rhs=0),
    which leaves boundary equations untouched — no power-of-two padding of
    the system itself is needed.
    """
    rhs2, squeeze = _ensure_2d(rhs)
    N = b.shape[0]
    n_steps = max(1, (N - 1).bit_length())

    def shift_down(x, s, fill):  # x[i - s]
        pad = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)[:N]

    def shift_up(x, s, fill):  # x[i + s]
        pad = [(0, s)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)[s:]

    for step in range(n_steps):
        s = 1 << step
        a_m, b_m, c_m = (
            shift_down(a, s, 0.0),
            shift_down(b, s, 1.0),
            shift_down(c, s, 0.0),
        )
        a_p, b_p, c_p = (
            shift_up(a, s, 0.0),
            shift_up(b, s, 1.0),
            shift_up(c, s, 0.0),
        )
        r_m = shift_down(rhs2, s, 0.0)
        r_p = shift_up(rhs2, s, 0.0)

        alpha = -a / b_m
        beta = -c / b_p
        b = b + alpha * c_m + beta * a_p
        rhs2 = rhs2 + alpha[:, None] * r_m + beta[:, None] * r_p
        a = alpha * a_m
        c = beta * c_p

    x = rhs2 / b[:, None]
    return x[:, 0] if squeeze else x


def spike(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, rhs: jnp.ndarray,
          block_size: int = 256):
    """Blocked SPIKE solve — the on-chip analog of the distributed algorithm
    in ``parallel/sharded.py``.

    Partition the N rows into B blocks of ``block_size``: a vmapped Thomas
    eliminates inside every block simultaneously (sequential depth =
    block_size, parallel width = B), producing per-block spikes (v, w); the
    2x2-block-tridiagonal reduced system over the block-boundary unknowns is
    solved by block-PCR in log2(B) fully-vectorised sweeps; local back
    substitution finishes.  ~100x faster than scalar PCR at N = 1e6 (scalar
    PCR does log2(N) sweeps over the FULL system; here the expensive stage
    is O(N / B)-deep and the swept system is 2B small).

    Single right-hand side only (rhs: [N]).
    """
    N = b.shape[0]
    n = block_size
    B = -(-N // n)
    pad = B * n - N
    dtype = b.dtype
    if pad:
        a = jnp.pad(a, (0, pad))
        c = jnp.pad(c, (0, pad))
        b = jnp.pad(b, (0, pad), constant_values=1.0)
        rhs = jnp.pad(rhs, (0, pad))
    ab = a.reshape(B, n)
    bb = b.reshape(B, n)
    cb = c.reshape(B, n)
    rb = rhs.reshape(B, n)
    # Strip inter-block couplings into the spikes.
    l_coup = ab[:, 0]  # a[d, 0] couples to block d-1's last row (0 for d=0)
    u_coup = cb[:, -1]  # c[d, -1] couples to block d+1's first row
    ab = ab.at[:, 0].set(0.0)
    cb = cb.at[:, -1].set(0.0)

    e0 = jnp.zeros((n,), dtype).at[0].set(1.0)
    eN = jnp.zeros((n,), dtype).at[-1].set(1.0)
    rhs3 = jnp.stack(
        [rb, l_coup[:, None] * e0[None, :], u_coup[:, None] * eN[None, :]],
        axis=-1,
    )  # [B, n, 3]
    sol3 = jax.vmap(thomas)(ab, bb, cb, rhs3)
    g, v, w = sol3[..., 0], sol3[..., 1], sol3[..., 2]

    # Reduced system: y_d = (x_first, x_last) of each block,
    #   y_d + L_d y_{d-1} + U_d y_{d+1} = gb_d
    # with L_d = [[0, v[d,0]], [0, v[d,-1]]], U_d = [[w[d,0], 0],
    # [w[d,-1], 0]] — solved by 2x2-block parallel cyclic reduction.
    L = jnp.zeros((B, 2, 2), dtype)
    L = L.at[:, 0, 1].set(v[:, 0]).at[:, 1, 1].set(v[:, -1])
    U = jnp.zeros((B, 2, 2), dtype)
    U = U.at[:, 0, 0].set(w[:, 0]).at[:, 1, 0].set(w[:, -1])
    Dg = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (B, 2, 2))
    r2 = jnp.stack([g[:, 0], g[:, -1]], axis=-1)  # [B, 2]

    # All 2x2 block algebra is written elementwise (no dot_general): tiny
    # matrices gain nothing from the MXU, and elementwise ops keep the f64
    # (TPU-emulated) path available — f64 linalg primitives are not
    # implemented on TPU.
    def inv2(Mm):
        det = Mm[..., 0, 0] * Mm[..., 1, 1] - Mm[..., 0, 1] * Mm[..., 1, 0]
        inv = jnp.stack(
            [
                jnp.stack([Mm[..., 1, 1], -Mm[..., 0, 1]], axis=-1),
                jnp.stack([-Mm[..., 1, 0], Mm[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        return inv / det[..., None, None]

    def mm2(A2, B2):  # [B,2,2] @ [B,2,2] elementwise
        return jnp.stack(
            [
                jnp.stack(
                    [
                        A2[..., 0, 0] * B2[..., 0, 0]
                        + A2[..., 0, 1] * B2[..., 1, 0],
                        A2[..., 0, 0] * B2[..., 0, 1]
                        + A2[..., 0, 1] * B2[..., 1, 1],
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        A2[..., 1, 0] * B2[..., 0, 0]
                        + A2[..., 1, 1] * B2[..., 1, 0],
                        A2[..., 1, 0] * B2[..., 0, 1]
                        + A2[..., 1, 1] * B2[..., 1, 1],
                    ],
                    axis=-1,
                ),
            ],
            axis=-2,
        )

    def mv2(A2, v2):  # [B,2,2] @ [B,2]
        return jnp.stack(
            [
                A2[..., 0, 0] * v2[..., 0] + A2[..., 0, 1] * v2[..., 1],
                A2[..., 1, 0] * v2[..., 0] + A2[..., 1, 1] * v2[..., 1],
            ],
            axis=-1,
        )

    def shift_blocks(x, s, fill_eye):
        padspec = [(0, 0)] * x.ndim
        if s > 0:
            padspec[0] = (s, 0)
            out = jnp.pad(x, padspec)[:B]
        else:
            padspec[0] = (0, -s)
            out = jnp.pad(x, padspec)[-s:]
        if fill_eye:
            idx = jnp.arange(B)
            oob = idx < s if s > 0 else idx >= B + s
            eye = jnp.broadcast_to(jnp.eye(2, dtype=dtype), (B, 2, 2))
            out = jnp.where(oob[:, None, None], eye, out)
        return out

    n_steps = max(1, (B - 1).bit_length())
    for step in range(n_steps):
        s = 1 << step
        D_m = shift_blocks(Dg, s, True)
        L_m = shift_blocks(L, s, False)
        U_m = shift_blocks(U, s, False)
        r_m = shift_blocks(r2, s, False)
        D_p = shift_blocks(Dg, -s, True)
        L_p = shift_blocks(L, -s, False)
        U_p = shift_blocks(U, -s, False)
        r_p = shift_blocks(r2, -s, False)
        alpha = -mm2(L, inv2(D_m))
        beta = -mm2(U, inv2(D_p))
        Dg = Dg + mm2(alpha, U_m) + mm2(beta, L_p)
        r2 = r2 + mv2(alpha, r_m) + mv2(beta, r_p)
        L = mm2(alpha, L_m)
        U = mm2(beta, U_p)
    y = mv2(inv2(Dg), r2)  # [B, 2]

    y_last_prev = jnp.pad(y[:-1, 1], (1, 0))  # x_last(d-1), 0 for d=0
    y_first_next = jnp.pad(y[1:, 0], (0, 1))  # x_first(d+1), 0 for last
    x = g - v * y_last_prev[:, None] - w * y_first_next[:, None]
    return x.reshape(-1)[:N]


def solve(a, b, c, rhs, method: str = "thomas"):
    """Dispatch: 'auto' | 'thomas' | 'pcr' | 'spike' | 'dense'.

    'auto' picks thomas for small N and the blocked SPIKE solver for large
    N (a length-N sequential scan would serialise the TPU).  'pcr' and
    'dense' are deliberately NOT in the auto path: they are retained as
    independent TEST ORACLES only — PCR validates SPIKE through a
    structurally different parallel algorithm (it is ~60x slower than SPIKE
    at N = 1e6 on TPU, RESULTS.md), and 'dense' is the small-N ground
    truth."""
    if method == "auto":
        method = "thomas" if b.shape[0] <= 8192 else "spike"
    if method == "thomas":
        return thomas(a, b, c, rhs)
    if method == "pcr":
        return pcr(a, b, c, rhs)
    if method == "spike":
        if rhs.ndim != 1:
            return jnp.stack(
                [spike(a, b, c, rhs[:, i]) for i in range(rhs.shape[1])],
                axis=1,
            )
        return spike(a, b, c, rhs)
    if method == "dense":
        A = to_dense(a, b, c)
        return jnp.linalg.solve(A, rhs)
    raise ValueError(f"unknown tridiagonal method: {method}")


def gauss_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Gaussian elimination with partial pivoting for SMALL
    static n (reduced SPIKE systems, 2*n_devices <= ~32): elementwise +
    gather ops only, so it compiles under TPU-emulated f64 where LU-based
    ``jnp.linalg.solve`` does not (CLAUDE.md)."""
    n = A.shape[0]
    Ab = jnp.concatenate([A, b[:, None]], axis=1)  # [n, n+1]
    idx = jnp.arange(n)
    for k in range(n):
        p = jnp.argmax(jnp.abs(Ab[k:, k])) + k
        rowk, rowp = Ab[k], Ab[p]
        Ab = Ab.at[k].set(rowp).at[p].set(rowk)
        factors = Ab[:, k] / Ab[k, k]
        elim = jnp.where(idx > k, factors, 0.0)
        Ab = Ab - elim[:, None] * Ab[k][None, :]
    x = jnp.zeros((n,), A.dtype)
    for k in reversed(range(n)):
        acc = Ab[k, n]
        if k + 1 < n:
            acc = acc - jnp.sum(Ab[k, k + 1:n] * x[k + 1:n])
        x = x.at[k].set(acc / Ab[k, k])
    return x


def to_dense(a, b, c) -> jnp.ndarray:
    """Materialise the tridiagonal system as a dense [N, N] matrix (tests)."""
    N = b.shape[0]
    return (
        jnp.diag(b)
        + jnp.diag(a[1:], -1)
        + jnp.diag(c[:-1], 1)
    )


def matvec(a, b, c, x) -> jnp.ndarray:
    """y = A x for tridiagonal A; x: [N] or [N, R]."""
    x2, squeeze = _ensure_2d(x)
    up = jnp.pad(x2[1:], ((0, 1), (0, 0)))
    dn = jnp.pad(x2[:-1], ((1, 0), (0, 0)))
    y = b[:, None] * x2 + c[:, None] * up + a[:, None] * dn
    return y[:, 0] if squeeze else y


def block_thomas_2x2(L, D, U, rhs):
    """Block-tridiagonal solve with 2x2 blocks (Thomas elimination as two
    ``lax.scan``s with closed-form 2x2 inverses — LU-free, so it compiles
    in TPU-emulated f64 where ``jnp.linalg.solve`` does not; CLAUDE.md).

    The 1D Hermite-cubic FEM system of the clamped biharmonic coarse
    stage (``models/biharmonic.py``) is block-tridiagonal with 2 dofs
    (value, slope) per node; its blocks are SPD after Dirichlet
    elimination, so unpivoted block elimination is stable.

    L, D, U: [N, 2, 2] (L[0] and U[-1] ignored); rhs: [N, 2] -> x [N, 2].
    """

    def inv2(A):
        det = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
        adj = jnp.stack([
            jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1),
            jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1),
        ], axis=-2)
        return adj / det[..., None, None]

    def fwd(carry, inp):
        Cp, Dp = carry  # [2, 2], [2]
        Li, Di, Ui, ri = inp
        S = Di - Li @ Cp
        Si = inv2(S)
        Cn = Si @ Ui
        Dn = Si @ (ri - Li @ Dp)
        return (Cn, Dn), (Cn, Dn)

    z2 = jnp.zeros((2, 2), D.dtype)
    (_, _), (Cs, Ds) = jax.lax.scan(
        fwd, (z2, jnp.zeros(2, D.dtype)), (L, D, U, rhs)
    )

    def bwd(x_next, inp):
        Ci, Di = inp
        x = Di - Ci @ x_next
        return x, x

    _, xs = jax.lax.scan(bwd, jnp.zeros(2, D.dtype), (Cs, Ds),
                         reverse=True)
    return xs
