// Native float64 oracle kernels for hybrid_fem_lssvr_tpu.
//
// Self-contained C++ (no BLAS/LAPACK): an independent implementation of the
// framework's numerical core, used from tests via ctypes as a
// cross-validation oracle and as a fast host-side reference runtime.  The
// reference repo's native substrate was BLAS/LAPACK + Fortran SLSQP inside
// scipy (SURVEY.md section 2.2); this library is its from-scratch
// replacement on the host side.
//
// Build: make -C native   (produces liboracle.so)

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Thomas algorithm for a tridiagonal system.
// a: sub-diagonal (a[0] unused = 0), b: main, c: super (c[n-1] unused = 0),
// rhs: right-hand side; x: output.  Returns 0 on success, -1 on zero pivot.
int thomas_f64(const double* a, const double* b, const double* c,
               const double* rhs, double* x, int n) {
  std::vector<double> cp(n), dp(n);
  double denom = b[0];
  if (denom == 0.0) return -1;
  cp[0] = c[0] / denom;
  dp[0] = rhs[0] / denom;
  for (int i = 1; i < n; ++i) {
    denom = b[i] - a[i] * cp[i - 1];
    if (denom == 0.0) return -1;
    cp[i] = c[i] / denom;
    dp[i] = (rhs[i] - a[i] * dp[i - 1]) / denom;
  }
  x[n - 1] = dp[n - 1];
  for (int i = n - 2; i >= 0; --i) x[i] = dp[i] - cp[i] * x[i + 1];
  return 0;
}

// Legendre Vandermonde + first/second derivative matrices at points t[nt],
// basis size M.  V0/V1/V2 are row-major [nt, M].
void legendre_vandermonde_f64(const double* t, int nt, int M, double* V0,
                              double* V1, double* V2) {
  for (int i = 0; i < nt; ++i) {
    std::vector<double> P(M), dP(M), d2P(M);
    P[0] = 1.0; dP[0] = 0.0; d2P[0] = 0.0;
    if (M > 1) { P[1] = t[i]; dP[1] = 1.0; d2P[1] = 0.0; }
    for (int k = 1; k + 1 < M; ++k) {
      P[k + 1] = ((2 * k + 1) * t[i] * P[k] - k * P[k - 1]) / (k + 1);
      dP[k + 1] = dP[k - 1] + (2 * k + 1) * P[k];
      d2P[k + 1] = d2P[k - 1] + (2 * k + 1) * dP[k];
    }
    for (int k = 0; k < M; ++k) {
      V0[i * M + k] = P[k];
      V1[i * M + k] = dP[k];
      V2[i * M + k] = d2P[k];
    }
  }
}

// Dense Gaussian elimination with partial pivoting (in-place on copies).
// Returns 0 on success, -1 if singular.
static int ge_solve(std::vector<double>& A, std::vector<double>& b, int n) {
  std::vector<int> piv(n);
  for (int i = 0; i < n; ++i) piv[i] = i;
  for (int col = 0; col < n; ++col) {
    int p = col;
    double best = std::fabs(A[col * n + col]);
    for (int r = col + 1; r < n; ++r) {
      double v = std::fabs(A[r * n + col]);
      if (v > best) { best = v; p = r; }
    }
    if (best == 0.0) return -1;
    if (p != col) {
      for (int j = 0; j < n; ++j) std::swap(A[p * n + j], A[col * n + j]);
      std::swap(b[p], b[col]);
    }
    const double pivv = A[col * n + col];
    for (int r = col + 1; r < n; ++r) {
      const double m = A[r * n + col] / pivv;
      if (m == 0.0) continue;
      for (int j = col; j < n; ++j) A[r * n + j] -= m * A[col * n + j];
      b[r] -= m * b[col];
    }
  }
  for (int i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int j = i + 1; j < n; ++j) s -= A[i * n + j] * b[j];
    b[i] = s / A[i * n + i];
  }
  return 0;
}

// Bordered-KKT element solve (SURVEY.md 0.4):
//   [ I + gamma D^T D   B^T ] [w]   [gamma D^T f]
//   [       B            0  ] [l] = [    bc     ]
// D: [C, M] row-major; B: [K, M]; f: [C]; bc: [K]; w out: [M].
int kkt_solve_f64(const double* D, const double* B, const double* f,
                  const double* bc, double gamma, int C, int M, int K,
                  double* w) {
  const int n = M + K;
  std::vector<double> A(n * n, 0.0), rhs(n, 0.0);
  for (int i = 0; i < M; ++i) {
    for (int j = 0; j < M; ++j) {
      double s = (i == j) ? 1.0 : 0.0;
      for (int c = 0; c < C; ++c) s += gamma * D[c * M + i] * D[c * M + j];
      A[i * n + j] = s;
    }
    for (int k = 0; k < K; ++k) {
      A[i * n + (M + k)] = B[k * M + i];
      A[(M + k) * n + i] = B[k * M + i];
    }
    double r = 0.0;
    for (int c = 0; c < C; ++c) r += gamma * D[c * M + i] * f[c];
    rhs[i] = r;
  }
  for (int k = 0; k < K; ++k) rhs[M + k] = bc[k];
  if (ge_solve(A, rhs, n) != 0) return -1;
  std::memcpy(w, rhs.data(), M * sizeof(double));
  return 0;
}

// Batched element enhancement on a uniform mesh (host reference runtime):
// nodes x0 + e*h, e = 0..E-1; rhs sampled by caller at collocation points
// (f_all: [E, C]); bc_all: [E, 2]; w_all out: [E, M].
// D/B shared across elements.  Returns number of failed elements.
int enhance_shared_f64(const double* D, const double* B,
                       const double* f_all, const double* bc_all,
                       double gamma, int E, int C, int M, double* w_all) {
  int fails = 0;
  for (int e = 0; e < E; ++e) {
    if (kkt_solve_f64(D, B, f_all + (size_t)e * C, bc_all + (size_t)e * 2,
                      gamma, C, M, 2, w_all + (size_t)e * M) != 0)
      ++fails;
  }
  return fails;
}

// Piecewise-Legendre evaluation: binary-search element lookup + recurrence
// evaluation (reference semantics incl. clamping, Hybrid-FEM-LSSVR.py:184-211).
void evaluate_f64(const double* nodes, int n_nodes, const double* coeffs,
                  int M, const double* x, int nx, double* out) {
  const int E = n_nodes - 1;
  for (int i = 0; i < nx; ++i) {
    int lo = 0, hi = n_nodes - 1;
    while (hi - lo > 1) {
      int mid = (lo + hi) / 2;
      if (nodes[mid] <= x[i]) lo = mid; else hi = mid;
    }
    int e = lo;
    if (e > E - 1) e = E - 1;
    const double xl = nodes[e], xr = nodes[e + 1];
    const double t = (2.0 * x[i] - xl - xr) / (xr - xl);
    double pm1 = 1.0, p = t, acc = coeffs[(size_t)e * M];
    if (M > 1) acc += coeffs[(size_t)e * M + 1] * t;
    for (int k = 1; k + 1 < M; ++k) {
      double pn = ((2 * k + 1) * t * p - k * pm1) / (k + 1);
      acc += coeffs[(size_t)e * M + k + 1] * pn;
      pm1 = p; p = pn;
    }
    out[i] = acc;
  }
}


// ---------------------------------------------------------------------------
// 2D oracle kernels (round 2): independent reference for the structured-quad
// pipeline (models/hybrid2d.py).
// ---------------------------------------------------------------------------

// Matrix-free Q1 stiffness apply on a uniform [ny1, nx1] nodal grid
// (row-major, y-major like the JAX side).  K_loc: [4, 4] local stiffness
// with corner order (00, 10, 01, 11) = (SW, SE, NW, NE).
void q1_apply_f64(const double* u, const double* K_loc, int ny1, int nx1,
                  double* out) {
  std::memset(out, 0, (size_t)ny1 * nx1 * sizeof(double));
  for (int ey = 0; ey + 1 < ny1; ++ey) {
    for (int ex = 0; ex + 1 < nx1; ++ex) {
      const int n00 = ey * nx1 + ex, n10 = n00 + 1;
      const int n01 = n00 + nx1, n11 = n01 + 1;
      const int idx[4] = {n00, n10, n01, n11};
      for (int a = 0; a < 4; ++a) {
        double s = 0.0;
        for (int b = 0; b < 4; ++b) s += K_loc[a * 4 + b] * u[idx[b]];
        out[idx[a]] += s;
      }
    }
  }
}

// Jacobi-preconditioned CG for the interior Dirichlet system
// K u = b - K u_bc restricted to interior nodes.  u holds the boundary
// values on entry (interior entries ignored) and the full solution on exit.
// Returns iterations used, or -1 if not converged.
int q1_cg_solve_f64(const double* b, const double* K_loc, int ny1, int nx1,
                    double tol, int maxiter, double* u) {
  const size_t N = (size_t)ny1 * nx1;
  std::vector<double> ubc(N, 0.0), rhs(N, 0.0), Ku(N), x(N, 0.0), r(N),
      z(N), pvec(N), Ap(N), diag(N, 0.0);
  std::vector<char> interior(N, 0);
  for (int j = 1; j + 1 < ny1; ++j)
    for (int i = 1; i + 1 < nx1; ++i) interior[(size_t)j * nx1 + i] = 1;
  for (size_t n = 0; n < N; ++n) ubc[n] = interior[n] ? 0.0 : u[n];
  q1_apply_f64(ubc.data(), K_loc, ny1, nx1, Ku.data());
  for (size_t n = 0; n < N; ++n)
    rhs[n] = interior[n] ? b[n] - Ku[n] : 0.0;
  // diag of K
  {
    std::vector<double> e(N, 0.0);
    for (int ey = 0; ey + 1 < ny1; ++ey)
      for (int ex = 0; ex + 1 < nx1; ++ex) {
        const int n00 = ey * nx1 + ex;
        const int idx[4] = {n00, n00 + 1, n00 + nx1, n00 + nx1 + 1};
        for (int a = 0; a < 4; ++a) diag[idx[a]] += K_loc[a * 4 + a];
      }
  }
  auto apply_free = [&](const std::vector<double>& v,
                        std::vector<double>& outv) {
    std::vector<double> vm(N);
    for (size_t n = 0; n < N; ++n) vm[n] = interior[n] ? v[n] : 0.0;
    q1_apply_f64(vm.data(), K_loc, ny1, nx1, outv.data());
    for (size_t n = 0; n < N; ++n) if (!interior[n]) outv[n] = 0.0;
  };
  double b2 = 0.0;
  for (size_t n = 0; n < N; ++n) b2 += rhs[n] * rhs[n];
  const double stop = tol * tol * (b2 > 0 ? b2 : 1.0);
  for (size_t n = 0; n < N; ++n) r[n] = rhs[n];
  for (size_t n = 0; n < N; ++n)
    z[n] = interior[n] ? r[n] / diag[n] : 0.0;
  pvec = z;
  double rz = 0.0;
  for (size_t n = 0; n < N; ++n) rz += r[n] * z[n];
  int it = 0;
  for (; it < maxiter; ++it) {
    double r2 = 0.0;
    for (size_t n = 0; n < N; ++n) r2 += r[n] * r[n];
    if (r2 <= stop) break;
    apply_free(pvec, Ap);
    double pAp = 0.0;
    for (size_t n = 0; n < N; ++n) pAp += pvec[n] * Ap[n];
    const double alpha = rz / pAp;
    for (size_t n = 0; n < N; ++n) { x[n] += alpha * pvec[n];
                                     r[n] -= alpha * Ap[n]; }
    for (size_t n = 0; n < N; ++n)
      z[n] = interior[n] ? r[n] / diag[n] : 0.0;
    double rz_new = 0.0;
    for (size_t n = 0; n < N; ++n) rz_new += r[n] * z[n];
    const double beta = rz_new / rz;
    rz = rz_new;
    for (size_t n = 0; n < N; ++n) pvec[n] = z[n] + beta * pvec[n];
  }
  for (size_t n = 0; n < N; ++n)
    u[n] = interior[n] ? x[n] : ubc[n];
  return it >= maxiter ? -1 : it;
}

// 2D LSE element solve: min ||D w - f|| s.t. B w = bc via the bordered
// normal-equation KKT [[D^T D, B^T], [B, 0]] (rows of D equilibrated by
// 1/||D||_F; nonsingular because null(D) ^ null(B) = {0} — the gamma-form
// I + gamma D^T D is NOT usable here, see docs/NUMERICS.md 3).
// D: [C2, M2]; B: [K, M2]; f_all: [E, C2]; bc_all: [E, K]; w_all: [E, M2].
// Returns number of failed elements.
int enhance_lse2d_f64(const double* D, const double* B,
                      const double* f_all, const double* bc_all,
                      int E, int C2, int M2, int K, double* w_all) {
  // Global Frobenius scale of D (scale-invariant minimiser).
  double fro = 0.0;
  for (int i = 0; i < C2 * M2; ++i) fro += D[i] * D[i];
  const double s = 1.0 / std::sqrt(fro / C2 + 1e-300);
  const int n = M2 + K;
  std::vector<double> DtD(M2 * M2, 0.0);
  for (int i = 0; i < M2; ++i)
    for (int j = 0; j < M2; ++j) {
      double acc = 0.0;
      for (int c = 0; c < C2; ++c)
        acc += (s * D[c * M2 + i]) * (s * D[c * M2 + j]);
      DtD[i * M2 + j] = acc;
    }
  int fails = 0;
  for (int e = 0; e < E; ++e) {
    std::vector<double> A(n * n, 0.0), rhs(n, 0.0);
    for (int i = 0; i < M2; ++i) {
      for (int j = 0; j < M2; ++j) A[i * n + j] = DtD[i * M2 + j];
      for (int k = 0; k < K; ++k) {
        A[i * n + (M2 + k)] = B[k * M2 + i];
        A[(M2 + k) * n + i] = B[k * M2 + i];
      }
      double r = 0.0;
      for (int c = 0; c < C2; ++c)
        r += (s * D[c * M2 + i]) * (s * f_all[(size_t)e * C2 + c]);
      rhs[i] = r;
    }
    for (int k = 0; k < K; ++k) rhs[M2 + k] = bc_all[(size_t)e * K + k];
    if (ge_solve(A, rhs, n) != 0) { ++fails; continue; }
    std::memcpy(w_all + (size_t)e * M2, rhs.data(), M2 * sizeof(double));
  }
  return fails;
}

// Matrix-free variable-coefficient Q1 stiffness apply (the oracle for
// ops/assembly2d.apply_stiffness_var): per-element K_e = sum_q a_q S_q
// with Sq: [Q, 4, 4] per-quadrature-point gradient products and
// a_maps: [Q, ny, nx] the coefficient sampled per element per point.
void q1_apply_var_f64(const double* u, const double* Sq,
                      const double* a_maps, int Q, int ny1, int nx1,
                      double* out) {
  std::memset(out, 0, (size_t)ny1 * nx1 * sizeof(double));
  const int ny = ny1 - 1, nx = nx1 - 1;
  for (int ey = 0; ey < ny; ++ey) {
    for (int ex = 0; ex < nx; ++ex) {
      const int n00 = ey * nx1 + ex, n10 = n00 + 1;
      const int n01 = n00 + nx1, n11 = n01 + 1;
      const int idx[4] = {n00, n10, n01, n11};
      double Ke[16] = {0.0};
      for (int q = 0; q < Q; ++q) {
        const double aq = a_maps[((size_t)q * ny + ey) * nx + ex];
        for (int t = 0; t < 16; ++t) Ke[t] += aq * Sq[q * 16 + t];
      }
      for (int a = 0; a < 4; ++a) {
        double s = 0.0;
        for (int b = 0; b < 4; ++b) s += Ke[a * 4 + b] * u[idx[b]];
        out[idx[a]] += s;
      }
    }
  }
}

// Per-element-operator 2D LSE enhancement (oracle for the variable-
// coefficient branch of hybrid_solve_2d / fused_enhance_varcoeff_2d):
// same bordered normal-equation KKT as enhance_lse2d_f64, but with a
// per-element D (D_all: [E, C2, M2]) and per-element equilibration.
int enhance_lse2d_var_f64(const double* D_all, const double* B,
                          const double* f_all, const double* bc_all,
                          int E, int C2, int M2, int K, double* w_all) {
  const int n = M2 + K;
  int fails = 0;
  for (int e = 0; e < E; ++e) {
    const double* D = D_all + (size_t)e * C2 * M2;
    double fro = 0.0;
    for (int i = 0; i < C2 * M2; ++i) fro += D[i] * D[i];
    const double s = 1.0 / std::sqrt(fro / C2 + 1e-300);
    std::vector<double> A(n * n, 0.0), rhs(n, 0.0);
    for (int i = 0; i < M2; ++i) {
      for (int j = 0; j < M2; ++j) {
        double acc = 0.0;
        for (int c = 0; c < C2; ++c)
          acc += (s * D[c * M2 + i]) * (s * D[c * M2 + j]);
        A[i * n + j] = acc;
      }
      for (int k = 0; k < K; ++k) {
        A[i * n + (M2 + k)] = B[k * M2 + i];
        A[(M2 + k) * n + i] = B[k * M2 + i];
      }
      double r = 0.0;
      for (int c = 0; c < C2; ++c)
        r += (s * D[c * M2 + i]) * (s * f_all[(size_t)e * C2 + c]);
      rhs[i] = r;
    }
    for (int k = 0; k < K; ++k) rhs[M2 + k] = bc_all[(size_t)e * K + k];
    if (ge_solve(A, rhs, n) != 0) { ++fails; continue; }
    std::memcpy(w_all + (size_t)e * M2, rhs.data(), M2 * sizeof(double));
  }
  return fails;
}

// Tensor-Legendre evaluation on a uniform [ny, nx] quad grid (clamped).
// coeffs: [ny, nx, M, M] (ky, kx ordering); points (x, y)[np_] -> out[np_].
void evaluate2d_f64(double x0, double hx, int nx, double y0, double hy,
                    int ny, const double* coeffs, int M, const double* x,
                    const double* y, int np_, double* out) {
  std::vector<double> Px(M), Py(M);
  for (int i = 0; i < np_; ++i) {
    int ix = (int)std::floor((x[i] - x0) / hx);
    int iy = (int)std::floor((y[i] - y0) / hy);
    if (ix < 0) ix = 0;
    if (ix > nx - 1) ix = nx - 1;
    if (iy < 0) iy = 0;
    if (iy > ny - 1) iy = ny - 1;
    const double tx = 2.0 * (x[i] - (x0 + ix * hx)) / hx - 1.0;
    const double ty = 2.0 * (y[i] - (y0 + iy * hy)) / hy - 1.0;
    Px[0] = 1.0; if (M > 1) Px[1] = tx;
    Py[0] = 1.0; if (M > 1) Py[1] = ty;
    for (int k = 1; k + 1 < M; ++k) {
      Px[k + 1] = ((2 * k + 1) * tx * Px[k] - k * Px[k - 1]) / (k + 1);
      Py[k + 1] = ((2 * k + 1) * ty * Py[k] - k * Py[k - 1]) / (k + 1);
    }
    const double* w = coeffs + (((size_t)iy * nx) + ix) * M * M;
    double acc = 0.0;
    for (int ky = 0; ky < M; ++ky) {
      double rowacc = 0.0;
      for (int kx = 0; kx < M; ++kx) rowacc += w[ky * M + kx] * Px[kx];
      acc += Py[ky] * rowacc;
    }
    out[i] = acc;
  }
}

// Matrix-free Q1 hex stiffness apply (oracle for
// ops/assembly3d.apply_stiffness_3d): shared 8x8 local operator, corner
// order a = 4*cz + 2*cy + cx (x fastest), node grid u[nz1, ny1, nx1].
void q1_apply3d_f64(const double* u, const double* K_loc, int nz1,
                    int ny1, int nx1, double* out) {
  std::memset(out, 0, (size_t)nz1 * ny1 * nx1 * sizeof(double));
  for (int ez = 0; ez + 1 < nz1; ++ez) {
    for (int ey = 0; ey + 1 < ny1; ++ey) {
      for (int ex = 0; ex + 1 < nx1; ++ex) {
        int idx[8];
        int a = 0;
        for (int cz = 0; cz < 2; ++cz)
          for (int cy = 0; cy < 2; ++cy)
            for (int cx = 0; cx < 2; ++cx)
              idx[a++] = ((ez + cz) * ny1 + (ey + cy)) * nx1 + (ex + cx);
        for (a = 0; a < 8; ++a) {
          double s = 0.0;
          for (int b = 0; b < 8; ++b) s += K_loc[a * 8 + b] * u[idx[b]];
          out[idx[a]] += s;
        }
      }
    }
  }
}

// Tensor-Legendre 3D evaluation (oracle for hybrid3d.evaluate_3d):
// coeffs [nz, ny, nx, M, M, M] with (kz, ky, kx) ordering; clamps
// outside the domain like the JAX path / the reference ``:198-209``.
void evaluate3d_f64(double x0, double hx, int nx, double y0, double hy,
                    int ny, double z0, double hz, int nz,
                    const double* coeffs, int M, const double* x,
                    const double* y, const double* z, int np_,
                    double* out) {
  std::vector<double> Px(M), Py(M), Pz(M);
  for (int i = 0; i < np_; ++i) {
    int ix = (int)std::floor((x[i] - x0) / hx);
    int iy = (int)std::floor((y[i] - y0) / hy);
    int iz = (int)std::floor((z[i] - z0) / hz);
    if (ix < 0) ix = 0;
    if (ix > nx - 1) ix = nx - 1;
    if (iy < 0) iy = 0;
    if (iy > ny - 1) iy = ny - 1;
    if (iz < 0) iz = 0;
    if (iz > nz - 1) iz = nz - 1;
    const double tx = 2.0 * (x[i] - (x0 + ix * hx)) / hx - 1.0;
    const double ty = 2.0 * (y[i] - (y0 + iy * hy)) / hy - 1.0;
    const double tz = 2.0 * (z[i] - (z0 + iz * hz)) / hz - 1.0;
    Px[0] = 1.0; if (M > 1) Px[1] = tx;
    Py[0] = 1.0; if (M > 1) Py[1] = ty;
    Pz[0] = 1.0; if (M > 1) Pz[1] = tz;
    for (int k = 1; k + 1 < M; ++k) {
      Px[k + 1] = ((2 * k + 1) * tx * Px[k] - k * Px[k - 1]) / (k + 1);
      Py[k + 1] = ((2 * k + 1) * ty * Py[k] - k * Py[k - 1]) / (k + 1);
      Pz[k + 1] = ((2 * k + 1) * tz * Pz[k] - k * Pz[k - 1]) / (k + 1);
    }
    const double* w =
        coeffs + ((((size_t)iz * ny) + iy) * nx + ix) * M * M * M;
    double acc = 0.0;
    for (int kz = 0; kz < M; ++kz) {
      double planeacc = 0.0;
      for (int ky = 0; ky < M; ++ky) {
        double rowacc = 0.0;
        for (int kx = 0; kx < M; ++kx)
          rowacc += w[(kz * M + ky) * M + kx] * Px[kx];
        planeacc += Py[ky] * rowacc;
      }
      acc += Pz[kz] * planeacc;
    }
    out[i] = acc;
  }
}

}  // extern "C"
