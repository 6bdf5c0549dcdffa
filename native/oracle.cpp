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

}  // extern "C"
