// tinympc_julia_tpu native runtime — dynamic-size C++ ADMM solver + C ABI.
//
// The FFI surface of the framework: the same 15 extern "C" entry points the
// reference bindings expose (/root/reference/src/bindings.cpp, SURVEY.md
// §2.2), implemented over a fresh dependency-free dynamic-size solver (plain
// std::vector, no Eigen).  This is the host/embedded runtime companion to the
// JAX/TPU compute path: C, C++, Julia (ccall) or any FFI-capable caller can
// drive MPC solves without Python.
//
// Like the reference, the C ABI operates on a process-global solver instance
// (the reference's g_solver singleton, bindings.cpp:15); the underlying C++
// class is instantiable any number of times.
//
// Algorithm semantics match ops/admm.py (which reproduces the reference ADMM
// exactly — see the framework's golden parity tests): update ordering,
// slack-variable solutions, residual bookkeeping, warm starts, Taylor
// adaptive-rho, box/linear/SOC projections, over-relaxation.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libtinympc_native.so
//        tinympc_native.cpp
#include <cmath>
#include <cstdio>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

namespace tinympc_native {

using std::vector;
typedef double real;

struct Settings {
  real abs_pri_tol = 1e-3;
  real abs_dua_tol = 1e-3;
  int max_iter = 1000;
  int check_termination = 1;
  int en_state_bound = 1;
  int en_input_bound = 1;
  int en_state_soc = 0;
  int en_input_soc = 0;
  int en_state_linear = 0;
  int en_input_linear = 0;
  int adaptive_rho = 0;
  real adaptive_rho_min = 1.0;
  real adaptive_rho_max = 100.0;
  int adaptive_rho_enable_clipping = 1;
  real relaxation_alpha = 1.0;
};

struct Cache {
  real rho = 0;
  vector<real> Kinf, Pinf, Quu_inv, AmBKt;          // row-major
  vector<real> dKinf, dPinf, dC1, dC2;
};

struct Solver {
  int nx = 0, nu = 0, N = 0;
  Settings settings;
  Cache cache;

  // problem data (stage-major: x[i*nx + j])
  vector<real> A, B, f, Qd, Rd;
  vector<real> x_min, x_max, u_min, u_max;
  vector<real> Xref, Uref;
  vector<real> Alin_x, blin_x, Alin_u, blin_u;
  vector<int> cone_x_start, cone_x_dim, cone_u_start, cone_u_dim;
  vector<real> cone_x_mu, cone_u_mu;

  // workspace
  vector<real> x, u, q, r, p, d, v, vnew, z, znew, g, y;
  real pri_res_state = 0, pri_res_input = 0;
  real dua_res_state = 0, dua_res_input = 0;
  int status = 0, iter = 0;

  // solution
  vector<real> sol_x, sol_u;
  int sol_iter = 0, sol_solved = 0;

  int setup(const real* A_, const real* B_, const real* f_, const real* Q_,
            const real* R_, real rho, int nx_, int nu_, int N_);
  int solve();
  void precompute_cache(real rho);
};

// --- tiny dense helpers (row-major) ----------------------------------------

static void matvec(const vector<real>& M, const real* v, real* out, int rows,
                   int cols) {
  for (int i = 0; i < rows; ++i) {
    real acc = 0;
    for (int j = 0; j < cols; ++j) acc += M[i * cols + j] * v[j];
    out[i] = acc;
  }
}

static void matvec_t(const vector<real>& M, const real* v, real* out, int rows,
                     int cols) {
  for (int j = 0; j < cols; ++j) out[j] = 0;
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) out[j] += M[i * cols + j] * v[i];
}

static vector<real> matmul(const vector<real>& A, const vector<real>& B, int m,
                           int k, int n) {
  vector<real> C(m * n, 0.0);
  for (int i = 0; i < m; ++i)
    for (int l = 0; l < k; ++l) {
      const real a = A[i * k + l];
      for (int j = 0; j < n; ++j) C[i * n + j] += a * B[l * n + j];
    }
  return C;
}

static vector<real> transpose(const vector<real>& A, int m, int n) {
  vector<real> T(n * m);
  for (int i = 0; i < m; ++i)
    for (int j = 0; j < n; ++j) T[j * m + i] = A[i * n + j];
  return T;
}

// Gauss-Jordan inverse with partial pivoting (sizes here are <= ~16).
static bool invert(vector<real> M, int n, vector<real>& out) {
  out.assign(n * n, 0.0);
  for (int i = 0; i < n; ++i) out[i * n + i] = 1.0;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int i = col + 1; i < n; ++i)
      if (std::fabs(M[i * n + col]) > std::fabs(M[piv * n + col])) piv = i;
    if (std::fabs(M[piv * n + col]) < 1e-300) return false;
    if (piv != col)
      for (int j = 0; j < n; ++j) {
        std::swap(M[piv * n + j], M[col * n + j]);
        std::swap(out[piv * n + j], out[col * n + j]);
      }
    const real inv_p = 1.0 / M[col * n + col];
    for (int j = 0; j < n; ++j) {
      M[col * n + j] *= inv_p;
      out[col * n + j] *= inv_p;
    }
    for (int i = 0; i < n; ++i) {
      if (i == col) continue;
      const real fac = M[i * n + col];
      if (fac == 0.0) continue;
      for (int j = 0; j < n; ++j) {
        M[i * n + j] -= fac * M[col * n + j];
        out[i * n + j] -= fac * out[col * n + j];
      }
    }
  }
  return true;
}

// --- setup + Riccati cache (tiny_api.cpp:21-190 semantics incl. the
//     double rho fold) --------------------------------------------------------

void Solver::precompute_cache(real rho) {
  // Q1 = user Q + 2 rho (work fold + precompute fold), R1 likewise.
  vector<real> Q1(nx * nx, 0.0), R1(nu * nu, 0.0);
  for (int i = 0; i < nx; ++i) Q1[i * nx + i] = Qd[i] + rho;  // Qd pre-folded
  for (int i = 0; i < nu; ++i) R1[i * nu + i] = Rd[i] + rho;

  vector<real> Ktp1(nu * nx, 0.0), Ptp1(nx * nx, 0.0);
  for (int i = 0; i < nx; ++i) Ptp1[i * nx + i] = rho;
  vector<real> Kinf = Ktp1, Pinf = Ptp1;
  const vector<real> Bt = transpose(B, nx, nu);
  const vector<real> At = transpose(A, nx, nx);

  for (int it = 0; it < 1000; ++it) {
    vector<real> BtP = matmul(Bt, Ptp1, nu, nx, nx);
    vector<real> G = matmul(BtP, B, nu, nx, nu);  // B'PB
    for (int i = 0; i < nu * nu; ++i) G[i] += R1[i];
    vector<real> Ginv;
    invert(G, nu, Ginv);
    vector<real> BtPA = matmul(BtP, A, nu, nx, nx);
    Kinf = matmul(Ginv, BtPA, nu, nu, nx);
    vector<real> BK = matmul(B, Kinf, nx, nu, nx);
    vector<real> AmBK(nx * nx);
    for (int i = 0; i < nx * nx; ++i) AmBK[i] = A[i] - BK[i];
    vector<real> PtA = matmul(Ptp1, AmBK, nx, nx, nx);
    Pinf = matmul(At, PtA, nx, nx, nx);
    for (int i = 0; i < nx * nx; ++i) Pinf[i] += Q1[i];
    real diff = 0;
    for (int i = 0; i < nu * nx; ++i)
      diff = std::fmax(diff, std::fabs(Kinf[i] - Ktp1[i]));
    if (diff < 1e-5) break;
    Ktp1 = Kinf;
    Ptp1 = Pinf;
  }

  vector<real> BtP = matmul(Bt, Pinf, nu, nx, nx);
  vector<real> G = matmul(BtP, B, nu, nx, nu);
  for (int i = 0; i < nu * nu; ++i) G[i] += R1[i];
  vector<real> Quu;
  invert(G, nu, Quu);
  vector<real> BK = matmul(B, Kinf, nx, nu, nx);
  vector<real> AmBK(nx * nx);
  for (int i = 0; i < nx * nx; ++i) AmBK[i] = A[i] - BK[i];

  cache.rho = rho;
  cache.Kinf = Kinf;
  cache.Pinf = Pinf;
  cache.Quu_inv = Quu;
  cache.AmBKt = transpose(AmBK, nx, nx);
  cache.dKinf.assign(nu * nx, 0.0);
  cache.dPinf.assign(nx * nx, 0.0);
  cache.dC1.assign(nu * nu, 0.0);
  cache.dC2.assign(nx * nx, 0.0);
}

int Solver::setup(const real* A_, const real* B_, const real* f_,
                  const real* Q_, const real* R_, real rho, int nx_, int nu_,
                  int N_) {
  nx = nx_;
  nu = nu_;
  N = N_;
  A.assign(A_, A_ + nx * nx);
  B.assign(B_, B_ + nx * nu);
  f.assign(f_, f_ + nx);
  // rho fold into diagonal costs (tiny_api.cpp:90-91)
  Qd.resize(nx);
  Rd.resize(nu);
  for (int i = 0; i < nx; ++i) Qd[i] = Q_[i * nx + i] + rho;
  for (int i = 0; i < nu; ++i) Rd[i] = R_[i * nu + i] + rho;

  const real big = 1e30;
  x_min.assign(N * nx, -big);
  x_max.assign(N * nx, big);
  u_min.assign((N - 1) * nu, -big);
  u_max.assign((N - 1) * nu, big);
  Xref.assign(N * nx, 0.0);
  Uref.assign((N - 1) * nu, 0.0);

  x.assign(N * nx, 0.0);
  q = p = v = vnew = g = x;
  u.assign((N - 1) * nu, 0.0);
  r = d = z = znew = y = u;

  settings = Settings();
  precompute_cache(rho);
  return 0;
}

// --- projections -----------------------------------------------------------

static void project_soc(real* vec, int start, int dim, real mu) {
  real a2 = 0;
  for (int i = start; i < start + dim - 1; ++i) a2 += vec[i] * vec[i];
  const real a = std::sqrt(a2);
  const real u0 = vec[start + dim - 1] * mu;
  if (a <= u0) return;
  if (a <= -u0) {
    for (int i = start; i < start + dim; ++i) vec[i] = 0;
    return;
  }
  const real safe_a = a > 1e-30 ? a : 1e-30;
  const real factor = (a + u0) / (2 * safe_a);
  for (int i = start; i < start + dim - 1; ++i) vec[i] *= factor;
  vec[start + dim - 1] = factor * (a / mu);
}

static void project_halfspaces(real* vec, const vector<real>& Am,
                               const vector<real>& bv, int m, int n) {
  for (int rI = 0; rI < m; ++rI) {
    real dot = 0, nrm2 = 0;
    for (int j = 0; j < n; ++j) {
      dot += Am[rI * n + j] * vec[j];
      nrm2 += Am[rI * n + j] * Am[rI * n + j];
    }
    const real viol = dot - bv[rI];
    if (viol > 0 && nrm2 > 1e-30) {
      const real s = viol / nrm2;
      for (int j = 0; j < n; ++j) vec[j] -= s * Am[rI * n + j];
    }
  }
}

// --- solve loop (admm.cpp:109-207 ordering) --------------------------------

int Solver::solve() {
  sol_solved = 0;
  sol_iter = 0;
  status = 11;
  iter = 0;
  const int Nm1 = N - 1;
  const real alpha = settings.relaxation_alpha;
  vector<real> tmp_u(nu), tmp_x(nx), tmp_x2(nx);

  for (int i = 0; i < settings.max_iter; ++i) {
    // forward pass
    for (int k = 0; k < Nm1; ++k) {
      matvec(cache.Kinf, &x[k * nx], tmp_u.data(), nu, nx);
      for (int j = 0; j < nu; ++j) u[k * nu + j] = -tmp_u[j] - d[k * nu + j];
      matvec(A, &x[k * nx], tmp_x.data(), nx, nx);
      matvec(B, &u[k * nu], tmp_x2.data(), nx, nu);
      for (int j = 0; j < nx; ++j)
        x[(k + 1) * nx + j] = tmp_x[j] + tmp_x2[j] + f[j];
    }

    // slack update (with optional over-relaxation)
    for (int k = 0; k < Nm1 * nu; ++k) {
      const real uh = alpha == 1.0 ? u[k] : alpha * u[k] + (1 - alpha) * z[k];
      znew[k] = uh + y[k];
    }
    for (int k = 0; k < N * nx; ++k) {
      const real xh = alpha == 1.0 ? x[k] : alpha * x[k] + (1 - alpha) * v[k];
      vnew[k] = xh + g[k];
    }
    if (settings.en_input_bound)
      for (int k = 0; k < Nm1 * nu; ++k)
        znew[k] = std::fmin(u_max[k], std::fmax(u_min[k], znew[k]));
    if (settings.en_state_bound)
      for (int k = 0; k < N * nx; ++k)
        vnew[k] = std::fmin(x_max[k], std::fmax(x_min[k], vnew[k]));
    if (settings.en_input_linear && !blin_u.empty())
      for (int k = 0; k < Nm1; ++k)
        project_halfspaces(&znew[k * nu], Alin_u, blin_u,
                           (int)blin_u.size(), nu);
    if (settings.en_state_linear && !blin_x.empty())
      for (int k = 0; k < N; ++k)
        project_halfspaces(&vnew[k * nx], Alin_x, blin_x,
                           (int)blin_x.size(), nx);
    if (settings.en_input_soc)
      for (int k = 0; k < Nm1; ++k)
        for (size_t c = 0; c < cone_u_start.size(); ++c)
          project_soc(&znew[k * nu], cone_u_start[c], cone_u_dim[c],
                      cone_u_mu[c]);
    if (settings.en_state_soc)
      for (int k = 0; k < N; ++k)
        for (size_t c = 0; c < cone_x_start.size(); ++c)
          project_soc(&vnew[k * nx], cone_x_start[c], cone_x_dim[c],
                      cone_x_mu[c]);

    // dual ascent
    for (int k = 0; k < Nm1 * nu; ++k) {
      const real uh = alpha == 1.0 ? u[k] : alpha * u[k] + (1 - alpha) * z[k];
      y[k] += uh - znew[k];
    }
    for (int k = 0; k < N * nx; ++k) {
      const real xh = alpha == 1.0 ? x[k] : alpha * x[k] + (1 - alpha) * v[k];
      g[k] += xh - vnew[k];
    }

    // linear cost
    const real rho = cache.rho;
    for (int k = 0; k < Nm1; ++k)
      for (int j = 0; j < nu; ++j) {
        const int idx = k * nu + j;
        r[idx] = -Uref[idx] * Rd[j] - rho * (znew[idx] - y[idx]);
      }
    for (int k = 0; k < N; ++k)
      for (int j = 0; j < nx; ++j) {
        const int idx = k * nx + j;
        q[idx] = -Xref[idx] * Qd[j] - rho * (vnew[idx] - g[idx]);
      }
    matvec_t(cache.Pinf, &Xref[(N - 1) * nx], tmp_x.data(), nx, nx);
    for (int j = 0; j < nx; ++j) {
      const int idx = (N - 1) * nx + j;
      p[idx] = -tmp_x[j] - rho * (vnew[idx] - g[idx]);
    }

    iter += 1;

    // adaptive rho (matrix-free OSQP residuals + Taylor update, the
    // framework's ops/rho.py algorithm; gate i>0 && i%5==0, admm.cpp:156)
    if (settings.adaptive_rho && i > 0 && i % 5 == 0 && !cache.dKinf.empty()) {
      const real eps = 1e-10;
      real pri_res = 0, pri_norm = 0, dual_res = 0, dual_norm = 0;
      for (int k = 0; k < Nm1; ++k) {
        for (int j = 0; j < nu; ++j) {
          const real ax = u[k * nu + j];
          pri_norm = std::fmax(pri_norm, std::fabs(ax));
          pri_norm = std::fmax(pri_norm, std::fabs(znew[k * nu + j]));
          pri_res = std::fmax(pri_res, std::fabs(ax - znew[k * nu + j]));
        }
        matvec(A, &x[k * nx], tmp_x.data(), nx, nx);
        matvec(B, &u[k * nu], tmp_x2.data(), nx, nu);
        for (int j = 0; j < nx; ++j) {
          const real dyn = tmp_x[j] + tmp_x2[j] - x[(k + 1) * nx + j];
          pri_norm = std::fmax(pri_norm, std::fabs(dyn));
          pri_norm = std::fmax(pri_norm, std::fabs(vnew[(k + 1) * nx + j]));
          pri_res = std::fmax(pri_res,
                              std::fabs(dyn - vnew[(k + 1) * nx + j]));
        }
      }
      vector<real> Px(nx), Atg(nx), Btg(nu);
      for (int k = 0; k < N; ++k) {
        if (k == N - 1) {
          matvec(cache.Pinf, &x[k * nx], Px.data(), nx, nx);
        } else {
          for (int j = 0; j < nx; ++j) Px[j] = Qd[j] * x[k * nx + j];
        }
        for (int j = 0; j < nx; ++j) Atg[j] = 0;
        if (k < N - 1) {
          matvec_t(A, &g[(k + 1) * nx], Atg.data(), nx, nx);
        }
        if (k >= 1)
          for (int j = 0; j < nx; ++j) Atg[j] -= g[k * nx + j];
        for (int j = 0; j < nx; ++j) {
          const real qv = Qd[j] * x[k * nx + j];
          const real rd = Px[j] + qv + Atg[j];
          dual_res = std::fmax(dual_res, std::fabs(rd));
          dual_norm = std::fmax(dual_norm, std::fabs(Px[j]));
          dual_norm = std::fmax(dual_norm, std::fabs(Atg[j]));
          dual_norm = std::fmax(dual_norm, std::fabs(qv));
        }
      }
      for (int k = 0; k < Nm1; ++k) {
        matvec_t(B, &g[(k + 1) * nx], Btg.data(), nx, nu);
        for (int j = 0; j < nu; ++j) {
          const real Pu = Rd[j] * u[k * nu + j];
          const real aty = Btg[j] + y[k * nu + j];
          const real rd = Pu + Pu + aty;
          dual_res = std::fmax(dual_res, std::fabs(rd));
          dual_norm = std::fmax(dual_norm, std::fabs(Pu));
          dual_norm = std::fmax(dual_norm, std::fabs(aty));
        }
      }
      real new_rho = cache.rho *
          std::sqrt((pri_res / (pri_norm + eps)) /
                    (dual_res / (dual_norm + eps) + eps));
      if (settings.adaptive_rho_enable_clipping)
        new_rho = std::fmin(std::fmax(new_rho, settings.adaptive_rho_min),
                            settings.adaptive_rho_max);
      const real drho = new_rho - cache.rho;
      for (int k = 0; k < nu * nx; ++k) cache.Kinf[k] += drho * cache.dKinf[k];
      for (int k = 0; k < nx * nx; ++k) cache.Pinf[k] += drho * cache.dPinf[k];
      cache.rho = new_rho;
    }

    // termination
    bool converged = false;
    if (settings.check_termination > 0 &&
        iter % settings.check_termination == 0) {
      real ps = 0, pi = 0, ds = 0, di = 0;
      for (int k = 0; k < N * nx; ++k) {
        ps = std::fmax(ps, std::fabs(x[k] - vnew[k]));
        ds = std::fmax(ds, std::fabs(v[k] - vnew[k]));
      }
      for (int k = 0; k < Nm1 * nu; ++k) {
        pi = std::fmax(pi, std::fabs(u[k] - znew[k]));
        di = std::fmax(di, std::fabs(z[k] - znew[k]));
      }
      ds *= cache.rho;
      di *= cache.rho;
      pri_res_state = ps;
      pri_res_input = pi;
      dua_res_state = ds;
      dua_res_input = di;
      converged = ps < settings.abs_pri_tol && pi < settings.abs_pri_tol &&
                  ds < settings.abs_dua_tol && di < settings.abs_dua_tol;
    }
    if (converged) {
      status = 1;
      sol_iter = iter;
      sol_solved = 1;
      sol_x = vnew;
      sol_u = znew;
      return 0;
    }

    v = vnew;
    z = znew;

    // backward pass
    for (int k = Nm1 - 1; k >= 0; --k) {
      matvec_t(B, &p[(k + 1) * nx], tmp_u.data(), nx, nu);
      for (int j = 0; j < nu; ++j) tmp_u[j] += r[k * nu + j];
      matvec(cache.Quu_inv, tmp_u.data(), &d[k * nu], nu, nu);
      matvec(cache.AmBKt, &p[(k + 1) * nx], tmp_x.data(), nx, nx);
      matvec_t(cache.Kinf, &r[k * nu], tmp_x2.data(), nu, nx);
      for (int j = 0; j < nx; ++j)
        p[k * nx + j] = q[k * nx + j] + tmp_x[j] - tmp_x2[j];
    }
  }

  sol_iter = iter;
  sol_solved = 0;
  sol_x = vnew;
  sol_u = znew;
  return 1;
}

}  // namespace tinympc_native

// ---------------------------------------------------------------------------
// C ABI — signature-compatible with the reference bindings
// (/root/reference/src/bindings.cpp; SURVEY.md §2.2 table).
// ---------------------------------------------------------------------------

namespace tinympc_native {

// --- codegen emitter --------------------------------------------------------
// C-ABI analog of the reference's tiny_codegen (codegen.cpp:56-68, exposed
// via bindings.cpp:210-225,298-331).  Emits the SAME project layout and file
// contents as the Python emitter (tinympc_julia_tpu/codegen/emitter.py) —
// the templates are baked in from that single source of truth by
// tools/gen_native_inc.py.

#include "codegen_templates.inc"

static std::string fmt_g(real v) {
  char buf[64];
  std::snprintf(buf, sizeof buf, "%.17g", v);
  return buf;
}

static std::string array_literal_1d(const std::string& name, const real* a,
                                    int n) {
  std::string s = "static const tiny_float " + name + "[" +
                  std::to_string(n) + "] = {";
  for (int j = 0; j < n; ++j) {
    if (j) s += ", ";
    s += fmt_g(a[j]);
  }
  return s + "};";
}

static std::string array_literal_2d(const std::string& name, const real* a,
                                    int rows, int cols) {
  std::string s = "static const tiny_float " + name + "[" +
                  std::to_string(rows) + "][" + std::to_string(cols) +
                  "] = {\n";
  for (int i = 0; i < rows; ++i) {
    s += "    {";
    for (int j = 0; j < cols; ++j) {
      if (j) s += ", ";
      s += fmt_g(a[i * cols + j]);
    }
    s += "}";
    if (i + 1 < rows) s += ",\n";
  }
  return s + "};";
}

static std::string int_array_literal(const std::string& name,
                                     const vector<int>& a) {
  std::string s = "static const int " + name + "[" +
                  std::to_string(a.size()) + "] = {";
  for (size_t j = 0; j < a.size(); ++j) {
    if (j) s += ", ";
    s += std::to_string(a[j]);
  }
  return s + "};";
}

static void copy2d(const std::string& dst, const std::string& src, int rows,
                   int cols, vector<std::string>& lines) {
  lines.push_back("  for (int i = 0; i < " + std::to_string(rows) + "; ++i)");
  lines.push_back("    for (int j = 0; j < " + std::to_string(cols) +
                  "; ++j)");
  lines.push_back("      " + dst + "[i][j] = " + src + "[i][j];");
}

static void copy1d(const std::string& dst, const std::string& src, int n,
                   vector<std::string>& lines) {
  lines.push_back("  for (int j = 0; j < " + std::to_string(n) + "; ++j) " +
                  dst + "[j] = " + src + "[j];");
}

static std::string replace_all(std::string s, const std::string& from,
                               const std::string& to) {
  for (size_t pos = 0; (pos = s.find(from, pos)) != std::string::npos;
       pos += to.size())
    s.replace(pos, from.size(), to);
  return s;
}

static std::string generate_data_source(const Solver& sv) {
  const int nx = sv.nx, nu = sv.nu, N = sv.N;
  const bool has_sens = sv.settings.adaptive_rho != 0;
  vector<std::string> parts;
  parts.push_back("#include \"tiny_data.hpp\"\n");
  parts.push_back(array_literal_2d("g_Adyn", sv.A.data(), nx, nx));
  parts.push_back(array_literal_2d("g_Bdyn", sv.B.data(), nx, nu));
  parts.push_back(array_literal_1d("g_fdyn", sv.f.data(), nx));
  parts.push_back(array_literal_1d("g_Q", sv.Qd.data(), nx));
  parts.push_back(array_literal_1d("g_R", sv.Rd.data(), nu));
  parts.push_back(array_literal_2d("g_Kinf", sv.cache.Kinf.data(), nu, nx));
  parts.push_back(array_literal_2d("g_Pinf", sv.cache.Pinf.data(), nx, nx));
  parts.push_back(
      array_literal_2d("g_Quu_inv", sv.cache.Quu_inv.data(), nu, nu));
  parts.push_back(array_literal_2d("g_AmBKt", sv.cache.AmBKt.data(), nx, nx));
  if (has_sens) {
    parts.push_back(array_literal_2d("g_dKinf", sv.cache.dKinf.data(), nu, nx));
    parts.push_back(array_literal_2d("g_dPinf", sv.cache.dPinf.data(), nx, nx));
    parts.push_back(array_literal_2d("g_dC1", sv.cache.dC1.data(), nu, nu));
    parts.push_back(array_literal_2d("g_dC2", sv.cache.dC2.data(), nx, nx));
  }
  const real big = 1e30;
  auto clipped = [&](const vector<real>& a) {
    vector<real> out(a.size());
    for (size_t i = 0; i < a.size(); ++i)
      out[i] = std::fmin(std::fmax(a[i], -big), big);
    return out;
  };
  parts.push_back(array_literal_2d("g_x_min", clipped(sv.x_min).data(), N, nx));
  parts.push_back(array_literal_2d("g_x_max", clipped(sv.x_max).data(), N, nx));
  parts.push_back(
      array_literal_2d("g_u_min", clipped(sv.u_min).data(), N - 1, nu));
  parts.push_back(
      array_literal_2d("g_u_max", clipped(sv.u_max).data(), N - 1, nu));
  parts.push_back(array_literal_2d("g_Xref", sv.Xref.data(), N, nx));
  parts.push_back(array_literal_2d("g_Uref", sv.Uref.data(), N - 1, nu));
  // Warm-start iterates (the reference bakes the live workspace,
  // codegen.cpp:212-258)
  const struct { const char* nm; const vector<real>* a; int rows, cols; } ws[] =
      {{"x", &sv.x, N, nx},       {"u", &sv.u, N - 1, nu},
       {"q", &sv.q, N, nx},       {"r", &sv.r, N - 1, nu},
       {"p", &sv.p, N, nx},       {"d", &sv.d, N - 1, nu},
       {"v", &sv.v, N, nx},       {"vnew", &sv.vnew, N, nx},
       {"z", &sv.z, N - 1, nu},   {"znew", &sv.znew, N - 1, nu},
       {"g", &sv.g, N, nx},       {"y", &sv.y, N - 1, nu}};
  for (const auto& w : ws)
    parts.push_back(array_literal_2d(std::string("g_ws_") + w.nm,
                                     w.a->data(), w.rows, w.cols));
  const int n_lin_x = sv.blin_x.empty() ? 0 : (int)sv.blin_x.size();
  const int n_lin_u = sv.blin_u.empty() ? 0 : (int)sv.blin_u.size();
  if (n_lin_x) {
    parts.push_back(array_literal_2d("g_Alin_x", sv.Alin_x.data(), n_lin_x, nx));
    parts.push_back(array_literal_1d("g_blin_x", sv.blin_x.data(), n_lin_x));
  }
  if (n_lin_u) {
    parts.push_back(array_literal_2d("g_Alin_u", sv.Alin_u.data(), n_lin_u, nu));
    parts.push_back(array_literal_1d("g_blin_u", sv.blin_u.data(), n_lin_u));
  }
  if (!sv.cone_x_start.empty()) {
    parts.push_back(int_array_literal("g_cone_x_start", sv.cone_x_start));
    parts.push_back(int_array_literal("g_cone_x_dim", sv.cone_x_dim));
    parts.push_back(array_literal_1d("g_cone_x_mu", sv.cone_x_mu.data(),
                                     (int)sv.cone_x_mu.size()));
  }
  if (!sv.cone_u_start.empty()) {
    parts.push_back(int_array_literal("g_cone_u_start", sv.cone_u_start));
    parts.push_back(int_array_literal("g_cone_u_dim", sv.cone_u_dim));
    parts.push_back(array_literal_1d("g_cone_u_mu", sv.cone_u_mu.data(),
                                     (int)sv.cone_u_mu.size()));
  }

  vector<std::string> lines = {"", "TinySolver tiny_solver;", "",
                               "static int init_solver() {",
                               "  tiny_solver.cache.rho = " +
                                   fmt_g(sv.cache.rho) + ";"};
  copy2d("tiny_solver.cache.Kinf", "g_Kinf", nu, nx, lines);
  copy2d("tiny_solver.cache.Pinf", "g_Pinf", nx, nx, lines);
  copy2d("tiny_solver.cache.Quu_inv", "g_Quu_inv", nu, nu, lines);
  copy2d("tiny_solver.cache.AmBKt", "g_AmBKt", nx, nx, lines);
  if (has_sens) {
    copy2d("tiny_solver.cache.dKinf_drho", "g_dKinf", nu, nx, lines);
    copy2d("tiny_solver.cache.dPinf_drho", "g_dPinf", nx, nx, lines);
    copy2d("tiny_solver.cache.dC1_drho", "g_dC1", nu, nu, lines);
    copy2d("tiny_solver.cache.dC2_drho", "g_dC2", nx, nx, lines);
  }
  const std::string w = "tiny_solver.work";
  copy1d(w + ".Q", "g_Q", nx, lines);
  copy1d(w + ".R", "g_R", nu, lines);
  copy2d(w + ".Adyn", "g_Adyn", nx, nx, lines);
  copy2d(w + ".Bdyn", "g_Bdyn", nx, nu, lines);
  copy1d(w + ".fdyn", "g_fdyn", nx, lines);
  const struct { const char* nm; int rows, cols; } bnds[] = {
      {"x_min", N, nx}, {"x_max", N, nx}, {"u_min", N - 1, nu},
      {"u_max", N - 1, nu}, {"Xref", N, nx}, {"Uref", N - 1, nu}};
  for (const auto& b : bnds)
    copy2d(w + "." + b.nm, std::string("g_") + b.nm, b.rows, b.cols, lines);
  for (const char* nm : {"x", "q", "p", "v", "vnew", "g"})
    copy2d(w + "." + nm, std::string("g_ws_") + nm, N, nx, lines);
  for (const char* nm : {"u", "r", "d", "z", "znew", "y"})
    copy2d(w + "." + nm, std::string("g_ws_") + nm, N - 1, nu, lines);
  if (n_lin_x) {
    copy2d(w + ".Alin_x", "g_Alin_x", n_lin_x, nx, lines);
    copy1d(w + ".blin_x", "g_blin_x", n_lin_x, lines);
  }
  if (n_lin_u) {
    copy2d(w + ".Alin_u", "g_Alin_u", n_lin_u, nu, lines);
    copy1d(w + ".blin_u", "g_blin_u", n_lin_u, lines);
  }
  if (!sv.cone_x_start.empty()) {
    const int k = (int)sv.cone_x_start.size();
    copy1d(w + ".cone_x_start", "g_cone_x_start", k, lines);
    copy1d(w + ".cone_x_dim", "g_cone_x_dim", k, lines);
    copy1d(w + ".cone_x_mu", "g_cone_x_mu", k, lines);
  }
  if (!sv.cone_u_start.empty()) {
    const int k = (int)sv.cone_u_start.size();
    copy1d(w + ".cone_u_start", "g_cone_u_start", k, lines);
    copy1d(w + ".cone_u_dim", "g_cone_u_dim", k, lines);
    copy1d(w + ".cone_u_mu", "g_cone_u_mu", k, lines);
  }
  const Settings& s = sv.settings;
  const std::string se = "tiny_solver.settings";
  lines.push_back("  " + se + ".abs_pri_tol = " + fmt_g(s.abs_pri_tol) + ";");
  lines.push_back("  " + se + ".abs_dua_tol = " + fmt_g(s.abs_dua_tol) + ";");
  lines.push_back("  " + se + ".max_iter = " + std::to_string(s.max_iter) +
                  ";");
  lines.push_back("  " + se + ".check_termination = " +
                  std::to_string(s.check_termination) + ";");
  lines.push_back("  " + se + ".en_state_bound = " +
                  std::to_string(s.en_state_bound) + ";");
  lines.push_back("  " + se + ".en_input_bound = " +
                  std::to_string(s.en_input_bound) + ";");
  lines.push_back("  " + se + ".en_state_soc = " +
                  std::to_string(s.en_state_soc) + ";");
  lines.push_back("  " + se + ".en_input_soc = " +
                  std::to_string(s.en_input_soc) + ";");
  lines.push_back("  " + se + ".en_state_linear = " +
                  std::to_string(s.en_state_linear) + ";");
  lines.push_back("  " + se + ".en_input_linear = " +
                  std::to_string(s.en_input_linear) + ";");
  lines.push_back("  " + se + ".adaptive_rho = " +
                  std::to_string(s.adaptive_rho) + ";");
  lines.push_back("  " + se + ".adaptive_rho_min = " +
                  fmt_g(s.adaptive_rho_min) + ";");
  lines.push_back("  " + se + ".adaptive_rho_max = " +
                  fmt_g(s.adaptive_rho_max) + ";");
  lines.push_back("  " + se + ".adaptive_rho_enable_clipping = " +
                  std::to_string(s.adaptive_rho_enable_clipping) + ";");
  lines.push_back("  return 0;");
  lines.push_back("}");
  lines.push_back("");
  lines.push_back("static const int g_initialized = init_solver();");
  std::string block;
  for (size_t i = 0; i < lines.size(); ++i) {
    if (i) block += "\n";
    block += lines[i];
  }
  parts.push_back(block);
  std::string out;
  for (size_t i = 0; i < parts.size(); ++i) {
    if (i) out += "\n\n";
    out += parts[i];
  }
  return out + "\n";
}

static int emit_project(const Solver& sv, const char* output_dir,
                        int verbose) {
  namespace fs = std::filesystem;
  std::error_code ec;
  const fs::path out(output_dir);
  fs::create_directories(out / "src", ec);
  fs::create_directories(out / "tinympc", ec);
  fs::create_directories(out / "build", ec);
  if (ec) {
    std::fprintf(stderr, "codegen: cannot create %s\n", output_dir);
    return -1;
  }
  const int n_lin_x = (int)sv.blin_x.size();
  const int n_lin_u = (int)sv.blin_u.size();
  std::string header = kHeaderTemplate;
  header = replace_all(header, "@NX@", std::to_string(sv.nx));
  header = replace_all(header, "@NU@", std::to_string(sv.nu));
  header = replace_all(header, "@NH@", std::to_string(sv.N));
  header = replace_all(header, "@NLINX@", std::to_string(n_lin_x));
  header = replace_all(header, "@NLINU@", std::to_string(n_lin_u));
  header = replace_all(header, "@NCONEX@",
                       std::to_string(sv.cone_x_start.size()));
  header = replace_all(header, "@NCONEU@",
                       std::to_string(sv.cone_u_start.size()));
  header = replace_all(header, "@HASSENS@",
                       sv.settings.adaptive_rho ? "1" : "0");
  auto write = [&](const fs::path& p, const std::string& text) {
    std::ofstream f(p);
    f << text;
    return f.good();
  };
  if (!write(out / "tinympc" / "tiny_data.hpp", header) ||
      !write(out / "src" / "tiny_data.cpp", generate_data_source(sv)) ||
      !write(out / "src" / "tiny_main.cpp", kMainTemplate) ||
      !write(out / "CMakeLists.txt", kCMakeTemplate) ||
      !write(out / "tinympc" / "tinympc_solver.hpp", kSolverTemplate)) {
    std::fprintf(stderr, "codegen: write failed under %s\n", output_dir);
    return -1;
  }
  if (verbose)
    std::printf("Code generation completed successfully in: %s\n",
                output_dir);
  return 0;
}

}  // namespace tinympc_native

using tinympc_native::Solver;
static std::unique_ptr<Solver> g_solver;

// Incoming matrices are column-major (the Julia/Fortran convention the
// reference bindings receive); convert to the row-major internal layout.
static std::vector<double> from_colmajor(const double* d, int rows, int cols) {
  std::vector<double> out((size_t)rows * cols);
  for (int i = 0; i < rows; ++i)
    for (int j = 0; j < cols; ++j) out[i * cols + j] = d[j * rows + i];
  return out;
}

extern "C" {

int setup_solver(double* A_data, int A_rows, int A_cols, double* B_data,
                 int B_rows, int B_cols, double* fdyn_data, int fdyn_rows,
                 int fdyn_cols, double* Q_data, int Q_rows, int Q_cols,
                 double* R_data, int R_rows, int R_cols, double rho, int nx,
                 int nu, int N, int verbose) {
  if (A_rows != nx || A_cols != nx || B_rows != nx || B_cols != nu ||
      Q_rows != nx || R_rows != nu || fdyn_rows != nx) {
    std::fprintf(stderr, "setup_solver: dimension mismatch\n");
    return 1;
  }
  g_solver = std::make_unique<Solver>();
  auto A = from_colmajor(A_data, nx, nx);
  auto B = from_colmajor(B_data, nx, nu);
  auto Q = from_colmajor(Q_data, nx, nx);
  auto R = from_colmajor(R_data, nu, nu);
  int st = g_solver->setup(A.data(), B.data(), fdyn_data, Q.data(), R.data(),
                           rho, nx, nu, N);
  if (verbose)
    std::printf("TinyMPC native solver setup (nx=%d, nu=%d, N=%d)\n", nx, nu,
                N);
  return st;
}

int set_x0(double* x0_data, int x0_rows, int x0_cols, int verbose) {
  if (!g_solver || x0_rows != g_solver->nx) return -1;
  std::memcpy(g_solver->x.data(), x0_data, sizeof(double) * g_solver->nx);
  return 0;
}

int set_x_ref(double* x_ref_data, int rows, int cols, int verbose) {
  if (!g_solver || rows != g_solver->nx || cols != g_solver->N) return -1;
  g_solver->Xref.assign(x_ref_data, x_ref_data + (size_t)rows * cols);
  return 0;
}

int set_u_ref(double* u_ref_data, int rows, int cols, int verbose) {
  if (!g_solver || rows != g_solver->nu || cols != g_solver->N - 1) return -1;
  g_solver->Uref.assign(u_ref_data, u_ref_data + (size_t)rows * cols);
  return 0;
}

int solve_mpc(int verbose) {
  if (!g_solver) return -1;
  int st = g_solver->solve();
  if (verbose) std::printf("Solve completed with status: %d\n", st);
  return st;
}

int get_states(double* buffer, int* rows, int* cols) {
  if (!g_solver || g_solver->sol_x.empty()) return -1;
  *rows = g_solver->nx;
  *cols = g_solver->N;
  // column-major out (stage-major internal == column-major (nx, N))
  for (int i = 0; i < g_solver->N; ++i)
    for (int j = 0; j < g_solver->nx; ++j)
      buffer[i * g_solver->nx + j] = g_solver->sol_x[i * g_solver->nx + j];
  return 0;
}

int get_controls(double* buffer, int* rows, int* cols) {
  if (!g_solver || g_solver->sol_u.empty()) return -1;
  *rows = g_solver->nu;
  *cols = g_solver->N - 1;
  for (int i = 0; i < g_solver->N - 1; ++i)
    for (int j = 0; j < g_solver->nu; ++j)
      buffer[i * g_solver->nu + j] = g_solver->sol_u[i * g_solver->nu + j];
  return 0;
}

void cleanup_solver() { g_solver.reset(); }

int update_settings(double abs_pri_tol, double abs_dua_tol, int max_iter,
                    int check_termination, int en_state_bound,
                    int en_input_bound, int en_state_soc, int en_input_soc,
                    int en_state_linear, int en_input_linear, int adaptive_rho,
                    double adaptive_rho_min, double adaptive_rho_max,
                    int adaptive_rho_enable_clipping, int verbose) {
  if (!g_solver) return -1;
  auto& s = g_solver->settings;
  s.abs_pri_tol = abs_pri_tol;
  s.abs_dua_tol = abs_dua_tol;
  s.max_iter = max_iter;
  s.check_termination = check_termination;
  s.en_state_bound = en_state_bound;
  s.en_input_bound = en_input_bound;
  s.en_state_soc = en_state_soc;
  s.en_input_soc = en_input_soc;
  s.en_state_linear = en_state_linear;
  s.en_input_linear = en_input_linear;
  s.adaptive_rho = adaptive_rho;
  s.adaptive_rho_min = adaptive_rho_min;
  s.adaptive_rho_max = adaptive_rho_max;
  s.adaptive_rho_enable_clipping = adaptive_rho_enable_clipping;
  return 0;
}

int set_bound_constraints(double* x_min_data, int x_min_rows, int x_min_cols,
                          double* x_max_data, int x_max_rows, int x_max_cols,
                          double* u_min_data, int u_min_rows, int u_min_cols,
                          double* u_max_data, int u_max_rows, int u_max_cols,
                          int verbose) {
  if (!g_solver) return -1;
  if (x_min_rows != g_solver->nx || x_min_cols != g_solver->N ||
      u_min_rows != g_solver->nu || u_min_cols != g_solver->N - 1)
    return 1;
  // Column-major (nx, N) memory == stage-major internal layout: copy as-is.
  g_solver->x_min.assign(x_min_data, x_min_data + (size_t)x_min_rows * x_min_cols);
  g_solver->x_max.assign(x_max_data, x_max_data + (size_t)x_max_rows * x_max_cols);
  g_solver->u_min.assign(u_min_data, u_min_data + (size_t)u_min_rows * u_min_cols);
  g_solver->u_max.assign(u_max_data, u_max_data + (size_t)u_max_rows * u_max_cols);
  g_solver->settings.en_state_bound = 1;  // auto-enable (bindings.cpp:400-404)
  g_solver->settings.en_input_bound = 1;
  return 0;
}

int set_linear_constraints(double* Alin_x_data, int Alin_x_rows,
                           int Alin_x_cols, double* blin_x_data,
                           int blin_x_len, double* Alin_u_data,
                           int Alin_u_rows, int Alin_u_cols,
                           double* blin_u_data, int blin_u_len, int verbose) {
  if (!g_solver) return -1;
  g_solver->Alin_x = from_colmajor(Alin_x_data, Alin_x_rows, Alin_x_cols);
  g_solver->blin_x.assign(blin_x_data, blin_x_data + blin_x_len);
  g_solver->Alin_u = from_colmajor(Alin_u_data, Alin_u_rows, Alin_u_cols);
  g_solver->blin_u.assign(blin_u_data, blin_u_data + blin_u_len);
  if (Alin_x_rows > 0 && blin_x_len > 0)
    g_solver->settings.en_state_linear = 1;
  if (Alin_u_rows > 0 && blin_u_len > 0)
    g_solver->settings.en_input_linear = 1;
  return 0;
}

int set_cone_constraints(int* Acu_data, int Acu_len, int* qcu_data,
                         int qcu_len, double* cu_data, int cu_len,
                         int* Acx_data, int Acx_len, int* qcx_data,
                         int qcx_len, double* cx_data, int cx_len,
                         int verbose) {
  if (!g_solver) return -1;
  g_solver->cone_u_start.assign(Acu_data, Acu_data + Acu_len);
  g_solver->cone_u_dim.assign(qcu_data, qcu_data + qcu_len);
  g_solver->cone_u_mu.assign(cu_data, cu_data + cu_len);
  g_solver->cone_x_start.assign(Acx_data, Acx_data + Acx_len);
  g_solver->cone_x_dim.assign(qcx_data, qcx_data + qcx_len);
  g_solver->cone_x_mu.assign(cx_data, cx_data + cx_len);
  if (Acx_len > 0) g_solver->settings.en_state_soc = 1;
  if (Acu_len > 0) g_solver->settings.en_input_soc = 1;
  return 0;
}

int set_cache_terms(double* Kinf_data, int Kinf_rows, int Kinf_cols,
                    double* Pinf_data, int Pinf_rows, int Pinf_cols,
                    double* Quu_inv_data, int Quu_inv_rows, int Quu_inv_cols,
                    double* AmBKt_data, int AmBKt_rows, int AmBKt_cols,
                    int verbose) {
  if (!g_solver) return -1;
  g_solver->cache.Kinf = from_colmajor(Kinf_data, Kinf_rows, Kinf_cols);
  g_solver->cache.Pinf = from_colmajor(Pinf_data, Pinf_rows, Pinf_cols);
  g_solver->cache.Quu_inv =
      from_colmajor(Quu_inv_data, Quu_inv_rows, Quu_inv_cols);
  g_solver->cache.AmBKt = from_colmajor(AmBKt_data, AmBKt_rows, AmBKt_cols);
  return 0;
}

int set_sensitivity_terms(double* dK_data, int dK_rows, int dK_cols,
                          double* dP_data, int dP_rows, int dP_cols,
                          double* dC1_data, int dC1_rows, int dC1_cols,
                          double* dC2_data, int dC2_rows, int dC2_cols,
                          int verbose) {
  if (!g_solver) return -1;
  g_solver->cache.dKinf = from_colmajor(dK_data, dK_rows, dK_cols);
  g_solver->cache.dPinf = from_colmajor(dP_data, dP_rows, dP_cols);
  g_solver->cache.dC1 = from_colmajor(dC1_data, dC1_rows, dC1_cols);
  g_solver->cache.dC2 = from_colmajor(dC2_data, dC2_rows, dC2_cols);
  return 0;
}

int codegen(const char* output_dir, int verbose) {
  // /root/reference/src/bindings.cpp:210-225
  if (!g_solver) return -1;
  int status = tinympc_native::emit_project(*g_solver, output_dir, verbose);
  if (verbose)
    std::printf("Code generation completed with status: %d\n", status);
  return status;
}

int codegen_with_sensitivity(const char* output_dir, double* dK_data,
                             int dK_rows, int dK_cols, double* dP_data,
                             int dP_rows, int dP_cols, double* dC1_data,
                             int dC1_rows, int dC1_cols, double* dC2_data,
                             int dC2_rows, int dC2_cols, int verbose) {
  // /root/reference/src/bindings.cpp:298-331 — stores the sensitivities in
  // the cache, then emits (the generated project bakes them iff
  // settings.adaptive_rho, codegen.cpp:79-85 semantics).
  if (!g_solver) return -1;
  if (dK_rows != g_solver->nu || dK_cols != g_solver->nx ||
      dP_rows != g_solver->nx || dP_cols != g_solver->nx ||
      dC1_rows != g_solver->nu || dC1_cols != g_solver->nu ||
      dC2_rows != g_solver->nx || dC2_cols != g_solver->nx) {
    std::fprintf(stderr, "codegen_with_sensitivity: dimension mismatch\n");
    return -1;
  }
  g_solver->cache.dKinf = from_colmajor(dK_data, dK_rows, dK_cols);
  g_solver->cache.dPinf = from_colmajor(dP_data, dP_rows, dP_cols);
  g_solver->cache.dC1 = from_colmajor(dC1_data, dC1_rows, dC1_cols);
  g_solver->cache.dC2 = from_colmajor(dC2_data, dC2_rows, dC2_cols);
  int status = tinympc_native::emit_project(*g_solver, output_dir, verbose);
  if (verbose)
    std::printf("Code generation with sensitivity completed with status: %d\n",
                status);
  return status;
}

static void print_matrix(const char* name, const std::vector<double>& a,
                         int rows, int cols) {
  std::printf("%s:\n", name);
  for (int i = 0; i < rows; ++i) {
    for (int j = 0; j < cols; ++j)
      std::printf("%s%.6g", j ? " " : "", a[i * cols + j]);
    std::printf("\n");
  }
}

int print_problem_data(int verbose) {
  if (!g_solver) return -1;
  std::printf("=== TinyMPC Problem Data ===\n");
  std::printf("Solution: iter=%d, solved=%d\n", g_solver->sol_iter,
              g_solver->sol_solved);
  std::printf("Cache: rho=%g\n", g_solver->cache.rho);
  std::printf("Settings: max_iter=%d, abs_pri_tol=%g, abs_dua_tol=%g\n",
              g_solver->settings.max_iter, g_solver->settings.abs_pri_tol,
              g_solver->settings.abs_dua_tol);
  std::printf("Problem: nx=%d, nu=%d\n", g_solver->nx, g_solver->nu);
  if (verbose) {
    // matrix dump under verbose (bindings.cpp:245-251); solution arrays are
    // stage-major internally == (nx, N) column-major, print stage rows
    print_matrix("States x", g_solver->sol_x, g_solver->N, g_solver->nx);
    print_matrix("Controls u", g_solver->sol_u, g_solver->N - 1,
                 g_solver->nu);
    print_matrix("Cache Kinf", g_solver->cache.Kinf, g_solver->nu,
                 g_solver->nx);
    print_matrix("Cache Pinf", g_solver->cache.Pinf, g_solver->nx,
                 g_solver->nx);
  }
  return 0;
}

int get_residuals(double* pri_state, double* pri_input, double* dua_state,
                  double* dua_input) {
  if (!g_solver) return -1;
  *pri_state = g_solver->pri_res_state;
  *pri_input = g_solver->pri_res_input;
  *dua_state = g_solver->dua_res_state;
  *dua_input = g_solver->dua_res_input;
  return 0;
}

}  // extern "C"
