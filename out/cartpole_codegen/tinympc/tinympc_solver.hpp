// tinympc_julia_tpu embedded solver — generated-code runtime.
//
// A fresh, dependency-free (no Eigen, no malloc, no exceptions) static-size
// C++ ADMM MPC solver for deployment targets (MCUs, realtime hosts).  The
// algorithm semantics match the tinympc_julia_tpu JAX engine (ops/admm.py),
// which itself reproduces the reference ADMM update ordering
// (/root/reference/src/codegen_src/tinympc/admm.cpp:109-207) — see the
// framework's golden parity tests.
//
// Dimensions (TINY_NX, TINY_NU, TINY_NH) and problem data are provided by the
// generated tiny_data.{hpp,cpp}.  All arrays are stage-major:
// x[stage][state].
#pragma once

#include <cmath>

#include "tiny_data.hpp"

namespace tinympc {

constexpr int kSolved = 1;
constexpr int kUnsolved = 11;

// ---------------------------------------------------------------------------
// Small fixed-size linear algebra on plain arrays
// ---------------------------------------------------------------------------

template <int R, int C>
inline void matvec(const tiny_float (&M)[R][C], const tiny_float (&v)[C],
                   tiny_float (&out)[R]) {
  for (int i = 0; i < R; ++i) {
    tiny_float acc = 0;
    for (int j = 0; j < C; ++j) acc += M[i][j] * v[j];
    out[i] = acc;
  }
}

// out = M^T v
template <int R, int C>
inline void matvec_t(const tiny_float (&M)[R][C], const tiny_float (&v)[R],
                     tiny_float (&out)[C]) {
  for (int j = 0; j < C; ++j) out[j] = 0;
  for (int i = 0; i < R; ++i)
    for (int j = 0; j < C; ++j) out[j] += M[i][j] * v[i];
}

template <int N>
inline tiny_float max_abs_diff(const tiny_float (&a)[N],
                               const tiny_float (&b)[N]) {
  tiny_float m = 0;
  for (int i = 0; i < N; ++i) {
    tiny_float d = std::fabs(a[i] - b[i]);
    if (d > m) m = d;
  }
  return m;
}

// ---------------------------------------------------------------------------
// ADMM stages (mirror ops/admm.py; ordering is the reference's)
// ---------------------------------------------------------------------------

inline void forward_pass(TinySolver &s) {
  for (int i = 0; i < TINY_NH - 1; ++i) {
    tiny_float Kx[TINY_NU];
    matvec(s.cache.Kinf, s.work.x[i], Kx);
    for (int j = 0; j < TINY_NU; ++j) s.work.u[i][j] = -Kx[j] - s.work.d[i][j];
    tiny_float Ax[TINY_NX], Bu[TINY_NX];
    matvec(s.work.Adyn, s.work.x[i], Ax);
    matvec(s.work.Bdyn, s.work.u[i], Bu);
    for (int j = 0; j < TINY_NX; ++j)
      s.work.x[i + 1][j] = Ax[j] + Bu[j] + s.work.fdyn[j];
  }
}

template <int N>
inline void project_soc(tiny_float (&v)[N], int start, int dim,
                        tiny_float mu) {
  // Scaled SOC projection: ||w[:-1]|| <= mu * w[-1] over v[start..start+dim).
  tiny_float a2 = 0;
  for (int i = start; i < start + dim - 1; ++i) a2 += v[i] * v[i];
  const tiny_float a = std::sqrt(a2);
  const tiny_float u0 = v[start + dim - 1] * mu;
  if (a <= u0) return;  // inside
  if (a <= -u0) {       // below: project to origin
    for (int i = start; i < start + dim; ++i) v[i] = 0;
    return;
  }
  const tiny_float safe_a = a > tiny_float(1e-30) ? a : tiny_float(1e-30);
  const tiny_float factor = (a + u0) / (2 * safe_a);
  for (int i = start; i < start + dim - 1; ++i) v[i] *= factor;
  v[start + dim - 1] = factor * (a / mu);
}

template <int N, int M>
inline void project_halfspaces(tiny_float (&v)[N],
                               const tiny_float (&A)[M][N],
                               const tiny_float (&b)[M]) {
  for (int r = 0; r < M; ++r) {
    tiny_float dot = 0, nrm2 = 0;
    for (int j = 0; j < N; ++j) {
      dot += A[r][j] * v[j];
      nrm2 += A[r][j] * A[r][j];
    }
    const tiny_float viol = dot - b[r];
    if (viol > 0 && nrm2 > tiny_float(1e-30)) {
      const tiny_float scale = viol / nrm2;
      for (int j = 0; j < N; ++j) v[j] -= scale * A[r][j];
    }
  }
}

inline void update_slack(TinySolver &s) {
  for (int i = 0; i < TINY_NH - 1; ++i)
    for (int j = 0; j < TINY_NU; ++j)
      s.work.znew[i][j] = s.work.u[i][j] + s.work.y[i][j];
  for (int i = 0; i < TINY_NH; ++i)
    for (int j = 0; j < TINY_NX; ++j)
      s.work.vnew[i][j] = s.work.x[i][j] + s.work.g[i][j];

  if (s.settings.en_input_bound) {
    for (int i = 0; i < TINY_NH - 1; ++i)
      for (int j = 0; j < TINY_NU; ++j) {
        tiny_float z = s.work.znew[i][j];
        if (z < s.work.u_min[i][j]) z = s.work.u_min[i][j];
        if (z > s.work.u_max[i][j]) z = s.work.u_max[i][j];
        s.work.znew[i][j] = z;
      }
  }
  if (s.settings.en_state_bound) {
    for (int i = 0; i < TINY_NH; ++i)
      for (int j = 0; j < TINY_NX; ++j) {
        tiny_float v = s.work.vnew[i][j];
        if (v < s.work.x_min[i][j]) v = s.work.x_min[i][j];
        if (v > s.work.x_max[i][j]) v = s.work.x_max[i][j];
        s.work.vnew[i][j] = v;
      }
  }
#if TINY_NUM_INPUT_LINEAR > 0
  if (s.settings.en_input_linear)
    for (int i = 0; i < TINY_NH - 1; ++i)
      project_halfspaces(s.work.znew[i], s.work.Alin_u, s.work.blin_u);
#endif
#if TINY_NUM_STATE_LINEAR > 0
  if (s.settings.en_state_linear)
    for (int i = 0; i < TINY_NH; ++i)
      project_halfspaces(s.work.vnew[i], s.work.Alin_x, s.work.blin_x);
#endif
#if TINY_NUM_INPUT_CONES > 0
  if (s.settings.en_input_soc)
    for (int i = 0; i < TINY_NH - 1; ++i)
      for (int k = 0; k < TINY_NUM_INPUT_CONES; ++k)
        project_soc(s.work.znew[i], s.work.cone_u_start[k],
                    s.work.cone_u_dim[k], s.work.cone_u_mu[k]);
#endif
#if TINY_NUM_STATE_CONES > 0
  if (s.settings.en_state_soc)
    for (int i = 0; i < TINY_NH; ++i)
      for (int k = 0; k < TINY_NUM_STATE_CONES; ++k)
        project_soc(s.work.vnew[i], s.work.cone_x_start[k],
                    s.work.cone_x_dim[k], s.work.cone_x_mu[k]);
#endif
}

inline void update_dual(TinySolver &s) {
  for (int i = 0; i < TINY_NH - 1; ++i)
    for (int j = 0; j < TINY_NU; ++j)
      s.work.y[i][j] += s.work.u[i][j] - s.work.znew[i][j];
  for (int i = 0; i < TINY_NH; ++i)
    for (int j = 0; j < TINY_NX; ++j)
      s.work.g[i][j] += s.work.x[i][j] - s.work.vnew[i][j];
}

inline void update_linear_cost(TinySolver &s) {
  const tiny_float rho = s.cache.rho;
  for (int i = 0; i < TINY_NH - 1; ++i)
    for (int j = 0; j < TINY_NU; ++j)
      s.work.r[i][j] = -s.work.Uref[i][j] * s.work.R[j] -
                       rho * (s.work.znew[i][j] - s.work.y[i][j]);
  for (int i = 0; i < TINY_NH; ++i)
    for (int j = 0; j < TINY_NX; ++j)
      s.work.q[i][j] = -s.work.Xref[i][j] * s.work.Q[j] -
                       rho * (s.work.vnew[i][j] - s.work.g[i][j]);
  // p_N = -Pinf^T Xref_N - rho (vnew_N - g_N)
  tiny_float PtX[TINY_NX];
  matvec_t(s.cache.Pinf, s.work.Xref[TINY_NH - 1], PtX);
  for (int j = 0; j < TINY_NX; ++j)
    s.work.p[TINY_NH - 1][j] =
        -PtX[j] - rho * (s.work.vnew[TINY_NH - 1][j] -
                         s.work.g[TINY_NH - 1][j]);
}

inline void backward_pass(TinySolver &s) {
  for (int i = TINY_NH - 2; i >= 0; --i) {
    tiny_float Btp[TINY_NU];
    matvec_t(s.work.Bdyn, s.work.p[i + 1], Btp);
    tiny_float rhs[TINY_NU];
    for (int j = 0; j < TINY_NU; ++j) rhs[j] = Btp[j] + s.work.r[i][j];
    matvec(s.cache.Quu_inv, rhs, s.work.d[i]);
    tiny_float Ap[TINY_NX], Ktr[TINY_NX];
    matvec(s.cache.AmBKt, s.work.p[i + 1], Ap);
    matvec_t(s.cache.Kinf, s.work.r[i], Ktr);
    for (int j = 0; j < TINY_NX; ++j)
      s.work.p[i][j] = s.work.q[i][j] + Ap[j] - Ktr[j];
  }
}

inline bool termination_condition(TinySolver &s) {
  if (s.settings.check_termination <= 0) return false;
  if (s.work.iter % s.settings.check_termination != 0) return false;
  tiny_float ps = 0, pi = 0, ds = 0, di = 0;
  for (int i = 0; i < TINY_NH; ++i) {
    ps = std::fmax(ps, max_abs_diff(s.work.x[i], s.work.vnew[i]));
    ds = std::fmax(ds, max_abs_diff(s.work.v[i], s.work.vnew[i]));
  }
  for (int i = 0; i < TINY_NH - 1; ++i) {
    pi = std::fmax(pi, max_abs_diff(s.work.u[i], s.work.znew[i]));
    di = std::fmax(di, max_abs_diff(s.work.z[i], s.work.znew[i]));
  }
  ds *= s.cache.rho;
  di *= s.cache.rho;
  s.work.primal_residual_state = ps;
  s.work.dual_residual_state = ds;
  s.work.primal_residual_input = pi;
  s.work.dual_residual_input = di;
  return ps < s.settings.abs_pri_tol && pi < s.settings.abs_pri_tol &&
         ds < s.settings.abs_dua_tol && di < s.settings.abs_dua_tol;
}

#if TINY_HAS_SENSITIVITY
inline void taylor_update_rho(TinySolver &s, tiny_float new_rho) {
  const tiny_float drho = new_rho - s.cache.rho;
  for (int i = 0; i < TINY_NU; ++i)
    for (int j = 0; j < TINY_NX; ++j)
      s.cache.Kinf[i][j] += drho * s.cache.dKinf_drho[i][j];
  for (int i = 0; i < TINY_NX; ++i)
    for (int j = 0; j < TINY_NX; ++j)
      s.cache.Pinf[i][j] += drho * s.cache.dPinf_drho[i][j];
  s.cache.rho = new_rho;
}

// Matrix-free OSQP-form residuals + rho prediction (the framework's
// ops/rho.py algorithm, O(N) memory — no stacked matrices).
inline void adapt_rho(TinySolver &s) {
  const tiny_float eps = tiny_float(1e-10);
  tiny_float pri_res = 0, pri_norm = 0, dual_res = 0, dual_norm = 0;
  // primal: input rows u_i vs z_i; dynamics rows A x_i + B u_i - x_{i+1}
  // vs v_{i+1}
  for (int i = 0; i < TINY_NH - 1; ++i) {
    for (int j = 0; j < TINY_NU; ++j) {
      const tiny_float ax = s.work.u[i][j];
      pri_norm = std::fmax(pri_norm, std::fabs(ax));
      pri_norm = std::fmax(pri_norm, std::fabs(s.work.znew[i][j]));
      pri_res = std::fmax(pri_res, std::fabs(ax - s.work.znew[i][j]));
    }
    tiny_float Ax[TINY_NX], Bu[TINY_NX];
    matvec(s.work.Adyn, s.work.x[i], Ax);
    matvec(s.work.Bdyn, s.work.u[i], Bu);
    for (int j = 0; j < TINY_NX; ++j) {
      const tiny_float dyn = Ax[j] + Bu[j] - s.work.x[i + 1][j];
      pri_norm = std::fmax(pri_norm, std::fabs(dyn));
      pri_norm = std::fmax(pri_norm, std::fabs(s.work.vnew[i + 1][j]));
      pri_res = std::fmax(pri_res, std::fabs(dyn - s.work.vnew[i + 1][j]));
    }
  }
  // dual: Px + q + A^T y blocks
  for (int i = 0; i < TINY_NH; ++i) {
    tiny_float Px[TINY_NX];
    if (i == TINY_NH - 1) {
      matvec(s.cache.Pinf, s.work.x[i], Px);
    } else {
      for (int j = 0; j < TINY_NX; ++j) Px[j] = s.work.Q[j] * s.work.x[i][j];
    }
    tiny_float Atg[TINY_NX] = {0};
    if (i < TINY_NH - 1) {
      tiny_float tmp[TINY_NX];
      matvec_t(s.work.Adyn, s.work.g[i + 1], tmp);
      for (int j = 0; j < TINY_NX; ++j) Atg[j] += tmp[j];
    }
    if (i >= 1)
      for (int j = 0; j < TINY_NX; ++j) Atg[j] -= s.work.g[i][j];
    for (int j = 0; j < TINY_NX; ++j) {
      const tiny_float qv = s.work.Q[j] * s.work.x[i][j];
      const tiny_float rd = Px[j] + qv + Atg[j];
      dual_res = std::fmax(dual_res, std::fabs(rd));
      dual_norm = std::fmax(dual_norm, std::fabs(Px[j]));
      dual_norm = std::fmax(dual_norm, std::fabs(Atg[j]));
      dual_norm = std::fmax(dual_norm, std::fabs(qv));
    }
  }
  for (int i = 0; i < TINY_NH - 1; ++i) {
    tiny_float Btg[TINY_NU];
    matvec_t(s.work.Bdyn, s.work.g[i + 1], Btg);
    for (int j = 0; j < TINY_NU; ++j) {
      const tiny_float Pu = s.work.R[j] * s.work.u[i][j];
      const tiny_float qu = s.work.R[j] * s.work.u[i][j];
      const tiny_float aty = Btg[j] + s.work.y[i][j];
      const tiny_float rd = Pu + qu + aty;
      dual_res = std::fmax(dual_res, std::fabs(rd));
      dual_norm = std::fmax(dual_norm, std::fabs(Pu));
      dual_norm = std::fmax(dual_norm, std::fabs(aty));
      dual_norm = std::fmax(dual_norm, std::fabs(qu));
    }
  }
  const tiny_float normalized_pri = pri_res / (pri_norm + eps);
  const tiny_float normalized_dual = dual_res / (dual_norm + eps);
  tiny_float new_rho =
      s.cache.rho * std::sqrt(normalized_pri / (normalized_dual + eps));
  if (s.settings.adaptive_rho_enable_clipping) {
    if (new_rho < s.settings.adaptive_rho_min)
      new_rho = s.settings.adaptive_rho_min;
    if (new_rho > s.settings.adaptive_rho_max)
      new_rho = s.settings.adaptive_rho_max;
  }
  taylor_update_rho(s, new_rho);
}
#endif  // TINY_HAS_SENSITIVITY

// ---------------------------------------------------------------------------
// The solve loop (reference ordering; solution = slack iterates)
// ---------------------------------------------------------------------------

inline int tiny_solve(TinySolver &s) {
  s.solution.solved = 0;
  s.solution.iter = 0;
  s.work.status = kUnsolved;
  s.work.iter = 0;

  for (int i = 0; i < s.settings.max_iter; ++i) {
    forward_pass(s);
    update_slack(s);
    update_dual(s);
    update_linear_cost(s);
    s.work.iter += 1;

#if TINY_HAS_SENSITIVITY
    if (s.settings.adaptive_rho && i > 0 && i % 5 == 0) adapt_rho(s);
#endif

    if (termination_condition(s)) {
      s.work.status = kSolved;
      s.solution.iter = s.work.iter;
      s.solution.solved = 1;
      for (int t = 0; t < TINY_NH; ++t)
        for (int j = 0; j < TINY_NX; ++j)
          s.solution.x[t][j] = s.work.vnew[t][j];
      for (int t = 0; t < TINY_NH - 1; ++t)
        for (int j = 0; j < TINY_NU; ++j)
          s.solution.u[t][j] = s.work.znew[t][j];
      return 0;
    }

    for (int t = 0; t < TINY_NH; ++t)
      for (int j = 0; j < TINY_NX; ++j) s.work.v[t][j] = s.work.vnew[t][j];
    for (int t = 0; t < TINY_NH - 1; ++t)
      for (int j = 0; j < TINY_NU; ++j) s.work.z[t][j] = s.work.znew[t][j];

    backward_pass(s);
  }

  s.solution.iter = s.work.iter;
  s.solution.solved = 0;
  for (int t = 0; t < TINY_NH; ++t)
    for (int j = 0; j < TINY_NX; ++j) s.solution.x[t][j] = s.work.vnew[t][j];
  for (int t = 0; t < TINY_NH - 1; ++t)
    for (int j = 0; j < TINY_NU; ++j) s.solution.u[t][j] = s.work.znew[t][j];
  return 1;
}

inline void tiny_set_x0(TinySolver &s, const tiny_float (&x0)[TINY_NX]) {
  for (int j = 0; j < TINY_NX; ++j) s.work.x[0][j] = x0[j];
}

}  // namespace tinympc
