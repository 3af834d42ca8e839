// Golden fixture generator.
//
// Drives the UNMODIFIED vendored reference solver (compiled directly from
// /root/reference/src/codegen_src/tinympc/*.cpp) through the benchmark
// configurations from the reference examples (SURVEY.md §2.5), and dumps
// trusted trajectories/caches as plain text.  tools/make_golden.py compiles
// this file, runs it, and packs the output into tests/golden/*.npz; the test
// suite then asserts the TPU framework reproduces these iterates within 1e-6
// (BASELINE.md north star).
//
// This is test scaffolding that LINKS AGAINST reference code; it contains no
// reference code itself.
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "tiny_api.hpp"
#include "types.hpp"

static FILE* g_out = nullptr;

// The reference's `RhoAdapter adapter;` (admm.cpp:118) leaves
// `matrices_initialized` uninitialized and relies on stack garbage being
// falsy.  Running the solve on a freshly created thread gives it a brand-new
// zero-filled mmap'd stack, making that read deterministically false.
static void run_on_fresh_stack(void (*fn)()) {
  std::thread t(fn);
  t.join();
}

static void dump(const char* name, const tinyMatrix& M) {
  std::fprintf(g_out, "%s %ld %ld\n", name, (long)M.rows(), (long)M.cols());
  for (long i = 0; i < M.rows(); ++i) {
    for (long j = 0; j < M.cols(); ++j) {
      std::fprintf(g_out, "%.17g ", (double)M(i, j));
    }
    std::fprintf(g_out, "\n");
  }
}

static void dump_scalar(const char* name, double v) {
  std::fprintf(g_out, "%s 1 1\n%.17g\n", name, v);
}

static void dump_cache(TinySolver* s, const char* prefix) {
  std::string p(prefix);
  dump((p + "Kinf").c_str(), s->cache->Kinf);
  dump((p + "Pinf").c_str(), s->cache->Pinf);
  dump((p + "Quu_inv").c_str(), s->cache->Quu_inv);
  dump((p + "AmBKt").c_str(), s->cache->AmBKt);
  dump_scalar((p + "rho").c_str(), s->cache->rho);
}

static void dump_solution(TinySolver* s, const char* prefix) {
  std::string p(prefix);
  dump((p + "x").c_str(), s->solution->x);
  dump((p + "u").c_str(), s->solution->u);
  dump_scalar((p + "iter").c_str(), s->solution->iter);
  dump_scalar((p + "solved").c_str(), s->solution->solved);
  dump_scalar((p + "pri_state").c_str(), s->work->primal_residual_state);
  dump_scalar((p + "pri_input").c_str(), s->work->primal_residual_input);
  dump_scalar((p + "dua_state").c_str(), s->work->dual_residual_state);
  dump_scalar((p + "dua_input").c_str(), s->work->dual_residual_input);
}

// ---------------------------------------------------------------------------
// Plants (parameters from the reference examples; these are DATA, not code)
// ---------------------------------------------------------------------------

// examples/cartpole_example_one_solve.jl:11-17
static void cartpole(tinyMatrix& A, tinyMatrix& B, tinyMatrix& Q, tinyMatrix& R) {
  A = tinyMatrix(4, 4);
  A << 1.0, 0.01, 0.0, 0.0,
       0.0, 1.0, 0.039, 0.0,
       0.0, 0.0, 1.002, 0.01,
       0.0, 0.0, 0.458, 1.002;
  B = tinyMatrix(4, 1);
  B << 0.0, 0.02, 0.0, 0.067;
  Q = tinyMatrix::Zero(4, 4);
  Q.diagonal() << 10.0, 1.0, 10.0, 1.0;
  R = tinyMatrix::Zero(1, 1);
  R.diagonal() << 1.0;
}

// examples/quadrotor_hover_codegen.jl:26-58
static void quadrotor(tinyMatrix& A, tinyMatrix& B, tinyMatrix& Q, tinyMatrix& R) {
  A = tinyMatrix(12, 12);
  A << 1.0, 0.0, 0.0, 0.0, 0.024525, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0002044, 0.0,
       0.0, 1.0, 0.0, -0.024525, 0.0, 0.0, 0.0, 0.05, 0.0, -0.0002044, 0.0, 0.0,
       0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.05, 0.0, 0.0, 0.0,
       0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025,
       0.0, 0.0, 0.0, 0.0, 0.981, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0122625, 0.0,
       0.0, 0.0, 0.0, -0.981, 0.0, 0.0, 0.0, 1.0, 0.0, -0.0122625, 0.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0,
       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0;
  B = tinyMatrix(12, 4);
  B << -0.0007069, 0.0007773, 0.0007091, -0.0007795,
       0.0007034, 0.0007747, -0.0007042, -0.0007739,
       0.0052554, 0.0052554, 0.0052554, 0.0052554,
       -0.1720966, -0.1895213, 0.1722891, 0.1893288,
       -0.1729419, 0.190174, 0.1734809, -0.1907131,
       0.0123423, -0.0045148, -0.0174024, 0.0095748,
       -0.056552, 0.0621869, 0.0567283, -0.0623632,
       0.0562756, 0.0619735, -0.0563386, -0.0619105,
       0.2102143, 0.2102143, 0.2102143, 0.2102143,
       -13.7677303, -15.1617018, 13.7831318, 15.1463003,
       -13.8353509, 15.2139209, 13.8784751, -15.2570451,
       0.9873856, -0.361182, -1.392188, 0.7659845;
  Q = tinyMatrix::Zero(12, 12);
  Q.diagonal() << 100.0, 100.0, 100.0, 4.0, 4.0, 400.0,
                  4.0, 4.0, 4.0, 2.0408163, 2.0408163, 4.0;
  R = tinyMatrix::Zero(4, 4);
  R.diagonal() << 4.0, 4.0, 4.0, 4.0;
}

static TinySolver* make_solver(const tinyMatrix& A, const tinyMatrix& B,
                               const tinyMatrix& Q, const tinyMatrix& R,
                               double rho, int N, double x_lim, double u_lim) {
  int nx = (int)A.rows();
  int nu = (int)B.cols();
  tinyMatrix x_min = tinyMatrix::Constant(nx, N, -x_lim);
  tinyMatrix x_max = tinyMatrix::Constant(nx, N, x_lim);
  tinyMatrix u_min = tinyMatrix::Constant(nu, N - 1, -u_lim);
  tinyMatrix u_max = tinyMatrix::Constant(nu, N - 1, u_lim);
  TinySolver* solver = nullptr;
  int status = tiny_setup(&solver, A, B, Q, R, rho, nx, nu, N,
                          x_min, x_max, u_min, u_max, 0);
  if (status != 0) {
    std::fprintf(stderr, "tiny_setup failed\n");
    std::exit(1);
  }
  return solver;
}

static void settings_like_julia(TinySolver* s, double pri, double dua,
                                int max_iter, int en_state_bound,
                                int en_input_bound) {
  // Mirror the Julia wrapper's post-setup update_settings push
  // (src/TinyMPC.jl:89-104): bounds disabled unless explicitly set.
  tiny_update_settings(s->settings, pri, dua, max_iter, /*check_term=*/1,
                       en_state_bound, en_input_bound);
}

// Scenario 1: cartpole one-solve (examples/cartpole_example_one_solve.jl)
static void scenario_cartpole_one_solve() {
  tinyMatrix A, B, Q, R;
  cartpole(A, B, Q, R);
  TinySolver* s = make_solver(A, B, Q, R, 1.0, 20, 1e17, 1e17);
  settings_like_julia(s, 1e-3, 1e-3, 10, 0, 0);
  dump_cache(s, "cache_");
  tinyVector x0(4);
  x0 << 0.5, 0.0, 0.0, 0.0;
  tiny_set_x0(s, x0);
  tiny_solve(s);
  dump_solution(s, "solve_");
}

// Scenario 2: raw iterate parity — fresh solver per k, tolerances zero so
// termination never fires, dump the k-th iterate.
static void scenario_cartpole_iterates() {
  tinyMatrix A, B, Q, R;
  cartpole(A, B, Q, R);
  for (int k = 1; k <= 10; ++k) {
    TinySolver* s = make_solver(A, B, Q, R, 1.0, 20, 1e17, 1e17);
    settings_like_julia(s, 0.0, 0.0, k, 0, 0);
    tinyVector x0(4);
    x0 << 0.5, 0.0, 0.0, 0.0;
    tiny_set_x0(s, x0);
    tiny_solve(s);
    char prefix[64];
    std::snprintf(prefix, sizeof(prefix), "k%d_", k);
    dump_solution(s, prefix);
  }
}

// Scenario 3: cartpole closed-loop MPC with box constraints
// (examples/cartpole_example_reference_constrained.jl: pos +-2, force +-5,
// x0=[0,0,0.1,0]).  Warm-started across steps like the reference singleton.
static void scenario_cartpole_mpc() {
  tinyMatrix A, B, Q, R;
  cartpole(A, B, Q, R);
  int N = 20, nsteps = 60;
  TinySolver* s = make_solver(A, B, Q, R, 1.0, N, 1e17, 1e17);
  // bounds: pos +-2 on state 0, force +-5
  s->work->x_min.row(0).setConstant(-2.0);
  s->work->x_max.row(0).setConstant(2.0);
  s->work->u_min.setConstant(-5.0);
  s->work->u_max.setConstant(5.0);
  settings_like_julia(s, 1e-3, 1e-3, 100, 1, 1);
  tinyVector x = tinyVector::Zero(4);
  x(2) = 0.1;
  tinyMatrix xs(4, nsteps), us(1, nsteps);
  tinyMatrix iters(1, nsteps);
  for (int t = 0; t < nsteps; ++t) {
    tiny_set_x0(s, x);
    tiny_solve(s);
    tinyVector u = s->solution->u.col(0);
    xs.col(t) = x;
    us.col(t) = u;
    iters(0, t) = s->solution->iter;
    x = A * x + B * u;
  }
  dump("mpc_xs", xs);
  dump("mpc_us", us);
  dump("mpc_iters", iters);
  dump("mpc_final_vnew", s->solution->x);
  dump("mpc_final_znew", s->solution->u);
}

// Scenario 4: quadrotor hover (examples/quadrotor_hover_codegen.jl params),
// plain solve from a perturbed hover state, input bounds +-0.5.
static void scenario_quadrotor_hover() {
  tinyMatrix A, B, Q, R;
  quadrotor(A, B, Q, R);
  TinySolver* s = make_solver(A, B, Q, R, 5.0, 20, 1e17, 0.5);
  settings_like_julia(s, 1e-3, 1e-3, 500, 0, 1);
  dump_cache(s, "cache_");
  tinyVector x0(12);
  x0 << 0.1, -0.2, 0.3, 0.05, -0.05, 0.1, 0.2, -0.1, 0.15, 0.0, 0.0, 0.0;
  tiny_set_x0(s, x0);
  tiny_solve(s);
  dump_solution(s, "solve_");
}

// Scenario 5: quadrotor with adaptive rho; sensitivity matrices are loaded
// from a file (produced independently via numpy finite differences) so the
// Taylor update path runs with real data instead of the hard-coded constants
// (tiny_api.cpp:279-321).
static void scenario_quadrotor_adaptive(const char* sens_path) {
  tinyMatrix A, B, Q, R;
  quadrotor(A, B, Q, R);
  TinySolver* s = make_solver(A, B, Q, R, 5.0, 20, 1e17, 0.5);
  settings_like_julia(s, 1e-3, 1e-3, 500, 0, 1);
  s->settings->adaptive_rho = 1;
  s->settings->adaptive_rho_min = 0.1;
  s->settings->adaptive_rho_max = 10.0;
  s->settings->adaptive_rho_enable_clipping = 1;

  FILE* f = std::fopen(sens_path, "r");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", sens_path);
    std::exit(1);
  }
  auto read_mat = [&](tinyMatrix& M, int r, int c) {
    M = tinyMatrix(r, c);
    for (int i = 0; i < r; ++i)
      for (int j = 0; j < c; ++j) {
        double v;
        if (std::fscanf(f, "%lf", &v) != 1) { std::fprintf(stderr, "bad sens file\n"); std::exit(1); }
        M(i, j) = v;
      }
  };
  read_mat(s->cache->dKinf_drho, 4, 12);
  read_mat(s->cache->dPinf_drho, 12, 12);
  read_mat(s->cache->dC1_drho, 4, 4);
  read_mat(s->cache->dC2_drho, 12, 12);
  std::fclose(f);

  tinyVector x0(12);
  x0 << 0.1, -0.2, 0.3, 0.05, -0.05, 0.1, 0.2, -0.1, 0.15, 0.0, 0.0, 0.0;
  tiny_set_x0(s, x0);
  static TinySolver* s_static = s;
  run_on_fresh_stack(+[]() { tiny_solve(s_static); });
  dump_solution(s, "solve_");
  dump_cache(s, "final_");
}

// Scenario 6: cartpole with a tracking reference (exercises q/r/p_N paths).
static void scenario_cartpole_tracking() {
  tinyMatrix A, B, Q, R;
  cartpole(A, B, Q, R);
  int N = 20;
  TinySolver* s = make_solver(A, B, Q, R, 1.0, N, 1e17, 1e17);
  settings_like_julia(s, 1e-3, 1e-3, 200, 0, 0);
  tinyMatrix Xref = tinyMatrix::Zero(4, N);
  tinyMatrix Uref = tinyMatrix::Zero(1, N - 1);
  for (int i = 0; i < N; ++i) {
    Xref(0, i) = 0.5 * std::sin(0.1 * i);
    Xref(2, i) = 0.05 * std::cos(0.2 * i);
  }
  for (int i = 0; i < N - 1; ++i) Uref(0, i) = 0.01 * i;
  tiny_set_x_ref(s, Xref);
  tiny_set_u_ref(s, Uref);
  tinyVector x0(4);
  x0 << 0.3, 0.0, -0.05, 0.0;
  tiny_set_x0(s, x0);
  tiny_solve(s);
  dump_solution(s, "solve_");
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: golden_gen <scenario> <out_path> [sens_path]\n");
    return 1;
  }
  g_out = std::fopen(argv[2], "w");
  if (!g_out) { std::fprintf(stderr, "cannot open %s\n", argv[2]); return 1; }
  std::string sc = argv[1];
  if (sc == "cartpole_one_solve") scenario_cartpole_one_solve();
  else if (sc == "cartpole_iterates") scenario_cartpole_iterates();
  else if (sc == "cartpole_mpc") scenario_cartpole_mpc();
  else if (sc == "quadrotor_hover") scenario_quadrotor_hover();
  else if (sc == "quadrotor_adaptive") {
    if (argc < 4) { std::fprintf(stderr, "need sens_path\n"); return 1; }
    scenario_quadrotor_adaptive(argv[3]);
  }
  else if (sc == "cartpole_tracking") scenario_cartpole_tracking();
  else { std::fprintf(stderr, "unknown scenario %s\n", sc.c_str()); return 1; }
  std::fclose(g_out);
  return 0;
}
