// Generated example main (analog of codegen_example, codegen.cpp:372-431).
#include <cstdio>

#include "tiny_data.hpp"
#include "tinympc_solver.hpp"

int main() {
  int status = tinympc::tiny_solve(tiny_solver);
  std::printf("status %d iter %d solved %d\n", status, tiny_solver.solution.iter,
              tiny_solver.solution.solved);
  for (int i = 0; i < TINY_NH - 1; ++i) {
    for (int j = 0; j < TINY_NU; ++j)
      std::printf("%.17g ", (double)tiny_solver.solution.u[i][j]);
    std::printf("\n");
  }
  return 0;
}
