#!/usr/bin/env python3
"""Cart-pole single solve (analog of
/root/reference/examples/cartpole_example_one_solve.jl)."""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinympc_julia_tpu.models import cartpole


def main():
    solver = cartpole.make_solver(max_iter=10)
    solver.set_x0([0.5, 0.0, 0.0, 0.0])
    solver.solve()
    solution = solver.get_solution()
    print(solution.controls)


if __name__ == "__main__":
    main()
