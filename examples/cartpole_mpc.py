#!/usr/bin/env python3
"""Closed-loop cart-pole MPC, re-planning each step with warm starts
(analog of /root/reference/examples/cartpole_example_mpc.jl)."""
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tinympc_julia_tpu.models import cartpole


def main(nsteps=200):
    solver = cartpole.make_solver(max_iter=100)
    x = np.array([0.5, 0.0, 0.0, 0.0])
    for t in range(nsteps):
        solver.set_x0(x)
        solver.solve()
        u = solver.get_solution().controls[:, 0]
        x = cartpole.simulate(x, u)
        if t % 20 == 0:
            print(f"step {t:3d}: x = {np.round(x, 4)} "
                  f"iters = {int(solver.solution.iter)}")
    print(f"final state norm: {np.linalg.norm(x):.2e} (stabilized)")


if __name__ == "__main__":
    main()
