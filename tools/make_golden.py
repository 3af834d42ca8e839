#!/usr/bin/env python3
"""Build and run the golden fixture generator against the vendored reference
C++ core, packing results into tests/golden/*.npz.

Also produces quadrotor rho-sensitivity matrices via an INDEPENDENT numpy
finite-difference implementation (no jax), used both by the reference binary's
adaptive-rho scenario and as an oracle for the framework's exact-jacfwd path.

Usage: python tools/make_golden.py
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src/codegen_src"
BUILD = "/tmp/golden_build"
GOLDEN = os.path.join(REPO, "tests", "golden")


def build():
    os.makedirs(BUILD, exist_ok=True)
    exe = os.path.join(BUILD, "golden_gen")
    srcs = [
        os.path.join(REPO, "tools", "golden_gen.cpp"),
        os.path.join(REF, "tinympc", "admm.cpp"),
        os.path.join(REF, "tinympc", "tiny_api.cpp"),
        os.path.join(REF, "tinympc", "rho_benchmark.cpp"),
    ]
    cmd = [
        "g++", "-O2", "-std=c++17", "-pthread",
        "-I", os.path.join(REF, "include", "Eigen"),
        "-I", os.path.join(REF, "tinympc"),
        "-o", exe, *srcs,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return exe


def parse_dump(path):
    """Parse the generator's 'name rows cols / values' text format."""
    out = {}
    with open(path) as f:
        tokens = f.read().split()
    i = 0
    while i < len(tokens):
        name = tokens[i]
        rows, cols = int(tokens[i + 1]), int(tokens[i + 2])
        n = rows * cols
        vals = np.array([float(t) for t in tokens[i + 3:i + 3 + n]])
        out[name] = vals.reshape(rows, cols)
        i += 3 + n
    return out


# --- independent numpy reference for the cache sensitivities ---------------

def numpy_cache_terms(A, B, Qdiag_user, Rdiag_user, rho):
    """Replicates tiny_precompute_and_set_cache semantics (double rho fold:
    work fold + precompute fold) in plain numpy."""
    nx = A.shape[0]
    nu = B.shape[1]
    Q1 = np.diag(Qdiag_user + 2.0 * rho)
    R1 = np.diag(Rdiag_user + 2.0 * rho)
    Ktp1 = np.zeros((nu, nx))
    Ptp1 = rho * np.eye(nx)
    Kinf, Pinf = Ktp1, Ptp1
    for _ in range(1000):
        Kinf = np.linalg.inv(R1 + B.T @ Ptp1 @ B) @ (B.T @ Ptp1 @ A)
        Pinf = Q1 + A.T @ Ptp1 @ (A - B @ Kinf)
        if np.max(np.abs(Kinf - Ktp1)) < 1e-5:
            break
        Ktp1, Ptp1 = Kinf, Pinf
    Quu_inv = np.linalg.inv(R1 + B.T @ Pinf @ B)
    AmBKt = (A - B @ Kinf).T
    return Kinf, Pinf, Quu_inv, AmBKt


def quadrotor_params():
    A = np.array([
        [1.0, 0.0, 0.0, 0.0, 0.024525, 0.0, 0.05, 0.0, 0.0, 0.0, 0.0002044, 0.0],
        [0.0, 1.0, 0.0, -0.024525, 0.0, 0.0, 0.0, 0.05, 0.0, -0.0002044, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.05, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.025],
        [0.0, 0.0, 0.0, 0.0, 0.981, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0122625, 0.0],
        [0.0, 0.0, 0.0, -0.981, 0.0, 0.0, 0.0, 1.0, 0.0, -0.0122625, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
    ])
    B = np.array([
        [-0.0007069, 0.0007773, 0.0007091, -0.0007795],
        [0.0007034, 0.0007747, -0.0007042, -0.0007739],
        [0.0052554, 0.0052554, 0.0052554, 0.0052554],
        [-0.1720966, -0.1895213, 0.1722891, 0.1893288],
        [-0.1729419, 0.190174, 0.1734809, -0.1907131],
        [0.0123423, -0.0045148, -0.0174024, 0.0095748],
        [-0.056552, 0.0621869, 0.0567283, -0.0623632],
        [0.0562756, 0.0619735, -0.0563386, -0.0619105],
        [0.2102143, 0.2102143, 0.2102143, 0.2102143],
        [-13.7677303, -15.1617018, 13.7831318, 15.1463003],
        [-13.8353509, 15.2139209, 13.8784751, -15.2570451],
        [0.9873856, -0.361182, -1.392188, 0.7659845],
    ])
    Qd = np.array([100.0, 100.0, 100.0, 4.0, 4.0, 400.0,
                   4.0, 4.0, 4.0, 2.0408163, 2.0408163, 4.0])
    Rd = np.array([4.0, 4.0, 4.0, 4.0])
    return A, B, Qd, Rd


def make_sensitivities(path):
    A, B, Qd, Rd = quadrotor_params()
    rho, h = 5.0, 1e-6
    t0 = numpy_cache_terms(A, B, Qd, Rd, rho)
    t1 = numpy_cache_terms(A, B, Qd, Rd, rho + h)
    sens = [(m1 - m0) / h for m0, m1 in zip(t0, t1)]
    with open(path, "w") as f:
        for m in sens:
            for row in m:
                f.write(" ".join(f"{v:.17g}" for v in row) + "\n")
    np.savez(os.path.join(GOLDEN, "quadrotor_sensitivities.npz"),
             dKinf=sens[0], dPinf=sens[1], dC1=sens[2], dC2=sens[3])
    return sens


def main():
    os.makedirs(GOLDEN, exist_ok=True)
    exe = build()
    sens_path = os.path.join(BUILD, "quadrotor_sens.txt")
    make_sensitivities(sens_path)

    scenarios = [
        ("cartpole_one_solve", []),
        ("cartpole_iterates", []),
        ("cartpole_mpc", []),
        ("quadrotor_hover", []),
        ("quadrotor_adaptive", [sens_path]),
        ("cartpole_tracking", []),
    ]
    for name, extra in scenarios:
        out_txt = os.path.join(BUILD, name + ".txt")
        subprocess.run([exe, name, out_txt, *extra], check=True,
                       stdout=subprocess.DEVNULL)
        data = parse_dump(out_txt)
        np.savez(os.path.join(GOLDEN, name + ".npz"), **data)
        print(f"{name}: {len(data)} arrays -> tests/golden/{name}.npz")


if __name__ == "__main__":
    sys.exit(main())
