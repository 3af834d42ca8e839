"""Codegen tests mirroring /root/reference/tests/test_codegen.jl (file set,
contents, nested dirs) plus what the reference can't do: compile the emitted
project and assert the embedded solver's solution matches the JAX solver."""
import os
import shutil
import subprocess

import numpy as np
import pytest

from tinympc_julia_tpu.models import cartpole, rocket

GXX = shutil.which("g++")


def _gen(tmp_path, solver, sub="out"):
    out = os.path.join(tmp_path, sub)
    solver.codegen(out)
    return out


def _build_and_run(out):
    exe = os.path.join(out, "build", "tiny_mpc_example")
    subprocess.run(
        [GXX, "-O2", "-std=c++17", "-I", os.path.join(out, "tinympc"),
         os.path.join(out, "src", "tiny_data.cpp"),
         os.path.join(out, "src", "tiny_main.cpp"), "-o", exe],
        check=True, capture_output=True)
    res = subprocess.run([exe], check=True, capture_output=True, text=True)
    lines = res.stdout.strip().splitlines()
    status, it, solved = (int(tok) for tok in
                          np.array(lines[0].split())[[1, 3, 5]])
    u = np.array([[float(v) for v in ln.split()] for ln in lines[1:]])
    return status, it, solved, u


class TestEmittedFiles:
    def test_file_set(self, tmp_path):
        # test_codegen.jl:21-52
        s = cartpole.make_solver()
        out = _gen(str(tmp_path), s)
        for rel in ("CMakeLists.txt", "src/tiny_data.cpp", "src/tiny_main.cpp",
                    "tinympc/tiny_data.hpp", "tinympc/tinympc_solver.hpp",
                    "build"):
            assert os.path.exists(os.path.join(out, rel)), rel

    def test_nested_output_dirs(self, tmp_path):
        # test_codegen.jl:84-102
        s = cartpole.make_solver()
        out = _gen(str(tmp_path), s, sub=os.path.join("a", "b", "c"))
        assert os.path.exists(os.path.join(out, "src", "tiny_data.cpp"))

    def test_generated_contents(self, tmp_path):
        # test_codegen.jl:104-132: include guards, types, entry point, extern
        s = cartpole.make_solver()
        out = _gen(str(tmp_path), s)
        header = open(os.path.join(out, "tinympc", "tiny_data.hpp")).read()
        assert "#pragma once" in header
        assert "tiny_float" in header
        assert "extern TinySolver tiny_solver" in header
        main = open(os.path.join(out, "src", "tiny_main.cpp")).read()
        assert "main" in main and "#include" in main

    def test_sensitivity_variant(self, tmp_path):
        # test_codegen.jl:54-82
        s = cartpole.make_solver(adaptive_rho=True)
        dK, dP, dC1, dC2 = s.compute_sensitivity_autograd()
        out = os.path.join(str(tmp_path), "sens")
        s.codegen_with_sensitivity(out, dK, dP, dC1, dC2)
        data = open(os.path.join(out, "src", "tiny_data.cpp")).read()
        assert "g_dKinf" in data
        header = open(os.path.join(out, "tinympc", "tiny_data.hpp")).read()
        assert "#define TINY_HAS_SENSITIVITY 1" in header


@pytest.mark.skipif(GXX is None, reason="no C++ compiler")
class TestEmbeddedParity:
    def test_cartpole_embedded_matches_jax(self, tmp_path):
        """Compile + run the emitted solver; it must reproduce the JAX solve
        from the identical baked state."""
        s = cartpole.make_solver(max_iter=50)
        s.set_x0([0.5, 0.0, 0.0, 0.0])
        out = _gen(str(tmp_path), s)
        status, it, solved, u = _build_and_run(out)
        s.solve()
        sol = s.get_solution()
        assert it == int(s.solution.iter)
        assert solved == int(s.solution.solved)
        np.testing.assert_allclose(u, sol.controls.T, atol=1e-12)

    def test_rocket_embedded_matches_jax(self, tmp_path):
        """Full constraint stack (box + SOC + affine f) in the embedded
        solver."""
        s = rocket.make_solver(max_iter=80)
        s.set_x0(rocket.X_INIT)
        Xref, Uref = rocket.reference_trajectory(0)
        s.set_x_ref(Xref)
        s.set_u_ref(Uref)
        out = _gen(str(tmp_path), s)
        status, it, solved, u = _build_and_run(out)
        s.solve()
        sol = s.get_solution()
        assert it == int(s.solution.iter)
        np.testing.assert_allclose(u, sol.controls.T, atol=1e-9)

    def test_adaptive_rho_embedded_matches_jax(self, tmp_path):
        """Adaptive-rho Taylor path in the embedded solver vs JAX."""
        s = cartpole.make_solver(max_iter=60, adaptive_rho=True,
                                 adaptive_rho_min=0.5, adaptive_rho_max=5.0)
        s.set_bound_constraints(np.full((4, 20), -1e17), np.full((4, 20), 1e17),
                                np.full((1, 19), -1.0), np.full((1, 19), 1.0))
        s.update_settings(en_state_bound=False, adaptive_rho=True)
        s.set_x0([1.2, -0.3, 0.2, 0.1])
        out = _gen(str(tmp_path), s)
        status, it, solved, u = _build_and_run(out)
        s.solve()
        sol = s.get_solution()
        assert it == int(s.solution.iter)
        np.testing.assert_allclose(u, sol.controls.T, atol=1e-9)
