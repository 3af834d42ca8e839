"""ctypes binding to the native runtime (native/tinympc_native.cpp).

The analog of the reference's Julia-side lib loader + ccall layer
(/root/reference/src/TinyMPC.jl:11-14, ccalls throughout): loads
libtinympc_native.so (building it on demand with the system compiler) and
exposes the same C ABI the reference bindings define (SURVEY.md §2.2).

Use `NativeSolver` for a Python-friendly wrapper, or `load_library()` for the
raw ctypes handle to embed in another FFI host.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_NAME = "libtinympc_native.so"

_lib: Optional[ctypes.CDLL] = None

_D = ctypes.POINTER(ctypes.c_double)
_I = ctypes.POINTER(ctypes.c_int)


def _gen_templates_inc() -> str:
    """(Re)generate native/codegen_templates.inc from the Python emitter's
    templates when stale; returns its path."""
    repo = os.path.dirname(_NATIVE_DIR)
    inc = os.path.join(_NATIVE_DIR, "codegen_templates.inc")
    deps = [os.path.join(repo, "tools", "gen_native_inc.py"),
            os.path.join(repo, "tinympc_julia_tpu", "codegen", "emitter.py"),
            os.path.join(repo, "tinympc_julia_tpu", "codegen", "templates",
                         "tinympc_solver.hpp")]
    if (not os.path.exists(inc)
            or any(os.path.getmtime(d) > os.path.getmtime(inc)
                   for d in deps)):
        import sys
        subprocess.run([sys.executable, deps[0], inc], check=True)
    return inc


def build_library(out_dir: Optional[str] = None) -> str:
    """Compile the native library if missing; returns its path."""
    out_dir = out_dir or _NATIVE_DIR
    src = os.path.join(_NATIVE_DIR, "tinympc_native.cpp")
    lib_path = os.path.join(out_dir, _LIB_NAME)
    try:
        inc = _gen_templates_inc()
    except (OSError, subprocess.CalledProcessError):
        # installed without the repo tools/ dir — use the checked-in inc
        inc = os.path.join(_NATIVE_DIR, "codegen_templates.inc")
    newest_src = max(os.path.getmtime(p) for p in (src, inc)
                     if os.path.exists(p))
    if (os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= newest_src):
        return lib_path
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(["g++", "-O2", "-std=c++17", "-fPIC", "-shared",
                    "-o", lib_path, src], check=True, cwd=_NATIVE_DIR)
    return lib_path


def load_library(path: Optional[str] = None) -> ctypes.CDLL:
    global _lib
    if _lib is not None and path is None:
        return _lib
    lib = ctypes.CDLL(path or build_library())

    lib.setup_solver.restype = ctypes.c_int
    lib.setup_solver.argtypes = [
        _D, ctypes.c_int, ctypes.c_int, _D, ctypes.c_int, ctypes.c_int,
        _D, ctypes.c_int, ctypes.c_int, _D, ctypes.c_int, ctypes.c_int,
        _D, ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    for name in ("set_x0", "set_x_ref", "set_u_ref"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [_D, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.solve_mpc.restype = ctypes.c_int
    lib.solve_mpc.argtypes = [ctypes.c_int]
    for name in ("get_states", "get_controls"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [_D, _I, _I]
    lib.cleanup_solver.restype = None
    lib.cleanup_solver.argtypes = []
    lib.update_settings.restype = ctypes.c_int
    lib.update_settings.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, ctypes.c_int]
    lib.set_bound_constraints.restype = ctypes.c_int
    lib.set_bound_constraints.argtypes = [
        _D, ctypes.c_int, ctypes.c_int] * 4 + [ctypes.c_int]
    lib.set_linear_constraints.restype = ctypes.c_int
    lib.set_linear_constraints.argtypes = [
        _D, ctypes.c_int, ctypes.c_int, _D, ctypes.c_int,
        _D, ctypes.c_int, ctypes.c_int, _D, ctypes.c_int, ctypes.c_int]
    lib.set_cone_constraints.restype = ctypes.c_int
    lib.set_cone_constraints.argtypes = [
        _I, ctypes.c_int, _I, ctypes.c_int, _D, ctypes.c_int,
        _I, ctypes.c_int, _I, ctypes.c_int, _D, ctypes.c_int, ctypes.c_int]
    lib.set_cache_terms.restype = ctypes.c_int
    lib.set_cache_terms.argtypes = [
        _D, ctypes.c_int, ctypes.c_int] * 4 + [ctypes.c_int]
    lib.set_sensitivity_terms.restype = ctypes.c_int
    lib.set_sensitivity_terms.argtypes = [
        _D, ctypes.c_int, ctypes.c_int] * 4 + [ctypes.c_int]
    lib.codegen.restype = ctypes.c_int
    lib.codegen.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.codegen_with_sensitivity.restype = ctypes.c_int
    lib.codegen_with_sensitivity.argtypes = [
        ctypes.c_char_p] + [_D, ctypes.c_int, ctypes.c_int] * 4 + [
        ctypes.c_int]
    lib.print_problem_data.restype = ctypes.c_int
    lib.print_problem_data.argtypes = [ctypes.c_int]
    lib.get_residuals.restype = ctypes.c_int
    lib.get_residuals.argtypes = [_D, _D, _D, _D]

    if path is None:
        _lib = lib
    return lib


def _colmajor(a) -> np.ndarray:
    return np.asfortranarray(np.asarray(a, dtype=np.float64))


def _dp(a):
    return a.ctypes.data_as(_D)


class NativeSolver:
    """Python wrapper over the native C ABI (process-global instance, like
    the reference's singleton)."""

    def __init__(self, lib_path: Optional[str] = None):
        self.lib = load_library(lib_path)
        self.nx = self.nu = self.N = 0

    def setup(self, A, B, f, Q, R, rho, nx, nu, N, *, verbose=False, **kw):
        A = _colmajor(A)
        Bm = _colmajor(B)
        fv = _colmajor(np.reshape(np.zeros(nx) if f is None else f, (nx, 1)))
        Q = _colmajor(Q)
        R = _colmajor(R)
        st = self.lib.setup_solver(
            _dp(A), nx, nx, _dp(Bm), nx, nu, _dp(fv), nx, 1,
            _dp(Q), nx, nx, _dp(R), nu, nu, float(rho), nx, nu, N,
            int(verbose))
        if st != 0:
            raise RuntimeError(f"setup_solver failed: {st}")
        self.nx, self.nu, self.N = nx, nu, N
        if kw:
            self.update_settings(**kw)
        return st

    def update_settings(self, abs_pri_tol=1e-3, abs_dua_tol=1e-3,
                        max_iter=100, check_termination=1,
                        en_state_bound=False, en_input_bound=False,
                        en_state_soc=False, en_input_soc=False,
                        en_state_linear=False, en_input_linear=False,
                        adaptive_rho=False, adaptive_rho_min=0.1,
                        adaptive_rho_max=10.0,
                        adaptive_rho_enable_clipping=True, verbose=False):
        return self.lib.update_settings(
            float(abs_pri_tol), float(abs_dua_tol), int(max_iter),
            int(check_termination), int(en_state_bound), int(en_input_bound),
            int(en_state_soc), int(en_input_soc), int(en_state_linear),
            int(en_input_linear), int(adaptive_rho), float(adaptive_rho_min),
            float(adaptive_rho_max), int(adaptive_rho_enable_clipping),
            int(verbose))

    def set_x0(self, x0):
        x0 = _colmajor(np.reshape(x0, (self.nx, 1)))
        return self.lib.set_x0(_dp(x0), self.nx, 1, 0)

    def set_x_ref(self, x_ref):
        x_ref = _colmajor(x_ref)
        return self.lib.set_x_ref(_dp(x_ref), self.nx, self.N, 0)

    def set_u_ref(self, u_ref):
        u_ref = _colmajor(u_ref)
        return self.lib.set_u_ref(_dp(u_ref), self.nu, self.N - 1, 0)

    def set_bound_constraints(self, x_min, x_max, u_min, u_max):
        ms = [_colmajor(m) for m in (x_min, x_max, u_min, u_max)]
        return self.lib.set_bound_constraints(
            _dp(ms[0]), self.nx, self.N, _dp(ms[1]), self.nx, self.N,
            _dp(ms[2]), self.nu, self.N - 1, _dp(ms[3]), self.nu, self.N - 1,
            0)

    def set_cone_constraints(self, Acu, qcu, cu, Acx, qcx, cx):
        ai = lambda a: np.ascontiguousarray(a, dtype=np.int32)
        ad = lambda a: np.ascontiguousarray(a, dtype=np.float64)
        Acu, qcu, Acx, qcx = ai(Acu), ai(qcu), ai(Acx), ai(qcx)
        cu, cx = ad(cu), ad(cx)
        ip = lambda a: a.ctypes.data_as(_I)
        return self.lib.set_cone_constraints(
            ip(Acu), len(Acu), ip(qcu), len(qcu), _dp(cu), len(cu),
            ip(Acx), len(Acx), ip(qcx), len(qcx), _dp(cx), len(cx), 0)

    def set_linear_constraints(self, Alin_x, blin_x, Alin_u, blin_u):
        Ax = _colmajor(np.reshape(Alin_x, (-1, self.nx)))
        Au = _colmajor(np.reshape(Alin_u, (-1, self.nu)))
        bx = np.ascontiguousarray(blin_x, dtype=np.float64)
        bu = np.ascontiguousarray(blin_u, dtype=np.float64)
        return self.lib.set_linear_constraints(
            _dp(Ax), Ax.shape[0], self.nx, _dp(bx), len(bx),
            _dp(Au), Au.shape[0], self.nu, _dp(bu), len(bu), 0)

    def set_cache_terms(self, Kinf, Pinf, Quu_inv, AmBKt):
        ms = [_colmajor(m) for m in (Kinf, Pinf, Quu_inv, AmBKt)]
        return self.lib.set_cache_terms(
            _dp(ms[0]), self.nu, self.nx, _dp(ms[1]), self.nx, self.nx,
            _dp(ms[2]), self.nu, self.nu, _dp(ms[3]), self.nx, self.nx, 0)

    def set_sensitivity_terms(self, dK, dP, dC1, dC2):
        ms = [_colmajor(m) for m in (dK, dP, dC1, dC2)]
        return self.lib.set_sensitivity_terms(
            _dp(ms[0]), self.nu, self.nx, _dp(ms[1]), self.nx, self.nx,
            _dp(ms[2]), self.nu, self.nu, _dp(ms[3]), self.nx, self.nx, 0)

    def codegen(self, output_dir, *, verbose=False):
        return self.lib.codegen(os.fsencode(output_dir), int(verbose))

    def codegen_with_sensitivity(self, output_dir, dK, dP, dC1, dC2, *,
                                 verbose=False):
        ms = [_colmajor(m) for m in (dK, dP, dC1, dC2)]
        return self.lib.codegen_with_sensitivity(
            os.fsencode(output_dir),
            _dp(ms[0]), self.nu, self.nx, _dp(ms[1]), self.nx, self.nx,
            _dp(ms[2]), self.nu, self.nu, _dp(ms[3]), self.nx, self.nx,
            int(verbose))

    def solve(self, *, verbose=False):
        return self.lib.solve_mpc(int(verbose))

    def get_solution(self):
        states = np.zeros((self.nx, self.N), order="F")
        controls = np.zeros((self.nu, self.N - 1), order="F")
        r = ctypes.c_int()
        c = ctypes.c_int()
        self.lib.get_states(_dp(states), ctypes.byref(r), ctypes.byref(c))
        self.lib.get_controls(_dp(controls), ctypes.byref(r), ctypes.byref(c))
        return states, controls

    def get_residuals(self):
        vals = [ctypes.c_double() for _ in range(4)]
        self.lib.get_residuals(*[ctypes.byref(v) for v in vals])
        return tuple(v.value for v in vals)

    def cleanup(self):
        self.lib.cleanup_solver()
