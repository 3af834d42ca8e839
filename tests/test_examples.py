"""Smoke tests for every examples/*.py (VERDICT r3 item 7): each example's
main() runs in a quick configuration so the reference-analog claims in
PARITY.md §2.5 cannot silently rot.  Correctness of the underlying paths is
pinned elsewhere; these assert "runs to completion and produces sane
output"."""
import importlib.util
import pathlib
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cartpole_one_solve(capsys):
    _load("cartpole_one_solve.py").main()
    out = capsys.readouterr().out
    assert "[" in out  # prints the controls array


def test_cartpole_mpc():
    _load("cartpole_mpc.py").main(nsteps=8)


def test_cartpole_constrained():
    _load("cartpole_constrained.py").main(nsteps=8)


def test_cartpole_gain_scheduled():
    _load("cartpole_gain_scheduled.py").main(nsteps=8, plot=False)


def test_cartpole_codegen(tmp_path):
    mod = _load("cartpole_codegen.py")
    out = tmp_path / "cg"
    mod.main(out_dir=str(out))
    assert (out / "src" / "tiny_data.cpp").exists()


def test_quadrotor_hover_codegen(tmp_path):
    mod = _load("quadrotor_hover_codegen.py")
    out = tmp_path / "cg"
    mod.main(out_dir=str(out))
    assert (out / "src" / "tiny_data.cpp").exists()


def test_misset_rho_recovery(capsys):
    _load("misset_rho_recovery.py").main(B=8)
    out = capsys.readouterr().out
    assert "adaptive (rebuild)" in out


def test_rocket_landing(capsys):
    _load("rocket_landing.py").main()
    out = capsys.readouterr().out
    assert "Final position" in out


def test_batched_scenario_sweep(capsys):
    _load("batched_scenario_sweep.py").main(B=64)
    assert "solved" in capsys.readouterr().out


def test_cartpole_swingup_animation(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", ["cartpole_swingup_animation.py",
                                      "--no-gif"])
    mod = _load("cartpole_swingup_animation.py")
    # quick mode: fewer closed-loop steps (the module reads the globals at
    # call time)
    monkeypatch.setattr(mod, "MAX_STEPS", 60)
    monkeypatch.setattr(mod, "STABLE_STEPS", 10)
    mod.main()
    data = np.load(tmp_path / "cartpole_swingup.npz")
    assert data["states"].shape[0] == mod.ATTEMPTS
