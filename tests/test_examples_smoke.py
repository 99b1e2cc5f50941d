"""Integration smoke: run a fast self-checking example end-to-end in-process
(the reference's docs build literately executes every example —
docs/make.jl:60-84; the full set runs in CI-style scripts, this keeps one in
the unit suite)."""

import runpy
import sys


def test_process_decomposition_example(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["process_decomposition.py"])
    runpy.run_path("examples/process_decomposition.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "process_decomposition: OK" in out


def test_convolutional_gp_example(monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["convolutional_gp.py"])
    runpy.run_path("examples/convolutional_gp.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "convolutional_gp: OK" in out


def test_differentiation_example(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["differentiation.py", "--platform", "cpu"])
    runpy.run_path("examples/differentiation.py", run_name="__main__")


def test_sensor_fusion_example(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["sensor_fusion.py", "--platform", "cpu"])
    runpy.run_path("examples/sensor_fusion.py", run_name="__main__")


def test_naive_linear_mixing_example(monkeypatch):
    monkeypatch.setattr(
        sys, "argv", ["naive_linear_mixing.py", "--platform", "cpu"]
    )
    runpy.run_path("examples/naive_linear_mixing.py", run_name="__main__")


def test_time_varying_blr_example(monkeypatch):
    monkeypatch.setattr(sys, "argv", ["time_varying_blr.py", "--platform", "cpu"])
    runpy.run_path("examples/time_varying_blr.py", run_name="__main__")


def test_non_gaussian_likelihoods_example(monkeypatch, capsys):
    monkeypatch.setattr(
        sys, "argv", ["non_gaussian_likelihoods.py", "--platform", "cpu"]
    )
    runpy.run_path("examples/non_gaussian_likelihoods.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "OK" in out
