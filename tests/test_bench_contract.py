"""bench.py driver contract: one JSON line on stdout, correct keys."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_emits_contract_line_cpu():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--platform", "cpu", "--kernel", "xla",
         "--steps", "1", "--warmup", "1", "--batch-size", "64"],
        capture_output=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    lines = proc.stdout.decode().strip().splitlines()
    assert len(lines) == 1, f"stdout must be exactly the JSON line: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "train_rays_per_sec_per_chip"
    assert rec["unit"] == "rays/s"
    assert rec["value"] > 0
    assert "vs_baseline" in rec
    assert rec["backend"] == "cpu"
    # round-3 flagship default: the online proposal-sampler step at the
    # quality-matched 64+96 budget, and the JSON line must say so
    # (series honesty markers)
    assert rec["train_sampler"] == "proposal"
    assert rec["samples"] == "64+96"


@pytest.mark.slow
def test_bench_parity_step_is_unmarked():
    """--train-sampler coarse reproduces the r1/r2 official series: the
    reference-parity step must NOT carry the train_sampler marker."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--platform", "cpu", "--kernel", "xla", "--train-sampler", "coarse",
         "--steps", "1", "--warmup", "1", "--batch-size", "64"],
        capture_output=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert "train_sampler" not in rec
    # the parity step stays at the reference flagship 64+128 — unmarked
    assert "samples" not in rec


@pytest.mark.slow
def test_bench_ns_fine_flag_reproduces_early_r3_budget():
    """--ns-fine 128 must reach the child and clear the samples marker
    (the early-r3 proposal rows' budget)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--platform", "cpu", "--ns-fine", "128",
         "--steps", "1", "--warmup", "1", "--batch-size", "64"],
        capture_output=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert rec["train_sampler"] == "proposal"
    assert "samples" not in rec, rec


@pytest.mark.slow
def test_bench_child_path_forwards_train_sampler():
    """Auto (driver) mode spawns a child bench process; --train-sampler
    coarse must reach the child.  Regression: the parent only forwarded
    the flag when it differed from 'coarse', so once 'proposal' became
    the default the explicit coarse request silently benched the
    proposal step."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--platform", "cpu", "--train-sampler", "coarse",
         "--steps", "1", "--warmup", "1", "--batch-size", "64"],
        capture_output=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = json.loads(proc.stdout.decode().strip().splitlines()[-1])
    assert "train_sampler" not in rec, rec


def test_bench_terminal_error_record_when_everything_wedges(monkeypatch, capsys):
    """The contract is ONE JSON line ALWAYS.  When the preflight, every
    child, and even the CPU fallback hang (a machine-wide wedge), the
    bench must still emit a parseable error record instead of rc=1 with
    no output (the round-1 regression)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class WedgedProc:
        returncode = None
        stdout = type("S", (), {"close": staticmethod(lambda: None)})()

        def communicate(self, timeout=None):
            raise subprocess.TimeoutExpired(cmd="x", timeout=timeout or 0)

        def kill(self):
            pass

    monkeypatch.setattr(bench.subprocess, "Popen",
                        lambda *a, **k: WedgedProc())
    monkeypatch.setenv("BENCH_PREFLIGHT_TIMEOUT", "1")
    monkeypatch.setenv("BENCH_PREFLIGHT_RETRIES", "0")
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    bench.main()  # must NOT raise or sys.exit
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert rec["metric"] == "train_rays_per_sec_per_chip"
    assert rec["value"] == 0.0
    assert rec["degraded"] is True
    assert "error" in rec


def test_precision_gate_logic():
    """The gate passes healthy v5e values and fails each documented
    breakage mode (pure function — the hardware probe itself is
    tests/test_tpu_hardware.py + the bench integration)."""
    from scripts.probe_mosaic_precision import gate

    healthy = {
        "exact_from_rs_err": 0.0,
        "exact_expand_err": 0.0,
        "generic_to_rs_rel": 2e-3,
        "encode_err_by_octave": [1e-5] * 6 + [5e-5, 8e-5, 1e-4, 1.2e-4],
    }
    ok, reasons = gate(healthy)
    assert ok and not reasons

    broken_encode = dict(healthy,
                         encode_err_by_octave=[1e-5] * 6 + [0.9, 1.5, 2.0,
                                                            1.8])
    ok, reasons = gate(broken_encode)
    assert not ok and any("octaves >= 6" in r for r in reasons)

    broken_limb = dict(healthy, exact_from_rs_err=3.9e-3)
    ok, reasons = gate(broken_limb)
    assert not ok and any("limb" in r for r in reasons)

    broken_generic = dict(healthy, generic_to_rs_rel=1e-2)
    ok, reasons = gate(broken_generic)
    assert not ok and any("generic" in r for r in reasons)
