"""bench.py preflight: a down TPU tunnel must fail fast, not hang.

The axon plugin's device init blocks indefinitely in native code when the
tunnel is unreachable; bench.py probes init in a subprocess with a hard
timeout. These tests exercise the probe's three outcomes without a real
backend."""

import importlib.util
import pathlib
import subprocess

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location('bench', ROOT / 'bench.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_preflight_ok(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, timeout, capture_output, text):
        return subprocess.CompletedProcess(cmd, 0, stdout='preflight-ok\n',
                                           stderr='')

    monkeypatch.setattr(subprocess, 'run', fake_run)
    bench._preflight()  # no raise


def test_preflight_timeout_exits(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, timeout, capture_output, text):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, 'run', fake_run)
    with pytest.raises(SystemExit) as e:
        bench._preflight(timeout_s=1)
    assert e.value.code == 1


def test_preflight_error_exits(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, timeout, capture_output, text):
        return subprocess.CompletedProcess(
            cmd, 1, stdout='', stderr='RuntimeError: backend died\n')

    monkeypatch.setattr(subprocess, 'run', fake_run)
    with pytest.raises(SystemExit):
        bench._preflight()


def test_preflight_env_skip(monkeypatch):
    bench = _load_bench()
    monkeypatch.setenv('CAR_BENCH_PREFLIGHT', '0')

    def boom(*a, **k):
        raise AssertionError('must not probe when skipped')

    monkeypatch.setattr(subprocess, 'run', boom)
    bench._preflight()
