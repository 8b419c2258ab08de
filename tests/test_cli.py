"""CLI surface tests (zkp_subnet_tpu/__main__.py): setup + check.

`round`/`aggregate`/`run`/`serve` are driven end-to-end by the verify
workflow and the runtime/server tests; here the artifact tooling gets
in-tree coverage: manifest writing, cryptographic SRS validation, and
corruption detection (the fetch/verify story of SURVEY.md §2.12)."""

import os

import pytest

from zkp_subnet_tpu.__main__ import main


def test_setup_check_and_corruption(tmp_path):
    setup = str(tmp_path / "setup_4_1.npz")
    pre = str(tmp_path / "precompute_4_1.npz")
    argv = ["setup", "--setup-path", setup, "--precompute-path", pre,
            "--scale", "4", "--machines-scale", "1",
            "--generate-setup", "--generate-precompute"]
    assert main(argv) == 0
    assert os.path.exists(setup + ".sha256")

    # refuses to overwrite without --overwrite
    assert main(argv) == 1
    assert main(argv + ["--overwrite"]) == 0

    check = ["check", "--setup-path", setup, "--precompute-path", pre]
    assert main(check) == 0

    # flip one byte in the precompute → manifest check must fail
    raw = bytearray(open(pre, "rb").read())
    raw[-1] ^= 0xFF
    open(pre, "wb").write(bytes(raw))
    assert main(check) == 1


def test_ensure_backend_falls_back_to_cpu(monkeypatch):
    """A broken default backend (e.g. the axon plugin on a box with no
    tunnel) must not kill the CLI: ensure_backend retries on CPU with a
    warning (VERDICT r3 weak #8)."""
    import jax
    import zkp_subnet_tpu as z

    calls = {"n": 0}

    def fake_default_backend():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Unable to initialize backend 'axon'")
        return "cpu"

    monkeypatch.setattr(jax, "default_backend", fake_default_backend)
    monkeypatch.setattr(z, "_platform", None)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    updates = []
    monkeypatch.setattr(jax.config, "update",
                        lambda k, v: updates.append((k, v)))
    assert z.ensure_backend() == "cpu"
    assert ("jax_platforms", "cpu") in updates


def test_ensure_backend_honors_explicit_platform(monkeypatch):
    """An explicit ZKP_TPU_PLATFORM choice is never silently overridden:
    if the user asked for a platform and it is broken, the error is real."""
    import jax
    import zkp_subnet_tpu as z

    def broken_backend():
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(jax, "default_backend", broken_backend)
    monkeypatch.setattr(z, "_platform", "axon")
    import pytest
    with pytest.raises(RuntimeError):
        z.ensure_backend()


@pytest.mark.slow
def test_localnet_worker_supervision(tmp_path):
    """A hard-killed worker process is respawned by the localnet supervisor
    and the coordinator rides through the outage (the reference's
    restart-forever loop, scripts/miner_setup.sh:16-19, as a mechanism)."""
    import subprocess
    import sys as _sys

    setup = str(tmp_path / "setup_6_2.npz")
    pre = str(tmp_path / "precompute_6_2.npz")
    assert main(["setup", "--setup-path", setup, "--precompute-path", pre,
                 "--scale", "6", "--machines-scale", "2",
                 "--generate-setup", "--generate-precompute"]) == 0

    env = dict(os.environ, ZKP_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [_sys.executable, "-m", "zkp_subnet_tpu", "localnet",
         "--setup-path", setup, "--precompute-path", pre,
         "--scale", "6", "--machines-scale", "2", "--workers", "2",
         "--rounds", "3", "--timeout", "120",
         "--chaos-kill-after", "20"],
        capture_output=True, text=True, timeout=900, env=env)
    err = proc.stderr
    assert "chaos: killing worker 0" in err
    assert "died rc=" in err and "respawning" in err
    # the run completes (some rounds may score the dead worker 0 while it
    # re-warms; the loop itself must survive and finish all rounds)
    assert "rounds ok over 2 worker processes" in proc.stdout
