"""Driver-contract tests for __graft_entry__.py.

The driver calls dryrun_multichip(n) from a process that has ALREADY
initialized JAX on the real TPU plugin (MULTICHIP_r01.json failure mode);
the entry must self-configure by re-exec'ing a CPU subprocess with
XLA_FLAGS=--xla_force_host_platform_device_count=N. Under pytest the
process is already an 8-device CPU backend (conftest.py), so the
in-process fast path runs directly.
"""

import sys

import pytest

sys.path.insert(0, ".")  # repo root (pytest.ini sets rootdir)
import __graft_entry__ as graft  # noqa: E402


def test_dryrun_inprocess_fast_path():
    # conftest gives this process cpu x8 -> _inprocess_ready is True and
    # the full dry run (train step + sharded retrieval) executes here.
    assert graft._inprocess_ready(2)
    graft.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_combined_mesh():
    """n>=4 runs the combined data x db mesh section (VERDICT r4 weak
    #6): one 2-D mesh carries the train step (batch over 'data') and the
    'db'-sharded ivfpq eval in the same process, asserted equal to
    single-chip inside _dryrun_impl."""
    assert graft._inprocess_ready(4)
    graft.dryrun_multichip(4)


def test_inprocess_ready_rejects_oversized_mesh():
    assert not graft._inprocess_ready(10_000)


def test_reexec_environment(monkeypatch):
    """When the process can't serve the mesh, the re-exec env must carry
    the conftest recipe: CPU platform, N virtual devices, TPU pool unset."""
    calls = {}

    class FakeProc:
        returncode = 0

    def fake_run(argv, cwd=None, env=None):
        calls["argv"], calls["cwd"], calls["env"] = argv, cwd, env
        return FakeProc()

    monkeypatch.setattr(graft, "_inprocess_ready", lambda n: False)
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_foo --xla_force_host_platform_device_count=3"
    )

    graft.dryrun_multichip(8)

    env = calls["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in env
    # stale device-count flag replaced, unrelated flags preserved
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=3" not in env["XLA_FLAGS"]
    assert "--xla_foo" in env["XLA_FLAGS"]
    assert calls["cwd"] == graft._REPO_ROOT
    bootstrap = calls["argv"][-1]
    assert "jax.config.update('jax_platforms', 'cpu')" in bootstrap
    assert "_dryrun_impl(8)" in bootstrap


def test_reexec_failure_raises(monkeypatch):
    class FakeProc:
        returncode = 3

    monkeypatch.setattr(graft, "_inprocess_ready", lambda n: False)
    monkeypatch.setattr(
        graft.subprocess, "run", lambda *a, **k: FakeProc()
    )
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(8)
