"""Chain-lease eviction protocol in bench.py.

The round-end driver capture (`python bench.py`) must never time-share the
single TPU chip with a still-running certification chain: the chain
registers its root PID in ``_outputs/chain_active`` and bench.py's outer
guard (plus both ``__graft_entry__`` entry points) evicts that exact PID
tree before measuring. Training is checkpoint-resumable, so eviction is
always safe; time-sharing instead depressed the round-4 headline.

Host-only logic — no jax, runs in the fast selection.
"""

import importlib.util
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def benchmod():
    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def lease(tmp_path, benchmod, monkeypatch):
    path = tmp_path / "chain_active"
    monkeypatch.setattr(benchmod, "_CHAIN_LEASE", str(path))
    monkeypatch.delenv("CHAIN_BENCH", raising=False)
    return path


def _spawn_tree(report_child=False):
    """A parent with one child, both sleeping; returns the Popen.

    With ``report_child`` the parent prints the child's PID on stdout (the
    child is reparented to init on eviction, so the test checks its death
    via /proc, while the parent — a direct child of pytest — is a zombie
    until ``wait()`` reaps it).
    """
    code = (
        "import subprocess,sys,time;"
        "p=subprocess.Popen([sys.executable,'-c','import time;time.sleep(120)']);"
        + ("print(p.pid,flush=True);" if report_child else "")
        + "time.sleep(120)"
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE if report_child else None,
    )


def _wait_dead(pid, secs=10.0):
    t0 = time.time()
    while time.time() - t0 < secs:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return True
        time.sleep(0.1)
    return False


def test_evicts_registered_tree_and_clears_lease(benchmod, lease):
    proc = _spawn_tree(report_child=True)
    child_pid = int(proc.stdout.readline())
    lease.write_text(str(proc.pid))
    benchmod._evict_chain_lease()
    # the root is a direct child of this process: a zombie until reaped
    proc.wait(timeout=15)
    assert proc.returncode != 0  # killed, not exited
    # the grandchild was reparented to init, which reaps it for real
    assert _wait_dead(child_pid)
    assert not lease.exists()


def test_chain_bench_env_skips_eviction(benchmod, lease, monkeypatch):
    proc = _spawn_tree()
    lease.write_text(str(proc.pid))
    monkeypatch.setenv("CHAIN_BENCH", "1")
    benchmod._evict_chain_lease()
    os.kill(proc.pid, 0)  # still alive: eviction skipped
    assert lease.exists()
    proc.terminate()
    proc.wait(timeout=10)


def test_stale_or_missing_lease_is_noop(benchmod, lease):
    # missing file
    benchmod._evict_chain_lease()
    # stale pid (already-dead process): file is cleaned up, nothing killed
    proc = _spawn_tree()
    proc.terminate()
    proc.wait(timeout=10)
    _wait_dead(proc.pid)
    lease.write_text(str(proc.pid))
    benchmod._evict_chain_lease()
    assert not lease.exists()


def test_garbage_lease_content_is_noop(benchmod, lease):
    lease.write_text("not-a-pid")
    benchmod._evict_chain_lease()  # must not raise
    assert lease.exists()  # unparseable content is left for a human
