"""True multi-process distributed tests: spawn a 2-process jax.distributed
group (CPU backend, 2 virtual devices each -> 4 global) and check the
sharded RBPF equals the single-process run (SURVEY.md §4 distributed-test
requirement, with real process boundaries and a real coordinator)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "mp_rbpf_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_rbpf_equivalence():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
        assert p.returncode == 0, out

    digests = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIGEST"):
                _, pid, x, y, th = line.split()
                digests[pid] = (float(x), float(y), float(th))
    assert len(digests) == 2, outs
    # both processes see the same replicated estimate
    assert digests["0"] == pytest.approx(digests["1"], abs=1e-6)
    assert any("EQUIVALENT" in o for o in outs), outs


def _launch(n_steps, fault_at, ckpt_dir, timeout=420):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(REPO, "scripts", "mp_fault_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord, ckpt_dir,
             str(n_steps), str(fault_at)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs, codes = [], []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("fault-injection workers timed out")
        outs.append(out)
        codes.append(p.returncode)
    return outs, codes


def _digest(outs):
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIGEST"):
                t = line.split()
                return (float(t[2]), float(t[3]), float(t[4]))
    return None


@pytest.mark.slow
def test_fault_injection_detect_and_resume(tmp_path):
    """SURVEY §4/§5 fault story, end-to-end across real process death:
    kill worker 1 mid-run -> the survivor's deadline-guarded heartbeat
    returns False and it exits cleanly (no hang on the wedged collective);
    relaunching the group resumes from the RecoveryLoop checkpoint and
    finishes with EXACTLY the digest of an uninterrupted run."""
    n_steps, fault_at = 5, 2

    # reference: uninterrupted 2-process run
    ref_dir = str(tmp_path / "ref")
    os.makedirs(ref_dir)
    outs, codes = _launch(n_steps, -1, ref_dir)
    assert codes == [0, 0], outs
    want = _digest(outs)
    assert want is not None, outs

    # faulted run: worker 1 dies at step 2
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    outs, codes = _launch(n_steps, fault_at, run_dir)
    joined = "\n".join(outs)
    assert codes[1] == 17, joined  # injected death
    assert codes[0] == 3, joined   # survivor detected it and exited
    assert f"DETECTED 0 at step {fault_at}" in joined, joined
    assert _digest(outs) is None   # nobody finished
    assert os.path.exists(os.path.join(run_dir, "rbpf_state.npz")), \
        "survivor checkpointed before detection"

    # relaunch: restore + continue to completion
    outs, codes = _launch(n_steps, -1, run_dir)
    joined = "\n".join(outs)
    assert codes == [0, 0], joined
    assert f"START 0 step={fault_at} resumed=1" in joined, joined
    got = _digest(outs)
    assert got is not None, joined
    # deterministic resume: bit-identical to the uninterrupted run
    assert got == want, (got, want)


@pytest.mark.slow
def test_two_process_ep2d_equivalence():
    """The composed EP x TP mesh across a REAL process boundary (2 procs x
    2 local devices = (2 pgroups x 2 bands)): the improved-proposal RBPF
    step must equal the single-process shared-pool CoW step (round-3
    verdict task 9 — the comm-backend row's composed-mesh gap)."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(REPO, "scripts", "mp_ep2d_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("ep2d multi-process workers timed out")
        outs.append(out)
        assert p.returncode == 0, out
    assert any("EQUIVALENT" in o for o in outs), outs
