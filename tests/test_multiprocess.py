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
