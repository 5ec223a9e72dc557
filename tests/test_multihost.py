"""Multi-host runtime smoke test: 2 CPU processes via jax.distributed.

SURVEY.md §4.6: multi-host paths must be testable without a pod — two local
processes, 4 virtual devices each, one global 8-device mesh, and a psum that
only succeeds if the cross-process collective works.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(worker))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert any("RESULT 0 8.0" in out for _, out in outs)
    assert any("RESULT 1 8.0" in out for _, out in outs)
    # phase 2: cross-process TP decode step — both processes computed the
    # SAME replicated checksum + greedy tokens (per-layer psums crossed the
    # process boundary)
    steps = sorted(line for _, out in outs for line in out.splitlines()
                   if line.startswith("STEP "))
    assert len(steps) == 2, steps
    assert steps[0].split(" ", 2)[2] == steps[1].split(" ", 2)[2], steps
    # phase 3: the cross-process serving chunk ran and was token-exact
    # (the worker asserts equality; CHUNK only prints on success)
    chunks = [line for _, out in outs for line in out.splitlines()
              if line.startswith("CHUNK ")]
    assert len(chunks) == 2, chunks
    # phase 4 (round 4): a full ContinuousBatcher session across the
    # process boundary — both processes served 3 requests with codes
    # token-identical to their process-local run, and agree with each other
    batches = sorted(line for _, out in outs for line in out.splitlines()
                     if line.startswith("BATCHER "))
    assert len(batches) == 2, batches
    assert batches[0].split(" ", 2)[2] == batches[1].split(" ", 2)[2], batches
    assert int(batches[0].split()[2]) > 0  # real codes were generated
