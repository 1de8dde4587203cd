"""True multi-host simulation: 2 jax.distributed processes x 4 virtual
CPU devices each == one 8-device global mesh, fed by per-host
BucketedLoader slices assembled via make_array_from_process_local_data
(parallel/mesh.py:41-57).

The losses from the 2-process run must match a single-process run over
the identical global schedule — proving the multi-host input path
(split_by_node, reference cat/shared/manager.py:100-202) yields the
same optimization trajectory as single-host training.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_losses_match_single_host(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # workers set their own JAX env; strip the pytest conftest's 8-device
    # flag so each worker gets exactly 4 local devices
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    def parse(out):
        for line in out.splitlines():
            if line.startswith("LOSSES"):
                return np.asarray([float(v) for v in line.split()[1:]])
        raise AssertionError(f"no LOSSES line in: {out!r}")

    l0, l1 = parse(outs[0]), parse(outs[1])
    assert l0.size >= 2
    # both processes observe the identical (replicated) global loss
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    assert np.all(np.isfinite(l0))
    # multi-host save/restore with ZeRO-sharded opt state: both
    # processes consolidated + reloaded bitwise-identically, and only
    # rank 0 wrote the file (VERDICT r2 item 8)
    assert all("SAVEOK" in o for o in outs), outs
    assert os.path.exists(os.path.join(str(tmp_path), "mp_ckpt.pt"))

    # single-process reference over the same global schedule (this pytest
    # process already runs on an 8-device virtual CPU backend)
    from tests.multiproc_worker import run_steps

    ref = np.asarray(run_steps(host_index=0, host_count=1,
                               n_steps=l0.size))
    np.testing.assert_allclose(l0, ref, rtol=1e-4, atol=1e-5)
