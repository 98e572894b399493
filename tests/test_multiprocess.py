"""2-process jax.distributed data-parallel parity (VERDICT r4 ask 6).

The 8-device dryrun validates single-process SPMD; this test exercises real
PROCESS boundaries: two OS processes, each owning 4 virtual CPU devices of
one global ('data',) mesh (gloo collectives), each loading only its local
half of the global batch (jax.make_array_from_process_local_data), running
one jitted train step. Loss and the post-update parameter checksum must
match across the two processes AND match a single-process 8-device run of
the same global batch — proving the gradient all-reduce and the cross-shard
BatchNorm statistics are correct across process boundaries
(SURVEY §5: jax.distributed is the multi-host story)."""

import os
import re
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _clean_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse(out: str):
    m = re.search(r"RESULT pid=\d+ loss=([\d.eE+-]+) checksum=([\d.eE+-]+)", out)
    assert m, out[-2000:]
    return float(m.group(1)), float(m.group(2))


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", "29741"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(WORKER)))
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    single = subprocess.run(
        [sys.executable, WORKER], capture_output=True, text=True, timeout=900,
        env=env, cwd=os.path.dirname(os.path.dirname(WORKER)))
    assert single.returncode == 0, single.stdout + single.stderr

    (l0, c0), (l1, c1) = _parse(outs[0]), _parse(outs[1])
    ls, cs = _parse(single.stdout)
    # identical global batch + replicated state => bitwise-equal losses
    # across the two processes; vs the single-process twin the only
    # difference is gloo reduction order, so allow float32-roundoff slack
    assert l0 == l1 and c0 == c1, (outs[0], outs[1])
    assert abs(l0 - ls) <= 1e-6 * max(1.0, abs(ls)), (l0, ls)
    assert abs(c0 - cs) <= 1e-4 * max(1.0, abs(cs)), (c0, cs)
