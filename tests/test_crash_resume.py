"""Crash-resume demonstration (VERDICT round-1 item 7): a training run is
SIGKILLed mid-flight in a real subprocess; restarting with the same
checkpoint dir resumes from the latest persisted epoch and finishes with
bit-identical metrics to an uninterrupted run (per-epoch shuffling is seeded
by epoch number, train/loop.py, so the trajectory is reproducible)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # SIGKILL-subprocess resume, minutes-long

SCRIPT = """
import json, sys
import numpy as np
from sifsr_tpu.config import HyperParams, TrainConfig
from sifsr_tpu.data import make_synthetic_dataset
from sifsr_tpu.train import train_loop

ckpt, n_epochs = sys.argv[1], int(sys.argv[2])
cfg = TrainConfig(
    hyper=HyperParams(batch_size=4, learning_rate=1e-3, n_epochs=n_epochs,
                      patience=50, alpha=0.99, gamma=-0.5),
    recipe="gradftm", seed=0, step_metrics=False,
)
train = make_synthetic_dataset(12, seed=1)
val = make_synthetic_dataset(4, seed=2)
state, metrics = train_loop(cfg, train, val, checkpoint_dir=ckpt, log_fn=print)
print("RESULT " + json.dumps({
    "best_epoch": int(metrics["best_epoch"]),
    "val_loss": [float(v) for v in metrics["val_loss"]],
}))
"""


def _run(ckpt_dir: str, n_epochs: int, timeout: int = 900):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, ckpt_dir, str(n_epochs)],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):]), out.stdout


def test_sigkill_mid_training_resumes_to_identical_result(tmp_path):
    n_epochs = 5
    # --- reference: uninterrupted run
    ref, _ = _run(str(tmp_path / "ckpt_ref"), n_epochs)
    assert len(ref["val_loss"]) == n_epochs

    # --- victim: start, SIGKILL once >=2 epochs are persisted
    ckpt_b = tmp_path / "ckpt_b"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.Popen(
        [sys.executable, "-c", SCRIPT, str(ckpt_b), str(n_epochs)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
    )
    try:
        deadline = time.time() + 600
        killed = False
        while time.time() < deadline:
            done = sorted(
                int(d) for d in os.listdir(ckpt_b)
                if d.isdigit() and os.path.isdir(ckpt_b / d)
            ) if ckpt_b.is_dir() else []
            if len([e for e in done if e >= 1]) >= 2:
                os.kill(proc.pid, signal.SIGKILL)  # hard kill, no cleanup
                killed = True
                break
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        assert killed, "run finished before the kill could land — slow down the config"
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    # --- resume with the same checkpoint dir: must pick up and finish
    res, stdout = _run(str(ckpt_b), n_epochs)
    assert "resumed from epoch" in stdout
    assert res["best_epoch"] == ref["best_epoch"]
    np.testing.assert_allclose(res["val_loss"], ref["val_loss"], rtol=1e-6)
