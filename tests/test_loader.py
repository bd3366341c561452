"""Threaded DataLoader liveness under a slow consumer.

Regression for a real deadlock (hit twice in production runs 2026-08-19,
diagnosed live via the SIGUSR1 stack dump): workers took a TASK before
acquiring a backpressure SLOT, and the worker holding the next batch the
in-order consumer needed could lose every slot race to workers holding
later batches — once `results` held `bound` batches none of which was the
needed one, no slot was ever released and every thread waited forever.
The fix inverts the order (slot before task); this stress reliably
deadlocked the old code within two epochs and must complete now.

Runs in a subprocess so a regression fails the test instead of hanging
the suite.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STRESS = """
import time

import numpy as np

from mrfp_tpu.data.loader import DataLoader

EPOCH = [0]


class DS:
    def __len__(self):
        return 120

    def __getitem__(self, i):
        rng = np.random.default_rng(i * 7919 + EPOCH[0])
        time.sleep(float(rng.uniform(0.001, 0.008)))  # variable collate
        return {"image": np.full((4, 4, 3), i, np.float32),
                "label": np.full((4, 4), i, np.int32)}

    def set_epoch(self, e):
        EPOCH[0] = e


dl = DataLoader(DS(), batch_size=1, shuffle=True, num_workers=5,
                prefetch=4, seed=0)
for epoch in range(4):
    dl.set_epoch(epoch)
    seen = 0
    for b in dl:
        seen += 1
        time.sleep(0.02)  # slow consumer: saturates the prefetch bound
    assert seen == 120, seen
print("stress-ok")
"""


def test_loader_no_deadlock_under_slow_consumer():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.run([sys.executable, "-c", _STRESS], env=env,
                       timeout=240, capture_output=True, text=True)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "stress-ok" in p.stdout
