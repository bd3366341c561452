"""Utils coverage: experiment harness, meters, probes, metrics API."""

import json
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from mrfp_tpu.core.config import Config, mrfp_plus_config
from mrfp_tpu.metrics import eval as mean_iou_eval
from mrfp_tpu.metrics import fast_hist, fast_hist_pasta
from mrfp_tpu.utils import AverageMeter, make_exp_name, prep_experiment
from mrfp_tpu.utils.probes import FeatureProbe, cosine_sim


def test_average_meter():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0, n=3)
    assert m.val == 4.0 and m.count == 4
    assert abs(m.avg - 3.5) < 1e-9


def test_make_exp_name_encodes_config():
    name = make_exp_name(mrfp_plus_config())
    assert "resnet50" in name and "D16" in name and "mrfpp" in name
    assert "bs16" in name and "it40000" in name


def test_prep_experiment_and_writer():
    with tempfile.TemporaryDirectory() as d:
        exp = prep_experiment(Config(), root=d)
        assert os.path.isdir(exp["ckpt_dir"])
        exp["writer"].add_scalar("train/loss", 1.5, 10)
        exp["writer"].close()
        lines = open(os.path.join(exp["exp_dir"], "metrics.jsonl")).readlines()
        rec = json.loads(lines[0])
        assert rec == {"tag": "train/loss", "value": 1.5, "step": 10}


def test_cosine_sim_and_probe():
    a = jnp.ones((2, 4, 4, 3))
    assert abs(float(cosine_sim(a, a)) - 1.0) < 1e-6
    assert abs(float(cosine_sim(a, -a)) + 1.0) < 1e-6
    with tempfile.TemporaryDirectory() as d:
        p = FeatureProbe(os.path.join(d, "sim.txt"))
        v = p.log(a, a)
        assert abs(v - 1.0) < 1e-6
        assert open(p.path).read().strip() == str(v)


def test_metrics_api_surface():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 19, (32, 32))
    gt = rng.integers(0, 19, (32, 32))
    np.testing.assert_array_equal(fast_hist(pred, gt, 19),
                                  fast_hist_pasta(pred, gt, 19))
    miou = mean_iou_eval(gt, pred)
    assert 0.0 <= miou <= 1.0
    # perfect prediction -> mIoU 1
    assert mean_iou_eval(gt, gt) == 1.0


def test_enable_stack_dumps_sigusr1(tmp_path):
    """kill -USR1 must dump all thread stacks to stderr without killing or
    otherwise disturbing the process (production hang diagnosis)."""
    import os
    import subprocess
    import sys

    src = (
        "import os, signal, threading, time\n"
        "from mrfp_tpu.utils import enable_stack_dumps\n"
        "enable_stack_dumps()\n"
        "t = threading.Thread(target=time.sleep, args=(60,), daemon=True,\n"
        "                     name='sleeper')\n"
        "t.start()\n"
        "os.kill(os.getpid(), signal.SIGUSR1)\n"
        "time.sleep(0.5)\n"
        "print('still-alive')\n"
    )
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run([sys.executable, "-c", src], env=env, timeout=120,
                       capture_output=True, text=True)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "still-alive" in p.stdout
    assert "Current thread" in p.stderr and "Thread" in p.stderr
