"""uint8 wire format: integer batches cross host->device as-is (4x fewer
bytes) and the jitted steps cast on device. uint8 -> float32 is exact, so
every result must be BIT-IDENTICAL to the float32 wire. The reference ships
float tensors (its ToTensor keeps raw 0..255 scale, dataloaders.py:118-136)
because CUDA DataLoaders pin float batches; on TPU the host->device link
(PCIe, or the dev tunnel at ~10-40 MB/s measured 2026-08-20) makes wire
bytes a first-class cost."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mrfp_tpu.core.config import Config
from mrfp_tpu.data import transforms as tr
from mrfp_tpu.data.loader import collate
from mrfp_tpu.models import MRFP
from mrfp_tpu.perturb import oc_init
from mrfp_tpu.train import create_train_state, make_jitted_steps
from mrfp_tpu.train.evaluator import SegEvaluator

HW = 64


def _batch(rng, n=2, dtype=np.uint8):
    imgs = rng.integers(0, 256, (n, HW, HW, 3)).astype(dtype)
    lbls = rng.integers(0, 19, (n, HW, HW)).astype(
        dtype if dtype == np.uint8 else np.int32)
    return imgs, lbls


def test_toarray_preserves_integer_sources():
    img = Image.fromarray((np.arange(64 * 64 * 3).reshape(64, 64, 3)
                           % 256).astype(np.uint8))
    lbl = Image.fromarray((np.arange(64 * 64).reshape(64, 64)
                           % 19).astype(np.uint8))
    out = tr.ToArray()({"image": img, "label": lbl})
    assert out["image"].dtype == np.uint8
    assert out["label"].dtype == np.uint8
    # float sources (post-Normalize) keep the float32 contract
    outf = tr.ToArray()({"image": np.asarray(img, np.float64) / 255.0,
                         "label": np.asarray(lbl, np.int64)})
    assert outf["image"].dtype == np.float32
    assert outf["label"].dtype == np.int32


def test_collate_preserves_uint8():
    rng = np.random.default_rng(0)
    u8 = [{"image": rng.integers(0, 256, (8, 8, 3)).astype(np.uint8),
           "label": rng.integers(0, 19, (8, 8)).astype(np.uint8)}
          for _ in range(3)]
    b = collate(u8)
    assert b["image"].dtype == np.uint8 and b["label"].dtype == np.uint8
    f = collate([{"image": s["image"].astype(np.float32),
                  "label": s["label"].astype(np.float32)} for s in u8])
    assert f["image"].dtype == np.float32 and f["label"].dtype == np.int32
    np.testing.assert_array_equal(b["image"].astype(np.float32), f["image"])


@pytest.mark.slow  # 195 s full-step bitwise A/B; the evaluator-level
# uint8 bitwise test (45 s) keeps wire regressions visible fast
def test_train_step_uint8_wire_bitwise_equals_float32():
    """Full MRFP+ train step: a uint8 batch must produce the bit-identical
    loss and updated params of the float32 batch (the cast is in-graph and
    exact; only the wire dtype differs)."""
    cfg = Config()
    model = MRFP(trunk="resnet-18", variant="D32")
    rng = np.random.default_rng(1)
    imgs, lbls = _batch(rng)

    def run(im, lb):
        state = create_train_state(model, cfg.train, (1, HW, HW, 3),
                                   oc_params=oc_init(jax.random.PRNGKey(1)))
        jt, _ = make_jitted_steps(model, cfg)
        state, metrics = jt(state, im, lb)
        return float(metrics["loss"]), state.params

    loss_u8, p_u8 = run(imgs, lbls)
    loss_f32, p_f32 = run(imgs.astype(np.float32), lbls.astype(np.int32))
    assert loss_u8 == loss_f32
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p_u8, p_f32)


class _WireDataset:
    name = "wire"
    id2cat = None

    def __init__(self, dtype):
        rng = np.random.default_rng(5)
        self.items = []
        for _ in range(3):
            img = rng.integers(0, 256, (HW, HW, 3)).astype(np.uint8)
            lbl = rng.integers(0, 19, (HW, HW)).astype(np.uint8)
            if dtype == np.float32:
                self.items.append({"image": img.astype(np.float32),
                                   "label": lbl.astype(np.int32)})
            else:
                self.items.append({"image": img, "label": lbl})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_evaluator_uint8_wire_bitwise_equals_float32():
    model = MRFP(trunk="resnet-18", variant="D32")
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    params, stats = variables["params"], variables.get("batch_stats", {})
    quiet = lambda *a, **k: None
    ref = SegEvaluator(model, params, stats).run(_WireDataset(np.float32),
                                                 log=quiet)
    got = SegEvaluator(model, params, stats).run(_WireDataset(np.uint8),
                                                 log=quiet)
    np.testing.assert_array_equal(got["hist"], ref["hist"])
    assert got["mean_iu"] == ref["mean_iu"]
    # batched + bucketed paths take uint8 too
    got_b = SegEvaluator(model, params, stats, eval_batch=2).run(
        _WireDataset(np.uint8), log=quiet)
    np.testing.assert_array_equal(got_b["hist"], ref["hist"])
    got_k = SegEvaluator(model, params, stats, bucket=48).run(
        _WireDataset(np.uint8), log=quiet)
    assert got_k["hist"].sum() == ref["hist"].sum()


def test_sliding_evaluator_uint8_wire_bitwise_equals_float32():
    """SlidingEvaluator ships tiles on the uint8 wire too (round-4 advisor:
    it used to force float32, 4x the host->device bytes): uint8 samples must
    produce the bit-identical histogram to the f32 wire."""
    from mrfp_tpu.train.evaluator import SlidingEvaluator

    model = MRFP(trunk="resnet-18", variant="D32")
    variables = jax.jit(
        lambda k, x: model.init({"params": k}, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    params, stats = variables["params"], variables.get("batch_stats", {})
    quiet = lambda *a, **k: None
    kw = dict(crop_size=48, tile_batch=2)
    ref = SlidingEvaluator(model, params, stats, **kw).run(
        _WireDataset(np.float32), log=quiet)
    got = SlidingEvaluator(model, params, stats, **kw).run(
        _WireDataset(np.uint8), log=quiet)
    np.testing.assert_array_equal(got["hist"], ref["hist"])
    assert got["mean_iu"] == ref["mean_iu"]
