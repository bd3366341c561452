"""Evaluator: padding correctness, metric math vs reference formulas."""

import numpy as np
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.train.evaluator import SegEvaluator, evaluate_hist, pad_to_bucket
from mrfp_tpu.data.datasets import SyntheticDataset


def test_pad_to_bucket_ignores_padding():
    img = np.ones((70, 90, 3), np.float32)
    lbl = np.zeros((70, 90), np.int32)
    pimg, plbl = pad_to_bucket(img, lbl, bucket=64, ignore_index=255)
    assert pimg.shape == (128, 128, 3) and plbl.shape == (128, 128)
    assert (plbl[:70, :90] == 0).all()
    assert (plbl[70:, :] == 255).all() and (plbl[:, 90:] == 255).all()


def test_evaluate_hist_matches_reference_formulas():
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 1000, (19, 19)).astype(np.int64)
    res = evaluate_hist(hist, "unit", log=lambda *a, **k: None)
    # reference formulas (metrics.py:60-77)
    acc = np.diag(hist).sum() / hist.sum()
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    assert abs(res["acc"] - acc) < 1e-12
    np.testing.assert_allclose(res["iu"], iu)
    assert abs(res["mean_iu"] - np.nanmean(iu)) < 1e-12


def test_sliding_evaluator_matches_whole_image_on_small_input():
    """When the image fits one tile, sliding == whole-image prediction."""
    from mrfp_tpu.train.evaluator import SlidingEvaluator
    model = MRFP(trunk="resnet-18", variant="D32", wt_layer=(0,) * 7)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    ev = SlidingEvaluator(model, variables["params"],
                          variables.get("batch_stats", {}), crop_size=64)
    ds = SyntheticDataset(length=2, hw=(64, 64))
    res = ev.run(ds, log=lambda *a, **k: None)
    assert res["hist"].sum() == 2 * 64 * 64
    base = SegEvaluator(model, variables["params"],
                        variables.get("batch_stats", {}), bucket=64)
    res2 = base.run(ds, log=lambda *a, **k: None)
    np.testing.assert_array_equal(res["hist"], res2["hist"])


def test_sliding_evaluator_tiles_large_input():
    from mrfp_tpu.train.evaluator import SlidingEvaluator
    model = MRFP(trunk="resnet-18", variant="D32", wt_layer=(0,) * 7)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    ev = SlidingEvaluator(model, variables["params"],
                          variables.get("batch_stats", {}), crop_size=64,
                          stride_rate=0.75)
    ds = SyntheticDataset(length=1, hw=(96, 130))  # forces 2x3 tiling
    res = ev.run(ds, log=lambda *a, **k: None)
    assert res["hist"].sum() == 96 * 130
    assert 0.0 <= res["mean_iu"] <= 1.0


def test_evaluator_runs_and_pads():
    model = MRFP(trunk="resnet-18", variant="D32", wt_layer=(0,) * 7)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), train=False)
    ev = SegEvaluator(model, variables["params"],
                      variables.get("batch_stats", {}), bucket=32)
    ds = SyntheticDataset(length=2, hw=(40, 52))  # non-bucket-aligned
    res = ev.run(ds, log=lambda *a, **k: None)
    assert res["hist"].sum() == 2 * 40 * 52  # only real pixels counted
    assert 0.0 <= res["mean_iu"] <= 1.0
    assert res["dropped"] == 0
