"""Coverage for the remaining capability components: gradient reversal,
MNASNet trunks, joint transforms, boundary relaxation."""

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from mrfp_tpu.nn.grad_reversal import grad_reverse
from mrfp_tpu.data.joint_transforms import (
    ClassUniform,
    MaskToTensor,
    RelaxedBoundaryLossToTensor,
    SlidingCrop,
    find_boundaries_thick,
)


def test_grad_reverse():
    f = lambda x: jnp.sum(grad_reverse(x, 2.0) ** 1)
    g = jax.grad(f)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -2.0 * np.ones(4))
    y = grad_reverse(jnp.arange(3.0), 2.0)
    np.testing.assert_allclose(np.asarray(y), np.arange(3.0))  # identity fwd


def test_mnasnet_zoo():
    from mrfp_tpu.models.deepv3_zoo import DeepMNASNet10V3PlusD
    m = DeepMNASNet10V3PlusD(use_dsn=False)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vs = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(vs, x, train=False, mutable=False)
    assert out["logits"].shape == (1, 32, 32, 19)


def _pair(w=300, h=280):
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    lbl = rng.integers(0, 19, (h, w)).astype(np.uint8)
    lbl[50:120, 60:200] = 15  # a "bus" region for class-uniform peaks
    return img, Image.fromarray(lbl)


def test_class_uniform_crop_size():
    import random
    img, lbl = _pair()
    cu = ClassUniform(128, crop_nopad=False, ignore_index=255,
                      rng=random.Random(0))
    for _ in range(3):
        ci, cl = cu(img, lbl)
        assert ci.size == (128, 128) and cl.size == (128, 128)


def test_sliding_crop_tiles_cover():
    img, lbl = _pair(300, 280)
    sc = SlidingCrop(crop_size=128, stride_rate=0.75, ignore_label=255)
    imgs, masks, slices = sc(img, lbl)
    assert len(imgs) == len(masks) == len(slices) > 1
    assert all(i.size == (128, 128) for i in imgs)
    ymax = max(s[1] for s in slices)
    xmax = max(s[3] for s in slices)
    assert ymax == 280 and xmax == 300


def test_relaxed_boundary_one_hot():
    lbl = np.zeros((10, 10), np.uint8)
    lbl[:, 5:] = 3
    lbl[0, 0] = 255  # ignore
    t = RelaxedBoundaryLossToTensor(ignore_id=255, num_classes=19,
                                    border_window=1)
    oh = t(Image.fromarray(lbl))
    assert oh.shape == (20, 10, 10)
    # boundary column sees both classes
    assert oh[0, 5, 4] == 1 and oh[3, 5, 4] == 1
    # interior is one-hot
    assert oh[0, 5, 1] == 1 and oh[3, 5, 1] == 0
    # ignore pixel maps to the extra channel
    assert oh[19, 0, 0] == 1


def test_find_boundaries_thick():
    lbl = np.zeros((6, 6), np.int32)
    lbl[:, 3:] = 1
    b = find_boundaries_thick(lbl)
    assert b[:, 2].all() and b[:, 3].all()
    assert not b[:, 0].any() and not b[:, 5].any()


def test_mask_to_tensor():
    lbl = Image.fromarray(np.arange(16, dtype=np.uint8).reshape(4, 4))
    out = MaskToTensor()(lbl)
    assert out.dtype == np.int64 and out.shape == (4, 4)


def test_relaxed_multihot_matches_host_transform():
    """The device-side relaxed target (train/losses.relaxed_multihot, the
    jointwtborder consumer) must reproduce RelaxedBoundaryLossToTensor
    exactly — including the reduce-border window halving + boundary
    weight 2, strict classes, and the ignore channel. Host encoding is
    allowed(0/1) * weight(1/2) on every channel."""
    import jax.numpy as jnp

    from mrfp_tpu.train.losses import relaxed_multihot

    rng = np.random.default_rng(5)
    lbl = rng.integers(0, 19, (16, 16)).astype(np.uint8)
    lbl[0, :3] = 255
    for border, reduce_iter, cur, strict in (
            (1, -1, 0, None), (2, -1, 0, None),
            (2, 10, 20, None), (2, 10, 20, (3, 7)), (1, 10, 5, (0,))):
        t = RelaxedBoundaryLossToTensor(
            ignore_id=255, num_classes=19, border_window=border,
            strict_classes=strict, reduce_border_iter=reduce_iter,
            cur_iter=cur)
        host = t(Image.fromarray(lbl))  # (C+1, H, W) in {0,1,2}
        reduce_now = reduce_iter != -1 and cur > reduce_iter
        allowed, weight = relaxed_multihot(
            jnp.asarray(lbl.astype(np.int32)), 19, 255, border,
            jnp.asarray(reduce_now), strict)
        dev = np.moveaxis(np.asarray(allowed, np.uint8)
                          * np.asarray(weight, np.uint8)[..., None], -1, 0)
        np.testing.assert_array_equal(dev, host, err_msg=str(
            (border, reduce_iter, cur, strict)))


def test_relaxed_cross_entropy_semantics():
    """border=0 reduces to plain CE; with a window, logits that put mass on
    a neighboring class at the border are penalized less than under plain
    CE (the objective's point)."""
    import jax.numpy as jnp

    from mrfp_tpu.train.losses import cross_entropy, relaxed_cross_entropy

    rng = np.random.default_rng(0)
    lbl = np.zeros((1, 8, 8), np.int32)
    lbl[:, :, 4:] = 1
    lbl[0, 0, 0] = 255
    logits = jnp.asarray(rng.standard_normal((1, 8, 8, 19)), jnp.float32)
    plain = cross_entropy(logits, jnp.asarray(lbl), 255)
    r0 = relaxed_cross_entropy(logits, jnp.asarray(lbl), 19, 255,
                               border=0, reduce_now=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(r0), np.asarray(plain), rtol=1e-6)
    r1 = relaxed_cross_entropy(logits, jnp.asarray(lbl), 19, 255,
                               border=1, reduce_now=jnp.asarray(False))
    assert float(r1) < float(plain)  # relaxation can only lower the NLL
