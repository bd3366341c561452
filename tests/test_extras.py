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
