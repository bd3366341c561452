"""torchvision-format ImageNet checkpoint import (Resnet.py:647-660 loads
model-zoo resnet50 weights through forgiving_state_restore: matching-shape
tensors load, iw-replaced norms skip their mismatched buffers)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mrfp_tpu.models import MRFP
from mrfp_tpu.train.import_torch import convert_state_dict

R50_BLOCKS = (3, 4, 6, 3)
R50_PLANES = (64, 128, 256, 512)


def _tv_resnet50_state_dict(seed=0):
    """Synthetic state_dict with torchvision resnet50 key names."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(*shape):
        return torch.from_numpy(
            rng.standard_normal(shape).astype(np.float32))

    def add_bn(name, c):
        sd[name + ".weight"] = t(c)
        sd[name + ".bias"] = t(c)
        sd[name + ".running_mean"] = t(c)
        sd[name + ".running_var"] = torch.abs(t(c)) + 0.5
        sd[name + ".num_batches_tracked"] = torch.tensor(1)

    sd["conv1.weight"] = t(64, 3, 7, 7)
    add_bn("bn1", 64)
    in_ch = 64
    for li, (blocks, planes) in enumerate(zip(R50_BLOCKS, R50_PLANES), 1):
        out_ch = planes * 4
        for b in range(blocks):
            p = f"layer{li}.{b}"
            sd[p + ".conv1.weight"] = t(planes, in_ch if b == 0 else out_ch, 1, 1)
            add_bn(p + ".bn1", planes)
            sd[p + ".conv2.weight"] = t(planes, planes, 3, 3)
            add_bn(p + ".bn2", planes)
            sd[p + ".conv3.weight"] = t(out_ch, planes, 1, 1)
            add_bn(p + ".bn3", out_ch)
            if b == 0:
                sd[p + ".downsample.0.weight"] = t(out_ch, in_ch, 1, 1)
                add_bn(p + ".downsample.1", out_ch)
        in_ch = out_ch
    sd["fc.weight"] = t(1000, 2048)
    sd["fc.bias"] = t(1000)
    return sd


def test_torchvision_import_into_mrfp_backbone():
    sd = _tv_resnet50_state_dict()
    model = MRFP(trunk="resnet-50", variant="D16")  # wt_layer (0,0,4,4,4,0,0)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, stats, oc, report = convert_state_dict(sd, variables)

    # conv1 loads with OIHW->HWIO transpose
    np.testing.assert_allclose(
        params["backbone"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    # a mid-block conv loads
    np.testing.assert_allclose(
        params["backbone"]["layer3"]["block2"]["conv2"]["kernel"],
        np.transpose(sd["layer3.2.conv2.weight"].numpy(), (2, 3, 1, 0)))
    # bn stats land in batch_stats
    np.testing.assert_allclose(
        stats["backbone"]["layer1"]["block0"]["bn1"]["var"],
        sd["layer1.0.bn1.running_var"].numpy())
    # stem norm is InstanceNorm(affine) here: bn1 gamma/beta load into its
    # scale/bias (shape matches); running stats are skipped like the
    # reference's forgiving restore
    np.testing.assert_allclose(params["backbone"]["bn1_iw"]["scale"],
                               sd["bn1.weight"].numpy())
    skipped = "\n".join(report["skipped"])
    assert "bn1" in skipped  # running stats of the replaced stem norm
    assert "fc" in skipped   # classifier head has no target


def test_iw_blocks_keep_init_when_absent_from_checkpoint():
    """The instance_norm_layer params don't exist in ImageNet checkpoints;
    they keep their fresh init (ones/zeros)."""
    sd = _tv_resnet50_state_dict()
    model = MRFP(trunk="resnet-50", variant="D16")
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    params, _stats, _oc, _rep = convert_state_dict(sd, variables)
    inl = params["backbone"]["layer1"]["block2"]["instance_norm_layer"]
    np.testing.assert_array_equal(inl["scale"], np.ones(256, np.float32))
    np.testing.assert_array_equal(inl["bias"], np.zeros(256, np.float32))
