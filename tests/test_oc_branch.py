"""OC branch parity vs a torch oracle built from the documented behavior.

The oracle applies, per layer: conv3x3(pad=dil, dil) -> F.interpolate
(default nearest) -> train-mode BatchNorm -> ReLU, with the exact scale/size
chain of deepv3.py:320-327. Our params are copied into the torch modules
(HWIO -> OIHW), so any mismatch in conv padding, resize rule, or BN moment
semantics fails loudly.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from mrfp_tpu.perturb.oc_branch import _LAYERS, oc_apply, oc_init, oc_maybe_resample


def _torch_stage(p, x, dilation, scale=None, size=None):
    w = torch.from_numpy(np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)))
    b = torch.from_numpy(np.asarray(p["bias"]))
    y = F.conv2d(x, w, b, stride=1, padding=dilation, dilation=dilation)
    y = F.interpolate(y, size=size, scale_factor=scale)
    gamma = torch.from_numpy(np.asarray(p["bn_scale"]))
    beta = torch.from_numpy(np.asarray(p["bn_bias"]))
    y = F.batch_norm(y, None, None, gamma, beta, training=True, eps=1e-5)
    return F.relu(y)


def _torch_oc(params, xp_nhwc, h, w):
    x = torch.from_numpy(np.transpose(xp_nhwc, (0, 3, 1, 2)))
    dil = {name: d for name, _i, _o, d in _LAYERS}
    x = _torch_stage(params["enc1"], x, dil["enc1"], scale=(1.205, 1.205))
    x = _torch_stage(params["enc2"], x, dil["enc2"], scale=(1.2, 1.2))
    x = _torch_stage(params["enc3"], x, dil["enc3"], scale=(1.2, 1.2))
    oc_dec = _torch_stage(params["enc4"], x, dil["enc4"], size=(int(h / 2), int(w / 2)))
    x = _torch_stage(params["dec1"], oc_dec, dil["dec1"], size=(int(h / 2), int(w / 2)))
    x = _torch_stage(params["dec2"], x, dil["dec2"], scale=(0.838, 0.838))
    x = _torch_stage(params["dec3"], x, dil["dec3"], scale=(0.798, 0.798))
    x = _torch_stage(params["dec4"], x, dil["dec4"],
                     size=(math.ceil(h / 4), math.ceil(w / 4)))
    to_nhwc = lambda t: np.transpose(t.numpy(), (0, 2, 3, 1))
    return to_nhwc(x), to_nhwc(oc_dec)


@pytest.mark.parametrize("h,w", [(64, 64), (96, 64)])
def test_oc_parity(h, w):
    params = oc_init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xp = rng.standard_normal((2, h // 4, w // 4, 64)).astype(np.float32)

    ours_out, ours_dec = oc_apply(params, jnp.asarray(xp), (h, w))
    ref_out, ref_dec = _torch_oc(params, xp, h, w)

    assert ours_out.shape == ref_out.shape
    assert ours_dec.shape == ref_dec.shape
    np.testing.assert_allclose(np.asarray(ours_dec), ref_dec, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_out), ref_out, atol=2e-4, rtol=1e-3)


def test_oc_init_statistics():
    """Kaiming fan_in std for convs; N(0,0.5) BN gamma (mynn.py:57-74)."""
    params = oc_init(jax.random.PRNGKey(42))
    k = np.asarray(params["enc4"]["kernel"])  # 128 -> 256, fan_in = 128*9
    assert abs(k.std() - math.sqrt(2.0 / (128 * 9))) < 0.002
    g = np.concatenate([np.asarray(params[n]["bn_scale"]) for n in params])
    assert abs(g.std() - 0.5) < 0.05
    assert all(np.all(np.asarray(params[n]["bias"]) == 0) for n in params)


def test_oc_resample_gate():
    p0 = oc_init(jax.random.PRNGKey(0))
    kept = oc_maybe_resample(p0, jnp.array(False), jax.random.PRNGKey(1))
    resampled = oc_maybe_resample(p0, jnp.array(True), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(kept["enc1"]["kernel"]),
                                  np.asarray(p0["enc1"]["kernel"]))
    assert not np.allclose(np.asarray(resampled["enc1"]["kernel"]),
                           np.asarray(p0["enc1"]["kernel"]))
