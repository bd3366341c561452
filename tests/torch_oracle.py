"""Functional torch oracle of the reference MRFPPlus *eval* forward.

Implements the documented behavior of deepv3.py:280-367 with training=False
(perturbations inert) for trunk resnet-50, variant D16, wt_layer
[0,0,4,4,4,0,0] — driven entirely by a state_dict in the reference's key
format, so it doubles as the fixture for the checkpoint importer.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

R50_BLOCKS = (3, 4, 6, 3)
R50_PLANES = (64, 128, 256, 512)


def make_reference_state_dict(seed: int = 0, num_classes: int = 19,
                              prefix: str = "module.") -> dict:
    """Random state_dict with the reference MRFPPlus key names and shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def t(*shape, scale=0.1):
        if len(shape) == 4:  # conv: unit-gain scaling keeps 50-layer
            scale = 1.0 / np.sqrt(shape[1] * shape[2] * shape[3])  # activations sane
        return torch.from_numpy(
            (scale * rng.standard_normal(shape)).astype(np.float32))

    def add_bn(name, c):
        sd[name + ".weight"] = 1.0 + 0.1 * t(c)
        sd[name + ".bias"] = 0.1 * t(c)
        sd[name + ".running_mean"] = 0.1 * t(c)
        sd[name + ".running_var"] = torch.abs(1.0 + 0.1 * t(c))
        sd[name + ".num_batches_tracked"] = torch.tensor(100)

    # stem: conv 7x7 + InstanceNorm(64, affine) (wt_layer[2]=4)
    sd["layer0.0.weight"] = t(64, 3, 7, 7)
    sd["layer0.1.weight"] = 1.0 + 0.1 * t(64)
    sd["layer0.1.bias"] = 0.1 * t(64)

    in_ch = 64
    for li, (blocks, planes) in enumerate(zip(R50_BLOCKS, R50_PLANES), start=1):
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
            # iw=4 on the LAST block of layer1 & layer2 (wt_layer[3]=[4]=4)
            if li in (1, 2) and b == blocks - 1:
                sd[p + ".instance_norm_layer.weight"] = 1.0 + 0.1 * t(out_ch)
                sd[p + ".instance_norm_layer.bias"] = 0.1 * t(out_ch)
        in_ch = out_ch

    # ASPP
    sd["aspp.features.0.0.weight"] = t(256, 2048, 1, 1)
    add_bn("aspp.features.0.1", 256)
    for i in range(1, 4):
        sd[f"aspp.features.{i}.0.weight"] = t(256, 2048, 3, 3)
        add_bn(f"aspp.features.{i}.1", 256)
    sd["aspp.img_conv.0.weight"] = t(256, 2048, 1, 1)
    add_bn("aspp.img_conv.1", 256)

    sd["bot_fine.0.weight"] = t(48, 256, 1, 1)
    add_bn("bot_fine.1", 48)
    sd["bot_aspp.0.weight"] = t(256, 1280, 1, 1)
    add_bn("bot_aspp.1", 256)
    sd["final1.0.weight"] = t(256, 304, 3, 3)
    add_bn("final1.1", 256)
    sd["final1.3.weight"] = t(256, 256, 3, 3)
    add_bn("final1.4", 256)
    sd["final2.0.weight"] = t(num_classes, 256, 1, 1)
    sd["final2.0.bias"] = 0.1 * t(num_classes)

    # frozen OC branch tensors (unused at eval, exercised by the importer)
    oc_specs = [("OClayer1", 64, 64), ("OClayer2", 64, 64), ("OClayer3", 128, 64),
                ("OClayer4", 256, 128), ("OCdeclayer1", 128, 256),
                ("OCdeclayer2", 64, 128), ("OCdeclayer3", 64, 64),
                ("OCdeclayer4", 64, 64)]
    bn_names = ["OC1_bn", "OC2_bn", "OC3_bn", "OC4_bn",
                "OC1_decbn", "OC2_decbn", "OC3_decbn", "OC4_decbn"]
    for (name, cout, cin), bnn in zip(oc_specs, bn_names):
        sd[name + ".weight"] = t(cout, cin, 3, 3)
        sd[name + ".bias"] = 0.01 * t(cout)
        add_bn(bnn, cout)

    return {prefix + k: v for k, v in sd.items()}


_TRAIN_MODE = {"on": False}


def _bn(x, sd, name):
    if _TRAIN_MODE["on"]:
        # train-mode BN: batch stats normalize; running buffers are cloned so
        # repeated oracle calls stay pure
        return F.batch_norm(x, sd[name + ".running_mean"].clone(),
                            sd[name + ".running_var"].clone(),
                            sd[name + ".weight"], sd[name + ".bias"],
                            training=True, eps=1e-5)
    return F.batch_norm(x, sd[name + ".running_mean"], sd[name + ".running_var"],
                        sd[name + ".weight"], sd[name + ".bias"],
                        training=False, eps=1e-5)


def _inorm(x, sd, name):
    return F.instance_norm(x, weight=sd[name + ".weight"],
                           bias=sd[name + ".bias"], eps=1e-5)


def _bottleneck(x, sd, p, stride, dilation, has_ds, has_in,
                inject_site=None, inject_val=None):
    """inject_site/val mirror Bottleneckmatchstick (Resnet.py:229-334):
    site 1 adds to conv1's input (residual/downsample read the unperturbed
    x), site 2 adds to conv2's input."""
    c1_in = x + inject_val if inject_site == 1 else x
    out = F.relu(_bn(F.conv2d(c1_in, sd[p + ".conv1.weight"]), sd, p + ".bn1"))
    if inject_site == 2:
        out = out + inject_val
    out = F.relu(_bn(F.conv2d(out, sd[p + ".conv2.weight"], stride=stride,
                              padding=dilation, dilation=dilation), sd, p + ".bn2"))
    out = _bn(F.conv2d(out, sd[p + ".conv3.weight"]), sd, p + ".bn3")
    res = x
    if has_ds:
        res = _bn(F.conv2d(x, sd[p + ".downsample.0.weight"], stride=stride),
                  sd, p + ".downsample.1")
    out = out + res
    if has_in:
        out = _inorm(out, sd, p + ".instance_norm_layer")
    return F.relu(out)


def _up(x, size):
    return F.interpolate(x, size=size, mode="bilinear", align_corners=True)


def reference_train_forward(sd: dict, x: torch.Tensor) -> torch.Tensor:
    """Train-mode logits with all perturbation gates OFF (p,p2,p3 >= 0.5):
    identical graph to eval but BNs normalize with batch statistics."""
    _TRAIN_MODE["on"] = True
    try:
        return reference_eval_forward(sd, x)
    finally:
        _TRAIN_MODE["on"] = False


def _strip(sd: dict) -> dict:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _stem(sd, x):
    x = F.conv2d(x, sd["layer0.0.weight"], stride=2, padding=3)
    x = _inorm(x, sd, "layer0.1")
    x = F.relu(x)
    return F.max_pool2d(x, 3, stride=2, padding=1)


def _stage(sd, x, li, inject=None):
    """One ResNet-50 D16 stage (layer1..layer4). ``inject``:
    (block, site, tensor) matchstick perturbation."""
    blocks = R50_BLOCKS[li - 1]
    stage_stride = 1 if li in (1, 4) else 2     # D16: layer4 stride 1
    for b in range(blocks):
        stride = stage_stride if b == 0 else 1
        has_ds = b == 0  # every stage's first block has a projection
        has_in = li in (1, 2) and b == blocks - 1
        site, val = (inject[1], inject[2]) \
            if inject is not None and inject[0] == b else (None, None)
        x = _bottleneck(x, sd, f"layer{li}.{b}", stride,
                        2 if li == 4 else 1, has_ds, has_in,
                        inject_site=site, inject_val=val)
    return x


def _heads(sd, x, low_level):
    """ASPP (image pooling first, then 1x1, then dilated 6/12/18) + decoder
    up to dec1 (deepv3.py:347-354)."""
    size = x.shape[2:]
    img = x.mean((2, 3), keepdim=True)
    img = F.relu(_bn(F.conv2d(img, sd["aspp.img_conv.0.weight"]),
                     sd, "aspp.img_conv.1"))
    outs = [_up(img, size)]
    outs.append(F.relu(_bn(F.conv2d(x, sd["aspp.features.0.0.weight"]),
                           sd, "aspp.features.0.1")))
    for i, r in enumerate((6, 12, 18), start=1):
        outs.append(F.relu(_bn(
            F.conv2d(x, sd[f"aspp.features.{i}.0.weight"], padding=r, dilation=r),
            sd, f"aspp.features.{i}.1")))
    x = torch.cat(outs, 1)

    dec0_up = F.relu(_bn(F.conv2d(x, sd["bot_aspp.0.weight"]), sd, "bot_aspp.1"))
    dec0_fine = F.relu(_bn(F.conv2d(low_level, sd["bot_fine.0.weight"]),
                           sd, "bot_fine.1"))
    dec0_up = _up(dec0_up, low_level.shape[2:])
    dec0 = torch.cat([dec0_fine, dec0_up], 1)
    dec1 = F.relu(_bn(F.conv2d(dec0, sd["final1.0.weight"], padding=1),
                      sd, "final1.1"))
    dec1 = F.relu(_bn(F.conv2d(dec1, sd["final1.3.weight"], padding=1),
                      sd, "final1.4"))
    return dec1


def reference_eval_forward(sd: dict, x: torch.Tensor) -> torch.Tensor:
    """Eval logits for NCHW input (MRFPPlus.forward with training=False)."""
    sd = _strip(sd)
    h, w = x.shape[2], x.shape[3]
    x = _stem(sd, x)
    x = _stage(sd, x, 1)
    low_level = x
    for li in (2, 3, 4):
        x = _stage(sd, x, li)
    dec1 = _heads(sd, x, low_level)
    dec2 = F.conv2d(dec1, sd["final2.0.weight"], sd["final2.0.bias"])
    return _up(dec2, (h, w))


# --- gates-ON train forward (deepv3.py:280-367) -----------------------------

def np_plus_injected(feat: torch.Tensor, alpha: torch.Tensor,
                     beta_noise: torch.Tensor,
                     scale_mult: float = 1.5) -> torch.Tensor:
    """Normalization_Perturbation_Plus (deepv3.py:268-277) with the two
    normal draws injected (alpha ~ N(1,0.75), beta_noise ~ N(0,0.75), both
    (B,C,1,1)) so jax and torch can be driven with identical randomness."""
    feat_mean = feat.mean((2, 3), keepdim=True)
    mean_diff = torch.std(feat_mean, 0, keepdim=True)  # unbiased, like ref
    mean_scale = mean_diff / mean_diff.max() * scale_mult
    beta = 1 + beta_noise * mean_scale
    return alpha * feat - alpha * feat_mean + beta * feat_mean


def _oc_stage(sd, x, conv, bn, dilation, scale=None, size=None):
    """conv -> nearest interpolate -> train-mode BN -> ReLU, the reference's
    per-layer OC pattern (deepv3.py:320-327)."""
    w, b = sd[conv + ".weight"], sd[conv + ".bias"]
    y = F.conv2d(x, w, b, padding=dilation, dilation=dilation)
    y = F.interpolate(y, scale_factor=scale, size=size)  # mode='nearest'
    c = w.shape[0]
    y = F.batch_norm(y, torch.zeros(c), torch.ones(c), sd[bn + ".weight"],
                     sd[bn + ".bias"], training=True, eps=1e-5)
    return F.relu(y)


def reference_train_forward_perturbed(
        sd: dict, x: torch.Tensor, np_noise: dict,
        gate_oc: bool, gate_np: bool, gate_dec: bool) -> torch.Tensor:
    """The FULL perturbed train forward (deepv3.py:280-367): OC stem
    injection (p), NP+ after layer0 and layer1 (p2), OC decoder injection at
    half resolution (p3). ``np_noise`` holds the injected NP+ draws:
    alpha0/beta0 (B,64,1,1) for the stem site, alpha1/beta1 (B,256,1,1) for
    the layer1 site. OC weights come from sd's OC* tensors (frozen branch)."""
    import math

    sd = _strip(sd)
    h, w = x.shape[2], x.shape[3]
    _TRAIN_MODE["on"] = True
    try:
        x = _stem(sd, x)
        xp = x
        if gate_np:
            x = np_plus_injected(xp, np_noise["alpha0"], np_noise["beta0"])

        # OC branch always computes from the UNPERTURBED stem xp
        # (deepv3.py:320-327)
        oc = _oc_stage(sd, xp, "OClayer1", "OC1_bn", 1, scale=(1.205, 1.205))
        oc = _oc_stage(sd, oc, "OClayer2", "OC2_bn", 1, scale=(1.2, 1.2))
        oc = _oc_stage(sd, oc, "OClayer3", "OC3_bn", 2, scale=(1.2, 1.2))
        oc_dec = _oc_stage(sd, oc, "OClayer4", "OC4_bn", 2,
                           size=(int(h / 2), int(w / 2)))
        oc = _oc_stage(sd, oc_dec, "OCdeclayer1", "OC1_decbn", 1,
                       size=(int(h / 2), int(w / 2)))
        oc = _oc_stage(sd, oc, "OCdeclayer2", "OC2_decbn", 1,
                       scale=(0.838, 0.838))
        oc = _oc_stage(sd, oc, "OCdeclayer3", "OC3_decbn", 2,
                       scale=(0.798, 0.798))
        ocout = _oc_stage(sd, oc, "OCdeclayer4", "OC4_decbn", 2,
                          size=(math.ceil(h / 4), math.ceil(w / 4)))
        if gate_oc:
            x = ocout + x

        x = _stage(sd, x, 1)
        if gate_np:
            x = np_plus_injected(x, np_noise["alpha1"], np_noise["beta1"])
        low_level = x
        for li in (2, 3, 4):
            x = _stage(sd, x, li)
        dec1 = _heads(sd, x, low_level)
        if gate_dec:
            dec1 = _up(dec1, (int(h / 2), int(w / 2)))
            dec1 = oc_dec + dec1
        dec2 = F.conv2d(dec1, sd["final2.0.weight"], sd["final2.0.bias"])
        return _up(dec2, (h, w))
    finally:
        _TRAIN_MODE["on"] = False
