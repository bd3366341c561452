"""DeepV3Plus zoo — DeepLabV3+ over any trunk with the whitening plan.

Re-design of network/deepv3.py:103-779: one model class parameterized by
trunk/variant/wt_layer, plus the reference's factory names (DeepR50V3PlusD,
DeepShuffleNetV3PlusD_OS8, ...). Differences from the reference, on purpose:

- network/deepv3.py:119 hard-overwrites the passed wt_layer with zeros
  (a latent bug that disables whitening in the zoo file); we honor the
  argument, which is the evident intent and what RobustNet upstream does.
- The ISW/IRW covariance state (network/cov_settings.py) is host-side numpy
  (nn/cov_settings.py); the model returns the collected whitening maps and
  ``covstat_update``/``whitening_loss_from_cov`` close the loop.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mrfp_tpu.nn.cov_settings import CovMatrixIRW, CovMatrixISW
from mrfp_tpu.nn.deeplab import ASPP, DSNHead, DeepLabDecoder
from mrfp_tpu.nn.layers import conv2d, kaiming_fan_in
from mrfp_tpu.nn.mobilenet import MobileNetV2
from mrfp_tpu.nn.resnet import (
    resnet18, resnet34, resnet50, resnet101, resnet152,
    resnext50_32x4d, resnext101_32x8d, wide_resnet50_2, wide_resnet101_2,
)
from mrfp_tpu.nn.seresnext import se_resnext50_32x4d, se_resnext101_32x4d
from mrfp_tpu.nn.shufflenet import ShuffleNetV2
from mrfp_tpu.ops.resize import resize_bilinear_align_corners
from mrfp_tpu.train.losses import instance_whitening_loss

# trunk -> (builder kind, per-slot channel dims for the cov machinery,
#           low_level/aux/final channels)
_TRUNKS = {
    "resnet-18": dict(kind="resnet", build=resnet18,
                      in_ch=(0, 0, 64, 64, 128, 256, 512)),
    "resnet-34": dict(kind="resnet", build=resnet34,
                      in_ch=(0, 0, 64, 64, 128, 256, 512)),
    "resnet-50": dict(kind="resnet", build=resnet50,
                      in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "resnet-101": dict(kind="resnet", build=resnet101,
                       in_ch=(64, 64, 128, 256, 512, 1024, 2048)),
    "resnet-152": dict(kind="resnet", build=resnet152,
                       in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "resnext-50": dict(kind="resnet", build=resnext50_32x4d,
                       in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "resnext-101": dict(kind="resnet", build=resnext101_32x8d,
                        in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "wide_resnet-50": dict(kind="resnet", build=wide_resnet50_2,
                           in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "wide_resnet-101": dict(kind="resnet", build=wide_resnet101_2,
                            in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "shufflenetv2": dict(kind="shufflenet", build=None,
                         in_ch=(0, 0, 24, 116, 232, 464, 1024)),
    "mobilenetv2": dict(kind="mobilenet", build=None,
                        in_ch=(0, 0, 16, 32, 64, 320, 1280)),
    "mnasnet_05": dict(kind="mnasnet", build=None, alpha=0.5,
                       in_ch=(0, 0, 8, 24, 48, 160, 1280)),
    "mnasnet_10": dict(kind="mnasnet", build=None, alpha=1.0,
                       in_ch=(0, 0, 16, 40, 96, 320, 1280)),
    "se_resnext-50": dict(kind="seresnext", build=se_resnext50_32x4d,
                          in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
    "se_resnext-101": dict(kind="seresnext", build=se_resnext101_32x4d,
                           in_ch=(0, 0, 64, 256, 512, 1024, 2048)),
}


def variant_os(variant: str) -> int:
    return {"D": 8, "D4": 4, "D16": 16}.get(variant, 32)


class DeepV3Plus(nn.Module):
    """DeepLabV3+ with per-slot whitening plan and DSN aux head."""

    num_classes: int = 19
    trunk: str = "resnet-101"
    variant: str = "D"
    wt_layer: Tuple[int, ...] = (0, 0, 0, 0, 0, 0, 0)
    use_dsn: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        spec = _TRUNKS[self.trunk]
        kind = spec["kind"]
        if kind == "resnet":
            self.backbone = spec["build"](wt_layer=self.wt_layer,
                                          variant=self.variant,
                                          dtype=self.dtype, name="backbone")
        elif kind == "mobilenet":
            self.backbone = MobileNetV2(wt_layer=self.wt_layer,
                                        variant=self.variant,
                                        dtype=self.dtype, name="backbone")
        elif kind == "shufflenet":
            self.backbone = ShuffleNetV2(wt_layer=self.wt_layer,
                                         variant=self.variant,
                                         dtype=self.dtype, name="backbone")
        elif kind == "mnasnet":
            from mrfp_tpu.nn.mnasnet import MNASNet
            self.backbone = MNASNet(alpha=spec["alpha"], variant=self.variant,
                                    dtype=self.dtype, name="backbone")
        else:  # seresnext (no iw instrumentation upstream either)
            self.backbone = spec["build"](dtype=self.dtype, name="backbone")
        self.aspp = ASPP(256, output_stride=variant_os(self.variant),
                         dtype=self.dtype, name="aspp")
        self.decoder = DeepLabDecoder(dtype=self.dtype, name="decoder")
        self.final2 = conv2d(self.num_classes, 1, bias=True,
                             kernel_init=kaiming_fan_in, dtype=self.dtype,
                             name="final2")
        if self.use_dsn:
            self.dsn = DSNHead(self.num_classes, dtype=self.dtype, name="dsn")

    def __call__(self, x, train: bool = False,
                 cal_covstat: bool = False, valid_hw=None) -> Dict[str, Any]:
        """``valid_hw``: see models.mrfp.MRFP.__call__ — valid extent (input
        pixels) for masked ASPP pooling under bucket-padded eval."""
        h, w = x.shape[1], x.shape[2]
        w_arr: list = []
        feat = self.backbone.stem(x, w_arr, train)
        feat = self.backbone.stage(0, feat, w_arr, train)
        low_level = feat
        feat = self.backbone.stage(1, feat, w_arr, train)
        feat = self.backbone.stage(2, feat, w_arr, train)
        aux_in = feat
        feat = self.backbone.stage(3, feat, w_arr, train)

        if cal_covstat:
            # statistics pass: only the whitening maps are needed
            # (network/deepv3.py:534-545)
            return {"w_arr": w_arr}

        if valid_hw is not None:
            os_ = variant_os(self.variant)
            valid_hw = (jnp.asarray(valid_hw, jnp.int32) + os_ - 1) // os_
        feat = self.aspp(feat, train, valid_hw=valid_hw)
        dec1 = self.decoder(feat, low_level, train)
        main_out = resize_bilinear_align_corners(self.final2(dec1), (h, w))
        out: Dict[str, Any] = {"logits": main_out.astype(jnp.float32),
                               "w_arr": w_arr}
        if self.use_dsn:
            out["dsn"] = self.dsn(aux_in, train).astype(jnp.float32)
        return out


def build_cov_layers(trunk: str, wt_layer: Sequence[int],
                     relax_denom: float = 0.0, clusters: int = 50) -> List:
    """Host-side ISW/IRW state per instrumented slot
    (network/deepv3.py:456-467)."""
    in_ch = _TRUNKS[trunk]["in_ch"]
    layers = []
    for i, code in enumerate(wt_layer):
        if code == 1:
            layers.append(CovMatrixIRW(dim=in_ch[i], relax_denom=relax_denom))
        elif code == 2:
            layers.append(CovMatrixISW(dim=in_ch[i], relax_denom=relax_denom,
                                       clusters=clusters))
    return layers


def covstat_update(cov_layers: List, w_arr: Sequence[jnp.ndarray],
                   eps: float = 1e-5) -> None:
    """One covstat accumulation step (network/deepv3.py:534-544): per
    whitening map, f_cor = f f^T/(HW-1) + eps*I over NHWC, variance of the
    off-diagonal over the batch."""
    for layer, f_map in zip(cov_layers, w_arr):
        f = np.asarray(f_map, np.float32)
        n, h, w, c = f.shape
        fm = f.reshape(n, h * w, c)
        f_cor = np.einsum("npc,npd->ncd", fm, fm) / (h * w - 1)
        f_cor += eps * np.eye(c, dtype=np.float32)
        off = f_cor * layer.reversal_eye if hasattr(layer, "reversal_eye") else f_cor
        layer.set_variance_of_covariance(np.var(off, axis=0, ddof=1))


def whitening_loss_from_cov(w_arr: Sequence[jnp.ndarray],
                            cov_layers: List) -> jnp.ndarray:
    """The train-time wt_loss (network/deepv3.py:561-568), averaged over maps."""
    mask_list, margins, nrcs = [], [], []
    for layer in cov_layers:
        _eye, mask, margin, nrc = layer.get_mask_matrix()
        mask_list.append(jnp.asarray(mask))
        nrcs.append(float(nrc))
        # per-layer margin: with relax_denom > 0 ISW/IRW layers carry
        # distinct margins (network/deepv3.py:561-568)
        margins.append(float(margin))
    loss = instance_whitening_loss(list(w_arr), mask_list, margins, nrcs)
    return loss / max(len(list(w_arr)), 1)


# --- reference factory names (network/deepv3.py:606-779) -------------------

def _factory(trunk: str, variant: str):
    def make(num_classes: int = 19, wt_layer=(0,) * 7, use_dsn: bool = True,
             dtype=None) -> DeepV3Plus:
        return DeepV3Plus(num_classes=num_classes, trunk=trunk,
                          variant=variant, wt_layer=tuple(wt_layer),
                          use_dsn=use_dsn, dtype=dtype)
    return make


DeepR18V3PlusD = _factory("resnet-18", "D")
DeepR50V3PlusD = _factory("resnet-50", "D16")
DeepR50V3PlusD_OS8 = _factory("resnet-50", "D")
DeepR101V3PlusD = _factory("resnet-101", "D16")
DeepR101V3PlusD_OS8 = _factory("resnet-101", "D")
DeepR152V3PlusD_OS8 = _factory("resnet-152", "D")
DeepResNext50V3PlusD = _factory("resnext-50", "D16")
DeepResNext101V3PlusD = _factory("resnext-101", "D16")
DeepResNext101V3PlusD_OS8 = _factory("resnext-101", "D")
DeepResNext101V3PlusD_OS4 = _factory("resnext-101", "D4")
DeepWideResNet50V3PlusD = _factory("wide_resnet-50", "D16")
DeepWideResNet50V3PlusD_OS8 = _factory("wide_resnet-50", "D")
DeepWideResNet101V3PlusD = _factory("wide_resnet-101", "D16")
DeepWideResNet101V3PlusD_OS8 = _factory("wide_resnet-101", "D")
DeepShuffleNetV3PlusD = _factory("shufflenetv2", "D16")
DeepShuffleNetV3PlusD_OS8 = _factory("shufflenetv2", "D")
DeepShuffleNetV3PlusD_OS32 = _factory("shufflenetv2", "D32")
DeepMobileNetV3PlusD = _factory("mobilenetv2", "D16")
DeepMobileNetV3PlusD_OS8 = _factory("mobilenetv2", "D")
DeepMNASNet05V3PlusD = _factory("mnasnet_05", "D16")
DeepMNASNet10V3PlusD = _factory("mnasnet_10", "D16")
DeepSEResNext50V3PlusD = _factory("se_resnext-50", "D16")
DeepSEResNext101V3PlusD = _factory("se_resnext-101", "D16")

MODEL_REGISTRY = {
    name: obj for name, obj in list(globals().items())
    if name.startswith("Deep") and callable(obj) and name != "DeepV3Plus"
}


def get_net(arch: str, **kw) -> DeepV3Plus:
    """network/__init__.py:13-23 equivalent: arch name -> model."""
    if arch not in MODEL_REGISTRY:
        raise ValueError(f"unknown arch {arch!r}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[arch](**kw)
