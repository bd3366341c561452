"""MRFP / MRFP+ / plain DeepLabV3+ — the paper's model family.

Faithful re-design of deepv3.py:152-367 (MRFPPlus) and :370-489
(simpleDeepV3Plus). The three stochastic gates (p, p2, p3 — drawn host-side
per batch in the reference, deepv3.py:281-283) arrive as traced booleans in
``PerturbArgs`` so one compiled program covers all 8 gate combinations; the
decoder-resolution switch (p3 changes the final2 input resolution,
deepv3.py:355-360) is a ``nn.cond`` so only one branch executes per step.

Eval (train=False) skips the perturbation machinery at the Python level —
the compiled eval graph is *exactly* the plain DeepLabV3+ forward the
reference runs with training=False (it computes-then-discards the OC branch,
main-path parity is unaffected; we simply don't burn the FLOPs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from mrfp_tpu.nn.deeplab import ASPP, DSNHead, DeepLabDecoder
from mrfp_tpu.nn.layers import PointwiseConv, kaiming_fan_in
from mrfp_tpu.nn.resnet import (
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    variant_output_stride,
    wide_resnet50_2,
    wide_resnet101_2,
)
from mrfp_tpu.ops.resize import resize_bilinear_align_corners
from mrfp_tpu.perturb.np_plus import normalization_perturbation_plus
from mrfp_tpu.perturb.oc_branch import OCParams, oc_decode, oc_encode

_RESNET_BUILDERS = {
    "resnet-18": resnet18,
    "resnet-34": resnet34,
    "resnet-50": resnet50,
    "resnet-101": resnet101,
    "resnet-152": resnet152,
    "resnext-50": resnext50_32x4d,
    "resnext-101": resnext101_32x8d,
    "wide_resnet-50": wide_resnet50_2,
    "wide_resnet-101": wide_resnet101_2,
}


@flax.struct.dataclass
class PerturbArgs:
    """Per-step stochastic inputs for the MRFP forward (all traced)."""

    gate_oc: jax.Array      # bool: p < 0.5  — OC stem injection
    gate_np: jax.Array      # bool: p2 < 0.5 — NP+ after layer0 and layer1
    gate_dec: jax.Array     # bool: p3 < 0.5 — OC decoder injection (MRFP+)
    key_np0: jax.Array
    key_np1: jax.Array
    oc_params: OCParams


class MRFP(nn.Module):
    """DeepLabV3+ with multi-resolution feature perturbation.

    With ``perturb=None`` (or train=False) this IS simpleDeepV3Plus — the
    no-perturbation baseline shares every trainable parameter and the eval
    graph with MRFP+ (as in the reference, where the OC branch is frozen and
    external to the checkpointed behavior at eval).
    """

    num_classes: int = 19
    trunk: str = "resnet-50"
    variant: str = "D16"
    wt_layer: Tuple[int, ...] = (0, 0, 4, 4, 4, 0, 0)
    hrfp_plus: bool = True           # allow p3 decoder injection
    use_dsn: bool = False
    np_std: float = 0.75
    np_scale: float = 1.5
    oc_scales_enc: Tuple[float, ...] = (1.205, 1.2, 1.2)
    oc_scales_dec: Tuple[float, ...] = (0.838, 0.798)
    remat: bool = False              # rematerialize backbone stages
    oc_conditional: bool = True      # lax.cond-skip unused OC halves
    dtype: Optional[Any] = None      # compute dtype for convs (bf16 on TPU)
    logits_fp32: bool = False        # False: keep train logits in `dtype`
    # (CE upcasts per-element inside its fusion; halves the HBM traffic of
    # the full-res logit maps in a bandwidth-bound step). fp32 models
    # (dtype=None) always emit fp32 logits.

    def setup(self):
        if self.trunk not in _RESNET_BUILDERS:
            raise ValueError(f"unsupported trunk {self.trunk!r} for MRFP "
                             f"(zoo trunks live in models.deepv3_zoo)")
        self.backbone = _RESNET_BUILDERS[self.trunk](
            wt_layer=self.wt_layer, variant=self.variant, remat=self.remat,
            dtype=self.dtype, name="backbone")
        os = variant_output_stride(self.variant)
        self.aspp = ASPP(256, output_stride=os, dtype=self.dtype, name="aspp")
        self.decoder = DeepLabDecoder(dtype=self.dtype, name="decoder")
        self.final2 = PointwiseConv(self.num_classes,
                                    kernel_init=kaiming_fan_in,
                                    dtype=self.dtype, name="final2")
        if self.use_dsn:
            self.dsn = DSNHead(self.num_classes, dtype=self.dtype, name="dsn")

    def __call__(self, x, train: bool = False,
                 perturb: Optional[PerturbArgs] = None,
                 valid_hw=None) -> Dict[str, Any]:
        """``valid_hw`` (traced int32 [2], input-pixel coords): valid extent
        when ``x`` was bottom/right zero-padded to a shape bucket — restricts
        ASPP's image-level pooling to real pixels (eval protocol parity,
        main.py:896). None (the default) = the whole image is valid."""
        h, w = x.shape[1], x.shape[2]
        w_arr: list = []
        perturbing = train and perturb is not None

        # --- layer0 / stem (deepv3.py:309-316) ---
        xp = self.backbone.stem(x, w_arr, train)

        if perturbing:
            # NP+ reads the *unperturbed* stem features xp (deepv3.py:317-318)
            x_np = normalization_perturbation_plus(
                perturb.key_np0, xp, self.np_std, self.np_scale)
            feat = jnp.where(perturb.gate_np, x_np, xp)
            # OC branch also reads xp (deepv3.py:320). The reference computes
            # the whole branch every step and then uses OCout only when p
            # fires and OCout_dec only when p3 fires; computing the halves
            # under lax.cond skips the dead work (no observable difference —
            # the skipped outputs were discarded) and saves ~30% of the OC
            # FLOPs in expectation at p=p3=0.5.
            dtype = self.dtype or jnp.float32
            if self.oc_conditional:
                # two cond boundaries measured fastest on TPU (round-1 A/B:
                # 181 ms vs 186 single-switch vs 189 unconditional; re-run
                # at the round-2 program: 137 ms two-cond vs 184 ms
                # unconditional, 40-step avg at p=0.5 gates). NP+ stays a
                # where-select: gating it under cond measured 57.5 vs 58.3
                # img/s (boundary copies exceed the skipped moment math).
                oc_dec_shape = (xp.shape[0], int(h / 2), int(w / 2), 256)
                oc_dec = jax.lax.cond(
                    jnp.logical_or(perturb.gate_oc, perturb.gate_dec),
                    lambda: oc_encode(perturb.oc_params, xp, (h, w),
                                      self.oc_scales_enc, dtype),
                    lambda: jnp.zeros(oc_dec_shape, xp.dtype))
                ocout = jax.lax.cond(
                    perturb.gate_oc,
                    lambda: oc_decode(perturb.oc_params, oc_dec, (h, w),
                                      self.oc_scales_dec, dtype),
                    lambda: jnp.zeros(xp.shape, xp.dtype))
            else:
                # unconditional (reference-style always-compute); XLA can
                # fuse/overlap freely across the whole graph
                oc_dec = oc_encode(perturb.oc_params, xp, (h, w),
                                   self.oc_scales_enc, dtype)
                ocout = oc_decode(perturb.oc_params, oc_dec, (h, w),
                                  self.oc_scales_dec, dtype)
            feat = jnp.where(perturb.gate_oc, ocout + feat, feat)
        else:
            feat = xp

        # --- backbone stages (deepv3.py:332-342) ---
        feat = self.backbone.stage(0, feat, w_arr, train)
        if perturbing:
            feat_np = normalization_perturbation_plus(
                perturb.key_np1, feat, self.np_std, self.np_scale)
            feat = jnp.where(perturb.gate_np, feat_np, feat)
        low_level = feat
        feat = self.backbone.stage(1, feat, w_arr, train)
        feat = self.backbone.stage(2, feat, w_arr, train)
        aux_in = feat
        feat = self.backbone.stage(3, feat, w_arr, train)

        # --- heads (deepv3.py:347-354) ---
        if valid_hw is not None:
            os_ = variant_output_stride(self.variant)
            valid_hw = (jnp.asarray(valid_hw, jnp.int32) + os_ - 1) // os_
        feat = self.aspp(feat, train, valid_hw=valid_hw)
        dec1 = self.decoder(feat, low_level, train)

        # --- final classifier, p3-gated resolution switch (deepv3.py:355-361) ---
        if perturbing and self.hrfp_plus:
            half = (int(h / 2), int(w / 2))

            def _with_dec(m):
                # Commuted form: final2 (1x1, linear) commutes with the
                # bilinear resize — W(resize(dec1)+oc_dec)+b ==
                # resize(W dec1 + b) + (W oc_dec + b) - b — so classify to
                # 19 channels first and never materialize the (N,H/2,W/2,
                # 256) half-res map (604 MB at bs8 768^2). Mathematically
                # exact vs the reference-shaped graph (deepv3.py:355-360);
                # only bf16 rounding order differs (f32 agrees to ~1e-6,
                # tested). The round-1 compiler SIGSEGV on this form was
                # specific to the conv-lowered final2; the dot form
                # compiles and is ~0.5% faster.
                lo = resize_bilinear_align_corners(m.final2(dec1), half)
                oc19 = m.final2(oc_dec)
                bias = m.final2.variables["params"]["bias"].astype(oc19.dtype)
                d19 = lo + oc19 - bias
                return resize_bilinear_align_corners(d19, (h, w))

            def _no_dec(m):
                return resize_bilinear_align_corners(m.final2(dec1), (h, w))

            main_out = nn.cond(perturb.gate_dec, _with_dec, _no_dec, self)
        else:
            main_out = resize_bilinear_align_corners(self.final2(dec1), (h, w))

        logit_dtype = jnp.float32 if (self.logits_fp32 or self.dtype is None
                                      or not train) else self.dtype
        out: Dict[str, Any] = {"logits": main_out.astype(logit_dtype)}
        if w_arr:
            out["w_arr"] = w_arr
        if self.use_dsn:
            out["dsn"] = self.dsn(aux_in, train).astype(jnp.float32)
        return out
