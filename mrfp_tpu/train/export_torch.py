"""Export our variable tree back into a reference-format PyTorch checkpoint.

The inverse of train.import_torch: produces a ``state_dict`` the upstream
MRFPPlus/simpleDeepV3Plus code loads with ``strict=True`` (keys
``module.``-prefixed as DataParallel writes them, conv kernels HWIO->OIHW,
BN scale/bias -> weight/bias, batch_stats mean/var -> running_mean/var,
``num_batches_tracked`` buffers emitted as 0), wrapped in the on-disk
container ``{'epoch', 'state_dict'}`` that main.py:867-868 writes.

Why: the migration story must run both ways — a model trained here on TPU
can be evaluated/served by the existing reference tooling, and the torch
oracle (tests/torch_oracle.py) can cross-check our eval forward on natively
trained weights. Round-trip bit-exactness and oracle-forward equivalence are
pinned in tests/test_export_torch.py.

Notes on reference quirks reproduced here:
- The OC branch BNs (OCk_bn/OCk_decbn, deepv3.py:221-237) only ever execute
  in train mode (the perturbation is train-only), so their running stats are
  inert; we emit fresh zeros/ones (+ nbt 0). Their affine weight/bias carry
  the real values from the external oc_params pytree.
- ``num_batches_tracked`` is emitted as 0: the reference BNs use a fixed
  momentum (0.1), so torch never reads the counter.
- Affine instance norms (the MRFPPlus stem ``bn1_iw`` and per-block
  ``instance_norm_layer``) have no running buffers in the reference either;
  SwitchWhiten layers (zoo iw>=3) export their running_mean/running_cov.
- The optimizer state is NOT exported: torch SGD state_dicts key momentum
  buffers by parameter *position*, which is DataParallel-wrapper dependent;
  the reference's own eval path reads only ``state_dict`` (main.py:884-886).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _kernel(x) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(_np(x), (3, 2, 0, 1))


def _block_sort(names):
    """block0, block1, ... block10 in numeric order."""
    return sorted(names, key=lambda n: int(re.sub(r"\D", "", n) or 0))


class _Emitter:
    def __init__(self):
        self.out: Dict[str, np.ndarray] = {}

    def conv(self, ref: str, node: Dict[str, Any]):
        self.out[f"{ref}.weight"] = _kernel(node["kernel"])
        if "bias" in node:
            self.out[f"{ref}.bias"] = _np(node["bias"])

    def norm(self, ref: str, node: Dict[str, Any],
             stats: Optional[Dict[str, Any]]):
        """BN / affine-INorm / SwitchWhiten -> torch buffers."""
        if "scale" in node:
            self.out[f"{ref}.weight"] = _np(node["scale"])
        if "bias" in node:
            self.out[f"{ref}.bias"] = _np(node["bias"])
        for k in ("sw_mean_weight", "sw_var_weight"):
            if k in node:
                self.out[f"{ref}.{k}"] = _np(node[k])
        if not stats:
            return
        if "mean" in stats:  # BatchNorm
            self.out[f"{ref}.running_mean"] = _np(stats["mean"])
            self.out[f"{ref}.running_var"] = _np(stats["var"])
            self.out[f"{ref}.num_batches_tracked"] = np.zeros((), np.int64)
        for k in ("running_mean", "running_cov"):  # SwitchWhiten
            if k in stats:
                self.out[f"{ref}.{k}"] = _np(stats[k])


def export_state_dict(params: Dict[str, Any],
                      batch_stats: Optional[Dict[str, Any]] = None,
                      oc_params: Optional[Dict[str, Any]] = None,
                      module_prefix: bool = True) -> Dict[str, np.ndarray]:
    """Our (params, batch_stats, oc_params) -> reference state_dict
    (numpy values; save_torch_checkpoint tensorizes them)."""
    stats = batch_stats or {}
    e = _Emitter()

    # --- backbone stem: layer0 Sequential (deepv3.py builds it from the
    # trunk's conv1/bn1[/conv2/bn2/conv3/bn3]; 7x7 stem = [conv, norm, relu,
    # pool] -> indices 0,1; deep stem -> 0,1,3,4,6,7) ---
    bp, bst = params.get("backbone", {}), stats.get("backbone", {})
    deep = "conv2" in bp
    conv_idx = {1: 0, 2: 3, 3: 6}
    for i in (1, 2, 3):
        if f"conv{i}" in bp:
            e.conv(f"layer0.{conv_idx[i]}", bp[f"conv{i}"])
        for nm in (f"bn{i}", f"bn{i}_iw", f"norm{i}"):
            if nm in bp:
                e.norm(f"layer0.{conv_idx[i] + 1}", bp[nm], bst.get(nm))
                break
    if not deep and "conv1" not in bp and "stem" in bp:
        raise ValueError("unrecognized backbone stem layout")

    # --- residual stages ---
    for L in (1, 2, 3, 4):
        lyr = bp.get(f"layer{L}")
        if lyr is None:
            continue
        lst = bst.get(f"layer{L}", {})
        for blk in _block_sort(lyr):
            n = int(re.sub(r"\D", "", blk) or 0)
            b, bs = lyr[blk], lst.get(blk, {})
            ref = f"layer{L}.{n}"
            for c in ("conv1", "conv2", "conv3"):
                if c in b:
                    e.conv(f"{ref}.{c}", b[c])
            for c in ("bn1", "bn2", "bn3"):
                if c in b:
                    e.norm(f"{ref}.{c}", b[c], bs.get(c))
            if "downsample_conv" in b:
                e.conv(f"{ref}.downsample.0", b["downsample_conv"])
                e.norm(f"{ref}.downsample.1", b["downsample_bn"],
                       bs.get("downsample_bn"))
            if "instance_norm_layer" in b:
                e.norm(f"{ref}.instance_norm_layer", b["instance_norm_layer"],
                       bs.get("instance_norm_layer"))

    # --- ASPP (features.i = Sequential(conv, bn, relu)) ---
    ap, ast = params.get("aspp", {}), stats.get("aspp", {})
    for name in sorted(ap):
        m = re.match(r"^feat(\d+)$", name)
        if m:
            ref = f"aspp.features.{m.group(1)}"
        elif name == "img_conv":
            ref = "aspp.img_conv"
        else:
            continue
        e.conv(f"{ref}.0", ap[name]["conv"])
        e.norm(f"{ref}.1", ap[name]["bn"], ast.get(name, {}).get("bn"))

    # --- decoder heads ---
    dp, dst = params.get("decoder", {}), stats.get("decoder", {})
    for name in ("bot_fine", "bot_aspp"):
        if name in dp:
            e.conv(f"{name}.0", dp[name]["conv"])
            e.norm(f"{name}.1", dp[name]["bn"], dst.get(name, {}).get("bn"))
    # final1 Sequential: 0 conv, 1 bn, 2 relu, 3 conv, 4 bn, 5 relu
    for ours, j in (("final1_0", 0), ("final1_1", 3)):
        if ours in dp:
            e.conv(f"final1.{j}", dp[ours]["conv"])
            e.norm(f"final1.{j + 1}", dp[ours]["bn"],
                   dst.get(ours, {}).get("bn"))
    if "final2" in params:
        e.conv("final2.0", params["final2"])

    # --- zoo DSN head (Sequential: 0 conv+bias, 1 bn, 2 relu, 3 dropout,
    # 4 classifier) ---
    if "dsn" in params:
        dsn, dsn_st = params["dsn"], stats.get("dsn", {})
        e.conv("dsn.0", dsn["conv"]["conv"])
        e.norm("dsn.1", dsn["conv"]["bn"], dsn_st.get("conv", {}).get("bn"))
        e.conv("dsn.4", dsn["classifier"])

    # --- OC branch (external pytree -> OClayerK/OCK_bn etc.) ---
    if oc_params:
        for k in (1, 2, 3, 4):
            for side, conv_ref, bn_ref in (
                    ("enc", f"OClayer{k}", f"OC{k}_bn"),
                    ("dec", f"OCdeclayer{k}", f"OC{k}_decbn")):
                node = oc_params.get(f"{side}{k}")
                if node is None:
                    continue
                e.conv(conv_ref, node)
                ch = np.shape(node["bn_scale"])[0]
                e.out[f"{bn_ref}.weight"] = _np(node["bn_scale"])
                e.out[f"{bn_ref}.bias"] = _np(node["bn_bias"])
                # train-mode-only BNs: stats are inert (see module docstring)
                e.out[f"{bn_ref}.running_mean"] = np.zeros((ch,), np.float32)
                e.out[f"{bn_ref}.running_var"] = np.ones((ch,), np.float32)
                e.out[f"{bn_ref}.num_batches_tracked"] = np.zeros((), np.int64)

    prefix = "module." if module_prefix else ""
    return {prefix + k: v for k, v in e.out.items()}


def save_torch_checkpoint(path: str, params, batch_stats=None, oc_params=None,
                          epoch: int = 0, module_prefix: bool = True) -> int:
    """Write the reference on-disk container; returns the tensor count."""
    import torch

    sd = export_state_dict(params, batch_stats, oc_params,
                           module_prefix=module_prefix)
    # copy=True: jax buffers arrive as non-writable views, which
    # torch.from_numpy warns about and must not alias anyway
    tensors = {k: torch.from_numpy(np.array(v, copy=True))
               for k, v in sd.items()}
    torch.save({"epoch": int(epoch), "state_dict": tensors}, path)
    return len(tensors)
