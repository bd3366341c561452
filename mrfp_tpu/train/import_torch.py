"""PyTorch checkpoint importer.

Converts reference checkpoints ({'epoch','state_dict','optimizer'},
main.py:867-868, keys 'module.'-prefixed by DataParallel) and torchvision
ImageNet weights into our variable tree:

- conv weight OIHW -> HWIO kernel
- BatchNorm weight/bias -> params scale/bias; running_mean/var -> batch_stats
- InstanceNorm2d(affine) weight/bias -> params scale/bias (no running stats)
- SwitchWhiten sw_mean_weight/sw_var_weight/weight/bias + running_mean/cov
- OC branch tensors -> the external oc_params pytree

Forgiving semantics mirror mynn.forgiving_state_restore (mynn.py:121-138):
source tensors whose target is missing or shape-mismatched are skipped (and
reported), so ImageNet checkpoints load into iw-modified backbones exactly as
the reference does.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# OC module name (deepv3.py:221-237) -> our oc_params entry
_OC_NAMES = {
    "OClayer1": "enc1", "OClayer2": "enc2", "OClayer3": "enc3", "OClayer4": "enc4",
    "OCdeclayer1": "dec1", "OCdeclayer2": "dec2", "OCdeclayer3": "dec3",
    "OCdeclayer4": "dec4",
    "OC1_bn": "enc1", "OC2_bn": "enc2", "OC3_bn": "enc3", "OC4_bn": "enc4",
    "OC1_decbn": "dec1", "OC2_decbn": "dec2", "OC3_decbn": "dec3",
    "OC4_decbn": "dec4",
}

_NORM_PARAM = {"weight": "scale", "bias": "bias"}
_NORM_STAT = {"running_mean": "mean", "running_var": "var"}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t) -> np.ndarray:
    return np.transpose(_to_np(t), (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _map_block_member(sub: str, leaf: str):
    """Map a residual-block member name to (collection, relative path)."""
    if sub in ("conv1", "conv2", "conv3"):
        if leaf == "weight":
            return [("params", (sub, "kernel"), _conv_kernel)]
        return []
    if sub in ("bn1", "bn2", "bn3"):
        if leaf in _NORM_PARAM:
            return [("params", (sub, _NORM_PARAM[leaf]), _to_np)]
        if leaf in _NORM_STAT:
            return [("batch_stats", (sub, _NORM_STAT[leaf]), _to_np)]
        return []
    if sub == "downsample.0" and leaf == "weight":
        return [("params", ("downsample_conv", "kernel"), _conv_kernel)]
    if sub == "downsample.1":
        if leaf in _NORM_PARAM:
            return [("params", ("downsample_bn", _NORM_PARAM[leaf]), _to_np)]
        if leaf in _NORM_STAT:
            return [("batch_stats", ("downsample_bn", _NORM_STAT[leaf]), _to_np)]
        return []
    if sub == "instance_norm_layer":
        if leaf in _NORM_PARAM:
            return [("params", ("instance_norm_layer", _NORM_PARAM[leaf]), _to_np)]
        if leaf == "sw_mean_weight":
            return [("params", ("instance_norm_layer", "sw_mean_weight"), _to_np)]
        if leaf == "sw_var_weight":
            return [("params", ("instance_norm_layer", "sw_var_weight"), _to_np)]
        if leaf in ("running_mean", "running_cov"):
            return [("batch_stats", ("instance_norm_layer", leaf), _to_np)]
        return []
    return []


def _stem_norm_paths(variables) -> Tuple[str, bool]:
    """(name, is_batchnorm) of the stem norm in our tree."""
    bp = variables.get("params", {}).get("backbone", {})
    if "bn1" in bp:
        return "bn1", True
    return "bn1_iw", False


def convert_state_dict(sd: Dict[str, Any], variables: Dict[str, Any],
                       verbose: bool = False):
    """Convert a reference/torchvision state_dict into (params, batch_stats,
    oc_params, report).

    ``variables`` is the target model's initialized variable dict (used for
    shape checking / forgiving skips). Returns NEW trees with imported values
    merged over the initialized ones.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables.get("params", {}))
    stats = jax.tree_util.tree_map(np.asarray, variables.get("batch_stats", {}))
    oc: Dict[str, Dict[str, np.ndarray]] = {}
    skipped: List[str] = []
    loaded = 0

    entries: List[Tuple[str, Tuple[str, ...], np.ndarray]] = []

    for name, tensor in sd.items():
        if name.startswith("module."):
            name = name[len("module."):]
        if name.endswith("num_batches_tracked"):
            continue

        parts = name.split(".")
        head, leaf = parts[0], parts[-1]

        # --- OC branch (frozen) ---
        if head in _OC_NAMES:
            tgt = _OC_NAMES[head]
            if "bn" in head.lower():
                key = {"weight": "bn_scale", "bias": "bn_bias"}.get(leaf)
                if key is None:  # running stats of train-mode BNs: consumed, unused
                    loaded += 1
                    continue
                oc.setdefault(tgt, {})[key] = _to_np(tensor)
            else:
                key = {"weight": "kernel", "bias": "bias"}[leaf]
                val = _conv_kernel(tensor) if leaf == "weight" else _to_np(tensor)
                oc.setdefault(tgt, {})[key] = val
            loaded += 1
            continue

        # --- stem: 'layer0.0/1' (MRFPPlus) or 'conv1'/'bn1' (torchvision) ---
        m = re.match(r"^layer0\.(\d+)$", ".".join(parts[:2])) if head == "layer0" else None
        if m or head in ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3"):
            if m:
                idx = int(parts[1])
                # layer0 Sequential: even idx = conv, odd = norm (7x7 stem:
                # 0=conv1 1=bn1; deep stem: 0,1,3,4,6,7 with relu at 2,5,8)
                stem_map = {0: "conv1", 1: "norm1", 3: "conv2", 4: "norm2",
                            6: "conv3", 7: "norm3"}
                role = stem_map.get(idx)
            else:
                role = {"conv1": "conv1", "bn1": "norm1", "conv2": "conv2",
                        "bn2": "norm2", "conv3": "conv3", "bn3": "norm3"}[head]
            if role is None:
                continue
            if role.startswith("conv"):
                entries.append(("params", ("backbone", role, "kernel"),
                                _conv_kernel(tensor)))
            else:
                i = role[-1]
                stem_name, is_bn = _stem_norm_paths(variables)
                # deep stems name their norms bn1/bn2/bn3 or bnN_iw
                cand_bn = f"bn{i}"
                bp = variables.get("params", {}).get("backbone", {})
                tgt = cand_bn if cand_bn in bp else f"bn{i}_iw"
                if leaf in _NORM_PARAM:
                    entries.append(("params", ("backbone", tgt, _NORM_PARAM[leaf]),
                                    _to_np(tensor)))
                elif leaf in _NORM_STAT:
                    entries.append(("batch_stats", ("backbone", tgt,
                                                    _NORM_STAT[leaf]), _to_np(tensor)))
            continue

        # --- residual stages: layer{1-4}.{i}.{member} ---
        m = re.match(r"^layer([1-4])\.(\d+)\.(.+?)\.([^.]+)$", name)
        if m:
            lyr, blk, sub, lf = m.group(1), m.group(2), m.group(3), m.group(4)
            for coll, rel, fn in _map_block_member(sub, lf):
                entries.append((coll, ("backbone", f"layer{lyr}", f"block{blk}")
                                + rel, fn(tensor)))
            continue

        # --- ASPP ---
        m = re.match(r"^aspp\.features\.(\d+)\.(\d+)\.([^.]+)$", name)
        if m:
            i, j, lf = int(m.group(1)), int(m.group(2)), m.group(3)
            base = ("aspp", f"feat{i}")
            if j == 0 and lf == "weight":
                entries.append(("params", base + ("conv", "kernel"),
                                _conv_kernel(tensor)))
            elif j == 1 and lf in _NORM_PARAM:
                entries.append(("params", base + ("bn", _NORM_PARAM[lf]),
                                _to_np(tensor)))
            elif j == 1 and lf in _NORM_STAT:
                entries.append(("batch_stats", base + ("bn", _NORM_STAT[lf]),
                                _to_np(tensor)))
            continue
        m = re.match(r"^aspp\.img_conv\.(\d+)\.([^.]+)$", name)
        if m:
            j, lf = int(m.group(1)), m.group(2)
            base = ("aspp", "img_conv")
            if j == 0 and lf == "weight":
                entries.append(("params", base + ("conv", "kernel"),
                                _conv_kernel(tensor)))
            elif j == 1 and lf in _NORM_PARAM:
                entries.append(("params", base + ("bn", _NORM_PARAM[lf]),
                                _to_np(tensor)))
            elif j == 1 and lf in _NORM_STAT:
                entries.append(("batch_stats", base + ("bn", _NORM_STAT[lf]),
                                _to_np(tensor)))
            continue

        # --- decoder heads ---
        m = re.match(r"^(bot_fine|bot_aspp)\.(\d+)\.([^.]+)$", name)
        if m:
            mod, j, lf = m.group(1), int(m.group(2)), m.group(3)
            base = ("decoder", mod)
            if j == 0 and lf == "weight":
                entries.append(("params", base + ("conv", "kernel"),
                                _conv_kernel(tensor)))
            elif j == 1 and lf in _NORM_PARAM:
                entries.append(("params", base + ("bn", _NORM_PARAM[lf]),
                                _to_np(tensor)))
            elif j == 1 and lf in _NORM_STAT:
                entries.append(("batch_stats", base + ("bn", _NORM_STAT[lf]),
                                _to_np(tensor)))
            continue
        m = re.match(r"^final1\.(\d+)\.([^.]+)$", name)
        if m:
            j, lf = int(m.group(1)), m.group(2)
            # Sequential: 0 conv,1 bn,2 relu,3 conv,4 bn,5 relu
            sub = "final1_0" if j in (0, 1) else "final1_1"
            base = ("decoder", sub)
            if j in (0, 3) and lf == "weight":
                entries.append(("params", base + ("conv", "kernel"),
                                _conv_kernel(tensor)))
            elif lf in _NORM_PARAM:
                entries.append(("params", base + ("bn", _NORM_PARAM[lf]),
                                _to_np(tensor)))
            elif lf in _NORM_STAT:
                entries.append(("batch_stats", base + ("bn", _NORM_STAT[lf]),
                                _to_np(tensor)))
            continue
        m = re.match(r"^final2\.0\.([^.]+)$", name)
        if m:
            lf = m.group(1)
            tgt = {"weight": "kernel", "bias": "bias"}[lf]
            val = _conv_kernel(tensor) if lf == "weight" else _to_np(tensor)
            entries.append(("params", ("final2", tgt), val))
            continue
        # --- zoo DSN head ---
        m = re.match(r"^dsn\.(\d+)\.([^.]+)$", name)
        if m:
            j, lf = int(m.group(1)), m.group(2)
            if j == 0:
                if lf == "weight":
                    entries.append(("params", ("dsn", "conv", "conv", "kernel"),
                                    _conv_kernel(tensor)))
                else:
                    entries.append(("params", ("dsn", "conv", "conv", "bias"),
                                    _to_np(tensor)))
            elif j == 1:
                if lf in _NORM_PARAM:
                    entries.append(("params", ("dsn", "conv", "bn",
                                               _NORM_PARAM[lf]), _to_np(tensor)))
                elif lf in _NORM_STAT:
                    entries.append(("batch_stats", ("dsn", "conv", "bn",
                                                    _NORM_STAT[lf]), _to_np(tensor)))
            elif j == 4:
                tgt = {"weight": "kernel", "bias": "bias"}[lf]
                val = _conv_kernel(tensor) if lf == "weight" else _to_np(tensor)
                entries.append(("params", ("dsn", "classifier", tgt), val))
            continue

        # unused torchvision tails (fc.*) and anything unmapped
        skipped.append(name)

    # forgiving merge: skip missing/shape-mismatched targets
    def _try_set(tree, path, value, name_for_report):
        node = tree
        for p in path[:-1]:
            if not isinstance(node, dict) or p not in node:
                skipped.append(name_for_report)
                return 0
            node = node[p]
        leaf = path[-1]
        if not isinstance(node, dict) or leaf not in node:
            skipped.append(name_for_report)
            return 0
        if tuple(np.shape(node[leaf])) != tuple(value.shape):
            skipped.append(f"{name_for_report} (shape {value.shape} != "
                           f"{np.shape(node[leaf])})")
            return 0
        node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
        return 1

    for coll, path, value in entries:
        tree = params if coll == "params" else stats
        loaded += _try_set(tree, path, value, "/".join(path))

    if verbose and skipped:
        print(f"[import_torch] loaded {loaded}, skipped {len(skipped)}:")
        for s in skipped[:40]:
            print("  -", s)

    return params, stats, (oc or None), {"loaded": loaded, "skipped": skipped}


def load_torch_checkpoint(path: str, variables: Dict[str, Any],
                          verbose: bool = False):
    """Load a reference .pth file ({'state_dict': ...} or raw state_dict)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return convert_state_dict(sd, variables, verbose=verbose)
