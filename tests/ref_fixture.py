"""Build a bit-exact reference checkpoint fixture by RUNNING the reference
model code (not copying it): instantiate deepv3.MRFPPlus from the upstream
repo on CPU torch and torch.save its state_dict in the exact on-disk format
main.py:867-868 writes ({'epoch', 'state_dict'}, keys 'module.'-prefixed by
DataParallel, incl. num_batches_tracked buffers).

The upstream module imports a few packages this environment lacks
(pytorch_wavelets, segmentation_models_pytorch — used only by model variants
we don't instantiate) and downloads ImageNet weights (zero-egress here), so
those are stubbed/neutralized before import.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_ROOT, "deepv3.py"))


def _stub(name: str, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_reference_stubs():
    """Make the upstream modules importable in this environment (missing
    optional deps stubbed, ImageNet fetches neutralized)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _stub("pytorch_wavelets", DWTForward=object, DWTInverse=object)
    base = _stub("segmentation_models_pytorch.base", SegmentationModel=object,
                 SegmentationHead=object, ClassificationHead=object,
                 modules=_stub("segmentation_models_pytorch.base.modules"))
    _stub("segmentation_models_pytorch", base=base)
    _stub("segmentation_models_pytorch.decoders", unet=None)
    _stub("segmentation_models_pytorch.decoders.unet", UnetDecoder=object)
    _stub("segmentation_models_pytorch.encoders",
          get_encoder=lambda *a, **k: None)
    # zoo-only deps (network/deepv3.py): kmeans1d fires only when an
    # ISW/IRW model calls set_mask_matrix; torchvision only for the
    # mobilenet/mnasnet/resnext trunks we don't instantiate here
    _stub("kmeans1d", cluster=lambda *a, **k: ([0], [0.0]))
    tv = _stub("torchvision")
    tv.models = _stub("torchvision.models")
    import torch.utils.model_zoo as mz
    mz.load_url = lambda *a, **k: {}  # zero-egress: skip the ImageNet fetch


def build_reference_pth(path: str, num_classes: int = 19) -> int:
    """Instantiate the upstream MRFPPlus and save it the way main.py does.
    Returns the number of tensors saved."""
    import torch

    _install_reference_stubs()
    from deepv3 import MRFPPlus  # noqa: the upstream module

    model = MRFPPlus(num_classes=num_classes)
    sd = {("module." + k): v for k, v in model.state_dict().items()}
    torch.save({"epoch": 0, "state_dict": sd}, path)
    return len(sd)


def make_zoo_state_dict(factory: str = "DeepR50V3PlusD",
                        wt_layer=(0,) * 7,
                        num_classes: int = 19) -> dict:
    """Instantiate an upstream RobustNet-zoo factory (network/deepv3.py)
    and return its raw state_dict (unprefixed; the DDP harness would add
    'module.', which both our importer and the strict-key tests strip).

    NOTE the vendored upstream quirk: DeepV3Plus.__init__ hard-overrides
    ``self.wt_layer = [0]*7`` (network/deepv3.py:119), ignoring both its
    ``wt_layer`` parameter and ``args.wt_layer`` — so every checkpoint this
    vendored copy can produce has plain BNs and no whitening layers,
    whatever ``wt_layer`` is passed here. Pass non-zero values only to
    observe that quirk."""
    import argparse

    _install_reference_stubs()
    from network import deepv3 as zoo  # noqa: the upstream module

    args = argparse.Namespace(dataset="cityscapes", wt_layer=list(wt_layer),
                              use_wtloss=True)
    model = getattr(zoo, factory)(num_classes=num_classes, criterion=None,
                                  criterion_aux=None, args=args)
    return model.state_dict()
