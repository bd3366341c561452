from mrfp_tpu.nn import deeplab, layers, norms, resnet
from mrfp_tpu.nn.deeplab import ASPP, ConvBNReLU, DSNHead, DeepLabDecoder
from mrfp_tpu.nn.norms import (
    BatchNorm,
    InstanceNorm,
    InstanceWhitening,
    SwitchWhiten2d,
)
from mrfp_tpu.nn.resnet import ResNet

__all__ = [
    "deeplab", "layers", "norms", "resnet",
    "ASPP", "ConvBNReLU", "DSNHead", "DeepLabDecoder",
    "BatchNorm", "InstanceNorm", "InstanceWhitening", "SwitchWhiten2d",
    "ResNet",
]
