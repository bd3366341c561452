from mrfp_tpu.nn import (
    cov_settings,
    deeplab,
    layers,
    mnasnet,
    mobilenet,
    norms,
    resnet,
    seresnext,
    shufflenet,
    wider_resnet,
)
from mrfp_tpu.nn.deeplab import ASPP, ConvBNReLU, DSNHead, DeepLabDecoder
from mrfp_tpu.nn.grad_reversal import grad_reverse
from mrfp_tpu.nn.mobilenet import MobileNetV2
from mrfp_tpu.nn.norms import (
    BatchNorm,
    InstanceNorm,
    InstanceWhitening,
    SwitchWhiten2d,
)
from mrfp_tpu.nn.resnet import ResNet
from mrfp_tpu.nn.shufflenet import ShuffleNetV2

__all__ = [
    "cov_settings", "deeplab", "layers", "mnasnet", "mobilenet", "norms",
    "resnet", "seresnext", "shufflenet", "wider_resnet",
    "ASPP", "ConvBNReLU", "DSNHead", "DeepLabDecoder", "grad_reverse",
    "BatchNorm", "InstanceNorm", "InstanceWhitening", "SwitchWhiten2d",
    "ResNet", "MobileNetV2", "ShuffleNetV2",
]
