from elvis_tpu.models.srnet import SRNet, SRNetCompact, SRNetLarge, srnet_upsample_fn
from elvis_tpu.models.deblur_unet import DeblurUNet
from elvis_tpu.models.inpaint_net import InpaintNet
from elvis_tpu.models.saliency_net import SaliencyNet, make_neural_saliency_fn
from elvis_tpu.models.diffusion import DiffusionRestorer

__all__ = [
    "DeblurUNet",
    "DiffusionRestorer",
    "InpaintNet",
    "SRNet",
    "SRNetCompact",
    "SRNetLarge",
    "SaliencyNet",
    "make_neural_saliency_fn",
    "srnet_upsample_fn",
]
