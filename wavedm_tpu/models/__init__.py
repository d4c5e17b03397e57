from wavedm_tpu.models.unet import DiffusionUNet
from wavedm_tpu.models.hfrm import HFRM
