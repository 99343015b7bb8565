from .dit import DiT, DiT_B, DiT_L, DiT_S, DiT_XL, DiT_models
from .registry import MODEL_VARIANTS, build_model
from .unet import (
    ADM_32, ADM_64, ADM_128, ADM_256, ADM_512, LDM,
    EncoderUNetModel, UNet_32, UNet_64, UNetModel, UNet_models,
    create_unet_model,
)
from .mmdit import MMDiT
from .unet import SuperResModel
from .uvit import UViT, UViT_H, UViT_L, UViT_M, UViT_S, UViT_S_D, UViT_models
from .vae import AutoencoderKL
from .vit import ViT, ViT_B, ViT_L, ViT_S, ViT_XL, ViT_models

__all__ = [
    "DiT", "DiT_S", "DiT_B", "DiT_L", "DiT_XL", "DiT_models",
    "UNetModel", "EncoderUNetModel", "create_unet_model", "UNet_models",
    "UNet_32", "ADM_32", "ADM_64", "ADM_128", "ADM_256", "ADM_512",
    "UNet_64", "LDM",
    "UViT", "UViT_S", "UViT_S_D", "UViT_M", "UViT_L", "UViT_H", "UViT_models",
    "ViT", "ViT_S", "ViT_B", "ViT_L", "ViT_XL", "ViT_models",
    "MODEL_VARIANTS", "build_model",
    "MMDiT", "SuperResModel", "AutoencoderKL",
]
