from .align import get_feature, initialize_encoders, preprocess_raw_image
from .loaders import convert_timm_vit, find_encoder_weights, load_encoders
from .vit_backbone import FAMILY_CONFIGS, FeatureViT, make_teacher

__all__ = [
    "FeatureViT", "make_teacher", "FAMILY_CONFIGS",
    "load_encoders", "convert_timm_vit", "find_encoder_weights",
    "initialize_encoders", "preprocess_raw_image", "get_feature",
]
