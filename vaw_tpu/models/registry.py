"""Model registry and builder (reference: main.py:30-34, 184-221)."""

from __future__ import annotations

from .dit import DiT_models
from .mmdit import MMDiT
from .unet import UNet_models
from .uvit import UViT_models
from .vit import ViT_models

__all__ = ["MODEL_VARIANTS", "build_model"]

# MM-DiT sizes follow the reference's hidden = 32*depth, heads = depth rule
# (reference: encoders/mmdit.py:556-558); the reference leaves the backbone
# orphaned, here it is a selectable variant.
MMDiT_models = {
    "MM-DiT-S": dict(depth=12),
    "MM-DiT-B": dict(depth=24),
    "MM-DiT-L": dict(depth=32),
}

MODEL_VARIANTS = (
    list(UNet_models) + list(ViT_models) + list(DiT_models)
    + list(UViT_models) + list(MMDiT_models)
)


def build_model(cfg):
    """Construct the backbone named by cfg.model with reference-faithful
    argument wiring (reference: main.py:184-221). cfg is a TrainConfig or any
    object with the same attribute names."""
    name = cfg.model
    # class_cond=False means an unconditional model regardless of
    # num_classes. The reference wires num_classes unconditionally into the
    # non-UNet families (main.py:207-220) and would crash on the first
    # label-less forward (dit.py:269 asserts y); the UNet factory's
    # `num_classes if class_cond else 0` semantic (unet.py:929 in the
    # reference) is applied uniformly here instead.
    num_classes = cfg.num_classes if cfg.class_cond else 0
    if name in UNet_models:
        return UNet_models[name](
            num_classes=cfg.num_classes, in_channels=cfg.in_chans,
            drop_label_prob=cfg.drop_label_prob, dropout=cfg.dropout,
            learn_sigma=cfg.learn_sigma, class_cond=cfg.class_cond,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            remat_policy=getattr(cfg, "remat_policy", "full"),
            dtype=cfg.compute_dtype,
        )
    if name in UViT_models:
        if cfg.learn_sigma:
            # The reference U-ViT always predicts in_channels
            # (models/uvit.py:185-187) — there is no 2C variance head. A
            # silent build would split the C-channel output in half deep
            # inside the LEARNED_RANGE loss; refuse up front instead.
            raise ValueError(
                "U-ViT does not support learn_sigma (fixed in_channels "
                "output head); use --learn_sigma False or a UNet/DiT/ViT "
                "backbone")
        return UViT_models[name](
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            in_channels=cfg.in_chans, num_classes=num_classes,
            class_dropout_prob=cfg.drop_label_prob,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            remat_policy=getattr(cfg, "remat_policy", "full"),
            dtype=cfg.compute_dtype,
        )
    if name in ViT_models:
        return ViT_models[name](
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            in_channels=cfg.in_chans, num_classes=num_classes,
            learn_sigma=cfg.learn_sigma, drop_rate=cfg.dropout,
            drop_label_prob=cfg.drop_label_prob,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            remat_policy=getattr(cfg, "remat_policy", "full"),
            dtype=cfg.compute_dtype,
        )
    if name in DiT_models:
        return DiT_models[name](
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            in_channels=cfg.in_chans, num_classes=num_classes,
            learn_sigma=cfg.learn_sigma, learn_align=cfg.learn_align,
            encoder_depth=cfg.encoder_depth,
            class_dropout_prob=cfg.drop_label_prob, z_dims=cfg.z_dims,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            remat_policy=getattr(cfg, "remat_policy", "full"),
            scan_blocks=getattr(cfg, "scan_blocks", False),
            dtype=cfg.compute_dtype,
        )
    if name in MMDiT_models:
        depth = MMDiT_models[name]["depth"]
        return MMDiT(
            image_size=cfg.image_size, patch_size=cfg.patch_size,
            in_channels=cfg.in_chans, hidden_size=32 * depth, depth=depth,
            num_heads=depth, num_classes=num_classes,
            learn_sigma=cfg.learn_sigma, learn_align=cfg.learn_align,
            encoder_depth=cfg.encoder_depth, z_dims=(cfg.z_dims,),
            class_dropout_prob=cfg.drop_label_prob,
            use_checkpoint=getattr(cfg, "use_checkpoint", False),
            remat_policy=getattr(cfg, "remat_policy", "full"),
            # the reference hardcodes a 16-grid table (latent-32 recipes);
            # widen for larger token grids
            pos_embed_max_size=max(16, cfg.image_size // cfg.patch_size),
            dtype=cfg.compute_dtype,
        )
    raise ValueError(f"Unsupported model variant: {name}")
