from .checkpoint import checkpoint_name, load_checkpoint, save_checkpoint
from .state import TrainState, ema_update
from .trainer import Trainer, make_optimizer, sample_from_latent, warmup_cosine_lr

__all__ = [
    "TrainState", "ema_update",
    "Trainer", "make_optimizer", "warmup_cosine_lr", "sample_from_latent",
    "save_checkpoint", "load_checkpoint", "checkpoint_name",
]
