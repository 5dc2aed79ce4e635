from .losses import (
    l1_loss,
    mse_loss,
    charbonnier_loss,
    gan_loss,
    relative_gan_loss,
    gram_matrix,
    texture_loss,
    CombinedGANLoss,
    DiscriminatorLoss,
)
from .vgg import VGG19Features, vgg19_from_torch, init_vgg_params
from .ema import ema_init, ema_update, EMA_DECAY
from .schedule import cosine_annealing_lr
from .state import GANTrainState, create_swin_train_state, create_hat_train_state
from .steps import (
    make_swin_train_step,
    make_hat_train_step,
    make_eval_step,
)

__all__ = [
    "l1_loss",
    "mse_loss",
    "charbonnier_loss",
    "gan_loss",
    "relative_gan_loss",
    "gram_matrix",
    "texture_loss",
    "CombinedGANLoss",
    "DiscriminatorLoss",
    "VGG19Features",
    "vgg19_from_torch",
    "init_vgg_params",
    "ema_init",
    "ema_update",
    "EMA_DECAY",
    "cosine_annealing_lr",
    "GANTrainState",
    "create_swin_train_state",
    "create_hat_train_state",
    "make_swin_train_step",
    "make_hat_train_step",
    "make_eval_step",
]
