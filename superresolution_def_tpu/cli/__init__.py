from .trainers import SwinTrainConfig, HATTrainConfig, train_swin_run, train_hat_run

__all__ = ["SwinTrainConfig", "HATTrainConfig", "train_swin_run", "train_hat_run"]
