from diffute_tpu.train.optim import build_optimizer, build_lr_schedule  # noqa: F401
from diffute_tpu.train.state import TrainState  # noqa: F401
from diffute_tpu.train.unet_train import make_unet_train_step, UNetTrainer  # noqa: F401
from diffute_tpu.train.vae_train import make_vae_train_step, VAETrainer  # noqa: F401
