from diffute_tpu.models.vae import AutoencoderKL  # noqa: F401
from diffute_tpu.models.unet import UNet2DCondition  # noqa: F401
from diffute_tpu.models.trocr import TrOCREncoder  # noqa: F401
from diffute_tpu.models.ema import EmaState, ema_init, ema_update  # noqa: F401
