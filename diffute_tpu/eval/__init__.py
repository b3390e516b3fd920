from diffute_tpu.eval.quality import psnr, ssim  # noqa: F401
from diffute_tpu.eval.ocr import OCRVerifier  # noqa: F401
