"""diffute_tpu — a TPU-native scene/document text-editing diffusion framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of DiffUTE
(reference: chenhaoxing/DiffUTE): glyph-conditioned Stable-Diffusion-2
inpainting for editing text regions in images.

Layout
------
- ``diffute_tpu.config``     typed dataclass configs for every component
- ``diffute_tpu.diffusion``  pure-JAX DDPM/DDIM schedulers (jit-safe)
- ``diffute_tpu.models``     Flax modules: AutoencoderKL, UNet2DCondition (9ch),
                             TrOCR ViT encoder, EMA
- ``diffute_tpu.ops``        Pallas TPU kernels: flash attention, fused
                             GroupNorm+SiLU; XLA fallbacks
- ``diffute_tpu.text``       glyph rasterization (host FreeType) + TrOCR
                             on-device preprocessing
- ``diffute_tpu.pipeline``   crop/mask policies + the jit'd end-to-end editor
- ``diffute_tpu.train``      stage-1 VAE / stage-2 UNet trainers (pjit DP,
                             grad-accum, EMA, orbax checkpointing)
- ``diffute_tpu.parallel``   device mesh + sharding helpers
- ``diffute_tpu.compat``     HF (diffusers/transformers) weight import/export
- ``diffute_tpu.io``         manifest (CSV + OCR-JSON) data pipeline
"""

__version__ = "0.1.0"

from diffute_tpu import config  # noqa: F401
