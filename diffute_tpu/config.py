"""Typed configuration tree for every diffute_tpu component.

The reference scatters its configuration over ~40 argparse flags duplicated in
three scripts (reference train_diffute_v1.py:69-332, train_vae.py:61-323,
app.ipynb:69-327) plus hard-coded constants (font size 40 / canvas height 60 at
train_diffute_v1.py:352-358, crop_scale 256 at :457, OCR score threshold 0.8 at
:446).  Here all of it is collected into frozen dataclasses; model configs
default to the SD2-inpainting / TrOCR-large architecture the reference loads
from the HuggingFace hub (train_diffute_v1.py:628-635).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL architecture (SD2 VAE defaults).

    Matches the model the reference fine-tunes in train_vae.py:516-517 and
    freezes in train_diffute_v1.py:632.
    """

    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_size: int = 512
    scaling_factor: float = 0.18215
    # dtype for parameters / compute; fp32 default, bf16 for TPU speed runs.
    dtype: jnp.dtype = jnp.float32
    # Rematerialize resnet blocks during stage-1 training (512^2 pixel-space
    # activations are the memory hot spot).
    remat: bool = False
    # Route the mid-block's single-head attention (head_dim = 512, seq =
    # (res/8)^2 = 4096..16384 tokens) through the Pallas flash kernel.
    use_flash_attention: bool = False

    @property
    def scale_factor(self) -> int:
        """Spatial downsampling factor, 2**(n_blocks-1) = 8.

        Mirrors `vae_scale_factor` at reference train_diffute_v1.py:800.
        """
        return 2 ** (len(self.block_out_channels) - 1)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """UNet2DConditionModel architecture (SD2-inpainting defaults).

    9 input channels = 4 noisy latent + 1 downsampled mask + 4 masked-image
    latent, concatenated at reference train_diffute_v1.py:912 / app.ipynb:811.
    ``attention_head_dim`` follows diffusers' (historically misnamed) config
    field: it is the per-resolution *number of heads*; head size is
    channels/heads = 64 everywhere.
    """

    sample_size: int = 64
    in_channels: int = 9
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # down_block_types / up_block_types encoded as has-cross-attention flags,
    # bottom-to-top resolution order for down, reverse for up.
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    use_linear_projection: bool = True  # SD2 Transformer2D uses linear proj
    freq_shift: int = 0
    flip_sin_to_cos: bool = True
    dtype: jnp.dtype = jnp.float32
    # Use Pallas flash-attention kernels instead of XLA dot-product attention.
    use_flash_attention: bool = False
    # Use the fused Pallas GroupNorm+SiLU kernel in resnet blocks.
    use_fused_groupnorm: bool = False
    # Serve transformer weights int8 (per-channel scales, Pallas int8-read
    # matmul) — inference only; see diffute_tpu.ops.quant.
    use_int8_weights: bool = False
    # Fuse GN+SiLU+conv3x3 into one Pallas kernel per resnet half
    # (ops/conv_fused.py) — the normalized tensor never leaves VMEM.
    use_fused_conv: bool = False
    # Rematerialize attention/resnet blocks to trade FLOPs for HBM (training).
    remat: bool = False


@dataclasses.dataclass(frozen=True)
class TrOCRConfig:
    """ViT-large encoder of microsoft/trocr-large-printed.

    Only the encoder is used for conditioning (reference
    train_diffute_v1.py:631: ``VisionEncoderDecoderModel...encoder``); output
    is ``last_hidden_state`` of shape (B, 577, 1024).
    """

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 384
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-12
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash_attention: bool = False

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1  # 577


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Noise-schedule config (SD2-inpainting `scheduler/` subfolder values).

    The reference loads this via DDPMScheduler.from_pretrained at
    train_diffute_v1.py:628 / app.ipynb:545; the hub config carries
    scaled_linear betas 0.00085->0.012 over 1000 train timesteps,
    epsilon prediction, clip_sample disabled.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # {linear, scaled_linear, squaredcos_cap_v2}
    prediction_type: str = "epsilon"  # {epsilon, v_prediction}
    clip_sample: bool = False
    steps_offset: int = 1  # used by DDIM timestep spacing, ignored by DDPM
    set_alpha_to_one: bool = False
    variance_type: str = "fixed_small"


@dataclasses.dataclass(frozen=True)
class GlyphConfig:
    """Glyph rendering constants (reference draw_text, train_diffute_v1.py:352-368).

    Canvas is ``((len(text)+2)*font_size, canvas_height)`` white RGB; the text
    is drawn black at ``text_pos``; empty strings are treated as length
    ``empty_text_len``.  The reference font arialuni.ttf is stripped from the
    snapshot (.MISSING_LARGE_BLOBS); ``font_path=None`` selects the first
    available fallback font.
    """

    font_size: int = 40
    canvas_height: int = 60
    text_pos: Tuple[int, int] = (40, 10)
    empty_text_len: int = 3
    font_path: Optional[str] = None  # None -> search FALLBACK_FONTS


@dataclasses.dataclass(frozen=True)
class EditConfig:
    """Inference pipeline configuration (reference text_editing, app.ipynb:653-854)."""

    resolution: int = 512
    num_inference_steps: int = 50  # reference demo default is 150 (app.ipynb:914)
    sampler: str = "ddim"  # {ddpm, ddim, dpmpp}; reference uses DDPM-ancestral
    # Classifier-free guidance.  The reference defines --guidance_scale but
    # never applies it (CFG code commented out, train_diffute_v1.py:915-917);
    # guidance_scale <= 1 reproduces reference behavior.
    guidance_scale: float = 1.0
    # Blend noised original latents into the unmasked region each step
    # (opt-in; the reference carries the constraint purely through the
    # 9-channel conditioning — SURVEY.md §3.3).
    masked_latent_blend: bool = False
    # Encoder propagation (Faster Diffusion, arXiv:2312.09608): run the UNet
    # encoder only every k-th step and reuse its features on the others,
    # cutting ~35% of UNet FLOPs per reused step.  1 = off (exact sampling);
    # experimental — quality impact must be validated with real weights.
    encoder_reuse_interval: int = 1
    seed: int = 0  # reference seeds initial latents with torch.manual_seed(0)
    # Train-time crop window (reference crop_scale=256, train_diffute_v1.py:457)
    train_crop_scale: int = 256
    dtype: jnp.dtype = jnp.float32


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer + LR schedule (reference train_diffute_v1.py:709-727, 772-777).

    ``name="adamw"`` is the reference-parity default; ``"adafactor"``
    (factored second moment, no per-param v) is the memory option that lets
    the full 866M UNet train on a single 16GB v5e chip.
    """

    name: str = "adamw"  # {adamw, adafactor, adamw8bit}
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lr_scheduler: str = "constant"  # {constant, constant_with_warmup, linear, cosine, cosine_with_restarts, polynomial}
    lr_warmup_steps: int = 500
    # hard-restart cycle count for cosine_with_restarts (diffusers
    # get_scheduler forwards num_cycles; its default for this schedule is 1)
    lr_num_cycles: int = 1
    scale_lr: bool = False
    # Low-memory Adam moments — the TPU-native counterpart of the reference's
    # optional bitsandbytes AdamW8bit (train_diffute_v1.py:244-248,709-719):
    # stores the first moment in bfloat16 (optax mu_dtype).
    low_memory_adam: bool = False


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration shared by stage-1 (VAE) and stage-2 (UNet)."""

    train_batch_size: int = 16  # per-device (reference train_diffute_v1.py:160-162)
    gradient_accumulation_steps: int = 1
    num_train_epochs: int = 100
    max_train_steps: Optional[int] = None
    mixed_precision: str = "no"  # {no, bf16}
    gradient_checkpointing: bool = False
    use_ema: bool = False
    ema_decay: float = 0.9999
    checkpointing_steps: int = 1000  # 500 for VAE stage (train_vae.py:278-286)
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None  # path or "latest"
    seed: int = 0
    output_dir: str = "diffute-output"
    logging_dir: str = "logs"
    report_to: str = "tensorboard"
    noise_offset: float = 0.0
    prediction_type: Optional[str] = None  # override scheduler's, like the flag
    ocr_score_threshold: float = 0.8  # reference train_diffute_v1.py:446
    dataloader_num_workers: int = 0
    # Parallelism: data-parallel size -1 = all devices; optimizer-state
    # sharding (ZeRO-1 style) over the data axis.
    dp_size: int = -1
    shard_optimizer_states: bool = False
    # Donate the train state to the jitted step (in-place update, halves
    # transient param memory).  None = auto: donate everywhere EXCEPT
    # relay-attached backends (axon), where donation round-trips the state
    # through the host (~76 s/step measured for the 866M trainer vs 0.4 s
    # without).  True/False forces.
    donate_state: Optional[bool] = None
    # Run this many consecutive optimizer steps inside ONE lax.scan
    # executable (state chains on device; batches get a leading
    # steps_per_call dim).  Amortizes per-call dispatch; on the relay
    # backend it is the difference between ~45 s/step and device speed.
    # Requires gradient_accumulation_steps == 1 when > 1.
    steps_per_call: int = 1
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)


@dataclasses.dataclass(frozen=True)
class DiffUTEConfig:
    """Top-level bundle used by pipelines and trainers."""

    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    trocr: TrOCRConfig = dataclasses.field(default_factory=TrOCRConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    glyph: GlyphConfig = dataclasses.field(default_factory=GlyphConfig)
    edit: EditConfig = dataclasses.field(default_factory=EditConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def small_config() -> DiffUTEConfig:
    """A reduced-width SD2 topology for on-chip convergence experiments.

    Same component structure as the full config (multi-level UNet with
    cross-attention conditioning on a frozen ViT encoder over glyph renders,
    KL VAE, SD2 noise schedule) at 256^2 pixels / 64^2 latents and ~1/10 the
    parameters, so the two-stage train -> edit -> OCR-verify loop is
    demonstrable on one chip in minutes instead of GPU-days (the reference's
    full recipe: >= 350k VAE steps feeding the UNet stage,
    train_diffute_v1.py:632).

    The VAE downsamples 4x (3 blocks), not the full config's 8x: measured on
    the trained 8x small VAE, direct reconstruction of ~20-40 px text was
    OCR-unreadable (the edit's fidelity upper bound), so the small scale
    keeps the UNet at the SAME 64^2 latent grid as full SD2 while giving the
    VAE 4x more latent capacity per pixel — pure-MSE training (the
    reference's stage-1 loss, train_vae.py:724) then preserves text.
    """
    return DiffUTEConfig(
        vae=VAEConfig(block_out_channels=(64, 128, 256),
                      layers_per_block=2, norm_num_groups=32,
                      sample_size=256, latent_channels=4),
        unet=UNetConfig(sample_size=64, block_out_channels=(128, 256, 512),
                        layers_per_block=2,
                        down_block_has_attn=(True, True, False),
                        up_block_has_attn=(False, True, True),
                        num_attention_heads=(2, 4, 8),
                        cross_attention_dim=256, norm_num_groups=32),
        trocr=TrOCRConfig(hidden_size=256, num_hidden_layers=4,
                          num_attention_heads=4, intermediate_size=1024,
                          image_size=224, patch_size=16),
        scheduler=SchedulerConfig(),
        glyph=GlyphConfig(),
        edit=EditConfig(resolution=256, train_crop_scale=256),
        train=TrainConfig(train_batch_size=16),
    )


def tiny_test_config() -> DiffUTEConfig:
    """A miniature config for CPU unit tests (all dims shrunk, same topology)."""
    return DiffUTEConfig(
        vae=VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                      norm_num_groups=4, sample_size=32, latent_channels=4),
        unet=UNetConfig(sample_size=8, block_out_channels=(16, 32),
                        layers_per_block=1, down_block_has_attn=(True, False),
                        up_block_has_attn=(False, True),
                        num_attention_heads=(2, 4), cross_attention_dim=16,
                        norm_num_groups=4),
        trocr=TrOCRConfig(hidden_size=16, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=32,
                          image_size=32, patch_size=16),
        scheduler=SchedulerConfig(),
        glyph=GlyphConfig(),
        edit=EditConfig(resolution=32, num_inference_steps=5),
        train=TrainConfig(train_batch_size=2),
    )
