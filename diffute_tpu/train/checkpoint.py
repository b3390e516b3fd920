"""Checkpoint save/restore (orbax) + diffusers-layout export.

Parity targets from the reference:
- ``accelerator.save_state(checkpoint-{step})`` every N steps with rotation
  (train_diffute_v1.py:941-945, flags :287-295; train_vae.py:746-750)
- custom hooks that also serialize diffusers-format ``unet/``, ``unet_ema/``,
  ``vae/`` subfolders (train_diffute_v1.py:662-693)
- ``--resume_from_checkpoint latest``: scan ``checkpoint-*`` dirs, pick the
  highest step (train_diffute_v1.py:829-851)

Here: orbax for the native {params, opt_state, ema, step} state (async-able,
multi-host safe), plus safetensors export in diffusers naming via
diffute_tpu.compat so reference-stack users can load our checkpoints
directly.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from diffute_tpu.compat import (export_trocr_params, export_unet_params,
                                export_vae_params, save_safetensors)


def save_checkpoint(output_dir: str, step: int, state: Any,
                    total_limit: Optional[int] = None) -> str:
    """Save train state under ``{output_dir}/checkpoint-{step}``; rotate old
    checkpoints beyond ``total_limit`` (reference flag --checkpoints_total_limit,
    train_diffute_v1.py:296-304)."""
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    # hand orbax the (possibly sharded) device arrays directly — a host
    # gather via np.asarray would break multi-host/ZeRO-sharded state and
    # stall training on a synchronous device->host copy
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    if total_limit:
        keep = set(list_checkpoints(output_dir, finalized_only=True)[-total_limit:])
        for old in list_checkpoints(output_dir):
            if old not in keep:
                shutil.rmtree(os.path.join(output_dir, old), ignore_errors=True)
    return path


class AsyncCheckpointManager:
    """Zero-stall checkpointing: orbax AsyncCheckpointer for the train state
    (device->host copy and serialization happen in the background while
    training continues) plus a background thread for the diffusers-layout
    export.  The reference's ``accelerator.save_state`` blocks the step loop
    for the full serialization (train_diffute_v1.py:941-945); here only the
    brief on-device snapshot is synchronous.

    Ordering guarantees: a new ``save`` first waits for the previous one
    (orbax serializes saves internally; the export thread is joined), so
    rotation only ever removes finalized checkpoints, and ``wait()`` at the
    end of training makes the last checkpoint durable before exit.

    Durability vs total_limit: rotation always retains the NEWEST finalized
    checkpoint, so a crash during the async save window can never leave zero
    restorable checkpoints (with total_limit=1 this means two checkpoints
    briefly coexist; ``wait()`` applies the final trim to the limit once the
    last save is durable).
    """

    def __init__(self, output_dir: str, total_limit: Optional[int] = None):
        self.output_dir = os.path.abspath(output_dir)
        self.total_limit = total_limit
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._export_thread = None

    def save(self, step: int, state: Any, export_fn=None,
             export_args: Any = None) -> str:
        """Kick off an async save of ``state`` under ``checkpoint-{step}``.

        ``export_fn(path, host_args)`` (e.g. the diffusers-layout export)
        runs on a background thread with ``host_args`` = ``export_args``
        fetched to HOST memory synchronously here — the train steps DONATE
        their state (unet_train.py:194), so any device array read after the
        next step would hit a deleted buffer.  Returns the checkpoint path
        immediately."""
        import threading

        if self._export_thread is not None:
            self._export_thread.join()
        # ensure the PRIOR async save is fully committed before rotation can
        # touch its directory (orbax also waits internally at the next save,
        # but rotation below must never race an in-flight writer)
        self._ckptr.wait_until_finished()
        if self.total_limit:
            # leave room for the incoming checkpoint, but never drop the
            # newest finalized one — it is the only restorable state until
            # the new async save commits
            self._rotate(keep=max(1, self.total_limit - 1))
        path = os.path.join(self.output_dir, f"checkpoint-{step}")
        if os.path.isdir(path) and not _is_finalized(self.output_dir,
                                                     f"checkpoint-{step}"):
            # stale leftover from a crashed save at this same step — orbax
            # refuses to write into an existing tmp dir
            shutil.rmtree(path, ignore_errors=True)
        self._ckptr.save(os.path.join(path, "state"),
                         args=ocp.args.StandardSave(state))
        if export_fn is not None:
            host_args = (jax.device_get(export_args)
                         if export_args is not None else None)
            self._export_thread = threading.Thread(
                target=export_fn, args=(path, host_args), daemon=False)
            self._export_thread.start()
        return path

    def _rotate(self, keep: int) -> None:
        """Keep the newest ``keep`` FINALIZED checkpoints; also sweep any
        unfinalized crash leftovers (safe here: callers rotate only after
        ``wait_until_finished``, so nothing is in flight)."""
        finalized = list_checkpoints(self.output_dir, finalized_only=True)
        retain = set(finalized[-keep:]) if keep else set()
        for old in list_checkpoints(self.output_dir):
            if old not in retain:
                shutil.rmtree(os.path.join(self.output_dir, old),
                              ignore_errors=True)

    def wait(self) -> None:
        if self._export_thread is not None:
            self._export_thread.join()
            self._export_thread = None
        self._ckptr.wait_until_finished()
        if self.total_limit:
            # final trim now that the last save is durable
            self._rotate(keep=self.total_limit)

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def list_checkpoints(output_dir: str, finalized_only: bool = False):
    if not os.path.isdir(output_dir):
        return []
    dirs = [d for d in os.listdir(output_dir) if re.fullmatch(r"checkpoint-\d+", d)]
    if finalized_only:
        dirs = [d for d in dirs if _is_finalized(output_dir, d)]
    return sorted(dirs, key=lambda d: int(d.split("-")[1]))


def _is_finalized(output_dir: str, name: str) -> bool:
    """A checkpoint is restorable only once orbax has renamed its tmp dir to
    ``state``.  A kill during an async save leaves ``state.orbax-checkpoint-tmp``
    behind; treating that directory as a checkpoint breaks resume (it would be
    picked as 'latest' and fail to restore) and can make rotation discard the
    real newest finalized state in favor of garbage."""
    return os.path.isdir(os.path.join(output_dir, name, "state"))


def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir, finalized_only=True)
    return os.path.join(output_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a matching state pytree)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                         target=target)


def checkpoint_step(path: str) -> int:
    """Step encoded in a checkpoint directory name (``.../checkpoint-N``).

    Returns -1 when the basename is not ``checkpoint-N`` (e.g. a copied or
    renamed checkpoint dir passed via --resume_from_checkpoint): such a dir
    is still restorable through its ``state/`` subdir, so callers using the
    step for an early-exit comparison must fall through to a normal restore
    rather than crash."""
    m = re.fullmatch(r"checkpoint-(\d+)", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else -1


def resolve_resume(output_dir: str, resume: Optional[str]) -> Optional[str]:
    """'latest' -> newest checkpoint dir; explicit path -> itself
    (reference train_diffute_v1.py:829-841)."""
    if not resume:
        return None
    if resume == "latest":
        return latest_checkpoint(output_dir)
    return resume if os.path.isdir(resume) else None


# ---------------------------------------------------------------------------
# diffusers-layout export (drop-in for the reference stack)
# ---------------------------------------------------------------------------


def export_diffusers_layout(
    path: str,
    unet_params: Optional[Any] = None,
    unet_ema_params: Optional[Any] = None,
    vae_params: Optional[Any] = None,
    unet_config: Optional[dict] = None,
    vae_config: Optional[dict] = None,
    trocr_params: Optional[Any] = None,
    trocr_config: Optional[dict] = None,
) -> None:
    """Write ``unet/``, ``unet_ema/``, ``vae/`` (and optionally ``trocr/``)
    subfolders with diffusion_pytorch_model.safetensors + config.json,
    mirroring the layout the reference's save hooks produce
    (train_diffute_v1.py:662-675).  Including the frozen ``vae/`` and
    ``trocr/`` makes a stage-2 checkpoint a SELF-CONTAINED pipeline dir:
    serve/eval load the exact conditioning encoder training used."""
    for sub, params, cfg, export, fname in (
        ("unet", unet_params, unet_config, export_unet_params,
         "diffusion_pytorch_model.safetensors"),
        ("unet_ema", unet_ema_params, unet_config, export_unet_params,
         "diffusion_pytorch_model.safetensors"),
        ("vae", vae_params, vae_config, export_vae_params,
         "diffusion_pytorch_model.safetensors"),
        ("trocr", trocr_params, trocr_config, export_trocr_params,
         "model.safetensors"),
    ):
        if params is None:
            continue
        d = os.path.join(path, sub)
        os.makedirs(d, exist_ok=True)
        sd = export(jax.tree_util.tree_map(np.asarray, params))
        save_safetensors(sd, os.path.join(d, fname))
        if cfg is not None:
            with open(os.path.join(d, "config.json"), "w") as f:
                json.dump(cfg, f, indent=2)


def diffusers_unet_config_json(config) -> dict:
    """Our UNetConfig -> diffusers UNet2DConditionModel config dict."""
    down = ["CrossAttnDownBlock2D" if a else "DownBlock2D"
            for a in config.down_block_has_attn]
    up = ["CrossAttnUpBlock2D" if a else "UpBlock2D"
          for a in config.up_block_has_attn]
    return {
        "_class_name": "UNet2DConditionModel",
        "sample_size": config.sample_size,
        "in_channels": config.in_channels,
        "out_channels": config.out_channels,
        "block_out_channels": list(config.block_out_channels),
        "layers_per_block": config.layers_per_block,
        "down_block_types": down,
        "up_block_types": up,
        "attention_head_dim": list(config.num_attention_heads),
        "cross_attention_dim": config.cross_attention_dim,
        "norm_num_groups": config.norm_num_groups,
        "use_linear_projection": config.use_linear_projection,
        "act_fn": "silu",
    }


def vit_config_json(config) -> dict:
    """Our TrOCRConfig -> transformers ViTModel config dict (the encoder the
    reference takes from VisionEncoderDecoderModel, train_diffute_v1.py:631)."""
    return {
        "model_type": "vit",
        "hidden_size": config.hidden_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "intermediate_size": config.intermediate_size,
        "image_size": config.image_size,
        "patch_size": config.patch_size,
        "num_channels": config.num_channels,
        "layer_norm_eps": config.layer_norm_eps,
        "qkv_bias": config.qkv_bias,
    }


def diffusers_vae_config_json(config) -> dict:
    return {
        "_class_name": "AutoencoderKL",
        "sample_size": config.sample_size,
        "in_channels": config.in_channels,
        "out_channels": config.out_channels,
        "block_out_channels": list(config.block_out_channels),
        "layers_per_block": config.layers_per_block,
        "latent_channels": config.latent_channels,
        "norm_num_groups": config.norm_num_groups,
        "scaling_factor": config.scaling_factor,
        "down_block_types": ["DownEncoderBlock2D"] * len(config.block_out_channels),
        "up_block_types": ["UpDecoderBlock2D"] * len(config.block_out_channels),
        "act_fn": "silu",
    }
