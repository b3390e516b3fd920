"""HuggingFace (diffusers/transformers) checkpoint import/export.

The reference loads its models with ``from_pretrained`` from the diffusers
directory layout (reference train_diffute_v1.py:628-635: `scheduler/`,
`vae/`, `unet/` subfolders; TrOCR via transformers at :630-631) and exports
checkpoints back into that layout via accelerate save hooks
(train_diffute_v1.py:662-693).  This module provides the equivalent:
bidirectional translation between torch state_dicts (as numpy arrays — torch
itself is not required) and our Flax parameter trees.

Translation rules:
- key paths: diffusers dotted names -> our flattened module names
  (``down_blocks.0.resnets.1`` -> ``down_blocks_0_resnets_1``), which were
  chosen to make this mapping mechanical;
- tensors: conv kernels (O,I,kH,kW) -> (kH,kW,I,O); linear kernels
  (O,I) -> (I,O); norm ``weight`` -> ``scale``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


Params = Dict[str, Any]


def _set_path(tree: Params, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _iter_paths(tree: Mapping, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _iter_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _convert_tensor(key: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map a torch parameter to (flax leaf name, transposed array)."""
    value = np.asarray(value)
    if key.endswith(".weight"):
        if value.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear (O,I) -> (I,O)
            return "kernel", value.transpose(1, 0)
        return "scale", value  # norm
    if key.endswith(".bias"):
        return "bias", value
    # passthrough tensors (cls_token, position_embeddings)
    return key.rsplit(".", 1)[-1], value


def _deconvert_tensor(leaf: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    value = np.asarray(value)
    if leaf == "kernel":
        if value.ndim == 4:
            return "weight", value.transpose(3, 2, 0, 1)
        return "weight", value.transpose(1, 0)
    if leaf == "scale":
        return "weight", value
    return leaf, value


# ---------------------------------------------------------------------------
# UNet / VAE (diffusers)
# ---------------------------------------------------------------------------

# Ordered regex rewrites from diffusers module paths to our module names.
_DIFFUSERS_REWRITES = [
    (re.compile(r"\b(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|downsamplers|upsamplers)\.(\d+)\."),
     r"\1_\2_\3_\4/"),
    (re.compile(r"\bmid_block\.(resnets|attentions)\.(\d+)\."), r"mid_block_\1_\2/"),
    (re.compile(r"\btransformer_blocks\.(\d+)\."), r"transformer_blocks_\1/"),
    (re.compile(r"\bto_out\.0\."), r"to_out_0/"),
    (re.compile(r"\bff\.net\.0\.proj\."), r"ff/net_0/proj/"),
    (re.compile(r"\bff\.net\.2\."), r"ff/net_2/"),
    (re.compile(r"\btime_embedding\.(linear_\d)\."), r"time_embedding/\1/"),
    (re.compile(r"\b(attn1|attn2)\."), r"\1/"),
]

# VAE-specific: mid-block attention (both modern `to_*` and legacy
# AttentionBlock `query/key/value/proj_attn` names).
_VAE_ATTN_REWRITES = [
    (re.compile(r"\bmid_block\.attentions\.0\.group_norm\."), r"mid_block/attn_group_norm/"),
    (re.compile(r"\bmid_block\.attentions\.0\.to_q\."), r"mid_block/attentions_0/to_q/"),
    (re.compile(r"\bmid_block\.attentions\.0\.to_k\."), r"mid_block/attentions_0/to_k/"),
    (re.compile(r"\bmid_block\.attentions\.0\.to_v\."), r"mid_block/attentions_0/to_v/"),
    (re.compile(r"\bmid_block\.attentions\.0\.to_out\.0\."), r"mid_block/attentions_0/to_out_0/"),
    # legacy names
    (re.compile(r"\bmid_block\.attentions\.0\.norm\."), r"mid_block/attn_group_norm/"),
    (re.compile(r"\bmid_block\.attentions\.0\.query\."), r"mid_block/attentions_0/to_q/"),
    (re.compile(r"\bmid_block\.attentions\.0\.key\."), r"mid_block/attentions_0/to_k/"),
    (re.compile(r"\bmid_block\.attentions\.0\.value\."), r"mid_block/attentions_0/to_v/"),
    (re.compile(r"\bmid_block\.attentions\.0\.proj_attn\."), r"mid_block/attentions_0/to_out_0/"),
    (re.compile(r"\bmid_block\.resnets\.(\d+)\."), r"mid_block/resnets_\1/"),
    (re.compile(r"\b(down_blocks|up_blocks)\.(\d+)\.(resnets|downsamplers|upsamplers)\.(\d+)\."),
     r"\1_\2_\3_\4/"),
]


def _translate(key: str, rewrites) -> str:
    for pat, repl in rewrites:
        key = pat.sub(repl, key)
    return key


def import_unet_state_dict(state_dict: Mapping[str, np.ndarray]) -> Params:
    """diffusers UNet2DConditionModel state_dict -> flax params tree."""
    params: Params = {}
    for key, value in state_dict.items():
        new_key = _translate(key, _DIFFUSERS_REWRITES)
        leaf, arr = _convert_tensor(key, value)
        parts = tuple(p for seg in new_key.split("/") for p in _split_dotted(seg, leaf))
        _set_path(params, parts, arr)
    return params


def import_vae_state_dict(state_dict: Mapping[str, np.ndarray]) -> Params:
    """diffusers AutoencoderKL state_dict -> flax params tree.

    Legacy AttentionBlock projections are stored as (C, C, 1, 1) convs in very
    old checkpoints; those are squeezed to linear kernels.
    """
    params: Params = {}
    for key, value in state_dict.items():
        scope_key = key
        for prefix in ("encoder.", "decoder."):
            if key.startswith(prefix):
                scope_key = key[len(prefix):]
                break
        new_key = _translate(scope_key, _VAE_ATTN_REWRITES)
        value = np.asarray(value)
        if ("attentions_0/to_" in new_key and value.ndim == 4
                and value.shape[2:] == (1, 1)):
            value = value[:, :, 0, 0]
        leaf, arr = _convert_tensor(key, value)
        parts = tuple(p for seg in new_key.split("/") for p in _split_dotted(seg, leaf))
        if key.startswith(("encoder.", "decoder.")):
            parts = (key.split(".", 1)[0],) + parts
        _set_path(params, parts, arr)
    return params


def _split_dotted(segment: str, leaf: str) -> Tuple[str, ...]:
    """Split a residual dotted segment, replacing the torch leaf with the flax
    leaf name: 'norm1.weight' + scale -> ('norm1', 'scale')."""
    parts = segment.split(".")
    parts = [p for p in parts if p]
    if parts and parts[-1] in ("weight", "bias"):
        parts[-1] = leaf
    elif parts and parts[-1] in ("cls_token", "position_embeddings"):
        pass
    return tuple(parts)


# ---------------------------------------------------------------------------
# TrOCR / ViT (transformers)
# ---------------------------------------------------------------------------

_VIT_REWRITES = [
    (re.compile(r"^embeddings\.cls_token$"), r"cls_token"),
    (re.compile(r"^embeddings\.position_embeddings$"), r"position_embeddings"),
    (re.compile(r"^embeddings\.patch_embeddings\.projection\."), r"patch_embeddings/"),
    (re.compile(r"^encoder\.layer\.(\d+)\.attention\.attention\.(query|key|value)\."),
     r"layer_\1/attention/\2/"),
    (re.compile(r"^encoder\.layer\.(\d+)\.attention\.output\.dense\."),
     r"layer_\1/attention/output_dense/"),
    (re.compile(r"^encoder\.layer\.(\d+)\.intermediate\.dense\."),
     r"layer_\1/intermediate_dense/"),
    (re.compile(r"^encoder\.layer\.(\d+)\.output\.dense\."),
     r"layer_\1/output_dense/"),
    (re.compile(r"^encoder\.layer\.(\d+)\.(layernorm_before|layernorm_after)\."),
     r"layer_\1/\2/"),
    (re.compile(r"^layernorm\."), r"layernorm/"),
]


def import_trocr_state_dict(state_dict: Mapping[str, np.ndarray]) -> Params:
    """HF ViTModel (or VisionEncoderDecoder ``encoder.``-prefixed) state_dict
    -> flax params for TrOCREncoder.  Pooler weights are dropped (unused by
    ``last_hidden_state``)."""
    params: Params = {}
    for key, value in state_dict.items():
        if key.startswith("encoder.encoder.") or key.startswith("encoder.embeddings."):
            key = key[len("encoder."):]  # VisionEncoderDecoder prefix
        elif key.startswith("encoder.layernorm."):
            key = key[len("encoder."):]
        if key.startswith("pooler."):
            continue
        new_key = _translate(key, _VIT_REWRITES)
        if new_key == key and not any(
            new_key.startswith(p) for p in ("cls_token", "position_embeddings",
                                            "patch_embeddings", "layer_", "layernorm")
        ):
            continue  # decoder weights etc.
        leaf, arr = _convert_tensor(key, value)
        parts = tuple(p for seg in new_key.split("/") for p in _split_dotted(seg, leaf))
        _set_path(params, parts, arr)
    return params


# ---------------------------------------------------------------------------
# Export (flax -> diffusers-layout torch-style dict)
# ---------------------------------------------------------------------------


def _export(params: Mapping) -> Dict[str, np.ndarray]:
    """Invert the import mapping: reconstruct diffusers dotted keys from the
    flax paths via string surgery (the hard-coded inverse of the forward
    rewrite grammar — both UNet and VAE names are covered)."""
    out: Dict[str, np.ndarray] = {}
    for path, value in _iter_paths(params):
        leaf = path[-1]
        torch_leaf, arr = _deconvert_tensor(leaf, value)
        segs = list(path[:-1])
        name = ".".join(segs) + "." + torch_leaf if segs else torch_leaf
        # undo flattened block names
        name = re.sub(r"\b(down_blocks|up_blocks)_(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)\b",
                      r"\1.\2.\3.\4", name)
        name = re.sub(r"\bmid_block_(resnets|attentions)_(\d+)\b", r"mid_block.\1.\2", name)
        name = re.sub(r"\bmid_block\.attn_group_norm\b", "mid_block.attentions.0.group_norm", name)
        name = re.sub(r"\bmid_block\.(resnets|attentions)_(\d+)\b", r"mid_block.\1.\2", name)
        name = re.sub(r"\btransformer_blocks_(\d+)\b", r"transformer_blocks.\1", name)
        name = re.sub(r"\bto_out_0\b", "to_out.0", name)
        name = re.sub(r"\bff\.net_0\.proj\b", "ff.net.0.proj", name)
        name = re.sub(r"\bff\.net_2\b", "ff.net.2", name)
        out[name] = arr
    return out


def export_unet_params(params: Mapping) -> Dict[str, np.ndarray]:
    """Flax UNet params -> diffusers UNet2DConditionModel state_dict (numpy)."""
    return _export(params)


def export_vae_params(params: Mapping) -> Dict[str, np.ndarray]:
    """Flax AutoencoderKL params -> diffusers AutoencoderKL state_dict."""
    return _export(params)


def export_trocr_params(params: Mapping) -> Dict[str, np.ndarray]:
    """Flax TrOCREncoder params -> transformers ViTModel state_dict (the
    inverse of ``import_trocr_state_dict``'s ``_VIT_REWRITES``), so trainer
    checkpoints can carry the frozen conditioning encoder in a layout the
    reference stack loads (train_diffute_v1.py:631)."""
    out: Dict[str, np.ndarray] = {}
    for path, value in _iter_paths(params):
        leaf = path[-1]
        torch_leaf, arr = _deconvert_tensor(leaf, value)
        name = ".".join(path[:-1]) + "." + torch_leaf if path[:-1] else torch_leaf
        name = re.sub(r"^cls_token$", "embeddings.cls_token", name)
        name = re.sub(r"^position_embeddings$",
                      "embeddings.position_embeddings", name)
        name = re.sub(r"^patch_embeddings\.",
                      "embeddings.patch_embeddings.projection.", name)
        name = re.sub(r"^layer_(\d+)\.attention\.(query|key|value)\.",
                      r"encoder.layer.\1.attention.attention.\2.", name)
        name = re.sub(r"^layer_(\d+)\.attention\.output_dense\.",
                      r"encoder.layer.\1.attention.output.dense.", name)
        name = re.sub(r"^layer_(\d+)\.intermediate_dense\.",
                      r"encoder.layer.\1.intermediate.dense.", name)
        name = re.sub(r"^layer_(\d+)\.output_dense\.",
                      r"encoder.layer.\1.output.dense.", name)
        name = re.sub(r"^layer_(\d+)\.(layernorm_before|layernorm_after)\.",
                      r"encoder.layer.\1.\2.", name)
        name = re.sub(r"^layernorm\.", "layernorm.", name)
        out[name] = arr
    return out


# ---------------------------------------------------------------------------
# safetensors IO
# ---------------------------------------------------------------------------


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return dict(load_file(path))


def save_safetensors(state_dict: Mapping[str, np.ndarray], path: str) -> None:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, path)
