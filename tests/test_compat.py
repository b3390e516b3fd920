"""Weight import/export: HF naming round-trips + numeric parity vs
transformers' torch ViTModel (the TrOCR encoder's upstream implementation,
reference train_diffute_v1.py:630-631).

diffusers itself is not installed in this image, so UNet/VAE conversion is
validated by (a) exact round-trip through the diffusers key grammar and
(b) golden key-name membership checks against the known SD2 checkpoint
naming.  The ViT path gets true end-to-end numeric parity against torch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.compat import (
    export_unet_params,
    export_vae_params,
    import_trocr_state_dict,
    import_unet_state_dict,
    import_vae_state_dict,
)
from diffute_tpu.config import TrOCRConfig, tiny_test_config
from diffute_tpu.models import AutoencoderKL, TrOCREncoder, UNet2DCondition


@pytest.fixture(scope="module")
def tiny():
    return tiny_test_config()


def _tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=path + "/" + str(k))


def test_unet_roundtrip(tiny):
    model = UNet2DCondition(tiny.unet)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 9)), jnp.array(0),
        jnp.zeros((1, 5, tiny.unet.cross_attention_dim)),
    )["params"]
    sd = export_unet_params(params)
    # Golden diffusers key names (SD2-inpainting unet checkpoint grammar).
    for key in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.resnets.0.time_emb_proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.0.conv1.weight",
        "mid_block.attentions.0.transformer_blocks.0.norm3.weight",
        "up_blocks.1.resnets.1.conv_shortcut.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert key in sd, key
    # conv kernels exported in torch OIHW layout
    assert sd["conv_in.weight"].shape == (16, 9, 3, 3)
    assert sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight"].shape == (16, 16)
    back = import_unet_state_dict(sd)
    _tree_equal(params, back)


def test_vae_roundtrip(tiny):
    model = AutoencoderKL(tiny.vae)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jax.random.PRNGKey(1))["params"]
    sd = export_vae_params(params)
    for key in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.resnets.0.norm1.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.resnets.0.conv1.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "encoder.mid_block.attentions.0.to_q.weight",
        "encoder.mid_block.attentions.0.to_out.0.weight",
        "encoder.conv_norm_out.weight",
        "decoder.up_blocks.0.resnets.0.conv1.weight",
        "decoder.up_blocks.0.upsamplers.0.conv.weight",
        "quant_conv.weight",
        "post_quant_conv.bias",
    ]:
        assert key in sd, key
    back = import_vae_state_dict(sd)
    _tree_equal(params, back)


def test_vae_legacy_attention_names(tiny):
    # Very old diffusers VAEs store the mid attention as AttentionBlock with
    # query/key/value/proj_attn and (C,C,1,1) conv projections.
    model = AutoencoderKL(tiny.vae)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                        jax.random.PRNGKey(1))["params"]
    sd = export_vae_params(params)
    legacy = {}
    for k, v in sd.items():
        k2 = (k.replace("attentions.0.to_q.", "attentions.0.query.")
               .replace("attentions.0.to_k.", "attentions.0.key.")
               .replace("attentions.0.to_v.", "attentions.0.value.")
               .replace("attentions.0.to_out.0.", "attentions.0.proj_attn.")
               .replace("attentions.0.group_norm.", "attentions.0.norm."))
        if k2 != k and k2.endswith(".weight") and v.ndim == 2:
            v = v[:, :, None, None]
        legacy[k2] = v
    back = import_vae_state_dict(legacy)
    _tree_equal(params, back)


def test_trocr_parity_vs_torch():
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       image_size=32, patch_size=16, hidden_act="gelu",
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    torch_model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}

    cfg = TrOCRConfig(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      image_size=32, patch_size=16)
    model = TrOCREncoder(cfg)
    params = import_trocr_state_dict(sd)

    x = np.random.RandomState(0).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(pixel_values=torch.from_numpy(x)).last_hidden_state.numpy()
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_trocr_import_from_vision_encoder_decoder_prefix():
    torch = pytest.importorskip("torch")
    from transformers import ViTConfig, ViTModel

    hf_cfg = ViTConfig(hidden_size=32, num_hidden_layers=1,
                       num_attention_heads=2, intermediate_size=64,
                       image_size=32, patch_size=16)
    torch_model = ViTModel(hf_cfg, add_pooling_layer=False).eval()
    sd = {"encoder." + k: v.detach().numpy()
          for k, v in torch_model.state_dict().items()}
    sd["decoder.model.decoder.embed_tokens.weight"] = np.zeros((4, 8), np.float32)
    params = import_trocr_state_dict(sd)
    assert "layer_0" in params and "patch_embeddings" in params
    assert "decoder" not in str(params.keys())
