"""Full-topology numeric parity: our Flax UNet/VAE vs a torch mirror.

Block-level parity (tests/test_torch_parity.py) can't see composition bugs:
block ordering, skip-stack wiring, up-path concat channel bookkeeping,
mid-block placement, kv-precompute indexing.  This file composes torch
modules (written here from the SD2 architecture spec, with diffusers state-
dict naming) into the COMPLETE SD2-inpainting UNet and SD2 VAE at the real
depth/width (block_out_channels (320,640,1280,1280) / (128,256,512,512),
heads (5,10,20,20), 2 layers/block) with reduced spatial dims, then asserts
fp32 logit parity end-to-end THROUGH the HF import path
(compat/hf_import.import_unet_state_dict / import_vae_state_dict) — so a
wiring mistake in either the Flax model or the name translation fails here.

Also pins the `cross_attention_kv` fast path (precomputed loop-invariant K/V)
to the plain forward — the indexing across down/mid/up attention layers is
exactly the class of bug block tests can't see.

Reference semantics mirrored: the diffusers UNet2DConditionModel /
AutoencoderKL forwards the reference calls at train_diffute_v1.py:913 and
train_diffute_v1.py:875-876 / app.ipynb:811-819.
"""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional

from diffute_tpu.compat.hf_import import (
    import_unet_state_dict,
    import_vae_state_dict,
)
from diffute_tpu.config import UNetConfig, VAEConfig
from diffute_tpu.models import AutoencoderKL, UNet2DCondition
from diffute_tpu.models.unet import count_params


# ---------------------------------------------------------------------------
# torch mirror modules (diffusers state-dict naming)
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = tnn.Linear(temb_dim, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class TAttention(tnn.Module):
    def __init__(self, query_dim, ctx_dim, heads, head_dim, qkv_bias=False):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(query_dim, inner, bias=qkv_bias)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=qkv_bias)
        self.to_out = tnn.ModuleList([tnn.Linear(inner, query_dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, s, _ = x.shape
        t = ctx.shape[1]
        h, d = self.heads, self.head_dim
        q = self.to_q(x).view(b, s, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, t, h, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, t, h, d).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, s, h * d)
        return self.to_out[0](out)


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        # net.0 = GEGLU, net.1 = dropout (paramless), net.2 = out proj
        self.net = tnn.ModuleList(
            [TGEGLU(dim, dim * mult), tnn.Identity(), tnn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttention(dim, dim, heads, dim // heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TAttention(dim, ctx_dim, heads, dim // heads)
        self.norm3 = tnn.LayerNorm(dim, eps=1e-5)
        self.ff = TFeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class TTransformer2D(tnn.Module):
    """Linear-projection spatial transformer (SD2 use_linear_projection)."""

    def __init__(self, channels, heads, ctx_dim, groups=32):
        super().__init__()
        self.norm = tnn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = tnn.Linear(channels, channels)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicTransformerBlock(channels, heads, ctx_dim)])
        self.proj_out = tnn.Linear(channels, channels)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        x = self.norm(x)
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        x = self.proj_in(x)
        x = self.transformer_blocks[0](x, ctx)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + res


class TDownsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))  # asymmetric SD padding


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TTimestepEmbedding(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def _sinusoid(t, dim):
    """SD timestep sinusoid, flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half, dtype=np.float64) / half)
    args = np.asarray(t, np.float64)[:, None] * freqs[None]
    return torch.from_numpy(
        np.concatenate([np.cos(args), np.sin(args)], axis=-1).astype(np.float32))


class _Blk(tnn.Module):
    """Bag of named children (resnets/attentions/downsamplers/upsamplers)."""

    def __init__(self, **lists):
        super().__init__()
        for k, v in lists.items():
            setattr(self, k, tnn.ModuleList(v))


class TUNet(tnn.Module):
    """Full SD2-inpainting UNet2DConditionModel mirror (diffusers naming)."""

    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        temb_dim = chans[0] * 4
        ctx = cfg.cross_attention_dim

        groups = cfg.norm_num_groups
        self.time_embedding = TTimestepEmbedding(chans[0], temb_dim)
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)

        # skip-channel bookkeeping mirrors the encode() stack
        skip_ch = [chans[0]]
        self.down_blocks = tnn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            resnets, attns = [], []
            for _ in range(cfg.layers_per_block):
                resnets.append(TResnet(prev, ch, temb_dim, groups))
                prev = ch
                if cfg.down_block_has_attn[i]:
                    attns.append(TTransformer2D(
                        ch, cfg.num_attention_heads[i], ctx, groups))
                skip_ch.append(ch)
            lists = {"resnets": resnets}
            if attns:
                lists["attentions"] = attns
            if i < n - 1:
                lists["downsamplers"] = [TDownsample(ch)]
                skip_ch.append(ch)
            self.down_blocks.append(_Blk(**lists))

        mid = chans[-1]
        self.mid_block = _Blk(
            resnets=[TResnet(mid, mid, temb_dim, groups),
                     TResnet(mid, mid, temb_dim, groups)],
            attentions=[TTransformer2D(mid, cfg.num_attention_heads[-1], ctx,
                                       groups)])

        self.up_blocks = tnn.ModuleList()
        prev = mid
        for u, (ch, i) in enumerate(zip(reversed(chans), reversed(range(n)))):
            resnets, attns = [], []
            for _ in range(cfg.layers_per_block + 1):
                cin = prev + skip_ch.pop()
                resnets.append(TResnet(cin, ch, temb_dim, groups))
                prev = ch
                if cfg.up_block_has_attn[u]:
                    attns.append(TTransformer2D(
                        ch, cfg.num_attention_heads[i], ctx, groups))
            lists = {"resnets": resnets}
            if attns:
                lists["attentions"] = attns
            if u < n - 1:
                lists["upsamplers"] = [TUpsample(ch)]
            self.up_blocks.append(_Blk(**lists))

        self.conv_norm_out = tnn.GroupNorm(cfg.norm_num_groups, chans[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, ctx):
        cfg = self.cfg
        temb = self.time_embedding(_sinusoid(timesteps, cfg.block_out_channels[0]))

        x = self.conv_in(sample)
        skips = [x]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, ctx)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if hasattr(blk, "attentions"):
                    x = blk.attentions[j](x, ctx)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAEMid(tnn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.resnets = tnn.ModuleList(
            [TResnet(ch, ch, None, groups, 1e-6), TResnet(ch, ch, None, groups, 1e-6)])
        attn = TAttention(ch, ch, 1, ch, qkv_bias=True)
        attn.group_norm = tnn.GroupNorm(groups, ch, eps=1e-6)
        self.attentions = tnn.ModuleList([attn])

    def forward(self, x):
        x = self.resnets[0](x)
        b, c, h, w = x.shape
        hid = self.attentions[0].group_norm(x)
        hid = hid.permute(0, 2, 3, 1).reshape(b, h * w, c)
        hid = self.attentions[0](hid)
        x = x + hid.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.resnets[1](x)


class TVAEEncoder(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        chans = cfg.block_out_channels
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = tnn.ModuleList()
        prev = chans[0]
        for i, ch in enumerate(chans):
            resnets = [TResnet(prev if j == 0 else ch, ch, None,
                               cfg.norm_num_groups, 1e-6)
                       for j in range(cfg.layers_per_block)]
            prev = ch
            lists = {"resnets": resnets}
            if i < len(chans) - 1:
                lists["downsamplers"] = [TDownsample(ch)]
            self.down_blocks.append(_Blk(**lists))
        self.mid_block = TVAEMid(chans[-1], cfg.norm_num_groups)
        self.conv_norm_out = tnn.GroupNorm(cfg.norm_num_groups, chans[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAEDecoder(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        rev = tuple(reversed(cfg.block_out_channels))
        self.conv_in = tnn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = TVAEMid(rev[0], cfg.norm_num_groups)
        self.up_blocks = tnn.ModuleList()
        prev = rev[0]
        for i, ch in enumerate(rev):
            resnets = [TResnet(prev if j == 0 else ch, ch, None,
                               cfg.norm_num_groups, 1e-6)
                       for j in range(cfg.layers_per_block + 1)]
            prev = ch
            lists = {"resnets": resnets}
            if i < len(rev) - 1:
                lists["upsamplers"] = [TUpsample(ch)]
            self.up_blocks.append(_Blk(**lists))
        self.conv_norm_out = tnn.GroupNorm(cfg.norm_num_groups, rev[-1], eps=1e-6)
        self.conv_out = tnn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TVAE(tnn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TVAEEncoder(cfg)
        self.decoder = TVAEDecoder(cfg)
        self.quant_conv = tnn.Conv2d(2 * cfg.latent_channels,
                                     2 * cfg.latent_channels, 1)
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)


# ---------------------------------------------------------------------------


def _state_dict_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _nhwc(x_nchw):
    return np.asarray(x_nchw.detach().numpy().transpose(0, 2, 3, 1))


@pytest.mark.slow
def test_unet_full_topology_parity_and_kv_fast_path():
    """Real SD2-inpaint depth/widths, 8x8 latent, diffusers-named state dict
    -> import_unet_state_dict -> Flax forward == torch forward; and the
    cross_attention_kv precompute path == the plain path."""
    torch.manual_seed(0)
    cfg = UNetConfig()  # the real thing: (320,640,1280,1280), heads (5,10,20,20)
    tm = TUNet(cfg).eval()

    sd = _state_dict_np(tm)
    params = import_unet_state_dict(sd)
    # the pinned real-model count proves no parameter was dropped or invented
    assert count_params(params) == 865_925_124

    rng = np.random.RandomState(0)
    b, hw, tok = 1, 8, 7
    sample = rng.randn(b, hw, hw, cfg.in_channels).astype(np.float32)
    t = np.array([517], np.int64)
    ctx = rng.randn(b, tok, cfg.cross_attention_dim).astype(np.float32)

    with torch.no_grad():
        ref = _nhwc(tm(torch.from_numpy(sample.transpose(0, 3, 1, 2)),
                       t, torch.from_numpy(ctx)))

    unet = UNet2DCondition(cfg)
    with jax.default_matmul_precision("highest"):
        out = jax.jit(lambda p, s, tt, c: unet.apply({"params": p}, s, tt, c))(
            params, sample, t.astype(np.int32), ctx)
        out = np.asarray(out)

    assert out.shape == ref.shape
    # ~70 layers of fp32 accumulation: tolerance scaled to output magnitude
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=2e-3 * scale, rtol=2e-3)

    # kv fast path: precomputed loop-invariant cross-attn K/V must match the
    # plain forward bit-for-bit-close (same math, different code path)
    with jax.default_matmul_precision("highest"):
        def run_kv(p, s, tt, c):
            kv = unet.apply({"params": p}, c, method=unet.cross_attention_kv)
            return unet.apply({"params": p}, s, tt, c, cross_kv=kv)

        out_kv = np.asarray(jax.jit(run_kv)(params, sample,
                                            t.astype(np.int32), ctx))
    np.testing.assert_allclose(out_kv, out, atol=1e-5 * scale, rtol=1e-5)


@pytest.mark.slow
def test_vae_full_topology_parity():
    """Real SD2 VAE widths, 32x32 input, encoder+decoder through
    import_vae_state_dict."""
    torch.manual_seed(1)
    cfg = VAEConfig()
    tm = TVAE(cfg).eval()

    params = import_vae_state_dict(_state_dict_np(tm))
    assert count_params(params) == 83_653_863

    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        moments = tm.quant_conv(tm.encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2))))
        mean_t, logvar_t = moments.chunk(2, dim=1)
        dec_t = tm.decoder(tm.post_quant_conv(mean_t))

    vae = AutoencoderKL(cfg)
    with jax.default_matmul_precision("highest"):
        mean, logvar = jax.jit(
            lambda p, x: vae.apply({"params": p}, x, method=vae.encode))(params, x)
        dec = jax.jit(
            lambda p, z: vae.apply({"params": p}, z, method=vae.decode))(params, mean)

    np.testing.assert_allclose(np.asarray(mean), _nhwc(mean_t),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar),
                               np.clip(_nhwc(logvar_t), -30.0, 20.0),
                               atol=2e-4, rtol=1e-3)
    scale = np.abs(_nhwc(dec_t)).max()
    np.testing.assert_allclose(np.asarray(dec), _nhwc(dec_t),
                               atol=2e-3 * scale, rtol=2e-3)
