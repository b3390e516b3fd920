"""Numeric parity of UNet building blocks vs independently-written torch
references.

diffusers is not installed in this image, so these torch modules are written
here from the SD2 architecture spec (GN-SiLU-conv resnet with temb injection,
pre-LN transformer with GEGLU, asymmetric-pad downsample, nearest-up
upsample, sinusoidal timestep embedding).  Passing means our Flax modules AND
the weight-layout conversion both implement the same math as a torch stack —
the closest available substitute for golden-activation tests against HF
weights (SURVEY.md §7 "hard parts").
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
tnn = torch.nn

from diffute_tpu.models.attention import BasicTransformerBlock, Transformer2D
from diffute_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    timestep_embedding,
)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _nchw(x_nhwc):
    return _t(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def _from_nchw(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


def _load(tmod, mapping):
    sd = {k: _t(v) for k, v in mapping.items()}
    tmod.load_state_dict(sd)
    return tmod.eval()


def _conv_w(kernel):  # HWIO -> OIHW
    return np.asarray(kernel).transpose(3, 2, 0, 1)


def _lin_w(kernel):  # (I, O) -> (O, I)
    return np.asarray(kernel).transpose(1, 0)


# ---------------------------------------------------------------------------


class TorchResnet(tnn.Module):
    def __init__(self, cin, cout, temb, groups, eps):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb, cout)
        self.norm2 = tnn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = h + self.time_emb_proj(tnn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return sc + h


def test_resnet_block_parity():
    cin, cout, temb_dim, groups = 16, 32, 24, 4
    model = ResnetBlock2D(cout, groups=groups, eps=1e-5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, cin))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, temb_dim))
    params = model.init(jax.random.PRNGKey(2), x, temb)["params"]

    tm = TorchResnet(cin, cout, temb_dim, groups, 1e-5)
    _load(tm, {
        "norm1.weight": params["norm1"]["scale"],
        "norm1.bias": params["norm1"]["bias"],
        "conv1.weight": _conv_w(params["conv1"]["kernel"]),
        "conv1.bias": params["conv1"]["bias"],
        "time_emb_proj.weight": _lin_w(params["time_emb_proj"]["kernel"]),
        "time_emb_proj.bias": params["time_emb_proj"]["bias"],
        "norm2.weight": params["norm2"]["scale"],
        "norm2.bias": params["norm2"]["bias"],
        "conv2.weight": _conv_w(params["conv2"]["kernel"]),
        "conv2.bias": params["conv2"]["bias"],
        "shortcut.weight": _conv_w(params["conv_shortcut"]["kernel"]),
        "shortcut.bias": params["conv_shortcut"]["bias"],
    })
    with torch.no_grad():
        ref = _from_nchw(tm(_nchw(x), _t(temb)))
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, x, temb)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


class TorchTransformerBlock(tnn.Module):
    """Pre-LN block: self-attn, cross-attn, GEGLU FF (SD CrossAttention
    parameterization: no qkv bias, out bias)."""

    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.heads = heads
        mk = lambda i, o, b: tnn.Linear(i, o, bias=b)
        self.q1, self.k1, self.v1 = mk(dim, dim, False), mk(dim, dim, False), mk(dim, dim, False)
        self.o1 = mk(dim, dim, True)
        self.q2 = mk(dim, dim, False)
        self.k2, self.v2 = mk(ctx_dim, dim, False), mk(ctx_dim, dim, False)
        self.o2 = mk(dim, dim, True)
        self.ff_proj = tnn.Linear(dim, dim * 8)
        self.ff_out = tnn.Linear(dim * 4, dim)

    def _attn(self, q, k, v):
        b, s, d = q.shape
        t = k.shape[1]
        h = self.heads
        q = q.view(b, s, h, d // h).transpose(1, 2)
        k = k.view(b, t, h, d // h).transpose(1, 2)
        v = v.view(b, t, h, d // h).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d // h), dim=-1)
        return (w @ v).transpose(1, 2).reshape(b, s, d)

    def forward(self, x, ctx):
        h = self.norm1(x)
        x = x + self.o1(self._attn(self.q1(h), self.k1(h), self.v1(h)))
        h = self.norm2(x)
        x = x + self.o2(self._attn(self.q2(h), self.k2(ctx), self.v2(ctx)))
        h = self.norm3(x)
        a, gate = self.ff_proj(h).chunk(2, dim=-1)
        x = x + self.ff_out(a * tnn.functional.gelu(gate))
        return x


def test_transformer_block_parity():
    dim, heads, ctx_dim = 32, 4, 24
    model = BasicTransformerBlock(num_heads=heads, head_dim=dim // heads)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, dim))
    # our attn2 projects from the same width as x in this module; emulate
    # ctx_dim == dim for the torch ref
    params = model.init(jax.random.PRNGKey(2), x, ctx)["params"]

    tm = TorchTransformerBlock(dim, heads, dim)
    _load(tm, {
        "norm1.weight": params["norm1"]["scale"], "norm1.bias": params["norm1"]["bias"],
        "norm2.weight": params["norm2"]["scale"], "norm2.bias": params["norm2"]["bias"],
        "norm3.weight": params["norm3"]["scale"], "norm3.bias": params["norm3"]["bias"],
        "q1.weight": _lin_w(params["attn1"]["to_q"]["kernel"]),
        "k1.weight": _lin_w(params["attn1"]["to_k"]["kernel"]),
        "v1.weight": _lin_w(params["attn1"]["to_v"]["kernel"]),
        "o1.weight": _lin_w(params["attn1"]["to_out_0"]["kernel"]),
        "o1.bias": params["attn1"]["to_out_0"]["bias"],
        "q2.weight": _lin_w(params["attn2"]["to_q"]["kernel"]),
        "k2.weight": _lin_w(params["attn2"]["to_k"]["kernel"]),
        "v2.weight": _lin_w(params["attn2"]["to_v"]["kernel"]),
        "o2.weight": _lin_w(params["attn2"]["to_out_0"]["kernel"]),
        "o2.bias": params["attn2"]["to_out_0"]["bias"],
        "ff_proj.weight": _lin_w(params["ff"]["net_0"]["proj"]["kernel"]),
        "ff_proj.bias": params["ff"]["net_0"]["proj"]["bias"],
        "ff_out.weight": _lin_w(params["ff"]["net_2"]["kernel"]),
        "ff_out.bias": params["ff"]["net_2"]["bias"],
    })
    with torch.no_grad():
        ref = tm(_t(x), _t(ctx)).numpy()
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_downsample_asymmetric_padding_parity():
    model = Downsample2D(16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 9, 16))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    conv = tnn.Conv2d(16, 16, 3, stride=2, padding=0)
    _load(conv, {"weight": _conv_w(params["conv"]["kernel"]),
                 "bias": params["conv"]["bias"]})
    with torch.no_grad():
        ref = _from_nchw(conv(tnn.functional.pad(_nchw(x), (0, 1, 0, 1))))
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_upsample_parity():
    model = Upsample2D(16)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 5, 16))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    conv = tnn.Conv2d(16, 16, 3, padding=1)
    _load(conv, {"weight": _conv_w(params["conv"]["kernel"]),
                 "bias": params["conv"]["bias"]})
    with torch.no_grad():
        up = tnn.functional.interpolate(_nchw(x), scale_factor=2, mode="nearest")
        ref = _from_nchw(conv(up))
    with jax.default_matmul_precision("highest"):
        out = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_timestep_embedding_formula():
    # SD convention: half-dim frequencies exp(-ln(1e4) * i / half), flipped
    # sin/cos order when flip_sin_to_cos.
    t = jnp.array([0, 1, 999])
    emb = timestep_embedding(t, 320, flip_sin_to_cos=True, freq_shift=0.0)
    half = 160
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expect = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # fp32 sin/cos at arguments up to ~1000 rad carry ~1e-4 roundoff
    np.testing.assert_allclose(np.asarray(emb), expect, atol=3e-4)
    assert np.allclose(np.asarray(emb[0]), np.concatenate(
        [np.ones(half), np.zeros(half)]))
