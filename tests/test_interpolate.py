"""torch-nearest resize parity (the mask-downsampling convention)."""

import numpy as np
import pytest

from diffute_tpu.ops.interpolate import nearest_resize_2d

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("in_hw,out_hw", [
    ((512, 512), (64, 64)),
    ((300, 300), (64, 64)),
    ((96, 128), (12, 16)),
])
def test_matches_torch_interpolate_nearest(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.rand(2, *in_hw).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x)[:, None], size=out_hw)[:, 0].numpy()
    out = np.asarray(nearest_resize_2d(x, *out_hw))
    np.testing.assert_array_equal(out, ref)


def test_channels_last_rank4():
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    out = np.asarray(nearest_resize_2d(x, 4, 4))
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(out[:, 0, 0], x[:, 0, 0])  # block-start pick
