"""Pipelined serving (edit_stream): bit-identical to sequential edit()."""

import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.pipeline import DiffUTEPipeline
from diffute_tpu.utils import init_pipeline_params


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_test_config()
    return DiffUTEPipeline(cfg, init_pipeline_params(cfg, seed=0))


def _items(n):
    rng = np.random.RandomState(3)
    items = []
    for i in range(n):
        img = rng.randint(0, 256, (48, 64, 3)).astype(np.uint8)
        items.append((img, (10 + i, 12, 30 + i, 24), f"t{i}"))
    return items


def test_edit_stream_matches_sequential(pipe):
    items = _items(3)
    seq = [pipe.edit(img, box, text, num_inference_steps=4)[0]
           for img, box, text in items]
    streamed = list(pipe.edit_stream(items, num_inference_steps=4, depth=2))
    assert len(streamed) == len(seq)
    for a, b in zip(streamed, seq):
        np.testing.assert_array_equal(a, b)


def test_edit_stream_bounds_inflight_to_depth(pipe):
    # depth=N must keep at most N programs in flight: the first result is
    # yielded after exactly N items are consumed, not N+1 (the pre-round-4
    # off-by-one) — callers use depth to bound device-side buffering
    pulled = []

    def lazy():
        for i, item in enumerate(_items(4)):
            pulled.append(i)
            yield item

    stream = pipe.edit_stream(lazy(), num_inference_steps=4, depth=2)
    next(stream)
    assert len(pulled) == 2


def test_edit_stream_on_mesh_matches_and_shares_programs(pipe):
    # a mesh-constructed pipeline must route stream submits through the same
    # placement as edit()/_run_device (NamedSharding device_put) — the
    # pre-round-4 stream path fed unplaced arrays, so the shared compiled
    # stage re-lowered for new input shardings on every submit
    from diffute_tpu.config import tiny_test_config
    from diffute_tpu.parallel import make_mesh

    cfg = tiny_test_config()
    mpipe = DiffUTEPipeline(cfg, init_pipeline_params(cfg, seed=0),
                            mesh=make_mesh(8))
    items = _items(2)
    seq = [mpipe.edit(img, box, text, num_inference_steps=4)[0]
           for img, box, text in items]
    streamed = list(mpipe.edit_stream(items, num_inference_steps=4, depth=2))
    for a, b in zip(streamed, seq):
        np.testing.assert_array_equal(a, b)


def test_edit_stream_depth_one_and_empty(pipe):
    # depth=1 (no overlap) must also be identical; empty stream yields nothing
    items = _items(2)
    seq = [pipe.edit(img, box, text, num_inference_steps=4)[0]
           for img, box, text in items]
    streamed = list(pipe.edit_stream(items, num_inference_steps=4, depth=1))
    for a, b in zip(streamed, seq):
        np.testing.assert_array_equal(a, b)
    assert list(pipe.edit_stream([], num_inference_steps=4)) == []
