"""Data pipeline tests: manifest compatibility (CSV + OCR JSON like the
reference's doc_select.csv / OCR files, train_diffute_v1.py:424-453),
synthetic dataset, batching, prefetch loader."""

import json
import os

import cv2
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.io import (
    SyntheticSceneDataset,
    UNetManifestDataset,
    VAEManifestDataset,
    make_unet_batch,
    make_vae_batch,
)
from diffute_tpu.io.dataset import PrefetchLoader


@pytest.fixture(scope="module")
def cfg():
    return tiny_test_config()


@pytest.fixture()
def manifest(tmp_path):
    """Build a reference-format manifest: images + OCR JSON + CSV."""
    rows = []
    for i in range(3):
        img = np.random.RandomState(i).randint(0, 255, (300, 400, 3), np.uint8)
        img_path = str(tmp_path / f"img{i}.png")
        cv2.imwrite(img_path, img)
        ocr = {"document": [
            {"text": f"word{i}", "score": 0.95,
             "box": [[50, 60], [180, 60], [180, 90], [50, 90]]},
            {"text": "lowscore", "score": 0.5,
             "box": [[10, 10], [20, 10], [20, 20], [10, 20]]},
        ]}
        ocr_path = str(tmp_path / f"ocr{i}.json")
        with open(ocr_path, "w") as f:
            json.dump(ocr, f)
        rows.append((img_path, ocr_path))
    csv_path = str(tmp_path / "doc_select.csv")
    with open(csv_path, "w") as f:
        f.write("image_path,ocr_path\n")
        for ip, op in rows:
            f.write(f"{ip},{op}\n")
    return csv_path, rows


def test_unet_manifest_dataset(cfg, manifest):
    csv_path, rows = manifest
    ds = UNetManifestDataset(csv_path, cfg)
    assert len(ds) == 3
    ex = ds[0]
    res = cfg.edit.resolution
    assert ex["pixel_values"].shape == (res, res, 3)
    assert ex["pixel_values"].dtype == np.uint8  # compact batch layout
    assert ex["masks"].shape == (res, res)
    assert set(np.unique(ex["masks"])) <= {0, 1}
    assert ex["masked_images"].shape == (res, res, 3)
    assert ex["masked_images"].dtype == np.uint8
    assert ex["glyph_image"].ndim == 3  # (60, (len+2)*40, 3)
    # low-score region never selected: glyph text is "word0" (5 chars)
    assert ex["glyph_image"].shape[1] == (5 + 2) * cfg.glyph.font_size


def test_unet_batching(cfg, manifest):
    csv_path, _ = manifest
    ds = UNetManifestDataset(csv_path, cfg)
    batch = make_unet_batch([ds[i] for i in range(3)], cfg)
    g = cfg.trocr.image_size
    assert batch["glyph_pixels"].shape == (3, g, g, 3)
    assert batch["pixel_values"].shape[0] == 3


def test_vae_manifest_dataset(cfg, tmp_path):
    img = np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8)
    p = str(tmp_path / "doc.png")
    cv2.imwrite(p, img)
    csv_path = str(tmp_path / "data.csv")
    with open(csv_path, "w") as f:
        f.write("path\n" + p + "\n")
    ds = VAEManifestDataset(csv_path, cfg)
    ex = ds[0]
    res = cfg.edit.resolution
    assert ex["pixel_values"].shape == (res, res, 3)
    batch = make_vae_batch([ex, ex])
    assert batch["pixel_values"].shape == (2, res, res, 3)


def test_read_image_bgr_mode(tmp_path):
    from diffute_tpu.io import read_image

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 200  # blue channel in BGR writing
    p = str(tmp_path / "c.png")
    cv2.imwrite(p, img)  # cv2 writes BGR
    rgb = read_image(p)
    bgr = read_image(p, bgr=True)
    assert rgb[0, 0, 2] == 200 and rgb[0, 0, 0] == 0   # blue is last in RGB
    assert bgr[0, 0, 0] == 200                          # reference order
    np.testing.assert_array_equal(rgb[..., ::-1], bgr)


def test_synthetic_dataset(cfg):
    ds = SyntheticSceneDataset(cfg)
    ex = ds[42]
    res = cfg.edit.resolution
    assert ex["pixel_values"].shape == (res, res, 3)
    # deterministic per index
    ex2 = ds[42]
    np.testing.assert_array_equal(ex["pixel_values"], ex2["pixel_values"])


def test_synthetic_vocab_modes(cfg):
    """The diverse-vocabulary modes: "fixed" stays bit-identical to the
    original stream (no extra rng draws), "random"/"mixed" produce novel
    strings drawn from the printable charset, deterministic per index."""
    fixed = SyntheticSceneDataset(cfg)
    fixed2 = SyntheticSceneDataset(cfg, vocab="fixed")
    for i in (0, 7, 42):
        np.testing.assert_array_equal(fixed[i]["pixel_values"],
                                      fixed2[i]["pixel_values"])

    rnd = SyntheticSceneDataset(cfg, vocab="random")
    charset = set(SyntheticSceneDataset._CHARSET)
    words = set(SyntheticSceneDataset._WORDS)
    texts = [rnd._sample_text(np.random.default_rng(i)) for i in range(64)]
    assert all(3 <= len(t) <= 10 and set(t) <= charset for t in texts)
    assert sum(t not in words for t in texts) >= 50  # overwhelmingly novel
    # deterministic per index (same contract as the images)
    ex = rnd[3]
    np.testing.assert_array_equal(ex["pixel_values"], rnd[3]["pixel_values"])

    mixed = SyntheticSceneDataset(cfg, vocab="mixed")
    texts = [mixed._sample_text(np.random.default_rng(i)) for i in range(64)]
    n_vocab = sum(t in words for t in texts)
    assert 10 <= n_vocab <= 54  # both populations present

    with pytest.raises(ValueError):
        SyntheticSceneDataset(cfg, vocab="huge")


def test_prefetch_loader(cfg):
    ds = SyntheticSceneDataset(cfg)
    loader = PrefetchLoader(ds, batch_size=2,
                            collate=lambda ex: make_unet_batch(ex, cfg),
                            num_threads=2, prefetch=2)
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    assert b1["pixel_values"].shape[0] == 2
    assert b2["glyph_pixels"].shape[0] == 2


class _IndexDataset:
    """Minimal dataset: example i is just {'i': i} (loader-semantics tests)."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.asarray(i)}


def _collect_indices(batches):
    return [int(v) for b in batches for v in b["i"]]


def test_epoch_loader_visits_each_index_once_per_epoch():
    ds = _IndexDataset(12)
    loader = PrefetchLoader(ds, batch_size=3,
                            collate=lambda ex: {"i": np.stack([e["i"] for e in ex])},
                            num_threads=2, shuffle="epoch", num_epochs=2)
    batches = list(loader)
    assert len(batches) == 8  # 2 epochs x 4 batches
    idx = _collect_indices(batches)
    # every index appears exactly twice across the two epochs
    assert sorted(idx) == sorted(list(range(12)) * 2)


def test_epoch_loader_drops_partial_batch_and_reshuffles():
    ds = _IndexDataset(10)  # batch 4 -> 2 full batches, 2 dropped per epoch
    loader = PrefetchLoader(ds, batch_size=4,
                            collate=lambda ex: {"i": np.stack([e["i"] for e in ex])},
                            num_threads=1, shuffle="epoch", num_epochs=2, seed=7)
    assert loader.steps_per_epoch == 2
    batches = list(loader)
    assert len(batches) == 4
    e0, e1 = _collect_indices(batches[:2]), _collect_indices(batches[2:])
    assert len(set(e0)) == 8 and len(set(e1)) == 8
    assert e0 != e1  # fresh permutation per epoch


def test_epoch_loader_process_shards_are_disjoint_and_cover():
    ds = _IndexDataset(16)
    collate = lambda ex: {"i": np.stack([e["i"] for e in ex])}
    shard0 = _collect_indices(list(PrefetchLoader(
        ds, 4, collate, num_threads=1, shuffle="epoch", num_epochs=1,
        process_index=0, process_count=2)))
    shard1 = _collect_indices(list(PrefetchLoader(
        ds, 4, collate, num_threads=1, shuffle="epoch", num_epochs=1,
        process_index=1, process_count=2)))
    assert len(shard0) == 8 and len(shard1) == 8
    assert set(shard0).isdisjoint(shard1)
    assert sorted(shard0 + shard1) == list(range(16))


def test_replacement_loader_differs_per_process():
    ds = _IndexDataset(1000)
    collate = lambda ex: {"i": np.stack([e["i"] for e in ex])}

    def first_batch(rank):
        it = iter(PrefetchLoader(ds, 8, collate, num_threads=1,
                                 shuffle="replacement", process_index=rank,
                                 process_count=2))
        b = next(it)
        it.close()
        return [int(v) for v in b["i"]]

    assert first_batch(0) != first_batch(1)


def test_auto_shuffle_uses_replacement_for_huge_datasets(cfg):
    huge = SyntheticSceneDataset(cfg)  # len 2^30
    loader = PrefetchLoader(huge, 2, lambda ex: make_unet_batch(ex, cfg))
    assert loader.shuffle == "replacement"
    small = _IndexDataset(64)
    loader = PrefetchLoader(small, 2, lambda ex: ex)
    assert loader.shuffle == "epoch"


def test_epoch_loader_rejects_batch_larger_than_shard():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        PrefetchLoader(_IndexDataset(4), 8, lambda ex: ex, shuffle="epoch")


def test_device_prefetcher_places_batches_on_mesh():
    import jax

    from diffute_tpu.parallel import DevicePrefetcher, make_mesh

    mesh = make_mesh(8)
    host_batches = [{"x": np.full((8, 4), i, np.float32)} for i in range(3)]
    out = list(DevicePrefetcher(iter(host_batches), mesh, depth=2))
    assert len(out) == 3
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert "data" in str(b["x"].sharding.spec)
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      host_batches[i]["x"])


def test_trainer_step_accepts_device_batches(cfg=None):
    """UNetTrainer.step must not re-place already-device batches."""
    import jax

    from diffute_tpu.config import tiny_test_config
    from diffute_tpu.parallel import shard_batch
    from diffute_tpu.train import VAETrainer
    from diffute_tpu.utils import init_pipeline_params

    c = tiny_test_config()
    params = init_pipeline_params(c)
    trainer = VAETrainer(c, params["vae"], total_steps=10)
    res = c.edit.resolution
    batch = {"pixel_values": np.zeros((8, res, res, 3), np.float32)}
    dev = shard_batch(trainer.mesh, batch)
    m1 = trainer.step(dev, jax.random.PRNGKey(0))
    m2 = trainer.step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


class _FlakyDataset(_IndexDataset):
    """Example indices in ``bad`` raise (corrupt-blob simulation)."""

    def __init__(self, n, bad):
        super().__init__(n)
        self.bad = set(bad)

    def __getitem__(self, i):
        if i in self.bad:
            raise ValueError(f"corrupt blob {i}")
        return super().__getitem__(i)


def test_loader_substitutes_failed_examples_without_dropping_batches():
    # A bad example must be substituted, never drop the batch: dropping
    # desynchronizes batch counts across multi-host ranks (ADVICE r2).
    ds = _FlakyDataset(12, bad=[5])
    loader = PrefetchLoader(ds, batch_size=3,
                            collate=lambda ex: {"i": np.stack([e["i"] for e in ex])},
                            num_threads=2, shuffle="epoch", num_epochs=2)
    batches = list(loader)
    assert len(batches) == 8  # full epoch budget despite the bad example
    idx = _collect_indices(batches)
    assert len(idx) == 24 and 5 not in idx
    assert loader.error_count == 2  # one substitution per epoch


def test_loader_raises_when_data_source_is_broken():
    ds = _FlakyDataset(8, bad=range(8))  # everything fails
    loader = PrefetchLoader(ds, batch_size=2,
                            collate=lambda ex: {"i": np.stack([e["i"] for e in ex])},
                            num_threads=1, shuffle="epoch", num_epochs=1)
    with pytest.raises(RuntimeError, match="example failures"):
        list(loader)
