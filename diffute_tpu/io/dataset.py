"""Training datasets: manifest-compatible with the reference, plus synthetic.

``UNetManifestDataset`` reproduces the *intended* semantics of the
reference's ``OursDataset.__getitem__`` (train_diffute_v1.py:399-519), whose
published form contains undefined-variable bugs (``i`` at :438,
``temp_ocr_path`` at :442 — SURVEY.md §0.7).  Manifest format is drop-in
compatible: a CSV with ``image_path`` / ``ocr_path`` columns (:426-430) and
OCR JSON files shaped ``{"document": [{"text", "box": [[x,y]x4], "score"}]}``
(:445-453), filtered at score > 0.8 (:446), one region sampled per image.

``VAEManifestDataset`` reproduces train_vae.py:369-418: CSV with ``path``
column, upscale short-side < 512 by int(1024/short), random 512^2 crop.

``SyntheticSceneDataset`` generates procedural document-like images with
rendered text so trainers/benches run without any external data.

All datasets yield numpy dicts; batching helpers stack to the layouts the
jit'd train steps expect.  Decode/augment is host CPU (the reference used
torch DataLoader workers, :757-763); heavy lifting is already in cv2/PIL C
code, and a thread-pool prefetcher overlaps it with device steps.  A failing
example (corrupt blob) is substituted by a deterministic alternate index —
never dropped, so every multi-host rank yields the same number of batches
per epoch (the reference instead tolerates truncated images globally,
``ImageFile.LOAD_TRUNCATED_IMAGES``, train_diffute_v1.py:66).
"""

from __future__ import annotations

import json
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from diffute_tpu.config import DiffUTEConfig, GlyphConfig
from diffute_tpu.io import hostops
from diffute_tpu.pipeline.crop import train_crop
from diffute_tpu.pipeline.regions import (
    generate_mask,
    make_masked_image,
    process_location,
)
from diffute_tpu.text import render_glyph, trocr_preprocess_host
from diffute_tpu.io.storage import open_blob, read_image


def _resize512(img: np.ndarray, res: int) -> np.ndarray:
    return hostops.resize_bilinear_u8(img, res, res)


class UNetManifestDataset:
    """Stage-2 example generator (one OCR region per image per epoch pass)."""

    def __init__(self, manifest_csv: str, config: DiffUTEConfig,
                 seed: int = 0, bgr: bool = False):
        import pandas as pd

        df = pd.read_csv(manifest_csv, low_memory=False)
        self.image_paths: List[str] = df["image_path"].tolist()
        self.ocr_paths: List[str] = df["ocr_path"].tolist()
        self.config = config
        self.seed = seed
        self.bgr = bgr

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.config
        # per-call generator: thread-safe under the prefetch loader and
        # reproducible per (seed, index)
        rng = np.random.default_rng((self.seed, index))
        image = read_image(self.image_paths[index], bgr=self.bgr)
        with open_blob(self.ocr_paths[index]) as f:
            ocr = json.loads(f.read())
        regions = [r for r in ocr["document"]
                   if r.get("score", 1.0) > cfg.train.ocr_score_threshold]
        if not regions:
            raise ValueError(f"No OCR region above threshold: {self.ocr_paths[index]}")
        region = regions[int(rng.integers(len(regions)))]
        text = region["text"]
        quad = np.asarray(region["box"], dtype=np.float32)
        box = np.int32([quad[:, 0].min(), quad[:, 1].min(),
                        quad[:, 0].max(), quad[:, 1].max()])
        h, w = image.shape[:2]
        box = process_location(box, (h, w))

        mask = generate_mask((h, w), box)
        masked = make_masked_image(image, mask)
        crop = train_crop(image, mask, masked, box, text, rng,
                          crop_scale=cfg.edit.train_crop_scale)

        res = cfg.edit.resolution
        # compact uint8 batch: normalization happens on device
        # (train steps apply utils.images.device_to_unit_range) — 4x fewer
        # host->device bytes and 4x less HBM for staged scan inputs than
        # shipping f32, within 1 ulp of the host-normalized numerics
        return {
            "pixel_values": _resize512(crop.image, res),
            "masks": _resize512(crop.mask, res),
            "masked_images": _resize512(crop.masked_image, res),
            "glyph_image": render_glyph(crop.text, cfg.glyph),
        }


class VAEManifestDataset:
    """Stage-1 example generator (random 512^2 document crops)."""

    def __init__(self, manifest_csv: str, config: DiffUTEConfig,
                 seed: int = 0, bgr: bool = False, path_column: str = "path"):
        import pandas as pd

        df = pd.read_csv(manifest_csv, low_memory=False)
        self.paths: List[str] = df[path_column].tolist()
        self.config = config
        self.seed = seed
        self.bgr = bgr

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        res = self.config.edit.resolution
        rng = np.random.default_rng((self.seed, index))
        image = read_image(self.paths[index], bgr=self.bgr)
        h, w = image.shape[:2]
        short = min(h, w)
        if short < res:
            # reference: int(1024/short) upscale (train_vae.py:399-403)
            scale = int(res * 2 / short)
            image = hostops.resize_bilinear_u8(image, h * scale, w * scale)
            h, w = image.shape[:2]
        y = int(rng.integers(0, h - res + 1))
        x = int(rng.integers(0, w - res + 1))
        crop = image[y : y + res, x : x + res]
        return {"pixel_values": crop}  # uint8; normalized on device


class SyntheticSceneDataset:
    """Procedural text-on-background images + OCR boxes (no external data).

    Used by smoke training, benchmarks, and tests.
    """

    # all words <= 10 chars: a 256-px crop holding the full box caps text
    # height at ~256/aspect px, and the VAE needs >=32 px to keep strokes
    # readable ("hello world" at 11 chars capped out at ~29 px)
    _WORDS = ("INVOICE", "TOTAL", "2023-08-16", "Amount", "Reference",
              "DiffUTE", "TPU", "hello", "42.00", "Document")
    # random-string charset for the diverse-vocabulary modes; printable
    # ASCII only so the char tokenizer / OCR verifier covers every target
    _CHARSET = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                "abcdefghijklmnopqrstuvwxyz0123456789.-")

    def __init__(self, config: DiffUTEConfig, image_hw=(384, 512),
                 seed: int = 0, vocab: str = "fixed"):
        """``vocab``: "fixed" = the 10-word list (the original stream,
        bit-identical per index); "random" = every example a fresh 3-10 char
        string; "mixed" = 50/50.  A fixed tiny vocabulary trains a model
        that REGENERATES its words perfectly but cannot write novel strings
        (measured: eval --cross_text 0.625 vs regeneration 1.0 on the 36k
        fixed-vocab checkpoint, BASELINE.md); diverse strings train the
        glyph-conditioned generation the deployment task needs — the role
        the reference's million-scene OCR corpora play
        (train_diffute_v1.py:399-519)."""
        if vocab not in ("fixed", "mixed", "random"):
            raise ValueError(f"vocab must be fixed|mixed|random, got {vocab!r}")
        self.config = config
        self.image_hw = image_hw
        self.seed = seed  # examples are deterministic per index
        self.vocab = vocab

    def _sample_text(self, rng) -> str:
        # extra rng draws are gated so the "fixed" stream stays bit-identical
        # to the pre-vocab-option dataset
        if self.vocab != "fixed" and (self.vocab == "random"
                                      or rng.random() < 0.5):
            n = int(rng.integers(3, 11))
            idx = rng.integers(len(self._CHARSET), size=n)
            return "".join(self._CHARSET[int(c)] for c in idx)
        return self._WORDS[int(rng.integers(len(self._WORDS)))]

    def __len__(self) -> int:
        return 1 << 30

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.config
        h, w = self.image_hw
        rng = np.random.default_rng(index)
        image = np.full((h, w, 3), int(rng.integers(180, 255)), np.uint8)
        # paste a rendered word at a random position
        text = self._sample_text(rng)
        glyph = render_glyph(text, cfg.glyph)
        gh, gw = glyph.shape[:2]
        # Size the text like the documents the reference trains on: tall
        # enough that its strokes survive the VAE (measured on the trained
        # small VAE: recon text is OCR-readable at >=32 px, destroyed at
        # ~20 px), capped so the full box fits an inference crop window
        # (infer_crop_params bounds the window by the short side).
        fit = min(1.0, (min(h, w) - 24) / gw)
        scale = fit * float(rng.uniform(0.55, 1.0))
        gw2, gh2 = max(8, int(gw * scale)), max(8, int(gh * scale))
        glyph_s = hostops.resize_bilinear_u8(glyph, gh2, gw2)
        y = int(rng.integers(0, h - gh2))
        x = int(rng.integers(0, w - gw2))
        region = image[y : y + gh2, x : x + gw2]
        image[y : y + gh2, x : x + gw2] = np.minimum(region, glyph_s)
        box = np.int32([x, y, x + gw2, y + gh2])
        box = process_location(box, (h, w))

        mask = generate_mask((h, w), box)
        masked = make_masked_image(image, mask)
        crop = train_crop(image, mask, masked, box, text, rng,
                          crop_scale=cfg.edit.train_crop_scale)
        res = cfg.edit.resolution
        # compact uint8 batch, normalized on device (see UNetManifestDataset)
        return {
            "pixel_values": _resize512(crop.image, res),
            "masks": _resize512(crop.mask, res),
            "masked_images": _resize512(crop.masked_image, res),
            # condition on the (possibly truncated) visible text, matching
            # the manifest dataset and the reference (draw_text on the
            # truncated string, train_diffute_v1.py:491)
            "glyph_image": render_glyph(crop.text, cfg.glyph),
        }


class SyntheticGlyphOCRDataset:
    """Glyph-render -> character-id pairs for training the OCR verifier.

    The reference uses a pretrained TrOCR as both conditioning encoder and
    (sketched, commented-out) edit verifier (train_diffute_v1.py:631,
    app.ipynb:843-847); with no downloadable weights, this dataset trains an
    equivalent at small scale.  Half the examples are raw glyph canvases
    (what the conditioning branch sees, ref draw_text :352-368), half are
    region-style crops — the glyph rescaled onto a light background with the
    reference's +10%-height box extension (:370-373) — which is what the
    eval CLI feeds the verifier from edited images.
    """

    def __init__(self, config: DiffUTEConfig, seed: int = 0,
                 max_len: int = 16, words=SyntheticSceneDataset._WORDS):
        from diffute_tpu.text.char_tokenizer import CharTokenizer

        self.config = config
        self.seed = seed
        self.max_len = max_len
        self.words = words
        self.tokenizer = CharTokenizer()
        # sampling alphabet for random strings (letters/digits/common
        # punctuation; the tokenizer itself covers all printable ASCII)
        self._alphabet = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                         "abcdefghijklmnopqrstuvwxyz0123456789.,-:/% ")

    def __len__(self) -> int:
        return 1 << 30

    def _sample_text(self, rng) -> str:
        if rng.random() < 0.4:
            return self.words[int(rng.integers(len(self.words)))]
        n = int(rng.integers(1, self.max_len - 2))
        s = "".join(self._alphabet[int(i)]
                    for i in rng.integers(len(self._alphabet), size=n))
        return s.strip() or "x"

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        cfg = self.config
        rng = np.random.default_rng((self.seed, index))
        text = self._sample_text(rng)
        glyph = render_glyph(text, cfg.glyph)
        if rng.random() < 0.5:
            # region-style: rescaled glyph on a light background with the
            # +10%-height bottom extension eval's box crop carries
            gh, gw = glyph.shape[:2]
            s = float(rng.uniform(0.3, 1.0))
            gh2, gw2 = max(8, int(gh * s)), max(8, int(gw * s))
            scaled = hostops.resize_bilinear_u8(glyph, gh2, gw2)
            bg = int(rng.integers(180, 255))
            region = np.full((gh2 + max(1, gh2 // 10), gw2, 3), bg, np.uint8)
            region[:gh2] = np.minimum(region[:gh2], scaled)
            glyph = region
        # degradation augmentation: the verifier must read text that came
        # through a VAE decode (smeared edges) and a diffusion sampler
        # (residual noise), not just crisp FreeType output — measured on the
        # first trained verifier: a 2x2 box blur destroyed reading entirely
        if rng.random() < 0.5:
            h0, w0 = glyph.shape[:2]
            f = float(rng.uniform(0.45, 0.85))
            small = hostops.resize_bilinear_u8(
                glyph, max(4, int(h0 * f)), max(4, int(w0 * f)))
            glyph = hostops.resize_bilinear_u8(small, h0, w0)
        if rng.random() < 0.5:
            noise = rng.normal(0.0, float(rng.uniform(2.0, 12.0)),
                               glyph.shape)
            glyph = np.clip(glyph.astype(np.float32) + noise,
                            0, 255).astype(np.uint8)
        if rng.random() < 0.5:
            # ink-contrast fade: diffusion output early in training writes
            # gray text, and the first trained verifier stopped reading a
            # clean glyph already at 0.6x contrast — fade ink toward the
            # local white point so reading survives washed-out strokes
            c = float(rng.uniform(0.35, 1.0))
            white = float(glyph.max())
            glyph = np.clip(white - (white - glyph.astype(np.float32)) * c,
                            0, 255).astype(np.uint8)
        return {"glyph_image": glyph,
                "target_ids": self.tokenizer.encode(text, self.max_len)}


def make_ocr_batch(examples: List[Dict[str, np.ndarray]],
                   config: DiffUTEConfig) -> Dict[str, np.ndarray]:
    from diffute_tpu.text import trocr_preprocess_host

    return {
        "glyph_pixels": trocr_preprocess_host(
            [e["glyph_image"] for e in examples], config.trocr),
        "target_ids": np.stack([e["target_ids"] for e in examples]),
    }


def make_unet_batch(examples: List[Dict[str, np.ndarray]],
                    config: DiffUTEConfig) -> Dict[str, np.ndarray]:
    """Stack examples -> the train-step batch layout.  Variable-width glyph
    renders go through TrOCR preprocessing here (the reference keeps them as
    a list until the processor call, train_diffute_v1.py:729-746,868)."""
    return {
        "pixel_values": np.stack([e["pixel_values"] for e in examples]),
        "masks": np.stack([e["masks"] for e in examples]),
        "masked_images": np.stack([e["masked_images"] for e in examples]),
        "glyph_pixels": trocr_preprocess_host(
            [e["glyph_image"] for e in examples], config.trocr),
    }


def make_vae_batch(examples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {"pixel_values": np.stack([e["pixel_values"] for e in examples])}


# Epoch-shuffle permutations above this dataset size would cost GBs of
# host memory; such datasets (e.g. the 2^30-example synthetic stream) fall
# back to with-replacement sampling, which is statistically equivalent there.
_EPOCH_SHUFFLE_MAX = 1 << 24

# Per-example decode-failure substitution attempts before declaring the data
# source broken (fatal, re-raised in the consumer on every rank alike).
_EXAMPLE_RETRIES = 8


class PrefetchLoader:
    """Thread-pool batch producer overlapping host decode with device steps.

    Sampling (``shuffle``):
      - ``"epoch"``: a fresh shuffled permutation per epoch, every index
        visited exactly once per epoch — the reference's shuffled DataLoader
        epoch semantics (train_diffute_v1.py:757-763,858).  The trailing
        partial batch is dropped (jit'd steps need static shapes).
        ``num_epochs`` bounds iteration; ``start_epoch`` supports resume.
      - ``"replacement"``: infinite i.i.d. sampling with replacement.
      - ``None`` (default): "epoch" for real datasets, "replacement" for
        datasets too large to permute (>= 2^24 examples).

    Multi-host: pass ``process_index``/``process_count`` (e.g. from
    ``jax.process_index()``/``jax.process_count()``) and each process draws
    a disjoint interleaved shard of every epoch permutation (replacement
    mode folds the rank into the seed) — the loader side of the reference's
    DistributedSampler role.
    """

    def __init__(self, dataset, batch_size: int, collate, num_threads: int = 4,
                 prefetch: int = 4, seed: int = 0,
                 shuffle: Optional[str] = None,
                 num_epochs: Optional[int] = None, start_epoch: int = 0,
                 process_index: int = 0, process_count: int = 1):
        shuffle = self.resolve_shuffle(len(dataset), batch_size,
                                       process_count, shuffle)
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.seed = seed
        self.shuffle = shuffle
        self.num_epochs = num_epochs
        self.start_epoch = start_epoch
        self.process_index = process_index
        self.process_count = process_count

    @staticmethod
    def resolve_shuffle(n: int, batch_size: int, process_count: int = 1,
                        shuffle: Optional[str] = None) -> str:
        """The sampling mode ``shuffle=None`` resolves to — shared with the
        trainer CLIs so their epoch/seed handling always agrees with the
        loader's actual mode."""
        if shuffle not in (None, "epoch", "replacement"):
            raise ValueError(f"shuffle must be 'epoch'/'replacement'/None, "
                             f"got {shuffle!r}")
        too_small = n // process_count < batch_size
        if shuffle is None:
            # auto: epoch semantics when a permutation is affordable AND the
            # per-process shard fills at least one batch (tiny smoke
            # manifests keep working via replacement sampling)
            return ("replacement" if n >= _EPOCH_SHUFFLE_MAX or too_small
                    else "epoch")
        if shuffle == "epoch" and too_small:
            raise ValueError(
                f"epoch shuffle needs >= one batch per process: "
                f"{n} examples / {process_count} processes < "
                f"batch_size {batch_size}")
        return shuffle

    @property
    def steps_per_epoch(self) -> int:
        """Full batches per epoch on this process (epoch mode)."""
        return (len(self.dataset) // self.process_count) // self.batch_size

    def _index_batches(self) -> Iterator[List[int]]:
        n = len(self.dataset)
        if self.shuffle == "replacement":
            rng = np.random.default_rng((self.seed, self.process_index))
            while True:
                yield [int(rng.integers(n)) for _ in range(self.batch_size)]
        else:
            epoch = self.start_epoch
            while self.num_epochs is None or epoch < self.num_epochs:
                # seeded by (seed, epoch) only: all processes draw the SAME
                # permutation and slice disjoint interleaved shards of it
                perm = np.random.default_rng((self.seed, epoch)).permutation(n)
                shard = perm[self.process_index::self.process_count]
                for i in range(0, len(shard) - self.batch_size + 1,
                               self.batch_size):
                    yield [int(j) for j in shard[i : i + self.batch_size]]
                epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        gen = self._index_batches()
        lock = threading.Lock()
        self.error_count = 0

        fatal = []  # non-example worker failure, re-raised in the consumer

        def put_stop_aware(item):
            while not stop.is_set():  # bounded put: notice consumer exit
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        n = len(self.dataset)

        def fetch(i):
            # Substitute-on-decode-error (§5.3): a bad blob is replaced by a
            # deterministic alternate index rather than dropping the whole
            # batch — dropping would desynchronize batch counts across
            # multi-host ranks and hang peers inside the jitted collective.
            for attempt in range(_EXAMPLE_RETRIES):
                j = i if attempt == 0 else (i + attempt * 104729) % n
                try:
                    return self.dataset[j]
                except Exception as e:
                    self.error_count += 1
                    if (self.error_count in (1, 10, 100)
                            or self.error_count % 1000 == 0):
                        print(f"[data] example {j} failed (error "
                              f"#{self.error_count}), substituting: "
                              f"{type(e).__name__}: {e}", flush=True)
            raise RuntimeError(
                f"{_EXAMPLE_RETRIES} consecutive example failures starting "
                f"at index {i}; data source looks broken")

        def worker():
            try:
                while not stop.is_set():
                    with lock:
                        idx = next(gen, None)
                    if idx is None:  # epoch budget exhausted
                        return
                    batch = self.collate([fetch(i) for i in idx])
                    put_stop_aware(batch)
            except BaseException as e:  # e.g. MemoryError in the permutation
                fatal.append(e)
            finally:
                put_stop_aware(None)  # ALWAYS deliver the sentinel

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        finished = 0
        try:
            while finished < len(threads):
                item = q.get()
                if item is None:
                    finished += 1
                    continue
                yield item
            if fatal:
                raise fatal[0]
        finally:
            stop.set()
