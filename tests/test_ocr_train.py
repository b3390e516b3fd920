"""OCR-verifier stage: tokenizer, dataset, trainer, export, and the
discriminative sanity of the eval metric (VERDICT r2 weak #8).

The reference's OCR round-trip is sketched and commented out
(app.ipynb:843-847); diffute_tpu trains a char-level TrOCR
(train/run_ocr.py) to make it a real gate.  The micro-convergence test here
is the miniature of the on-chip convergence run: a tiny encoder+decoder
trained on two words must read them back exactly, and the eval metric must
separate correct from incorrect readings.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.text.char_tokenizer import (CharTokenizer, EOS_ID, PAD_ID,
                                             VOCAB_SIZE)


def test_char_tokenizer_round_trip():
    tok = CharTokenizer()
    ids = tok.encode("Hello 42!", max_len=16)
    assert ids.shape == (16,) and ids.dtype == np.int32
    assert tok.decode(ids) == "Hello 42!"
    assert ids[9] == EOS_ID and (ids[10:] == PAD_ID).all()
    # truncation leaves room for EOS
    ids = tok.encode("abcdefgh", max_len=4)
    assert tok.decode(ids) == "abc" and ids[3] == EOS_ID
    # unknown (non-printable) chars are skipped
    assert tok.decode(tok.encode("a\tb", max_len=8)) == "ab"
    assert tok.batch_decode(np.stack([tok.encode("x", 8),
                                      tok.encode("yz", 8)])) == ["x", "yz"]
    assert tok.vocab_size == VOCAB_SIZE


def test_synthetic_glyph_ocr_dataset():
    from diffute_tpu.io.dataset import (SyntheticGlyphOCRDataset,
                                        make_ocr_batch)

    cfg = tiny_test_config()
    ds = SyntheticGlyphOCRDataset(cfg, seed=0, max_len=16)
    tok = ds.tokenizer
    ex = ds[3]
    assert ex["glyph_image"].dtype == np.uint8
    assert ex["target_ids"].shape == (16,)
    # deterministic per index
    ex2 = ds[3]
    assert np.array_equal(ex["glyph_image"], ex2["glyph_image"])
    assert np.array_equal(ex["target_ids"], ex2["target_ids"])
    # the ids decode to a non-empty string the glyph was rendered from
    assert len(tok.decode(ex["target_ids"])) > 0
    batch = make_ocr_batch([ds[i] for i in range(4)], cfg)
    s = cfg.trocr.image_size
    assert batch["glyph_pixels"].shape == (4, s, s, 3)
    assert batch["target_ids"].shape == (4, 16)


def _tiny_decoder_cfg(cfg):
    from diffute_tpu.models.trocr_decoder import TrOCRDecoderConfig

    return TrOCRDecoderConfig(
        vocab_size=VOCAB_SIZE, hidden_size=cfg.trocr.hidden_size,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=32,
        max_position_embeddings=64)


def _init_ocr_params(cfg, dcfg, seed=0):
    from diffute_tpu.models.trocr_decoder import TrOCRDecoder
    from diffute_tpu.utils.params import init_trocr_params

    enc = init_trocr_params(cfg, jax.random.PRNGKey(seed))
    dec = jax.jit(TrOCRDecoder(dcfg).init)(
        jax.random.PRNGKey(seed + 1), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, cfg.trocr.seq_len, dcfg.hidden_size)))["params"]
    return {"encoder": enc, "decoder": dec}


def test_ocr_trainer_loss_decreases():
    from diffute_tpu.io.dataset import (SyntheticGlyphOCRDataset,
                                        make_ocr_batch)
    from diffute_tpu.train.ocr_train import OCRTrainer

    cfg = tiny_test_config()
    dcfg = _tiny_decoder_cfg(cfg)
    trainer = OCRTrainer(cfg, dcfg, _init_ocr_params(cfg, dcfg),
                         total_steps=30)
    ds = SyntheticGlyphOCRDataset(cfg, seed=0, max_len=8)
    losses = []
    for i in range(20):
        batch = make_ocr_batch([ds[8 * i + j] for j in range(8)], cfg)
        m = trainer.step(batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_trocr_decoder_export_import_round_trip():
    from diffute_tpu.models.trocr_decoder import (
        export_trocr_decoder_state_dict, import_trocr_decoder_state_dict)

    cfg = tiny_test_config()
    dcfg = _tiny_decoder_cfg(cfg)
    params = _init_ocr_params(cfg, dcfg)["decoder"]
    sd = export_trocr_decoder_state_dict(jax.device_get(params))
    back = import_trocr_decoder_state_dict(sd)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(jax.device_get(params)))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(params)),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trocr_encoder_export_import_round_trip():
    from diffute_tpu.compat import export_trocr_params
    from diffute_tpu.compat.hf_import import import_trocr_state_dict
    from diffute_tpu.utils.params import init_trocr_params

    cfg = tiny_test_config()
    params = jax.device_get(init_trocr_params(cfg, jax.random.PRNGKey(3)))
    back = import_trocr_state_dict(export_trocr_params(params))
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def trained_verifier():
    """Overfit a tiny OCR model on two words — the miniature of the on-chip
    convergence run (readable in ~1 min on CPU)."""
    from diffute_tpu.eval import OCRVerifier
    from diffute_tpu.text import render_glyph
    from diffute_tpu.text.preprocess import trocr_preprocess_host
    from diffute_tpu.train.ocr_train import OCRTrainer

    cfg = tiny_test_config()
    dcfg = _tiny_decoder_cfg(cfg)
    tok = CharTokenizer()
    words = ("AB", "CD")
    glyphs = [render_glyph(w, cfg.glyph) for w in words]
    # tile to a batch divisible by the 8-device test mesh
    reps = 4
    batch = {
        "glyph_pixels": np.tile(trocr_preprocess_host(glyphs, cfg.trocr),
                                (reps, 1, 1, 1)),
        "target_ids": np.tile(np.stack([tok.encode(w, 8) for w in words]),
                              (reps, 1)),
    }
    from diffute_tpu.config import OptimizerConfig

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, optimizer=OptimizerConfig(learning_rate=3e-3)))
    trainer = OCRTrainer(cfg, dcfg, _init_ocr_params(cfg, dcfg),
                         total_steps=500)
    acc = 0.0
    for i in range(500):
        m = trainer.step(batch, jax.random.PRNGKey(i))
        acc = float(m["token_accuracy"])
        if acc == 1.0 and i > 20:
            break
    assert acc == 1.0, f"tiny OCR did not overfit two words (acc={acc})"
    params = jax.device_get(trainer.state.params)
    verifier = OCRVerifier(cfg.trocr, dcfg, params["encoder"],
                           params["decoder"], tokenizer=tok, max_len=8)
    return verifier, words, glyphs


def test_trained_verifier_reads_and_discriminates(trained_verifier):
    """VERDICT r2 weak #8: with a TRAINED verifier the eval metric is
    discriminative — a region showing the right word scores 1.0 on id-match
    and exact on text, an unrelated render scores low."""
    from diffute_tpu.eval.run import _id_match

    verifier, words, glyphs = trained_verifier
    eos = verifier.decoder.config.eos_token_id

    ids = {w: verifier.read([g])[0] for w, g in zip(words, glyphs)}
    texts = verifier.read_text(list(glyphs))
    assert list(texts) == list(words)

    # identical render: perfect id-match
    assert _id_match(ids["AB"], verifier.read([glyphs[0]])[0], eos) == 1.0
    # different word: imperfect id-match (first char already differs)
    assert _id_match(ids["AB"], ids["CD"], eos) < 1.0
    # blank background reads as neither word
    blank = np.full_like(glyphs[0], 230)
    assert verifier.read_text([blank])[0] != words[0]


def test_id_match_degenerate_empty_reads_score_zero():
    """An untrained verifier emits EOS at position 0 for everything; two
    empty reads must NOT count as perfect agreement (VERDICT r2 weak #8)."""
    from diffute_tpu.eval.run import _id_match

    eos = 2
    empty = np.array([eos, 0, 0], np.int32)
    word = np.array([5, 7, eos], np.int32)
    assert _id_match(empty, empty, eos) == 0.0
    assert _id_match(empty, word, eos) == 0.0
    assert _id_match(word, word, eos) == 1.0
