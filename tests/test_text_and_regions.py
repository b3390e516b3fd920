"""Golden tests for the reference's behavior-defining preprocessing:
glyph canvas geometry (train_diffute_v1.py:352-368), box extension
(:370-373), mask semantics (:375-383), masked image (:385-388)."""

import numpy as np
from PIL import Image, ImageDraw

from diffute_tpu.config import GlyphConfig
from diffute_tpu.pipeline import generate_mask, make_masked_image, process_location
from diffute_tpu.text import render_glyph
from diffute_tpu.text.glyph import find_font
from diffute_tpu.text.preprocess import trocr_preprocess_host


def test_glyph_canvas_geometry():
    g = render_glyph("hello")
    assert g.shape == (60, (5 + 2) * 40, 3)
    assert g.dtype == np.uint8
    # white background in the left margin (text starts at x=40)
    assert (g[:, :35] == 255).all()
    # some black ink
    assert g.min() < 50


def test_glyph_empty_text():
    g = render_glyph("")
    assert g.shape == (60, (3 + 2) * 40, 3)
    assert (g == 255).all()  # nothing drawn


def test_glyph_matches_reference_semantics():
    # Independent re-derivation of draw_text with the same font object.
    cfg = GlyphConfig()
    text = "Test 123"
    font = find_font(cfg.font_path, cfg.font_size)
    img = Image.new("RGB", ((len(text) + 2) * 40, 60), color="white")
    ImageDraw.Draw(img).text((40, 10), text, font=font, fill="black")
    np.testing.assert_array_equal(render_glyph(text, cfg), np.array(img))


def test_glyph_cache_returns_copies():
    a = render_glyph("cache")
    b = render_glyph("cache")
    a[0, 0] = 0
    assert (b[0, 0] == 255).all()


def test_trocr_preprocess_shapes():
    imgs = [render_glyph("ab"), render_glyph("a much longer string")]
    out = trocr_preprocess_host(imgs)
    assert out.shape == (2, 384, 384, 3)
    assert out.dtype == np.uint8


def test_process_location_extends_down_10pct():
    loc = process_location([10, 20, 110, 60], (1000, 1000))
    # h = 40 -> y2 extended by 4
    np.testing.assert_array_equal(loc, [10, 20, 110, 64])
    # clamped at image bottom
    loc = process_location([10, 20, 110, 998], (1000, 1000))
    assert loc[3] == 999


def test_generate_mask_matches_pil_inclusive_fill():
    h, w = 50, 80
    box = [10, 5, 30, 20]
    ours = generate_mask((h, w), box)
    pil = Image.new("L", (w, h), 0)
    ImageDraw.Draw(pil).rectangle((box[0], box[1], box[2], box[3]), fill=1)
    np.testing.assert_array_equal(ours, np.array(pil))
    assert ours.sum() == (30 - 10 + 1) * (20 - 5 + 1)


def test_generate_mask_clips_to_image():
    m = generate_mask((20, 20), [15, 15, 40, 40])
    assert m[19, 19] == 1 and m.sum() == 5 * 5


def test_make_masked_image():
    img = np.full((10, 10, 3), 200, np.uint8)
    mask = generate_mask((10, 10), [2, 2, 4, 4])
    out = make_masked_image(img, mask)
    assert (out[2:5, 2:5] == 0).all()
    assert (out[6:, 6:] == 200).all()
