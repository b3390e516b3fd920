"""Host-side glyph rasterization (FreeType via PIL).

Exact reproduction of the reference's ``draw_text`` (train_diffute_v1.py:
352-368, identical copy at app.ipynb:347-363): render the replacement string
in black on a white RGB canvas of size ``((len(text)+2)*40, 60)`` at offset
(40, 10) with font size 40; empty text is treated as length 3.

The reference font ``arialuni.ttf`` is stripped from the snapshot
(.MISSING_LARGE_BLOBS:1); :func:`find_font` falls back to the first available
system font.  Rasterization is inherently host/CPU (FreeType); renders are
LRU-cached so repeated edits of the same string skip the raster + resize.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from diffute_tpu.config import GlyphConfig

FALLBACK_FONTS = (
    "arialuni.ttf",
    os.path.join(os.path.dirname(__file__), "..", "..", "assets", "arialuni.ttf"),
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf",
)


@functools.lru_cache(maxsize=8)
def find_font(font_path: Optional[str], font_size: int) -> ImageFont.FreeTypeFont:
    candidates = (font_path,) + FALLBACK_FONTS if font_path else FALLBACK_FONTS
    for cand in candidates:
        if cand is None:
            continue
        try:
            return ImageFont.truetype(cand, font_size)
        except OSError:
            continue
    raise FileNotFoundError(
        f"No usable TTF font found (searched {candidates}); "
        "set GlyphConfig.font_path"
    )


@functools.lru_cache(maxsize=4096)
def _render_cached(text: str, font_size: int, canvas_height: int,
                   pos: tuple, empty_text_len: int,
                   font_path: Optional[str]) -> bytes:
    len_text = len(text) or empty_text_len
    img = Image.new("RGB", ((len_text + 2) * font_size, canvas_height),
                    color="white")
    font = find_font(font_path, font_size)
    draw = ImageDraw.Draw(img)
    draw.text(pos, text, font=font, fill="black")
    arr = np.array(img)
    return arr.tobytes() + arr.shape[1].to_bytes(4, "little")


def render_glyph(text: str, config: GlyphConfig = GlyphConfig()) -> np.ndarray:
    """Render ``text`` -> uint8 RGB array (canvas_height, (len+2)*font_size, 3)."""
    raw = _render_cached(text, config.font_size, config.canvas_height,
                         tuple(config.text_pos), config.empty_text_len,
                         config.font_path)
    width = int.from_bytes(raw[-4:], "little")
    arr = np.frombuffer(raw[:-4], dtype=np.uint8)
    return arr.reshape(config.canvas_height, width, 3).copy()
