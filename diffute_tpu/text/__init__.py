from diffute_tpu.text.glyph import render_glyph, find_font  # noqa: F401
from diffute_tpu.text.preprocess import (  # noqa: F401
    trocr_preprocess_host,
    trocr_normalize,
)
from diffute_tpu.text.char_tokenizer import CharTokenizer  # noqa: F401
