"""Gradio demo — UI parity with the reference's app (app.ipynb:856-928).

Two-click ROI selection on the uploaded image (odd/even click state machine
like ``get_select_coordinates``, app.ipynb:860-884), a steps slider 20-200
defaulting to 150 (app.ipynb:914), and the edited image + region mask as
outputs.  gradio is not in the base image; the import is gated and the module
degrades to a clear error message.

Launch: ``python -m diffute_tpu.serve.app --checkpoint <diffusers-layout dir>``
(random-init weights when omitted — layout/demo testing only).
"""

from __future__ import annotations

import argparse
from typing import Optional

import numpy as np


def build_pipeline(checkpoint: Optional[str] = None):
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    from diffute_tpu.config import DiffUTEConfig
    from diffute_tpu.pipeline import DiffUTEPipeline
    from diffute_tpu.utils import init_pipeline_params

    config = DiffUTEConfig()
    if checkpoint:
        from diffute_tpu.serve.loading import load_diffusers_layout

        params = load_diffusers_layout(checkpoint, config)
    else:
        params = init_pipeline_params(config)
    return DiffUTEPipeline(config, params)


def launch(checkpoint: Optional[str] = None, share: bool = False):
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "gradio is not installed in this environment; use the Python API "
            "(diffute_tpu.pipeline.DiffUTEPipeline.edit) or the CLI "
            "(python -m diffute_tpu.serve.cli)") from e

    pipe = build_pipeline(checkpoint)

    def get_select_coordinates(roi, evt: "gr.SelectData"):
        # two-click state machine (reference app.ipynb:860-884), kept in
        # per-session gr.State so concurrent users don't share clicks
        roi = dict(roi)
        roi["clicks"] = roi.get("clicks", 0) + 1
        if roi["clicks"] % 2 == 1:
            roi["x_temp"], roi["y_temp"] = evt.index
        else:
            roi["x_new"], roi["y_new"] = evt.index
        return roi

    def run_edit(img, text, steps, roi):
        if roi.get("clicks", 0) < 2:
            raise gr.Error("Click two corners of the text region first.")
        x0 = min(roi["x_temp"], roi["x_new"])
        y0 = min(roi["y_temp"], roi["y_new"])
        x1 = max(roi["x_temp"], roi["x_new"])
        y1 = max(roi["y_temp"], roi["y_new"])
        out, mask = pipe.edit(np.asarray(img), (x0, y0, x1, y1), text,
                              num_inference_steps=int(steps))
        return out, mask

    with gr.Blocks() as demo:
        gr.Markdown("# DiffUTE-TPU — scene text editing")
        roi_state = gr.State({})
        with gr.Row():
            inp = gr.Image(label="input (click two corners of the region)")
            outp = gr.Image(label="edited")
            maskp = gr.Image(label="mask")
        text = gr.Textbox(label="replacement text")
        steps = gr.Slider(20, 200, value=150, step=1, label="denoising steps")
        btn = gr.Button("Edit")
        inp.select(get_select_coordinates, [roi_state], roi_state)
        btn.click(run_edit, [inp, text, steps, roi_state], [outp, maskp])
    demo.launch(share=share)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--share", action="store_true")
    a = p.parse_args()
    launch(a.checkpoint, a.share)
