"""Gradio demo — UI parity with the reference's app (app.ipynb:856-928).

Affordances matching the reference:
  - two-click ROI selection with an ``gr.AnnotatedImage`` overlay (first
    click: red point marker; second click: the completed region) —
    app.ipynb:860-884,899;
  - X0/Y0/X1/Y1 ``gr.Number`` boxes live-updated by the clicks (and
    editable by hand, like the reference) — app.ipynb:906-907;
  - an examples gallery seeding (text, image, steps, box) — app.ipynb:
    905-912, with procedurally generated stand-in images;
  - a 20-200 steps slider defaulting to 150 — app.ipynb:914.

Improvement over the reference: click state lives in per-session
``gr.State`` instead of a module-global dict, so concurrent users don't
share clicks.  All callback logic is in serve/ui.py (gradio-free,
unit-tested); gradio is not in this image, so the import is gated and the
module degrades to a clear error message.

Launch: ``python -m diffute_tpu.serve.app --checkpoint <diffusers-layout dir>``
(random-init weights when omitted — layout/demo testing only).
"""

from __future__ import annotations

import argparse
import tempfile
from typing import Optional

import numpy as np

from diffute_tpu.serve.ui import (
    POINT_LABEL,
    initial_roi_state,
    make_examples,
    roi_ready,
    run_edit,
    select_coordinates,
)


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
    examples = make_examples(tempfile.mkdtemp(prefix="diffute_examples_"))

    def on_select(img, roi, evt: "gr.SelectData"):
        roi, sections, (bx0, by0, bx1, by1) = select_coordinates(
            roi, evt.index, np.asarray(img).shape[:2])
        return roi, (img, sections), bx0, by0, bx1, by1

    def on_generate(img, text, steps, sampler, roi, bx0, by0, bx1, by1):
        # the Number boxes are authoritative (they're example-seeded and
        # hand-editable, like the reference); clicks only populate them.
        # Unclicked Number widgets deliver None — treat as no box.
        coords = [0 if c is None else c for c in (bx0, by0, bx1, by1)]
        bx0, by0, bx1, by1 = coords
        if not roi_ready(roi) and (bx1 - bx0) * (by1 - by0) <= 0:
            raise gr.Error("Click two corners of the text region (or fill "
                           "the X0/Y0/X1/Y1 boxes) first.")
        try:
            return run_edit(pipe, img, text, steps, bx0, by0, bx1, by1,
                            sampler=sampler)
        except (TypeError, ValueError) as e:
            raise gr.Error(str(e)) from e

    with gr.Blocks() as demo:
        gr.Markdown("DiffUTE-TPU: Universal Text Editing Diffusion Model")
        with gr.Tab("Text editing pipeline"):
            roi_state = gr.State(initial_roi_state())
            with gr.Row():
                with gr.Column():
                    ori_image = gr.Image(label="Original image")
                    text_input = gr.Textbox(
                        label="Input the text you want to write here")
                    img_output = gr.AnnotatedImage(
                        label="ROI", color_map={POINT_LABEL: "#f44336"})
                    button = gr.Button("Generate", variant="primary")
                    with gr.Row():
                        x0 = gr.Number(label="X0")
                        x1 = gr.Number(label="X1")
                        y0 = gr.Number(label="Y0")
                        y1 = gr.Number(label="Y1")
                    steps = gr.Slider(
                        20.0, 200.0, value=150, step=1, label="Inference step",
                        info="The step of denoising process.")
                    sampler = gr.Dropdown(
                        ["ddim", "ddpm", "dpmpp"], value="ddim",
                        label="Sampler",
                        info="dpmpp = DPM-Solver++(2M): full quality at "
                             "~20 steps (beyond-reference option).")
                    gr.Examples(
                        examples,
                        inputs=[text_input, ori_image, steps, x0, y0, x1, y1])
                with gr.Column():
                    output_img = gr.Image(label="Generated image")
                    output_mask = gr.Image(label="Generated mask")
        ori_image.select(on_select, [ori_image, roi_state],
                         [roi_state, img_output, x0, y0, x1, y1])
        button.click(on_generate,
                     [ori_image, text_input, steps, sampler, roi_state,
                      x0, y0, x1, y1],
                     [output_img, output_mask])
    demo.launch(share=share)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--share", action="store_true")
    a = p.parse_args()
    launch(a.checkpoint, a.share)
