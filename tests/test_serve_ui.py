"""UI callback logic (serve/ui.py) — testable without gradio.

Pins the reference demo's two-click ROI semantics (app.ipynb:860-884),
the coordinate-box outputs, the examples gallery shape, and the
Generate-callback wiring into the pipeline.
"""

import numpy as np
import pytest

from diffute_tpu.serve.ui import (
    POINT_LABEL,
    ROI_LABEL,
    initial_roi_state,
    make_examples,
    roi_ready,
    run_edit,
    select_coordinates,
)


def test_first_click_marks_point_with_5pct_square():
    s0 = initial_roi_state()
    s1, sections, box = select_coordinates(s0, (30, 40), image_hw=(200, 400))
    assert s1["clicks"] == 1
    assert not roi_ready(s1)
    (sec_box, label), = sections
    w = int(200 * 0.05)  # 5% of image HEIGHT, like the reference
    assert label == POINT_LABEL
    assert sec_box == (30, 40, 30 + w, 40 + w) == box


def test_second_click_completes_sorted_roi():
    s0 = initial_roi_state()
    s1, _, _ = select_coordinates(s0, (100, 90), image_hw=(200, 400))
    s2, sections, box = select_coordinates(s1, (20, 130), image_hw=(200, 400))
    assert s2["clicks"] == 2 and roi_ready(s2)
    (sec_box, label), = sections
    assert label == ROI_LABEL
    assert sec_box == (20, 90, 100, 130) == box  # corners sorted


def test_third_click_starts_a_new_point():
    s = initial_roi_state()
    for xy in [(10, 10), (50, 60)]:
        s, _, _ = select_coordinates(s, xy, (100, 100))
    s3, sections, _ = select_coordinates(s, (70, 80), (100, 100))
    assert s3["clicks"] == 3 and not roi_ready(s3)
    assert sections[0][1] == POINT_LABEL
    # fourth click pairs with the third (the reference's shifting window)
    s4, sections, box = select_coordinates(s3, (60, 90), (100, 100))
    assert roi_ready(s4)
    assert box == (60, 80, 70, 90)


def test_state_is_per_session_not_shared():
    a = initial_roi_state()
    b = initial_roi_state()
    a2, _, _ = select_coordinates(a, (5, 5), (100, 100))
    assert b["clicks"] == 0 and a["clicks"] == 0  # inputs not mutated
    assert a2["clicks"] == 1


def test_make_examples_rows(tmp_path):
    import os

    rows = make_examples(str(tmp_path))
    assert len(rows) == 4
    for text, path, steps, x0, y0, x1, y1 in rows:
        assert isinstance(text, str) and text
        assert os.path.exists(path)
        assert 20 <= steps <= 200
        assert x1 > x0 and y1 > y0
        from PIL import Image

        w, h = Image.open(path).size
        assert 0 <= x0 and x1 <= w and 0 <= y0 and y1 <= h


def test_run_edit_calls_pipeline_with_reference_arg_order():
    calls = {}

    class FakePipe:
        def edit(self, image, box, text, num_inference_steps):
            calls.update(image=image, box=box, text=text,
                         steps=num_inference_steps)
            return image, np.zeros(image.shape[:2], np.uint8)

    img = np.zeros((32, 48, 3), np.uint8)
    out, mask = run_edit(FakePipe(), img, "HELLO", 150.0, 1, 2, 20, 21)
    assert calls["box"] == (1, 2, 20, 21)
    assert calls["text"] == "HELLO"
    assert calls["steps"] == 150
    assert out.shape == img.shape and mask.shape == img.shape[:2]


def test_run_edit_validates_inputs():
    class FakePipe:
        def edit(self, *a, **k):  # pragma: no cover
            raise AssertionError("should not be reached")

    with pytest.raises(ValueError):
        run_edit(FakePipe(), None, "x", 50, 0, 0, 1, 1)
    with pytest.raises(ValueError):
        run_edit(FakePipe(), np.zeros((8, 8, 3), np.uint8), "", 50, 0, 0, 1, 1)


def test_run_edit_sampler_override():
    """The beyond-reference sampler dropdown routes through edit_config."""
    import dataclasses

    from diffute_tpu.config import tiny_test_config

    captured = {}

    class FakePipe:
        config = tiny_test_config()

        def edit(self, image, box, text, num_inference_steps,
                 edit_config=None):
            captured["sampler"] = edit_config and edit_config.sampler
            return image, np.zeros(image.shape[:2], np.uint8)

    img = np.zeros((8, 8, 3), np.uint8)
    run_edit(FakePipe(), img, "X", 20, 0, 0, 4, 4, sampler="dpmpp")
    assert captured["sampler"] == "dpmpp"
    run_edit(FakePipe(), img, "X", 20, 0, 0, 4, 4)
    assert captured["sampler"] is None
