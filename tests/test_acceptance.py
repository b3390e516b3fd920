"""Self-test of the weight-day acceptance command at tiny scale.

The real run (full-size weights + a reference-stack bundle) is blocked by
zero egress; this proves the machinery: a layout accepted against its own
bundle, every stage exercised, and a WRONG-weights layout rejected by the
latent-parity stage — so on weight day the command is known-good.
"""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from diffute_tpu.config import tiny_test_config
from diffute_tpu.eval.acceptance import main as acceptance_main
from diffute_tpu.train.checkpoint import (
    diffusers_unet_config_json,
    diffusers_vae_config_json,
    export_diffusers_layout,
    vit_config_json,
)
from diffute_tpu.utils import init_pipeline_params


def _export_layout(path, cfg, seed):
    params = init_pipeline_params(cfg, seed=seed)
    export_diffusers_layout(
        path, unet_params=params["unet"], unet_ema_params=None,
        unet_config=diffusers_unet_config_json(cfg.unet),
        vae_params=params["vae"],
        vae_config=diffusers_vae_config_json(cfg.vae),
        trocr_params=params["trocr"],
        trocr_config=vit_config_json(cfg.trocr))


@pytest.mark.slow
def test_acceptance_roundtrip_and_rejection(tmp_path):
    cfg = tiny_test_config()
    layout = str(tmp_path / "layout")
    bundle = str(tmp_path / "bundle")
    _export_layout(layout, cfg, seed=5)

    common = ["--model_scale", "tiny", "--steps", "4"]

    # make the bundle from the same stack+weights (the format spec)
    rc = acceptance_main(["--pretrained", layout,
                          "--make_reference", bundle] + common)
    assert rc == 0
    assert os.path.exists(os.path.join(bundle, "latents_steps.npy"))
    assert os.path.exists(os.path.join(bundle, "manifest.json"))

    # same weights vs their own bundle: every stage must PASS (pins are
    # full-scale-only, recorded as skipped at tiny scale)
    report_path = str(tmp_path / "report.json")
    rc = acceptance_main(["--pretrained", layout,
                          "--reference_outputs", bundle,
                          "--out", report_path] + common)
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)
    assert report["accepted"]
    for name in ("layout", "goldens", "latents", "image"):
        assert report["stages"][name]["status"] == "pass", (name, report)
    assert report["stages"]["param_pins"]["status"] == "skipped"

    # a DIFFERENT-weights layout must be rejected by the numeric stages
    wrong = str(tmp_path / "wrong")
    _export_layout(wrong, cfg, seed=6)
    rc = acceptance_main(["--pretrained", wrong,
                          "--reference_outputs", bundle] + common)
    assert rc == 1


def test_acceptance_without_bundle_certifies_layout_only(tmp_path):
    cfg = tiny_test_config()
    layout = str(tmp_path / "layout")
    _export_layout(layout, cfg, seed=5)
    report_path = str(tmp_path / "report.json")
    rc = acceptance_main(["--pretrained", layout, "--model_scale", "tiny",
                          "--out", report_path])
    assert rc == 0
    with open(report_path) as f:
        report = json.load(f)
    assert report["accepted"]
    assert report["stages"]["goldens"]["status"] == "skipped"


def test_acceptance_make_reference_plus_bundle_still_compares(tmp_path):
    # --make_reference together with --reference_outputs must write our
    # bundle AND run the comparison — returning after the write would
    # certify with zero numeric checks (and no skipped stages for the
    # vacuity guard to catch)
    cfg = tiny_test_config()
    layout = str(tmp_path / "layout")
    wrong = str(tmp_path / "wrong")
    bundle = str(tmp_path / "bundle")
    ours = str(tmp_path / "ours")
    _export_layout(layout, cfg, seed=5)
    _export_layout(wrong, cfg, seed=6)
    common = ["--model_scale", "tiny", "--steps", "4"]
    rc = acceptance_main(["--pretrained", layout,
                          "--make_reference", bundle] + common)
    assert rc == 0

    report_path = str(tmp_path / "report.json")
    rc = acceptance_main(["--pretrained", wrong,
                          "--make_reference", ours,
                          "--reference_outputs", bundle,
                          "--out", report_path] + common)
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert not report["accepted"]
    assert report["stages"]["make_reference"]["status"] == "pass"
    assert os.path.exists(os.path.join(ours, "latents_steps.npy"))
    assert report["stages"]["latents"]["status"] == "fail"


def test_acceptance_rejects_unloadable_layout(tmp_path):
    # a component subdir WITHOUT its safetensors file would be silently
    # random-initialized by the loader (and the pins pass by construction,
    # they count topology) — the layout stage must fail on the missing FILE
    cfg = tiny_test_config()
    layout = str(tmp_path / "layout")
    _export_layout(layout, cfg, seed=5)
    os.remove(os.path.join(layout, "vae",
                           "diffusion_pytorch_model.safetensors"))
    report_path = str(tmp_path / "report.json")
    rc = acceptance_main(["--pretrained", layout, "--model_scale", "tiny",
                          "--out", report_path])
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert not report["accepted"]
    assert report["stages"]["layout"]["status"] == "fail"
    assert report["stages"]["layout"]["missing_weight_files"] == ["vae"]


def test_acceptance_rejects_vacuous_and_mismatched_bundle(tmp_path):
    cfg = tiny_test_config()
    layout = str(tmp_path / "layout")
    _export_layout(layout, cfg, seed=5)

    # bundle with a manifest but NO comparable arrays: every numeric stage
    # is skipped, and the vacuity guard must refuse to certify
    bundle = tmp_path / "empty_bundle"
    bundle.mkdir()
    with open(bundle / "manifest.json", "w") as f:
        json.dump({"model_scale": "tiny", "steps": 4}, f)
    report_path = str(tmp_path / "report.json")
    rc = acceptance_main(["--pretrained", layout, "--model_scale", "tiny",
                          "--reference_outputs", str(bundle),
                          "--out", report_path])
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert not report["accepted"]
    assert report["stages"]["bundle"]["status"] == "fail"

    # bundle made at a different model scale: clean manifest-stage fail,
    # not a broadcast crash mid-comparison
    with open(bundle / "manifest.json", "w") as f:
        json.dump({"model_scale": "small"}, f)
    rc = acceptance_main(["--pretrained", layout, "--model_scale", "tiny",
                          "--reference_outputs", str(bundle),
                          "--out", report_path])
    assert rc == 1
    with open(report_path) as f:
        report = json.load(f)
    assert report["stages"]["manifest"]["status"] == "fail"
