"""End-to-end CLI trainer runs (in-process, tiny smoke configs)."""

import json
import os
import sys

import cv2
import numpy as np
import pytest


def _run_main(module_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    module_main()


def test_run_vae_smoke(tmp_path, monkeypatch, capsys):
    from diffute_tpu.train.run_vae import main

    out = str(tmp_path / "vae")
    _run_main(main, ["run_vae", "--smoke", "--report_to", "none",
                     "--output_dir", out], monkeypatch)
    text = capsys.readouterr().out
    assert "done at step 2" in text
    assert os.path.exists(os.path.join(out, "checkpoint-2", "vae",
                                       "diffusion_pytorch_model.safetensors"))


@pytest.mark.slow
def test_run_unet_smoke_with_resume(tmp_path, monkeypatch, capsys):
    from diffute_tpu.train.run_unet import main

    out = str(tmp_path / "unet")
    _run_main(main, ["run_unet", "--smoke", "--report_to", "none",
                     "--output_dir", out, "--use_ema"], monkeypatch)
    first = capsys.readouterr().out
    assert "done at step 2" in first
    ckpt = os.path.join(out, "checkpoint-2")
    assert os.path.exists(os.path.join(ckpt, "unet",
                                       "diffusion_pytorch_model.safetensors"))
    assert os.path.exists(os.path.join(ckpt, "unet_ema",
                                       "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(ckpt, "unet", "config.json")) as f:
        cfg = json.load(f)
    assert cfg["in_channels"] == 9

    # resume from latest with the target already satisfied: the CLI exits
    # from the checkpoint dir name alone, before any model/trainer init
    _run_main(main, ["run_unet", "--smoke", "--report_to", "none",
                     "--output_dir", out, "--use_ema",
                     "--resume_from_checkpoint", "latest"], monkeypatch)
    second = capsys.readouterr().out
    assert "done at step 2" in second and "nothing to train" in second


def test_trainer_early_exit_on_satisfied_target(tmp_path, monkeypatch, capsys):
    # a segment target the newest checkpoint already satisfies must exit
    # before ANY heavy init: the fake checkpoint below has a finalized-looking
    # dir but no restorable state, so reaching the old restore path would
    # crash — success proves the dirname-based early exit ran instead
    from diffute_tpu.train.run_vae import main

    out = str(tmp_path / "vae")
    os.makedirs(os.path.join(out, "checkpoint-7", "state"))
    _run_main(main, ["run_vae", "--smoke", "--report_to", "none",
                     "--output_dir", out,
                     "--resume_from_checkpoint", "latest"], monkeypatch)
    text = capsys.readouterr().out
    assert "done at step 7" in text and "nothing to train" in text
    # and it trained/exported nothing
    assert not os.path.exists(os.path.join(out, "checkpoint-7", "vae"))


@pytest.mark.slow
def test_run_unet_with_manifest(tmp_path, monkeypatch, capsys):
    from diffute_tpu.train.run_unet import main

    img = np.random.RandomState(0).randint(0, 255, (300, 400, 3), np.uint8)
    ip = str(tmp_path / "im.png")
    cv2.imwrite(ip, img)
    op = str(tmp_path / "ocr.json")
    with open(op, "w") as f:
        json.dump({"document": [{"text": "hello", "score": 0.9,
                                 "box": [[50, 60], [180, 60], [180, 90],
                                         [50, 90]]}]}, f)
    csv = str(tmp_path / "doc_select.csv")
    with open(csv, "w") as f:
        f.write(f"image_path,ocr_path\n{ip},{op}\n")

    out = str(tmp_path / "unet_m")
    _run_main(main, ["run_unet", "--smoke", "--report_to", "none",
                     "--output_dir", out, "--manifest", csv,
                     "--optimizer", "adafactor"], monkeypatch)
    assert "done at step 2" in capsys.readouterr().out


def test_run_vae_steps_per_call(tmp_path, monkeypatch, capsys):
    from diffute_tpu.train.run_vae import main

    out = str(tmp_path / "vae_spc")
    _run_main(main, ["run_vae", "--smoke", "--report_to", "none",
                     "--output_dir", out, "--steps_per_call", "2"],
              monkeypatch)
    assert "done at step 2" in capsys.readouterr().out


def test_checkpoint_step_parses_defensively():
    # a renamed/copied checkpoint dir must not crash the early-exit check
    # (it is still restorable through its state/ subdir)
    from diffute_tpu.train.checkpoint import checkpoint_step

    assert checkpoint_step("/x/y/checkpoint-42") == 42
    assert checkpoint_step("/x/y/checkpoint-42/") == 42
    assert checkpoint_step("/x/y/best-model") == -1
    assert checkpoint_step("/x/y/checkpoint-latest") == -1
    assert checkpoint_step("checkpoint-7") == 7


def test_resume_from_renamed_checkpoint_dir(tmp_path, monkeypatch, capsys):
    # an explicit --resume_from_checkpoint dir whose basename is not
    # 'checkpoint-N' skips the dirname early exit and restores normally
    import shutil

    from diffute_tpu.train.run_vae import main

    out = str(tmp_path / "vae")
    _run_main(main, ["run_vae", "--smoke", "--report_to", "none",
                     "--output_dir", out], monkeypatch)
    capsys.readouterr()
    renamed = str(tmp_path / "best-copy")
    shutil.copytree(os.path.join(out, "checkpoint-2"), renamed)
    _run_main(main, ["run_vae", "--smoke", "--report_to", "none",
                     "--output_dir", out,
                     "--resume_from_checkpoint", renamed], monkeypatch)
    text = capsys.readouterr().out
    assert f"resumed from {renamed} at step 2" in text
    assert "done at step 2" in text
