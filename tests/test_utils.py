"""utils: image conversions (reference R18), optimizer options."""

import numpy as np
import pytest

from diffute_tpu.config import OptimizerConfig
from diffute_tpu.train.optim import build_lr_schedule, build_optimizer
from diffute_tpu.utils.images import image_to_tensor, numpy_to_pil, tensor_to_image


def test_image_tensor_roundtrip():
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    t = image_to_tensor(img)
    assert t.min() >= -1 and t.max() <= 1
    back = tensor_to_image(t)
    np.testing.assert_array_equal(back, img)


def test_numpy_to_pil():
    imgs = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    pils = numpy_to_pil(imgs)
    assert len(pils) == 2 and pils[0].size == (8, 8)
    gray = numpy_to_pil(np.zeros((8, 8, 1), np.uint8))
    assert gray[0].mode == "L"


def test_lr_schedules():
    for name in ["constant", "constant_with_warmup", "linear", "cosine",
                 "cosine_with_restarts", "polynomial"]:
        sched = build_lr_schedule(
            OptimizerConfig(lr_scheduler=name, lr_warmup_steps=10), 100)
        v0, vmid, vend = float(sched(0)), float(sched(50)), float(sched(99))
        assert v0 >= 0 and vmid >= 0 and vend >= 0
        if name != "constant":
            assert v0 < 1e-4 + 1e-9  # warmup starts near 0
        if name in ("linear", "cosine", "polynomial"):
            assert vend < vmid


def test_scale_lr_and_low_memory_adam():
    import jax
    import jax.numpy as jnp

    cfg = OptimizerConfig(scale_lr=True, low_memory_adam=True,
                          learning_rate=1e-4)
    tx = build_optimizer(cfg, 100, total_batch_size=64)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, _ = tx.update(grads, state, params)
    # scaled lr 1e-4*64: first adam step magnitude ~ lr
    assert abs(float(updates["w"][0, 0])) > 1e-4
    mu_leaves = [x for x in jax.tree_util.tree_leaves(state)
                 if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mu_leaves, "expected bf16 first-moment state"


def test_metric_writer_tracker_fanout(tmp_path, capsys):
    """--report_to parity (reference train_diffute_v1.py:277-285): known
    trackers resolve when importable, unknown/absent ones degrade to stdout
    with a warning instead of failing the run."""
    from diffute_tpu.utils.metrics import MetricWriter

    w = MetricWriter(str(tmp_path / "tb"), report_to="tensorboard")
    w.log(1, {"train_loss": 0.5})
    w.close()
    import os

    assert os.listdir(str(tmp_path / "tb"))  # event file written

    w = MetricWriter(None, report_to="wandb")  # not installed in this image
    w.log(1, {"train_loss": 0.25})
    w.close()
    out = capsys.readouterr().out
    assert "wandb" in out and "train_loss=0.25000" in out

    w = MetricWriter(None, report_to="none")
    w.log(3, {"x": 1.0})
    w.close()
    assert "[step 3] x=1.00000" in capsys.readouterr().out


def test_extract_loss_curve_keeps_nan_points(tmp_path):
    # a diverged segment (train_loss=nan) must appear in the curve, not be
    # silently dropped by the line regex
    import json
    import math
    import subprocess
    import sys

    log = tmp_path / "unet.log"
    log.write_text(
        "[step 16] train_loss=0.5 grad_norm=1.0 steps_per_sec=1.0\n"
        "[step 32] train_loss=nan grad_norm=inf steps_per_sec=1.0\n"
        "[step 48] train_loss=0.4 grad_norm=0.9 steps_per_sec=1.0\n")
    out = tmp_path / "curve.json"
    subprocess.run([sys.executable, "benchmarks/extract_loss_curve.py",
                    str(log), "--out", str(out), "--every", "1"],
                   check=True, cwd="/root/repo")
    curve = json.load(open(out))
    assert [p["step"] for p in curve] == [16, 32, 48]
    assert math.isnan(curve[1]["train_loss"])
    assert math.isinf(curve[1]["grad_norm"])


def test_cosine_with_restarts_matches_diffusers_closed_form():
    # golden vs get_cosine_with_hard_restarts_schedule_with_warmup semantics:
    #   warmup: lr * step/warmup
    #   then:   lr * 0.5*(1+cos(pi * ((num_cycles*progress) % 1)))
    import dataclasses
    import math

    lr, warmup, total, cycles = 1e-4, 10, 100, 3
    cfg = OptimizerConfig(lr_scheduler="cosine_with_restarts",
                          lr_warmup_steps=warmup, learning_rate=lr,
                          lr_num_cycles=cycles)
    sched = build_lr_schedule(cfg, total)

    def ref(step):
        if step < warmup:
            return lr * step / max(1, warmup)
        progress = (step - warmup) / max(1, total - warmup)
        if progress >= 1.0:
            return 0.0
        return lr * 0.5 * (1.0 + math.cos(math.pi * ((cycles * progress) % 1.0)))

    # the schedule computes in f32; (1+cos) near the arc minimum amplifies
    # rounding, so allow lr*1e-5 absolute slack
    for step in range(0, 110):
        assert float(sched(step)) == pytest.approx(ref(step), rel=1e-5,
                                                   abs=lr * 1e-5), step

    # cycle boundaries: span 90, cycles 3 -> restart at warmup+30, +60
    for b in (40, 70):
        assert float(sched(b)) == pytest.approx(lr, rel=1e-6)       # snaps back to full lr
        assert float(sched(b - 1)) < 0.01 * lr                      # fell to ~0 just before
    assert float(sched(100)) == 0.0 and float(sched(105)) == 0.0    # past total: 0

    # num_cycles=1 equals the single hard cosine arc ending at 0
    one = build_lr_schedule(dataclasses.replace(cfg, lr_num_cycles=1), total)
    assert float(one(warmup)) == pytest.approx(lr, rel=1e-6)
    assert float(one(99)) < 0.01 * lr
