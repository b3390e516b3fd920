"""Stage-2 training entry point (the reference's ``train_diffute_v1.py main()``).

Usage:
  python -m diffute_tpu.train.run_unet --manifest doc_select.csv \\
      --pretrained <diffusers-layout dir> --output-dir out \\
      --max-train-steps 10000 [--resume-from-checkpoint latest] ...
  python -m diffute_tpu.train.run_unet --smoke     # tiny synthetic run

Flag names follow the reference's where they exist
(train_diffute_v1.py:69-332).
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", default=None,
                   help="CSV with image_path/ocr_path columns (doc_select.csv)")
    p.add_argument("--pretrained", default=None,
                   help="diffusers-layout dir with vae/ unet/ (+ trocr/)")
    p.add_argument("--output_dir", "--output-dir", default="diffute-unet")
    p.add_argument("--train_batch_size", type=int, default=16)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_train_steps", "--max-train-steps", type=int,
                   default=None,
                   help="overrides --num_train_epochs when set (reference "
                        "semantics, train_diffute_v1.py:855-860)")
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--lr_scheduler", default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor", "adamw8bit"],
                   help="adafactor = factored second moment (fits the full "
                        "UNet on a single 16GB chip); adamw8bit = int8 "
                        "moments, the bnb AdamW8bit analogue")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="low-memory Adam moments (bf16 mu, TPU analogue)")
    p.add_argument("--mixed_precision", default="no", choices=["no", "bf16"])
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", "--resume-from-checkpoint",
                   default=None)
    p.add_argument("--prediction_type", default=None,
                   choices=[None, "epsilon", "v_prediction"])
    p.add_argument("--noise_offset", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report_to", default="tensorboard")
    p.add_argument("--logging_dir", default="logs")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps per lax.scan executable (amortizes "
                        "dispatch; state stays on device between steps)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny config + synthetic data, 2 steps")
    p.add_argument("--synthetic_vocab", default="fixed",
                   choices=["fixed", "mixed", "random"],
                   help="synthetic-dataset text vocabulary: fixed 10-word "
                        "list / random 3-10 char strings / 50-50 mixed — "
                        "diverse strings train glyph-conditioned generation "
                        "of NOVEL text (the eval --cross_text task) instead "
                        "of regeneration only (io/dataset.py)")
    p.add_argument("--model_scale", default="full",
                   choices=["full", "small"],
                   help="full = SD2-inpaint topology; small = reduced-width "
                        "topology (config.small_config) for on-chip "
                        "convergence experiments")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from diffute_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np

    from diffute_tpu.config import (DiffUTEConfig, OptimizerConfig,
                                    SchedulerConfig, TrainConfig,
                                    small_config, tiny_test_config)
    from diffute_tpu.io import SyntheticSceneDataset, UNetManifestDataset, make_unet_batch
    from diffute_tpu.io.dataset import PrefetchLoader
    from diffute_tpu.parallel import maybe_init_distributed
    from diffute_tpu.train import UNetTrainer
    from diffute_tpu.train.checkpoint import (
        AsyncCheckpointManager, checkpoint_step, diffusers_unet_config_json,
        diffusers_vae_config_json, export_diffusers_layout, resolve_resume,
        restore_checkpoint, vit_config_json)
    from diffute_tpu.utils import init_pipeline_params
    from diffute_tpu.utils.metrics import MetricWriter
    from diffute_tpu.utils.profiling import StepTimer

    maybe_init_distributed()

    train_cfg = TrainConfig(
        train_batch_size=args.train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        max_train_steps=args.max_train_steps,
        num_train_epochs=args.num_train_epochs,
        mixed_precision=args.mixed_precision,
        gradient_checkpointing=args.gradient_checkpointing,
        use_ema=args.use_ema,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed,
        output_dir=args.output_dir,
        noise_offset=args.noise_offset,
        prediction_type=args.prediction_type,
        dataloader_num_workers=args.dataloader_num_workers,
        steps_per_call=args.steps_per_call,
        optimizer=OptimizerConfig(
            name=args.optimizer,
            learning_rate=args.learning_rate,
            lr_scheduler=args.lr_scheduler,
            lr_warmup_steps=args.lr_warmup_steps,
            max_grad_norm=args.max_grad_norm,
            scale_lr=args.scale_lr,
            low_memory_adam=args.use_8bit_adam,
        ),
    )

    if args.smoke:
        config = dataclasses.replace(tiny_test_config(), train=train_cfg)
        batch_size = max(2, jax.local_device_count())
    else:
        base = (small_config() if args.model_scale == "small"
                else DiffUTEConfig())
        config = dataclasses.replace(base, train=train_cfg)
        # per-PROCESS batch: train_batch_size per device, local devices only
        # (multi-host pods assemble the global batch in shard_batch)
        batch_size = args.train_batch_size * jax.local_device_count()
    if args.prediction_type:
        config = dataclasses.replace(
            config, scheduler=dataclasses.replace(
                config.scheduler, prediction_type=args.prediction_type))
    if args.gradient_checkpointing:
        config = dataclasses.replace(
            config, unet=dataclasses.replace(config.unet, remat=True))

    if args.manifest:
        dataset = UNetManifestDataset(args.manifest, config, seed=args.seed)
    else:
        dataset = SyntheticSceneDataset(config, seed=args.seed,
                                        vocab=args.synthetic_vocab)
    accum = args.gradient_accumulation_steps

    # Reference semantics (train_diffute_v1.py:855-860): max_train_steps
    # wins when given, otherwise num_train_epochs over the dataset.  Use the
    # loader's own mode resolution so epoch/seed handling always matches
    # what the loader actually does (incl. the tiny-manifest fallback).
    epoch_mode = PrefetchLoader.resolve_shuffle(
        len(dataset), batch_size * accum, jax.process_count()) == "epoch"
    steps_per_epoch = max(
        1, len(dataset) // jax.process_count() // (batch_size * accum))
    if args.smoke:
        max_steps = 2
    elif args.max_train_steps:
        max_steps = args.max_train_steps
    elif epoch_mode:
        max_steps = args.num_train_epochs * steps_per_epoch
    else:
        max_steps = 10_000  # synthetic stream has no epochs
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train,
                                          max_train_steps=max_steps))

    # Segmented/relaunched chains (benchmarks/convergence_small.py) re-invoke
    # the trainer with targets an existing checkpoint may already satisfy.
    # The step is encoded in the checkpoint dir name, so decide BEFORE the
    # pretrained load + trainer/device init — a no-op segment otherwise pays
    # ~10 min of restore+compile on the relay just to discover it's done.
    resume = resolve_resume(args.output_dir, args.resume_from_checkpoint)
    if resume and checkpoint_step(resume) >= max_steps:
        # Decided from the directory NAME alone — the state was not restored
        # or validated, so say which dir satisfied the target.
        print(f"done at step {checkpoint_step(resume)}; nothing to train "
              f"(resumed at or beyond max_train_steps; checkpoint {resume} "
              f"not validated)")
        return

    if args.pretrained:
        from diffute_tpu.serve.loading import load_diffusers_layout

        params = load_diffusers_layout(args.pretrained, config)
    else:
        params = init_pipeline_params(config, seed=args.seed)

    trainer = UNetTrainer(config, params["unet"],
                          {"vae": params["vae"], "trocr": params["trocr"]},
                          total_steps=max_steps)
    # The trainer holds its own (copied/casted) param trees; dropping the
    # loader-returned f32 tree frees ~5 GB of HBM on the 866M config, which
    # otherwise sits at the v5e capacity edge and thrashes the allocator.
    del params

    start_step = 0
    resume = resolve_resume(args.output_dir, args.resume_from_checkpoint)
    if resume:
        trainer.state = restore_checkpoint(resume, trainer.state)
        start_step = int(trainer.state.step)
        print(f"resumed from {resume} at step {start_step}")

    def collate(ex):
        b = make_unet_batch(ex, config)
        if accum > 1:
            b = {k: v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
                 for k, v in b.items()}
        return b

    # Epoch mode resumes at the right epoch boundary; replacement mode folds
    # the resume step into the seed so batches are fresh.  The epoch budget
    # is recomputed from max_train_steps (not taken from --num_train_epochs)
    # so a --max_train_steps larger than num_train_epochs*steps_per_epoch
    # never exhausts the loader early — the reference recomputes
    # num_train_epochs the same way (train_diffute_v1.py:807).
    import math

    loader = PrefetchLoader(
        dataset, batch_size * accum, collate,
        num_threads=max(1, args.dataloader_num_workers),
        seed=args.seed if epoch_mode else args.seed + start_step,
        num_epochs=math.ceil(max_steps / steps_per_epoch) if epoch_mode else None,
        start_epoch=start_step // steps_per_epoch if epoch_mode else 0,
        process_index=jax.process_index(), process_count=jax.process_count())

    writer = MetricWriter(os.path.join(args.output_dir, args.logging_dir),
                          report_to=args.report_to, config=vars(args))
    ckpt_mgr = AsyncCheckpointManager(args.output_dir,
                                      args.checkpoints_total_limit)
    timer = StepTimer()
    # Fold the resume step into the RNG stream so a resumed run continues
    # with fresh batches/noise instead of replaying the first N steps (the
    # reference skips consumed batches instead, train_diffute_v1.py:862-866).
    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), start_step)
    step = start_step
    last_saved = start_step
    profiling = False
    # overlap host->device batch transfer with the running step
    from diffute_tpu.parallel import DevicePrefetcher

    spc = args.steps_per_call
    if spc > 1:
        # group spc per-step batches into one (spc, B, ...) scan input
        def grouped(it, k):
            buf = []
            for b in it:
                buf.append(b)
                if len(buf) == k:
                    yield {kk: np.stack([x[kk] for x in buf]) for kk in buf[0]}
                    buf = []

        device_loader = DevicePrefetcher(grouped(loader, spc), trainer.mesh,
                                         batch_axis=1)
    else:
        device_loader = DevicePrefetcher(loader, trainer.mesh,
                                         batch_axis=1 if accum > 1 else 0)
    # frozen components exported alongside the UNet so every checkpoint is a
    # self-contained pipeline dir (vae/ trocr/ never change during stage 2;
    # exported in float32 regardless of the bf16 training cast)
    frozen_f32 = jax.tree_util.tree_map(
        lambda x: x.astype("float32"), trainer.frozen)

    def export(p, host):
        export_diffusers_layout(
            p, unet_params=host["params"], unet_ema_params=host["ema"],
            unet_config=diffusers_unet_config_json(config.unet),
            vae_params=host["vae"],
            vae_config=diffusers_vae_config_json(config.vae),
            trocr_params=host["trocr"],
            trocr_config=vit_config_json(config.trocr))

    def export_args(state):
        return {"params": state.params,
                "ema": state.ema.params if state.ema else None,
                "vae": frozen_f32["vae"], "trocr": frozen_f32["trocr"]}

    for batch in device_loader:
        if step >= max_steps:
            break
        if args.profile_steps and step == start_step + 1 and not profiling:
            jax.profiler.start_trace(os.path.join(args.output_dir, "trace"))
            profiling = True
        if profiling and step >= start_step + 1 + args.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
        key, sub = jax.random.split(key)
        if spc > 1:
            metrics = trainer.run_steps(batch, sub)
            metrics = {k2: np.mean(np.asarray(v)) for k2, v in metrics.items()}
        else:
            metrics = trainer.step(batch, sub)
        timer.tick()
        step = int(trainer.state.step)
        rate = (spc / timer.mean) if timer.mean else 0.0
        writer.log(step, {"train_loss": metrics["loss"],
                          "grad_norm": metrics["grad_norm"],
                          "steps_per_sec": rate})
        # with steps_per_call > 1 the counter advances in strides of
        # spc, so detect crossing a checkpoint boundary, not equality
        if step % args.checkpointing_steps < spc or step >= max_steps:
            # async: orbax snapshots to host synchronously (safe under the
            # donated train state), persists + exports in the background
            last_saved = step
            path = ckpt_mgr.save(step, trainer.state, export_fn=export,
                                 export_args=export_args(trainer.state))
            print(f"saved {path}")
    if profiling:
        jax.profiler.stop_trace()
    if step > last_saved:
        # loader exhausted (epoch budget / partial scan group) before a
        # checkpoint boundary: never exit without persisting the last state
        path = ckpt_mgr.save(step, trainer.state, export_fn=export,
                             export_args=export_args(trainer.state))
        print(f"saved {path}")
    ckpt_mgr.wait()  # last checkpoint durable before exit
    writer.close()
    if step > start_step:
        print(f"done at step {step}; final loss {float(metrics['loss']):.4f}")
    else:
        print(f"done at step {step}; nothing to train "
              f"(resumed at or beyond max_train_steps)")


if __name__ == "__main__":
    main()
