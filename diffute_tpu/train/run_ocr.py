"""OCR-verifier training entry point (char-level TrOCR on glyph renders).

Produces the pretrained-TrOCR analogue the reference downloads from the hub
(train_diffute_v1.py:630-631): a frozen conditioning encoder for stage-2 UNet
training plus an encoder+decoder verifier for the eval CLI's string-level OCR
round-trip (app.ipynb:843-847, commented out there; working here).

Usage:
  python -m diffute_tpu.train.run_ocr --model_scale small \\
      --max_train_steps 3000 --output_dir diffute-ocr
  python -m diffute_tpu.train.run_ocr --smoke

Checkpoints export ``trocr/`` (ViT layout) + ``trocr_decoder/`` (HF
TrOCRForCausalLM layout); point stage-2 training and eval at the checkpoint
dir and use ``--tokenizer char`` in eval.
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", "--output-dir", default="diffute-ocr")
    p.add_argument("--train_batch_size", type=int, default=64)
    p.add_argument("--max_train_steps", "--max-train-steps", type=int,
                   default=3000)
    p.add_argument("--learning_rate", type=float, default=3e-4)
    p.add_argument("--lr_scheduler", default="constant_with_warmup")
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--max_len", type=int, default=16,
                   help="target sequence length (chars + EOS)")
    p.add_argument("--checkpointing_steps", type=int, default=1000)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report_to", default="tensorboard")
    p.add_argument("--logging_dir", default="logs")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--steps_per_call", type=int, default=1)
    p.add_argument("--model_scale", default="small",
                   choices=["small"],
                   help="only the small (char-level) scale is trainable "
                        "from scratch; the full scale is the pretrained "
                        "TrOCR the reference downloads")
    p.add_argument("--smoke", action="store_true",
                   help="tiny config, 2 steps")
    return p.parse_args()


def main():
    args = parse_args()

    import jax

    from diffute_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    jax.config.update("jax_default_prng_impl", "rbg")
    import numpy as np

    from diffute_tpu.config import (OptimizerConfig, TrainConfig,
                                    small_config, tiny_test_config)
    from diffute_tpu.io.dataset import (PrefetchLoader,
                                        SyntheticGlyphOCRDataset,
                                        make_ocr_batch)
    from diffute_tpu.models.trocr_decoder import (
        TrOCRDecoder, TrOCRDecoderConfig, export_trocr_decoder_state_dict,
        small_decoder_config)
    from diffute_tpu.parallel import DevicePrefetcher, maybe_init_distributed
    from diffute_tpu.train.checkpoint import (
        AsyncCheckpointManager, checkpoint_step, resolve_resume,
        restore_checkpoint, vit_config_json)
    from diffute_tpu.train.ocr_train import OCRTrainer
    from diffute_tpu.utils.metrics import MetricWriter
    from diffute_tpu.utils.params import init_trocr_params
    from diffute_tpu.utils.profiling import StepTimer
    from diffute_tpu.compat import save_safetensors

    maybe_init_distributed()

    train_cfg = TrainConfig(
        train_batch_size=args.train_batch_size,
        max_train_steps=args.max_train_steps,
        checkpointing_steps=args.checkpointing_steps,
        checkpoints_total_limit=args.checkpoints_total_limit,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed,
        output_dir=args.output_dir,
        steps_per_call=args.steps_per_call,
        optimizer=OptimizerConfig(
            name="adamw",
            learning_rate=args.learning_rate,
            lr_scheduler=args.lr_scheduler,
            lr_warmup_steps=args.lr_warmup_steps,
            max_grad_norm=args.max_grad_norm,
        ),
    )

    if args.smoke:
        config = dataclasses.replace(tiny_test_config(), train=train_cfg)
        dcfg = TrOCRDecoderConfig(
            vocab_size=128, hidden_size=config.trocr.hidden_size,
            decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=32,
            max_position_embeddings=64)
        batch_size = max(2, jax.local_device_count())
        max_steps = 2
    else:
        config = dataclasses.replace(small_config(), train=train_cfg)
        dcfg = small_decoder_config()
        batch_size = args.train_batch_size * jax.local_device_count()
        max_steps = args.max_train_steps

    # Early exit for already-satisfied segment targets (see run_unet.py):
    # the checkpoint dir name encodes the step — decide before any heavy init.
    resume = resolve_resume(args.output_dir, args.resume_from_checkpoint)
    if resume and checkpoint_step(resume) >= max_steps:
        print(f"done at step {checkpoint_step(resume)}; nothing to train "
              f"(checkpoint {resume} not validated)")
        return

    dataset = SyntheticGlyphOCRDataset(config, seed=args.seed,
                                       max_len=args.max_len)

    import jax.numpy as jnp

    enc_params = init_trocr_params(config, jax.random.PRNGKey(args.seed))
    decoder = TrOCRDecoder(dcfg)
    dec_params = jax.jit(decoder.init)(
        jax.random.PRNGKey(args.seed + 1), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, config.trocr.seq_len, dcfg.hidden_size)))["params"]

    trainer = OCRTrainer(config, dcfg,
                         {"encoder": enc_params, "decoder": dec_params},
                         total_steps=max_steps)
    del enc_params, dec_params

    start_step = 0
    resume = resolve_resume(args.output_dir, args.resume_from_checkpoint)
    if resume:
        trainer.state = restore_checkpoint(resume, trainer.state)
        start_step = int(trainer.state.step)
        print(f"resumed from {resume} at step {start_step}")

    loader = PrefetchLoader(
        dataset, batch_size, lambda ex: make_ocr_batch(ex, config),
        num_threads=max(1, args.dataloader_num_workers),
        seed=args.seed + start_step,
        process_index=jax.process_index(), process_count=jax.process_count())

    writer = MetricWriter(os.path.join(args.output_dir, args.logging_dir),
                          report_to=args.report_to, config=vars(args))
    ckpt_mgr = AsyncCheckpointManager(args.output_dir,
                                      args.checkpoints_total_limit)
    timer = StepTimer()

    from diffute_tpu.compat import export_trocr_params

    def export(p, host):
        """trocr/ (ViT layout) + trocr_decoder/ (TrOCRForCausalLM layout)."""
        import json

        d = os.path.join(p, "trocr")
        os.makedirs(d, exist_ok=True)
        save_safetensors(export_trocr_params(host["encoder"]),
                         os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(vit_config_json(config.trocr), f, indent=2)
        d = os.path.join(p, "trocr_decoder")
        os.makedirs(d, exist_ok=True)
        save_safetensors(export_trocr_decoder_state_dict(host["decoder"]),
                         os.path.join(d, "model.safetensors"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({"model_type": "trocr", "tokenizer": "char",
                       "vocab_size": dcfg.vocab_size,
                       "hidden_size": dcfg.hidden_size,
                       "decoder_layers": dcfg.decoder_layers,
                       "decoder_attention_heads": dcfg.decoder_attention_heads,
                       "decoder_ffn_dim": dcfg.decoder_ffn_dim,
                       "max_position_embeddings":
                           dcfg.max_position_embeddings}, f, indent=2)

    def export_args(state):
        return {"encoder": jax.tree_util.tree_map(np.asarray, state.params["encoder"]),
                "decoder": jax.tree_util.tree_map(np.asarray, state.params["decoder"])}

    key = jax.random.fold_in(jax.random.PRNGKey(args.seed), start_step)
    step = start_step
    last_saved = start_step
    spc = args.steps_per_call
    if spc > 1:
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
        device_loader = DevicePrefetcher(loader, trainer.mesh)
    for batch in device_loader:
        if step >= max_steps:
            break
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
                          "token_accuracy": metrics["token_accuracy"],
                          "grad_norm": metrics["grad_norm"],
                          "steps_per_sec": rate})
        if step % args.checkpointing_steps < spc or step >= max_steps:
            last_saved = step
            path = ckpt_mgr.save(step, trainer.state, export_fn=export,
                                 export_args=export_args(trainer.state))
            print(f"saved {path}")
    if step > last_saved:
        path = ckpt_mgr.save(step, trainer.state, export_fn=export,
                             export_args=export_args(trainer.state))
        print(f"saved {path}")
    ckpt_mgr.wait()
    writer.close()
    if step > start_step:
        print(f"done at step {step}; final loss {float(metrics['loss']):.4f} "
              f"token_accuracy {float(metrics['token_accuracy']):.4f}")
    else:
        print(f"done at step {step}; nothing to train")


if __name__ == "__main__":
    main()
