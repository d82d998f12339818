#!/usr/bin/env python
"""Supervised finetune CLI (parity target: reference train_finetune.py).

Teacher-forced recognition training with periodic benchmark evaluation and
best-checkpoint keeping. TPU-native: one jitted train step over a 1-D data
mesh; batches are host-loaded (decode+resize only) and device-augmented.

Usage:
  python train_finetune.py --config ccd_tpu/configs/ccd_finetune_ard.yaml \
      [--batch_size N] [--checkpoint path] [--run_only_test] [--test_root p] \
      [--epochs N] [--eval_iters N] [--synthetic N]
"""

from __future__ import annotations

import argparse
import logging
import os
import tempfile
import time


def _parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--run_only_test", action="store_true", default=None)
    p.add_argument("--test_root", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model_eval", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--eval_iters", type=int, default=None)
    p.add_argument("--max_iters", type=int, default=None,
                   help="hard cap on iterations (smoke runs)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N freshly generated synthetic samples")
    return p.parse_args()


def _log_attention_maps(writer, viz_attn, params, images_d, iteration):
    """Per-character cross-attention heatmap grid over the input image
    (parity: train_finetune.py:301-326)."""
    try:
        import cv2
        import numpy as np
        from ccd_tpu.data.augment import denormalize

        attn = np.asarray(viz_attn(params, images_d))  # (1, T, 256)
        t = attn.shape[1]
        img = np.asarray(denormalize(images_d[0]))
        img = np.clip(img * 255.0, 0, 255).astype(np.float32)
        writer.add_image("Mask/Input_image", (img / 255.0).transpose(2, 0, 1),
                         iteration)
        overlaps = []
        for step in range(t):
            amap = attn[0, step].reshape(8, 32)
            amap = (amap - amap.min()) / (amap.max() - amap.min() + 1e-12)
            amap = cv2.resize(amap, (img.shape[1], img.shape[0]))
            heat = cv2.applyColorMap((amap * 255).astype(np.uint8),
                                     cv2.COLORMAP_JET).astype(np.float32)
            overlaps.append(cv2.addWeighted(heat, 0.6, img, 0.4, 0))
        grid_rows = []
        for r in range(0, t, 5):
            row = np.concatenate(overlaps[r:r + 5] + [np.zeros_like(overlaps[0])]
                                 * (5 - len(overlaps[r:r + 5])), axis=1)
            grid_rows.append(row)
        grid = np.concatenate(grid_rows, axis=0) / 255.0
        writer.add_image("Mask/vis_Maps", grid.transpose(2, 0, 1), iteration)
    except Exception as e:  # visualization must never kill training
        import logging
        logging.debug(f"attention viz skipped: {e}")


def main():
    args = _parse_arguments()
    from ccd_tpu.config import Config
    from ccd_tpu.utils import Averager, Logger

    config = Config(args.config)
    config.override(dataset_train_batch_size=args.batch_size,
                    model_checkpoint=args.checkpoint,
                    training_epochs=args.epochs,
                    training_eval_iters=args.eval_iters)
    if args.test_root:
        config.dataset_test_roots = [args.test_root]

    Logger.init(config.global_workdir, config.global_name, config.global_phase)
    Logger.enable_file()
    logging.info(config)

    import numpy as np
    import jax
    from ccd_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(__file__)
    import jax.numpy as jnp

    # multi-host initialization when launched under a JAX coordinator
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    from ccd_tpu.builders import (build_recognizer, load_finetune_payload,
                                  load_pretrained_backbone,
                                  load_recognizer_params)
    from ccd_tpu.checkpoints.orbax_io import (CheckpointManager,
                                              restore_pytree, save_pytree)
    from ccd_tpu.data.dataset import SupervisedDataset, build_dataset
    from ccd_tpu.data.pipeline import (DataLoader, device_chunks,
                                       infinite_batches)
    from ccd_tpu.data.augment import (abinet_augment, normalize,
                                      supervised_augment)
    from ccd_tpu.evaluation.runner import evaluate_benchmarks
    from ccd_tpu.parallel import (data_mesh, replicated_sharding,
                                  shard_stacked_batch)
    from ccd_tpu.training import (finetune_state_payload, init_finetune_state,
                                  make_multi_finetune_step)

    # ------------------------------------------------------------ data
    if args.synthetic:
        from ccd_tpu.data.synthetic import write_synthetic_lmdb
        tmp = tempfile.mkdtemp(prefix="ccd_synth_ft_")
        train_root = os.path.join(tmp, "training", "SYNTH")
        test_root = os.path.join(tmp, "evaluation", "SYNTH")
        write_synthetic_lmdb(train_root, args.synthetic, seed=1)
        write_synthetic_lmdb(test_root, max(args.synthetic // 4, 8), seed=2)
        config.dataset_train_roots = [train_root]
        config.dataset_test_roots = [test_root]

    batch_size = int(config.dataset_train_batch_size or 288)
    max_seq_len = int(config.decoder_max_seq_len)
    train_ds = build_dataset(
        SupervisedDataset, config.dataset_train_roots, is_training=True,
        max_seq_len=max_seq_len,
        charset_type=config.dataset_charset_type or "DICT90",
        data_portion=float(config.dataset_portion or 1.0),
        multiscales=bool(config.dataset_multiscales))
    train_loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                              drop_last=True,
                              num_workers=int(config.dataset_num_workers or 4),
                              process_index=jax.process_index(),
                              process_count=jax.process_count())
    config.iter_num = len(train_loader)
    logging.info(f"each epoch iteration: {config.iter_num}")

    # ------------------------------------------------------------ model
    model, convertor = build_recognizer(config)
    rng = jax.random.PRNGKey(int(config.seed or 0))
    from ccd_tpu.training import FinetuneState
    state, tx = init_finetune_state(
        rng, model, image_hw=(config.dataset_image_height,
                              config.dataset_image_width))
    if config.model_pretrain_checkpoint:
        logging.info(f"Read pretrain vision model from "
                     f"{config.model_pretrain_checkpoint}.")
        state = state.replace(params=load_pretrained_backbone(
            config.model_pretrain_checkpoint, state.params))
    if config.model_checkpoint:
        logging.info(f"Read vision model from {config.model_checkpoint}.")
        state = state.replace(params=load_recognizer_params(
            config.model_checkpoint, model, state.params))

    # ------------------------------------------------------------ eval-only
    eval_log_dir = os.path.join(str(config.output_dir or "./saved_models/"),
                                str(config.global_name))

    eval_loader_cache = {}  # benchmark datasets/loaders built once per run

    def run_eval(iteration=None):
        results, weighted = evaluate_benchmarks(
            model, state.params, list(config.dataset_test_roots or []),
            batch_size=int(config.dataset_test_batch_size or batch_size),
            max_seq_len=max_seq_len,
            charset_type=config.dataset_charset_type or "DICT90",
            case_sensitive=bool(config.dataset_eval_case_sensitive),
            loader_cache=eval_loader_cache)
        # per-benchmark eval log file (reference train_finetune.py:352-371)
        evaluation_log = ""
        if iteration is not None:
            evaluation_log += f"iteration: {iteration} \n"
        for res in results:
            line = (f"dataset: {os.path.basename(str(res['name']))} --> "
                    f"word_num: {int(res['words'])} --> "
                    f"accuracy: {res['cwr']:0.3f}")
            logging.info(line)
            evaluation_log += line + "\n"
        logging.info(f"total_accuracy: {weighted:0.3f}")
        evaluation_log += f"total_accuracy: {weighted:0.3f}"
        if jax.process_index() == 0:
            os.makedirs(eval_log_dir, exist_ok=True)
            with open(os.path.join(eval_log_dir,
                                   "log_all_evaluation.txt"), "a") as log:
                log.write("-" * 80 + "\n")
                log.write(evaluation_log + "\n")
        return weighted

    if args.run_only_test:
        run_eval()
        return

    # ------------------------------------------------------------ train
    # fused + multi-step: device augmentation + normalization + K train
    # iterations per dispatch (see make_multi_pretrain_step for rationale)
    total_iters = int(config.training_epochs * config.iter_num)
    data_aug = bool(config.dataset_data_aug)
    aug_fn = (abinet_augment if config.dataset_use_abi else supervised_augment) \
        if data_aug else None
    k_steps = max(int(config.training_steps_per_dispatch or 1), 1)
    step_fn = make_multi_finetune_step(
        model, tx, aug_fn=aug_fn,
        base_lr=float(config.lr), min_lr=float(config.min_lr),
        total_iters=max(total_iters, 1),
        warmup_iters=int((config.warmup_epochs or 0) * config.iter_num),
        weight_decay=float(config.weight_decay), clip_grad=config.clip_grad)

    # ---- full-state resume (params + AdamW moments + iteration + best):
    # the restart_from_checkpoint equivalent (reference
    # train_finetune.py:237-256 restores model + optimizer + iteration; we
    # additionally carry best_accuracy, which the reference resets to 0).
    # Priority: a mid-run checkpoint in this run's own ckpt_dir, else a full
    # payload at --checkpoint (torch .pth was already loaded params-only).
    ckpt_dir = os.path.join(config.output_dir, config.global_name)
    manager = CheckpointManager(ckpt_dir, max_to_keep=3)
    best_ckpt_path = os.path.join(ckpt_dir, "best_accuracy")
    best_accuracy = 0.0
    template = jax.device_get(finetune_state_payload(state))
    payload = None
    latest = manager.latest_step()
    if latest is not None:
        logging.info(f"resuming mid-run from {ckpt_dir} step {latest}")
        try:
            payload = manager.restore(latest, template)
        except Exception as e:
            logging.warning(f"step {latest} is not a full train-state "
                            f"payload ({e}); starting from loaded params")
    elif config.model_checkpoint:
        payload = load_finetune_payload(config.model_checkpoint, template)
    if payload is not None:
        state = state.replace(
            params=payload["params"], opt_state=payload["opt_state"],
            iteration=jnp.asarray(payload["iteration"], jnp.int32))
        best_accuracy = float(payload["best_accuracy"])
        logging.info(f"continue to train:{int(payload['iteration'])} "
                     f"(best_accuracy {best_accuracy:0.3f})")

    mesh = data_mesh(config.mesh_num_devices)
    state = jax.device_put(state, replicated_sharding(mesh))
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    try:
        from torch.utils.tensorboard import SummaryWriter
        os.makedirs("./tensorboard", exist_ok=True)
        writer = SummaryWriter(log_dir=f"./tensorboard/{config.global_name}")
    except Exception:
        writer = None

    # last-layer cross-attention visualization (train_finetune.py:301-326)
    @jax.jit
    def viz_attn(params, images):
        logits, attn = model.apply({"params": params}, images[:1],
                                   viz_targets, train_mode=True,
                                   deterministic=True)
        return attn.mean(1)  # (1, T, 256)

    viz_targets = jnp.full((1, model.max_seq_len), model.padding_idx,
                           jnp.int32).at[:, 0].set(model.start_idx)

    loss_avg = Averager()
    pending = []

    # background staging: uint8 images (normalized on device), targets int32
    def stage(chunk):
        raws = np.stack([c[0] for c in chunk])                  # uint8
        tgts = np.stack([c[1] for c in chunk])
        return shard_stacked_batch((jnp.asarray(raws), jnp.asarray(tgts)),
                                   mesh)

    staged = device_chunks(infinite_batches(train_loader), k_steps, stage)
    start = time.time()
    n_steps = min(total_iters, args.max_iters or total_iters)
    if args.max_iters and args.max_iters > total_iters:
        logging.warning(f"--max_iters {args.max_iters} exceeds the schedule "
                        f"length epochs*iter_num={total_iters}; running "
                        f"{total_iters} iterations")
    show_iters = int(config.training_show_iters or 50)
    eval_iters = int(config.training_eval_iters or 3000)
    save_iters = int(config.training_save_iters or 20000)
    if n_steps % k_steps != 0:
        logging.warning(
            f"n_steps={n_steps} is not a multiple of "
            f"training.steps_per_dispatch={k_steps}; the loop runs "
            f"{(-n_steps) % k_steps} extra iterations (the K-step scan is "
            f"shape-static) and the final checkpoint is labeled with the "
            f"actual iteration count")
    iteration = int(jax.device_get(state.iteration))
    while iteration < n_steps:
        batch = next(staged)
        state, metrics = jstep(state, *batch)
        pending.append(metrics["loss"])  # (K,) device array; fetched at log
        iteration += k_steps

        if iteration % show_iters < k_steps:
            for arr in jax.device_get(pending):
                for v in np.asarray(arr).reshape(-1):
                    loss_avg.add(float(v))
            pending.clear()
            lr = float(np.asarray(jax.device_get(metrics["lr"]))[-1])
            logging.info(f"iteration:{iteration - 1}--> "
                         f"train loss:{loss_avg.val():.4f} "
                         f"lr:{lr:.2e} ({(time.time()-start):.0f}s)")
            if writer:
                writer.add_scalar("metric/train_loss", loss_avg.val(), iteration)
                writer.add_scalar("metric/lr", lr, iteration)
                images_d = normalize(
                    batch[0][-1].astype(jnp.float32) / 255.0)
                _log_attention_maps(writer, viz_attn, state.params, images_d,
                                    iteration)
            loss_avg.reset()

        if iteration >= k_steps and iteration % eval_iters < k_steps:
            logging.info("eval model")
            acc = run_eval(iteration)
            if writer:
                writer.add_scalar("metric/eval_acc", acc, iteration)
            if acc >= best_accuracy:
                # durable best checkpoint: a fixed path the manager's
                # retention policy never evicts (reference best_accuracy.pth,
                # train_finetune.py:373-378), overwritten on improvement
                best_accuracy = acc
                save_pytree(best_ckpt_path, jax.device_get(
                    finetune_state_payload(state, best_accuracy)))

        if iteration >= k_steps and iteration % save_iters < k_steps:
            manager.save(iteration, jax.device_get(
                finetune_state_payload(state, best_accuracy)))

    # final eval + save (labeled with the ACTUAL trained iteration count)
    acc = run_eval(iteration)
    if acc >= best_accuracy:
        best_accuracy = acc
        save_pytree(best_ckpt_path, jax.device_get(
            finetune_state_payload(state, best_accuracy)))
    if manager.latest_step() != iteration:
        manager.save(iteration, jax.device_get(
            finetune_state_payload(state, best_accuracy)))
    manager.wait()
    logging.info(f"done: final accuracy {acc:0.3f}, best {best_accuracy:0.3f}")


if __name__ == "__main__":
    main()
