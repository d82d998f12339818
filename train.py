#!/usr/bin/env python
"""CCD self-supervised pretraining CLI (parity target: reference train.py).

DINO-style student/teacher distillation over per-character features. The
whole iteration — 3-view device augmentation with θ bookkeeping, student
ViT+SegHead, device-side glyph clustering, char pooling + DINO heads, both
losses, AdamW, EMA teacher, center EMA — runs as two jitted functions on a
1-D data mesh (multi-host via jax.distributed + the same collectives).

Usage:
  python train.py --config ccd_tpu/configs/ccd_pretrain_vit_small.yaml \
      [--batch_size_per_gpu N] [--max_iters N] [--synthetic N]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile
import time


def _parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--batch_size_per_gpu", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max_iters", type=int, default=None,
                   help="hard cap on iterations (smoke runs)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="pretrain on N freshly generated synthetic samples")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-15 here")
    return p.parse_args()


def main():
    args = _parse_arguments()
    from ccd_tpu.config import Config
    from ccd_tpu.utils import Logger, MetricLogger

    config = Config(args.config)
    config.override(arch=args.arch, batch_size_per_gpu=args.batch_size_per_gpu,
                    training_epochs=args.epochs, lr=args.lr, seed=args.seed)

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

    from ccd_tpu.builders import build_pretrain_models
    from ccd_tpu.checkpoints.orbax_io import CheckpointManager
    from ccd_tpu.data.dataset import PretrainDataset, build_dataset
    from ccd_tpu.data.pipeline import (DataLoader, device_chunks,
                                       infinite_batches)
    from ccd_tpu.losses import teacher_temp_schedule
    from ccd_tpu.parallel import (pretrain_mesh, pretrain_state_shardings,
                                  shard_stacked_batch)
    from ccd_tpu.training import (init_pretrain_state,
                                  make_multi_pretrain_step,
                                  pretrain_state_payload)

    # ------------------------------------------------------------ data
    if args.synthetic:
        from ccd_tpu.data.dataset import mask_env_path
        from ccd_tpu.data.synthetic import write_synthetic_lmdb
        tmp = tempfile.mkdtemp(prefix="ccd_synth_pre_")
        root = os.path.join(tmp, "training", "SYNTH")
        mask_root = os.path.join(tmp, "Mask")
        write_synthetic_lmdb(root, args.synthetic, seed=3, with_mask_lmdb=True,
                             mask_path=mask_env_path(root, mask_root))
        config.dataset_train_roots = [root]
        config.dataset_mask_path = mask_root
        config.dataset_mask = True

    batch_size = int(config.batch_size_per_gpu or 64)
    h, w = int(config.dataset_image_height), int(config.dataset_image_width)
    train_ds = build_dataset(
        PretrainDataset, config.dataset_train_roots, is_training=True,
        img_h=h, img_w=w, mask=bool(config.dataset_mask),
        mask_path=config.dataset_mask_path or "",
        data_portion=float(config.dataset_portion or 1.0))
    loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True,
                        drop_last=True,
                        num_workers=int(config.dataset_num_workers or 8),
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    config.iter_num = len(loader)
    logging.info(f"each epoch iteration: {config.iter_num}")

    # ------------------------------------------------------------ models
    student, teacher = build_pretrain_models(config)
    rng = jax.random.PRNGKey(int(config.seed or 0))
    state, tx = init_pretrain_state(rng, student, teacher, image_hw=(h, w),
                                    optimizer=str(config.optimizer or "adamw"))

    global_batch = batch_size * jax.process_count()
    total_iters = max(int(config.training_epochs) * config.iter_num, 1)
    # virtual-epoch count (train.py:118-119)
    nepochs = int(config.training_epochs * config.iter_num * global_batch
                  / config.imgnet_based) + 1
    logging.info(f"training epochs is {nepochs}")

    # fused + multi-step: 3-view device augmentation + K train iterations in
    # ONE compiled program (aug keys derive from state.rng on device, so
    # GSPMD randomness stays globally consistent; K steps per dispatch
    # amortize the launch latency, which on the remote-tunnel TPU costs
    # ~2x the device step itself)
    severity = int(config.dataset_augmentation_severity or 5)
    k_steps = max(int(config.training_steps_per_dispatch or 1), 1)
    # mesh.model_parallel > 1 column-shards the 65536-wide DINO head (+ its
    # AdamW moments and the center) over a second 'model' axis — see
    # parallel/mesh.py::pretrain_mesh. Built BEFORE the step so the fused
    # DINO-CE kernel can shard_map over the data axis (losses.py).
    mesh = pretrain_mesh(config.mesh_num_devices,
                         model_parallel=config.mesh_model_parallel or 1)
    step_fn = make_multi_pretrain_step(
        student, teacher, tx, severity=severity, mesh=mesh,
        base_lr=float(config.lr) * global_batch / 256.0,
        min_lr=float(config.min_lr),
        total_iters=total_iters,
        warmup_iters=int(config.warmup_epoch * config.imgnet_based / global_batch),
        weight_decay=float(config.weight_decay),
        weight_decay_end=float(config.weight_decay_end),
        momentum_teacher=float(config.momentum_teacher),
        teacher_temps=teacher_temp_schedule(
            float(config.warmup_teacher_temp), float(config.teacher_temp),
            int(config.warmup_teacher_temp_epochs), nepochs),
        clip_grad=config.clip_grad,
        freeze_last_layer=int(config.freeze_last_layer),
        global_batch=global_batch,
        imgnet_based=int(config.imgnet_based))

    state = jax.device_put(state, pretrain_state_shardings(state, mesh))
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    ckpt_dir = os.path.join(config.output_dir, config.global_name)
    manager = CheckpointManager(ckpt_dir, max_to_keep=3,
                                keep_period=int(config.saveckp_freq or 10))

    state_payload = pretrain_state_payload

    latest = manager.latest_step()
    if latest is not None:
        logging.info(f"resuming from checkpoint step {latest}")
        restored = manager.restore(latest, jax.device_get(state_payload(state)))
        state = state.replace(**restored)
        # restored leaves are host arrays — re-establish the mesh placement
        # (column shards for the TP head) before the donated jit sees them
        state = jax.device_put(state, pretrain_state_shardings(state, mesh))

    try:
        from torch.utils.tensorboard import SummaryWriter
        os.makedirs("./tensorboard", exist_ok=True)
        writer = SummaryWriter(log_dir=f"./tensorboard/{config.global_name}")
    except Exception:
        writer = None

    metric_logger = MetricLogger(delimiter="  ")

    # background staging: uint8 images+masks (4x less tunnel traffic than
    # f32; normalized on device inside the step) device_put ahead of the
    # loop so decode + transfer overlap device compute
    def stage(chunk):
        raws = np.stack([c[0] for c in chunk])                  # uint8
        masks_np = np.stack([c[1] for c in chunk]).astype(np.uint8)
        return shard_stacked_batch(
            (jnp.asarray(raws), jnp.asarray(masks_np)), mesh)

    staged = device_chunks(infinite_batches(loader), k_steps, stage)
    iteration = int(jax.device_get(state.iteration))
    global_epoch = 0
    start = time.time()
    n_steps = min(total_iters, args.max_iters or total_iters)
    if args.max_iters and args.max_iters > total_iters:
        logging.warning(f"--max_iters {args.max_iters} exceeds the schedule "
                        f"length epochs*iter_num={total_iters}; running "
                        f"{total_iters} iterations")
    log_path = os.path.join(config.global_workdir, "log.txt")
    os.makedirs(config.global_workdir, exist_ok=True)

    show_iters = int(config.training_show_iters or 200)
    if (n_steps - iteration) % k_steps != 0:
        logging.warning(
            f"remaining steps {n_steps - iteration} not a multiple of "
            f"training.steps_per_dispatch={k_steps}; the loop runs "
            f"{(iteration - n_steps) % k_steps} extra iterations (the K-step "
            f"scan is shape-static); checkpoints are labeled with the actual "
            f"iteration count")
    while iteration < n_steps:
        if args.profile_dir and 10 <= iteration < 10 + k_steps:
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and 10 + k_steps <= iteration < 10 + 2 * k_steps:
            jax.profiler.stop_trace()
        # K host batches per dispatch, staged ahead by the prefetch thread
        raws, masks_d = next(staged)
        state, metrics = jstep(state, raws, masks_d)
        iteration += k_steps

        # virtual epoch is a pure function of the iteration — computed on the
        # host so the loop never synchronizes with the device except at
        # logging/checkpoint boundaries (keeps dispatch running ahead of the
        # data loader)
        epoch = int(iteration * global_batch // config.imgnet_based)
        if epoch != global_epoch:
            global_epoch = epoch
            metric_logger.synchronize_between_processes()
            logging.info(f"Averaged stats: {metric_logger}")
            manager.save(iteration, jax.device_get(state_payload(state)))
            if jax.process_index() == 0:
                stats = {f"train_{k}": m.global_avg
                         for k, m in metric_logger.meters.items()}
                stats["epoch"] = epoch
                with open(log_path, "a") as f:
                    f.write(json.dumps(stats) + "\n")
            metric_logger = MetricLogger(delimiter="  ")

        if iteration % show_iters < k_steps:  # boundary crossed this chunk
            metrics = jax.device_get(metrics)  # sync point (logging only)
            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
            # NaN-loss abort (reference train.py:239-241). Checked at the
            # existing logging sync point rather than every step so the abort
            # costs no extra host<->device round-trips.
            if not np.isfinite(np.asarray(metrics["loss"])).all():
                logging.error(f"Loss is {last['loss']}, stopping training")
                sys.exit(1)
            metric_logger.update(loss=last["loss"], lr=last["lr"],
                                 wd=last["wd"])
            ips = batch_size * iteration / (time.time() - start)
            logging.info(f"it {iteration - 1} epoch {epoch} "
                         f"loss {last['loss']:.4f} "
                         f"(mask {last['mask_loss']:.4f} "
                         f"dino {last['dino_loss']:.4f}) "
                         f"lr {last['lr']:.2e} {ips:.1f} img/s")
            if writer:
                for k in ("loss", "mask_loss", "dino_loss", "lr", "wd"):
                    writer.add_scalar(f"metric/{k}", last[k], iteration)

    manager.save(iteration, jax.device_get(state_payload(state)))
    manager.wait()
    total = time.time() - start
    logging.info(f"Training time {total:.0f}s "
                 f"({batch_size * n_steps / total:.1f} img/s/proc)")


if __name__ == "__main__":
    main()
