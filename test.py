#!/usr/bin/env python
"""Benchmark evaluation CLI (parity target: reference test.py:43-218).

Usage:
  python test.py --config ccd_tpu/configs/ccd_finetune_ard.yaml \
      --checkpoint saved_models/best_accuracy.pth [--test_root <lmdb dir>] \
      [--batch_size 288]

Accepts reference torch ``.pth`` checkpoints (converted on the fly) or Orbax
directories. ``--synthetic N`` evaluates on freshly generated synthetic data
for smoke runs without external datasets.
"""

from __future__ import annotations

import argparse
import logging
import os
import tempfile


def _parse_arguments():
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--test_root", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--model_eval", type=str, default="vision",
                   choices=["vision", "language", "alignment"],
                   help="evaluated output head (reference eval_acc.py:16; "
                        "this model family only produces 'vision')")
    p.add_argument("--test_speed", action="store_true",
                   help="use the early-exit greedy decode "
                        "(forward_test_speed, nrtr_decoder.py:177-203)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="evaluate on N freshly generated synthetic samples")
    return p.parse_args()


def main():
    args = _parse_arguments()
    from ccd_tpu.config import Config
    from ccd_tpu.utils import Logger

    config = Config(args.config)
    config.override(dataset_test_batch_size=args.batch_size,
                    model_checkpoint=args.checkpoint)
    if args.test_root:
        config.dataset_test_roots = [args.test_root]

    Logger.init(config.global_workdir, config.global_name, "test")
    Logger.enable_file()
    logging.info(config)

    import jax
    from ccd_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(__file__)
    from ccd_tpu.builders import build_recognizer, load_recognizer_params
    from ccd_tpu.evaluation.runner import evaluate_benchmarks

    model, convertor = build_recognizer(config)

    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, config.dataset_image_height, config.dataset_image_width, 3))
    tgt = jnp.full((1, model.max_seq_len), model.padding_idx, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, img, tgt, train_mode=True)
    params = variables["params"]
    if config.model_checkpoint:
        logging.info(f"Read model from {config.model_checkpoint}.")
        params = load_recognizer_params(config.model_checkpoint, model, params)

    test_roots = list(config.dataset_test_roots or [])
    if args.synthetic:
        from ccd_tpu.data.synthetic import write_synthetic_lmdb
        tmp = tempfile.mkdtemp(prefix="ccd_synth_eval_")
        root = os.path.join(tmp, "evaluation", "SYNTH")
        write_synthetic_lmdb(root, args.synthetic, seed=123)
        test_roots = [root]

    batch = config.dataset_test_batch_size or 288
    results, weighted = evaluate_benchmarks(
        model, params, test_roots, batch_size=batch,
        max_seq_len=config.decoder_max_seq_len,
        charset_type=config.dataset_charset_type or "DICT90",
        case_sensitive=bool(config.dataset_eval_case_sensitive),
        test_speed=args.test_speed)

    dashed = "-" * 80
    print(dashed)
    for res in results:
        print(f"dataset: {os.path.basename(str(res['name']))} --> "
              f"word_num: {int(res['words'])} --> accuracy: {res['cwr']:0.3f} "
              f"(ccr {res['ccr']:0.3f}, ned {res['ned']:0.2f}, "
              f"time {res['time']:.1f}s)")
    print(f"total_accuracy: {weighted:0.3f}")
    print(dashed)
    return weighted


if __name__ == "__main__":
    main()
