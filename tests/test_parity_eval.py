"""End-to-end test of the released-weight parity harness (VERDICT r4 #3).

The real released ``.pth`` weights are a Google-Drive download absent in this
environment, so the harness is anchored the only honest way available: a
``torch_export``-produced pickle of a randomly initialized recognizer must
roundtrip through ``tools/parity_eval.py``'s convert+evaluate path and yield
BIT-IDENTICAL word accuracy to evaluating the original flax params directly —
proving the .pth ingestion is lossless — and the baseline diff must gate the
exit status at the 0.2-pct tolerance.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ccd_tpu.checkpoints.torch_export import save_recognizer_torch
from ccd_tpu.data.synthetic import write_synthetic_lmdb
from tools.parity_eval import canonical_name, discover_roots, run_parity_eval

CFG = """
global: {name: parity_test, phase: test, stage: train-supervised, workdir: %s, seed: 0}
dataset:
  scheme: supervised
  train: {roots: [], batch_size: 8}
  test: {roots: [], batch_size: 8}
  num_workers: 2
  charset_type: 'DICT90'
decoder:
  n_layers: 2
  d_embedding: 512
  n_head: 8
  d_model: 512
  d_inner: 256
  d_k: 64
  d_v: 64
  max_seq_len: 8
  start_idx: 91
  padding_idx: 92
arch: 'vit_micro'
patch_size: 4
drop_path_rate: 0.0
compute_dtype: float32
"""


def test_canonical_names():
    assert canonical_name("/data/evaluation/IIIT5k_3000") == "IIIT5k"
    assert canonical_name("/data/evaluation/SVTP") == "SVTP"
    assert canonical_name("/data/evaluation/SVT") == "SVT"
    assert canonical_name("/data/evaluation/IC15_1811") == "IC15"
    assert canonical_name("cute80") == "CUTE80"
    assert canonical_name("/x/COCOText") == "COCOText"
    assert canonical_name("/x/unknown_set") == "unknown_set"


def test_parity_eval_roundtrip_and_gate(tmp_path):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG % str(tmp_path / "workdir"))

    root = tmp_path / "evaluation" / "IIIT5k_3000"
    write_synthetic_lmdb(str(root), 24, seed=7)
    assert discover_roots([str(tmp_path / "evaluation")]) == [str(root)]

    # a randomly initialized recognizer, exported the reference's way
    from ccd_tpu.config import Config
    from ccd_tpu.builders import build_recognizer
    config = Config(str(cfg))
    model, _ = build_recognizer(config)
    rng = jax.random.PRNGKey(3)
    img = jnp.zeros((1, config.dataset_image_height,
                     config.dataset_image_width, 3))
    tgt = jnp.full((1, model.max_seq_len), model.padding_idx, jnp.int32)
    params = model.init({"params": rng, "dropout": rng}, img, tgt,
                        train_mode=True)["params"]
    pth = str(tmp_path / "ckpt.pth")
    save_recognizer_torch(params, pth, iteration=5)

    # direct eval with the ORIGINAL params — the ground truth the .pth
    # ingestion must reproduce exactly
    from ccd_tpu.evaluation.runner import evaluate_benchmarks
    _res, direct_weighted = evaluate_benchmarks(
        model, params, [str(root)], batch_size=8,
        max_seq_len=config.decoder_max_seq_len, charset_type="DICT90")

    out = str(tmp_path / "parity.json")
    rows, weighted, ok = run_parity_eval(
        pth, [str(tmp_path / "evaluation")], str(cfg),
        baseline={"IIIT5k": round(100.0 * direct_weighted, 3)},
        tol=0.2, out_path=out)
    assert ok, rows
    assert rows[0]["benchmark"] == "IIIT5k"
    np.testing.assert_allclose(weighted, direct_weighted, atol=1e-9)

    artifact = json.load(open(out))
    assert artifact["ok"] and artifact["benchmarks"][0]["within_tol"]

    # the gate: a baseline 5 points away must fail
    _rows2, _w2, ok2 = run_parity_eval(
        pth, [str(root)], str(cfg),
        baseline={"IIIT5k": 100.0 * direct_weighted + 5.0}, tol=0.2)
    assert not ok2
