"""Evaluation driver: jitted greedy-decode predict fn + benchmark-suite runner.

Parity target: ``test.py:150-218`` + ``TextAccuracy.compute`` — per-benchmark
word accuracy over LMDB evaluation sets with a weighted total. The decode is
the KV-cached scan (vs the reference's 25x full-decoder re-run) jitted once at
a fixed batch size; ragged final batches are padded and sliced.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ccd_tpu.convertor import AttnConvertor
from ccd_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from ccd_tpu.data.dataset import SupervisedDataset, build_dataset
from ccd_tpu.data.pipeline import DataLoader
from ccd_tpu.evaluation.accuracy import TextAccuracy


def make_predict_fn(model, params, convertor: AttnConvertor,
                    batch_size: int = 288) -> Callable[[np.ndarray], List[str]]:
    """Build ``fn(uint8 images (N, H, W, 3)) -> list[str]`` (greedy decode)."""

    @jax.jit
    def _decode(images: jnp.ndarray) -> jnp.ndarray:
        x = images.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return model.apply({"params": params}, x, train_mode=False)

    def predict(images: np.ndarray) -> List[str]:
        n = images.shape[0]
        if n < batch_size:
            pad = np.repeat(images[-1:], batch_size - n, axis=0)
            images = np.concatenate([images, pad], axis=0)
        probs = np.asarray(_decode(jnp.asarray(images)))[:n]
        indexes, _scores = convertor.tensor2idx(probs)
        return convertor.idx2str(indexes)

    return predict


def evaluate_benchmarks(model, params, test_roots: Sequence[str],
                        batch_size: int = 288, max_seq_len: int = 25,
                        charset_type: str = "DICT90",
                        case_sensitive: bool = False,
                        num_workers: int = 4,
                        names: Optional[Sequence[str]] = None
                        ) -> Tuple[List[Dict[str, float]], float]:
    """Run the 11-benchmark-style eval; returns (per-set metrics, weighted acc)."""
    convertor = AttnConvertor(dict_type=charset_type, max_seq_len=max_seq_len,
                              with_unknown=True)
    predict = make_predict_fn(model, params, convertor, batch_size)
    results = []
    total_acc = 0.0
    total_words = 0.0
    for i, root in enumerate(test_roots):
        ds = build_dataset(SupervisedDataset, [root], is_training=False,
                           convertor=convertor, max_seq_len=max_seq_len)
        loader = DataLoader(ds, batch_size=batch_size, shuffle=False,
                            drop_last=False, num_workers=num_workers)
        acc = TextAccuracy(case_sensitive=case_sensitive)
        res = acc.compute(lambda imgs: predict(imgs),
                          ((images, texts) for images, _targets, texts in loader))
        res["name"] = names[i] if names else str(root)
        results.append(res)
        total_acc += res["cwr"] * res["words"]
        total_words += res["words"]
    weighted = total_acc / max(total_words, 1.0)
    return results, weighted
