"""Evaluation driver: jitted greedy-decode predict fn + benchmark-suite runner.

Parity target: ``test.py:150-218`` + ``TextAccuracy.compute`` — per-benchmark
word accuracy over LMDB evaluation sets with a weighted total. The decode is
the KV-cached scan (vs the reference's 25x full-decoder re-run) jitted once at
a fixed batch size; ragged final batches are padded and sliced.

TPU-native improvements over the reference runner:

* the jitted decode is a module-level function taking ``params`` as an
  argument (not a per-call closure), so periodic eval cycles inside the
  finetune loop reuse one compiled executable instead of retracing — through
  this TPU's remote-compile tunnel a retrace costs minutes;
* under ``jax.process_count() > 1`` each process evaluates a disjoint shard
  of every benchmark and the ``TextAccuracy`` counters are summed across
  processes (parity: the reference's meter ``all_reduce``,
  ``Dino/modules/utils.py:253-264``) — the reference instead replicates the
  full eval on every rank.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ccd_tpu.convertor import AttnConvertor
from ccd_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from ccd_tpu.data.dataset import SupervisedDataset, build_dataset
from ccd_tpu.data.pipeline import DataLoader
from ccd_tpu.evaluation.accuracy import TextAccuracy


@partial(jax.jit, static_argnums=(0, 3))
def _decode(model, params, images: jnp.ndarray, test_speed: bool) -> jnp.ndarray:
    """uint8 (N, H, W, 3) -> per-step softmax (N, T, C-1).

    ``model`` is an unbound flax module (hashable dataclass), so repeated
    calls with the same model/batch shape hit jax.jit's cache.
    """
    x = images.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return model.apply({"params": params}, x, train_mode=False,
                       test_speed=test_speed)


def make_predict_fn(model, params, convertor: AttnConvertor,
                    batch_size: int = 288, test_speed: bool = False,
                    small_bucket: Optional[int] = 32
                    ) -> Callable[[np.ndarray], List[str]]:
    """Build ``fn(uint8 images (N, H, W, 3)) -> list[str]`` (greedy decode).

    ``test_speed=True`` routes through the early-exit decode
    (``forward_test_speed``, ``Dino/decoder/nrtr_decoder.py:177-203``).

    ``small_bucket``: second compiled decode size for ragged FINAL batches —
    a 289-image benchmark at batch 288 decodes 288 + 32 rows instead of
    288 + 288 (the 1-row remainder pads to 32, not to the full batch). The
    small executable compiles lazily on the first ragged batch <= its size
    and is cached by jax.jit like the main one. ``None`` disables (always
    pad to ``batch_size``, the round-3 behavior).
    """
    buckets = sorted({b for b in (small_bucket, batch_size)
                      if b and b <= batch_size})

    def predict(images: np.ndarray) -> List[str]:
        n = images.shape[0]
        size = next((b for b in buckets if n <= b), batch_size)
        if n < size:
            pad = np.repeat(images[-1:], size - n, axis=0)
            images = np.concatenate([images, pad], axis=0)
        probs = np.asarray(_decode(model, params, jnp.asarray(images),
                                   test_speed))[:n]
        indexes, _scores = convertor.tensor2idx(probs)
        return convertor.idx2str(indexes)

    return predict


def evaluate_benchmarks(model, params, test_roots: Sequence[str],
                        batch_size: int = 288, max_seq_len: int = 25,
                        charset_type: str = "DICT90",
                        case_sensitive: bool = False,
                        num_workers: int = 4,
                        names: Optional[Sequence[str]] = None,
                        test_speed: bool = False,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None,
                        loader_cache: Optional[dict] = None,
                        ) -> Tuple[List[Dict[str, float]], float]:
    """Run the 11-benchmark-style eval; returns (per-set metrics, weighted acc).

    With multiple JAX processes each evaluates its shard and counters are
    summed (``TextAccuracy.synchronize_between_processes``), so the returned
    metrics cover the full benchmark on every process.

    ``loader_cache``: pass the same dict across periodic eval cycles (the
    finetune loop does) to reuse each benchmark's dataset + loader — the
    LMDB open and index scan happen once per run instead of once per cycle.
    """
    pidx = jax.process_index() if process_index is None else process_index
    pcnt = jax.process_count() if process_count is None else process_count
    convertor = AttnConvertor(dict_type=charset_type, max_seq_len=max_seq_len,
                              with_unknown=True)
    predict = make_predict_fn(model, params, convertor, batch_size, test_speed)
    results = []
    total_acc = 0.0
    total_words = 0.0
    for i, root in enumerate(test_roots):
        key = (str(root), batch_size, max_seq_len, charset_type, num_workers,
               pidx, pcnt)
        if loader_cache is not None and key in loader_cache:
            loader = loader_cache[key]
        else:
            ds = build_dataset(SupervisedDataset, [root], is_training=False,
                               convertor=convertor, max_seq_len=max_seq_len)
            loader = DataLoader(ds, batch_size=batch_size, shuffle=False,
                                drop_last=False, num_workers=num_workers,
                                process_index=pidx, process_count=pcnt)
            if loader_cache is not None:
                loader_cache[key] = loader
        acc = TextAccuracy(case_sensitive=case_sensitive)
        acc.compute(lambda imgs: predict(imgs),
                    ((images, texts) for images, _targets, texts in loader))
        if pcnt > 1:  # only sum counters when the eval was actually sharded
            acc.synchronize_between_processes()
        res = acc.result()
        res["name"] = names[i] if names else str(root)
        results.append(res)
        total_acc += res["cwr"] * res["words"]
        total_words += res["words"]
    weighted = total_acc / max(total_words, 1.0)
    return results, weighted
