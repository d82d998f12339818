"""Quick learnability probe: overfit the micro recognizer on a handful of
synthetic words and report greedy-decode word accuracy on the SAME images.
Isolates model/step/decode from the CLI + data pipeline while diagnosing the
convergence demo. CPU, runs in a couple of minutes (with a warm .jax_cache_cpu).

``--hard`` renders through the convergence demo's hard path (48x160 render,
6 fonts, rotation, low contrast -> cv2.resize to 32x128), reproducing the
exact pixels the production convergence run trains on.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from ccd_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "x"))
import jax.numpy as jnp

from ccd_tpu.convertor import AttnConvertor
from ccd_tpu.data.synthetic import render_word, random_words
from ccd_tpu.models.recognizer import CCDRecognizer
from ccd_tpu.training.finetune_step import (init_finetune_state,
                                            make_fused_finetune_step)

ap = argparse.ArgumentParser()
ap.add_argument("--hard", action="store_true")
ap.add_argument("--n", type=int, default=32)
ap.add_argument("--steps", type=int, default=160)
ap.add_argument("--lr", type=float, default=1e-3)
args = ap.parse_args()

N, STEPS, LR = args.n, args.steps, args.lr
rng = np.random.default_rng(0)
words = random_words(N, rng, min_len=2, max_len=6)
images = np.zeros((N, 32, 128, 3), np.uint8)
if args.hard:
    import cv2
    for i, wd in enumerate(words):
        big, _ = render_word(wd, 48, 160, rng, hard=True)
        images[i] = cv2.resize(big, (128, 32))
else:
    for i, wd in enumerate(words):
        images[i], _ = render_word(wd, 32, 128, rng)

conv = AttnConvertor("DICT90", max_seq_len=25, with_unknown=True)
targets = conv.str2tensor(words)
print("targets[0]:", targets[0][:12], "word:", words[0])

model = CCDRecognizer(arch="vit_micro", max_seq_len=25, drop_path_rate=0.0)
state, tx = init_finetune_state(jax.random.PRNGKey(0), model)
step = jax.jit(make_fused_finetune_step(
    model, tx, base_lr=LR, min_lr=1e-6, total_iters=STEPS, warmup_iters=20,
    weight_decay=0.05, clip_grad=5.0))

imgs_d = jnp.asarray(images)
tgts_d = jnp.asarray(targets)
t0 = time.time()
for it in range(STEPS):
    state, metrics = step(state, imgs_d, tgts_d)
    if it % 50 == 0 or it == STEPS - 1:
        print(f"it {it:4d} loss {float(metrics['loss']):.4f} "
              f"lr {float(metrics['lr']):.2e} ({time.time()-t0:.0f}s)",
              flush=True)

# greedy decode on the training images (normalized the same way)
from ccd_tpu.data.augment import normalize
x = normalize(imgs_d.astype(jnp.float32) / 255.0)
scores = jax.jit(lambda p, x: model.apply({"params": p}, x, train_mode=False,
                                          deterministic=True))(state.params, x)
idxs, _ = conv.tensor2idx(np.asarray(scores))
preds = conv.idx2str(idxs)
ok = sum(p.lower() == w.lower() for p, w in zip(preds, words))
for p, w in list(zip(preds, words))[:10]:
    print(f"  gt={w!r:>10} pred={p!r}")
print(f"train word acc: {ok}/{N} = {ok/N:.2%}")
