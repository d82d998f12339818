"""Debug: restore the micro finetune checkpoint, compare teacher-forced
predictions vs greedy decode on TRAIN images (diagnosing the 0% eval acc)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from ccd_tpu.config import Config
from ccd_tpu.builders import build_recognizer
from ccd_tpu.checkpoints.orbax_io import restore_pytree
from ccd_tpu.data.dataset import SupervisedDataset, build_dataset
from ccd_tpu.data.augment import normalize
cfg = Config("workdir/conv_micro/configs/conv_ft_scratch.yaml")
model, conv = build_recognizer(cfg)

ckpt = os.path.abspath("workdir/conv_micro/saved_models/conv_ft_scratch/best_accuracy")
payload = restore_pytree(ckpt)
print("payload keys:", list(payload.keys()))
params = payload["params"]
print("iteration:", payload.get("iteration"))

import sys as _sys
_roots = cfg.dataset_test_roots if "--eval" in _sys.argv else cfg.dataset_train_roots
ds = build_dataset(SupervisedDataset, _roots,
                   is_training=False, convertor=conv)
print("train ds:", len(ds))
imgs, tgts, texts = [], [], []
for i in range(8):
    img, tgt, text = ds[i]
    imgs.append(img); tgts.append(tgt); texts.append(text)
imgs = np.stack(imgs); tgts = np.stack(tgts)
print("img range:", imgs.min(), imgs.max(), imgs.dtype)
x = jnp.asarray(imgs, jnp.float32)
if x.max() > 2.0:
    x = x / 255.0
x = normalize(x)

# teacher-forced forward
logits, _ = model.apply({"params": params}, x, jnp.asarray(tgts),
                        train_mode=True, deterministic=True)
pred_tf = np.asarray(jnp.argmax(logits, -1))
print("C (logit classes):", logits.shape[-1])

# greedy decode
scores = model.apply({"params": params}, x, train_mode=False,
                     deterministic=True)
pred_free = np.asarray(jnp.argmax(scores, -1))

idx2char = conv.idx2char
def render(ids):
    s = []
    for i in ids:
        i = int(i)
        if i == conv.end_idx: s.append("<E>"); break
        if i == conv.padding_idx: s.append("<P>"); continue
        if i == conv.start_idx: s.append("<B>"); continue
        s.append(idx2char[i] if i < len(idx2char) else f"?{i}")
    return "".join(s)

for n in range(8):
    print(f"gt={texts[n]!r:>14} tgt={render(tgts[n])!r:>16}"
          f" tf={render(pred_tf[n])!r:>16} free={render(pred_free[n])!r:>16}")
print("tgt[0]:", tgts[0][:10])
print("tf [0]:", pred_tf[0][:10])
print("fr [0]:", pred_free[0][:10])
