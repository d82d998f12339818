"""Finetune resume correctness (round-2 VERDICT #1): kill/restart mid-run.

The finetune twin of ``tests/test_resume.py``: runs the jitted finetune step
on the 8-device mesh, checkpoints mid-run with the SAME payload glue the
train_finetune CLI uses (``finetune_state_payload`` + ``CheckpointManager``),
restores into a freshly-initialized state (simulating a new process),
continues, and asserts the resumed trajectory is identical to an
uninterrupted one — iteration counter, student params, AdamW first/second
moments and best_accuracy all continue exactly. Also covers the durable
best-accuracy checkpoint path (``save_pytree`` to a fixed location the
manager's retention policy never evicts — reference best_accuracy.pth,
train_finetune.py:373-378).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ccd_tpu.builders import load_finetune_payload
from ccd_tpu.checkpoints.orbax_io import (CheckpointManager, restore_pytree,
                                          save_pytree)
from ccd_tpu.models import CCDRecognizer
from ccd_tpu.parallel import data_mesh, replicated_sharding, shard_batch
from ccd_tpu.training import (finetune_state_payload, init_finetune_state,
                              make_finetune_step)


def _build(seed=0):
    # deterministic config: zero dropout so the (unsaved) rng key cannot
    # influence the trajectory
    model = CCDRecognizer(arch="vit_micro", max_seq_len=8, decoder_n_layers=2,
                          decoder_d_inner=64, decoder_dropout=0.0,
                          drop_path_rate=0.0, encoder_drop=0.0)
    state, tx = init_finetune_state(jax.random.PRNGKey(seed), model)
    step = make_finetune_step(model, tx, base_lr=1e-3, min_lr=1e-5,
                              total_iters=20, warmup_iters=2,
                              weight_decay=0.05, clip_grad=5.0)
    return model, state, step


def _batches(model, n, b=8):
    rng = np.random.default_rng(5)
    out = []
    for _ in range(n):
        images = rng.normal(scale=0.5, size=(b, 32, 128, 3)).astype(np.float32)
        targets = rng.integers(0, 90, size=(b, model.max_seq_len)).astype(np.int32)
        targets[:, 0] = model.start_idx
        targets[:, -2:] = model.padding_idx
        out.append((jnp.asarray(images), jnp.asarray(targets)))
    return out


def test_finetune_resume_continuity(tmp_path):
    mesh = data_mesh(8)
    rep = replicated_sharding(mesh)
    model, state, step = _build()
    state = jax.device_put(state, rep)
    jstep = jax.jit(step)
    batches = [shard_batch(b, mesh) for b in _batches(model, 6)]

    # ---- uninterrupted run; full-payload checkpoint at iteration 3 and a
    # durable best checkpoint (best_accuracy=0.5) exactly like the CLI
    manager = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    best_path = str(tmp_path / "ckpt" / "best_accuracy")
    for it, batch in enumerate(batches):
        if it == 3:
            manager.save(it, jax.device_get(finetune_state_payload(state, 0.5)))
            manager.wait()
            save_pytree(best_path,
                        jax.device_get(finetune_state_payload(state, 0.5)))
        state, _ = jstep(state, *batch)
    final_direct = jax.device_get(state)

    # ---- "new process": fresh init (different seed -> different params),
    # restore the payload the way train_finetune.py does, continue from it 3
    _, state2, _ = _build(seed=321)
    template = jax.device_get(finetune_state_payload(state2))
    latest = manager.latest_step()
    assert latest == 3
    payload = manager.restore(latest, template)
    assert float(payload["best_accuracy"]) == 0.5
    state2 = state2.replace(
        params=payload["params"], opt_state=payload["opt_state"],
        iteration=jnp.asarray(payload["iteration"], jnp.int32))
    state2 = jax.device_put(state2, rep)
    assert int(jax.device_get(state2.iteration)) == 3
    for batch in batches[3:]:
        state2, _ = jstep(state2, *batch)
    final_resumed = jax.device_get(state2)

    # ---- continuity: everything in the payload tracks exactly (the AdamW
    # first/second moments live inside opt_state)
    assert int(final_resumed.iteration) == int(final_direct.iteration) == 6
    for name in ("params", "opt_state"):
        a = jax.tree_util.tree_leaves_with_path(getattr(final_direct, name))
        b = jax.tree_util.tree_leaves_with_path(getattr(final_resumed, name))
        assert len(a) == len(b)
        for (pa, va), (pb, vb) in zip(a, b):
            assert pa == pb
            np.testing.assert_allclose(
                np.asarray(va), np.asarray(vb), atol=1e-6,
                err_msg=f"{name}:{jax.tree_util.keystr(pa)}")

    # ---- the durable best checkpoint restores through the same helper the
    # CLI uses for --checkpoint full-state loads
    best = load_finetune_payload(best_path, template)
    assert best is not None and int(best["iteration"]) == 3
    # and via the manager-root path resolution too
    from_root = load_finetune_payload(str(tmp_path / "ckpt"), template)
    assert from_root is not None and int(from_root["iteration"]) == 3

    # a torch .pth path yields None (params-only fallback)
    assert load_finetune_payload("whatever/best_accuracy.pth", template) is None
