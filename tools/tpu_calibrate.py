#!/usr/bin/env python
"""Measure what the attached TPU actually delivers on the shapes this
framework runs — the denominator for an honest MFU/roofline claim.

Each row scans the op K times inside ONE compiled dispatch (lax.scan with a
data dependency through the carry) so the remote tunnel's launch latency is
amortized, then syncs by fetching a scalar reduction (``block_until_ready``
under-blocks on this tunnel; a full-array fetch would swamp the measurement
— see CLAUDE.md).

Usage:  python tools/tpu_calibrate.py            # ~2 min warm
Output: one table; paste into README's performance section when hardware
        changes.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ccd_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache("bench.py")

    K = 50

    def timed(name, fn, *args, flops=0.0, bytes_=0.0):
        f = jax.jit(fn)
        float(jax.device_get(f(*args)))  # compile + warm
        t0 = time.perf_counter()
        float(jax.device_get(f(*args)))
        dt = (time.perf_counter() - t0) / K
        msg = f"{name:44s} {dt * 1e6:9.1f} us"
        if flops:
            msg += f"  {flops / dt / 1e12:6.1f} TFLOPS"
        if bytes_:
            msg += f"  {bytes_ / dt / 1e9:6.1f} GB/s"
        print(msg, flush=True)

    def scan_op(op):
        def fn(x, *rest):
            def body(c, _):
                return op(c, *rest), 0.0
            c, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(c.astype(jnp.float32))
        return fn

    rng = np.random.default_rng(0)
    print(f"# device: {jax.devices()[0].device_kind}, {K} iters/row")

    # -- MXU peak: square matmuls --------------------------------------------
    for n in (2048, 4096, 8192):
        a = jnp.asarray(rng.random((n, n)), jnp.bfloat16)
        w = jnp.asarray(rng.random((n, n)), jnp.bfloat16)
        timed(f"matmul {n}^3 bf16", scan_op(
            lambda c, w: jnp.dot(c, w, preferred_element_type=jnp.bfloat16)),
            a, w, flops=2 * n ** 3)

    # -- the model's actual matmul shapes (M = 128 seqs x 256 tokens) --------
    # fc1: (32768, 384) x (384, 1536);  fc2: (32768, 1536) x (1536, 384)
    # qkv: (32768, 384) x (384, 1152);  DINO last: (3328, 256) x (256, 65536)
    shapes = [("fc1", 32768, 384, 1536), ("fc2", 32768, 1536, 384),
              ("qkv", 32768, 384, 1152), ("dino_last", 3328, 256, 65536)]
    for name, m, k, n in shapes:
        a = jnp.asarray(rng.random((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.random((k, n)), jnp.bfloat16)

        def op(c, w, k=k):
            y = jnp.dot(c, w, preferred_element_type=jnp.bfloat16)
            return y[:, :k] if y.shape[1] >= k else jnp.pad(
                y, ((0, 0), (0, k - y.shape[1])))
        timed(f"{name} ({m},{k})x({k},{n}) bf16", scan_op(op), a, w,
              flops=2 * m * k * n,
              bytes_=2 * (m * k + k * n + m * n))

    # -- memory system -------------------------------------------------------
    big = jnp.asarray(rng.random((64, 1024, 1024)), jnp.bfloat16)
    timed("elementwise 128MB bf16 (copy bound)", scan_op(
        lambda c: c * 1.0001), big, bytes_=2 * 2 * big.size)
    t = jnp.asarray(rng.random((128, 256, 6, 64)), jnp.bfloat16)
    timed("transpose BSHD<->BHSD 25MB x2", scan_op(
        lambda c: jnp.transpose(c, (0, 2, 1, 3)).transpose((0, 2, 1, 3))
        * 1.0001), t, bytes_=2 * 2 * 2 * t.size)

    # -- the attention kernels at production shape ---------------------------
    from ccd_tpu.ops.flash_attention import flash_attention, mha_packed
    q = jnp.asarray(rng.random((768, 256, 64)), jnp.bfloat16)
    timed("flash fwd (768 bh, 256, 64)", scan_op(
        lambda c, k, v: flash_attention(c, k, v, 0.125)), q, q, q,
        flops=2 * 2 * 768 * 256 * 256 * 64, bytes_=2 * 4 * 768 * 256 * 64)
    qkv = jnp.asarray(rng.random((128, 256, 3, 6, 64)), jnp.bfloat16)
    timed("packed fwd (128, 256, 3, 6, 64)", scan_op(
        lambda c: c + mha_packed(c, 0.125).reshape(
            c.shape[0], c.shape[1], 1, c.shape[3], c.shape[4]) * 1e-3), qkv,
        flops=2 * 2 * 768 * 256 * 256 * 64, bytes_=2 * 4 * 768 * 256 * 64)

    # -- activation cost: is gelu a hidden VPU tax in the MLP? ---------------
    act = jnp.asarray(rng.random((32768, 1536)), jnp.bfloat16)
    timed("gelu exact (erf) (32768,1536) bf16", scan_op(
        lambda c: jax.nn.gelu(c, approximate=False) * 1.0001), act,
        bytes_=2 * 2 * act.size)
    timed("gelu tanh approx (32768,1536) bf16", scan_op(
        lambda c: jax.nn.gelu(c, approximate=True) * 1.0001), act,
        bytes_=2 * 2 * act.size)


if __name__ == "__main__":
    main()
