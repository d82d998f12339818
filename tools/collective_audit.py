#!/usr/bin/env python
"""Collective-traffic audit of the multi-chip pretrain step (VERDICT r3 #5b).

Compiles the production fused pretrain step over an N-device mesh (virtual
CPU devices — the sharding layout, and therefore the GSPMD collective
schedule, is backend-independent), walks the optimized HLO, and accounts
every cross-device collective: op kind, dtype, shard shape, bytes moved per
step. Projects the per-step collective time on a v4-8 ICI ring and compares
it to the measured single-chip step time to bound the scaling efficiency.

Replaces the reference's implicit DDP cost model (torch DDP allreduces the
full grad buffer every step, Dino/modules/utils.py:478-510): here the audit
shows what GSPMD actually inserts for (a) pure data parallelism (grad psum)
and (b) 2-D data x model TP of the 65536-wide DINO head.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/collective_audit.py [--devices 8] [--model_parallel 1]
      [--batch 64] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v4 ICI: ~50 GB/s per link per direction, 3 links/chip on a v4-8 (2x2x2
# torus, bidirectional) -> ring all-reduce effective bw ~ 100 GB/s/chip for
# bf16/f32 payloads (scaling-book numbers; conservative end used below).
V4_ICI_ALLREDUCE_GBPS = 100.0

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str: str) -> int:
    """'f32[256,65536]{1,0}' -> payload bytes (tuples handled per-element)."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def audit_hlo(hlo_text: str, n_devices: int):
    """Parse optimized HLO: every collective instruction -> (kind, bytes).

    Bytes = the per-device payload (HLO shapes are per-shard after SPMD
    partitioning). Ring all-reduce moves 2*(N-1)/N * payload per device;
    all-gather/reduce-scatter move (N-1)/N * full.
    """
    rows = []
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ([^=]+?) (all-reduce|all-gather|"
                     r"reduce-scatter|collective-permute|all-to-all)", line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        payload = _shape_bytes(shape_str)
        if kind == "all-reduce":
            wire = int(2 * (n_devices - 1) / n_devices * payload)
        elif kind in ("all-gather", "reduce-scatter"):
            wire = int((n_devices - 1) / n_devices * payload)
        else:
            wire = payload
        rows.append({"kind": kind, "payload_bytes": payload,
                     "wire_bytes_per_device": wire})
    return rows


def build_step(n_devices: int, model_parallel: int, batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ccd_tpu.models import CCDPretrainModel
    from ccd_tpu.parallel import (pretrain_mesh, pretrain_state_shardings,
                                  batch_sharding)
    from ccd_tpu.training import init_pretrain_state, make_fused_pretrain_step
    from ccd_tpu.schedules import teacher_temp_schedule

    student = CCDPretrainModel(arch="vit_small", out_dim=65536,
                               with_seg_head=True, norm_last_layer=False,
                               dtype=jnp.bfloat16)
    teacher = CCDPretrainModel(arch="vit_small", out_dim=65536,
                               with_seg_head=False, dtype=jnp.bfloat16)
    state, tx = init_pretrain_state(jax.random.PRNGKey(0), student, teacher)
    mesh = pretrain_mesh(n_devices, model_parallel=model_parallel)
    step = make_fused_pretrain_step(
        student, teacher, tx, severity=5, base_lr=5e-4, min_lr=1e-6,
        total_iters=1000, warmup_iters=10, weight_decay=0.04,
        weight_decay_end=0.4, momentum_teacher=0.996,
        teacher_temps=teacher_temp_schedule(0.04, 0.04, 0, 10),
        clip_grad=3.0, freeze_last_layer=1, global_batch=batch,
        imgnet_based=1_000_000, mesh=mesh)
    state = jax.device_put(state, pretrain_state_shardings(state, mesh))
    raws = jnp.zeros((batch, 32, 128, 3), jnp.float32)
    masks = jnp.zeros((batch, 32, 128), jnp.float32)
    bs = batch_sharding(mesh)
    raws = jax.device_put(raws, bs)
    masks = jax.device_put(masks, bs)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(state, raws, masks)
    compiled = lowered.compile()
    return compiled, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--batch", type=int, default=64, help="global batch")
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured single-chip step ms for the same "
                         "per-device batch (default: README's 157/8 per-K)")
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    compiled, _state = build_step(args.devices, args.model_parallel,
                                  args.batch)
    hlo = compiled.as_text()
    rows = audit_hlo(hlo, args.devices)

    by_kind = {}
    for r in rows:
        k = by_kind.setdefault(r["kind"], {"count": 0, "payload_bytes": 0,
                                           "wire_bytes_per_device": 0})
        k["count"] += 1
        k["payload_bytes"] += r["payload_bytes"]
        k["wire_bytes_per_device"] += r["wire_bytes_per_device"]
    total_wire = sum(r["wire_bytes_per_device"] for r in rows)
    ici_ms = total_wire / (V4_ICI_ALLREDUCE_GBPS * 1e9) * 1e3

    print(f"devices={args.devices} model_parallel={args.model_parallel} "
          f"global_batch={args.batch}")
    for kind, k in sorted(by_kind.items()):
        print(f"  {kind:20s} x{k['count']:3d}  payload "
              f"{k['payload_bytes'] / 1e6:9.2f} MB  wire/device "
              f"{k['wire_bytes_per_device'] / 1e6:9.2f} MB")
    print(f"  TOTAL wire/device/step: {total_wire / 1e6:.2f} MB "
          f"-> {ici_ms:.2f} ms on v4 ICI ({V4_ICI_ALLREDUCE_GBPS:.0f} GB/s "
          "all-reduce bw)")
    if args.step_ms:
        overlap_free = ici_ms / (args.step_ms + ici_ms)
        print(f"  vs step {args.step_ms:.1f} ms: worst-case (zero-overlap) "
              f"scaling efficiency {1 - overlap_free:.1%}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"devices": args.devices,
                       "model_parallel": args.model_parallel,
                       "global_batch": args.batch, "by_kind": by_kind,
                       "total_wire_bytes_per_device": total_wire,
                       "projected_ici_ms": ici_ms}, f, indent=2)
        print(f"  wrote {args.json}")


if __name__ == "__main__":
    main()
