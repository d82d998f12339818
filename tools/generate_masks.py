#!/usr/bin/env python
"""Offline glyph-mask generation into LMDB (parity: mask_create/generate_mask.py
+ merge.py).

Reads image LMDBs, computes the 2-means foreground mask for every image, and
writes a parallel mask LMDB (``mask-%09d`` keys, PNG-encoded). The reference
fans out over a 36-process pool to amortize per-image scipy k-means; here the
k-means runs BATCHED on the accelerator (``kmeans_foreground_mask``) with the
host only decoding/encoding PNGs — typically >10x faster end to end.

Usage:
  python tools/generate_masks.py --src <lmdb dir> [<lmdb dir> ...] \
      --mask_root <out root> [--batch 256]

Mask paths are derived like the reference (suffix after 'training' appended
to --mask_root); a single output env per source env, so no merge step is
needed (merge.py's shard-merging is subsumed).
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", nargs="+", required=True)
    parser.add_argument("--mask_root", required=True)
    parser.add_argument("--batch", type=int, default=256)
    args = parser.parse_args()

    import cv2
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ccd_tpu.data.dataset import mask_env_path, scan_dataset_roots
    from ccd_tpu.data.lmdb import LmdbReader, LmdbWriter
    from ccd_tpu.ops.kmeans_mask import kmeans_foreground_mask

    for src in scan_dataset_roots(args.src):
        out = mask_env_path(src, args.mask_root) or os.path.join(
            args.mask_root, os.path.basename(os.path.normpath(src)))
        print(f"{src} -> {out}")
        reader = LmdbReader(src)
        n = int(reader.get(b"num-samples"))
        writer = LmdbWriter(out)

        # batch images at a common size for the device k-means; the mask is
        # resized back to the original image size before encoding
        bh, bw = 64, 256
        batch_imgs, batch_meta = [], []

        def flush():
            if not batch_imgs:
                return
            grays = jnp.asarray(np.stack(batch_imgs), jnp.float32)
            masks = np.asarray(kmeans_foreground_mask(grays))
            for m, (key, oh, ow) in zip(masks, batch_meta):
                m = cv2.resize(m, (ow, oh), interpolation=cv2.INTER_NEAREST)
                buf = io.BytesIO()
                Image.fromarray((m * 255).astype(np.uint8)).save(buf, format="PNG")
                writer.put(key, buf.getvalue())
            batch_imgs.clear()
            batch_meta.clear()

        done = 0
        for i in range(1, n + 1):
            img_buf = reader.get(f"image-{i:09d}".encode())
            if img_buf is None:
                continue
            arr = np.frombuffer(img_buf, np.uint8)
            gray = cv2.imdecode(arr, cv2.IMREAD_GRAYSCALE)
            if gray is None:
                continue
            oh, ow = gray.shape
            batch_imgs.append(cv2.resize(gray, (bw, bh)).astype(np.float32))
            batch_meta.append((f"mask-{i:09d}".encode(), oh, ow))
            if len(batch_imgs) >= args.batch:
                flush()
                done += args.batch
                if done % (args.batch * 20) == 0:
                    print(f"  {done}/{n}")
        flush()
        writer.put(b"num-samples", str(n).encode())
        writer.close()
        reader.close()
        print(f"  wrote {n} masks")


if __name__ == "__main__":
    main()
