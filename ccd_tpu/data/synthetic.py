"""Synthetic scene-text data generation (for tests, smoke runs and benches).

Renders random words onto noisy backgrounds with PIL, producing exactly the
artifacts the real pipeline consumes: RGB text images, ground-truth glyph
masks, and label strings. Also writes reference-layout LMDB environments
(image-%09d / label-%09d / num-samples [+ mask-%09d]) so the full LMDB
dataset/eval stack can be exercised end-to-end without external data.
"""

from __future__ import annotations

import io
import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ccd_tpu.charsets import DICT36
from ccd_tpu.data.lmdb import LmdbWriter


def _font(size: int = 22):
    for path in (
        "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    ):
        if os.path.exists(path):
            return ImageFont.truetype(path, size)
    return ImageFont.load_default()


def render_word(word: str, h: int = 32, w: int = 128, rng: Optional[np.random.Generator] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Render a word -> (RGB uint8 (h, w, 3), glyph mask float (h, w))."""
    rng = rng or np.random.default_rng(0)
    bg = int(rng.integers(140, 250))
    fg = int(rng.integers(0, max(bg - 90, 1)))
    img = Image.new("L", (w, h), color=bg)
    draw = ImageDraw.Draw(img)
    font = _font(int(rng.integers(18, 26)))
    bbox = draw.textbbox((0, 0), word, font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    x = max((w - tw) // 2 + int(rng.integers(-4, 5)), 0) - bbox[0]
    y = max((h - th) // 2 + int(rng.integers(-2, 3)), 0) - bbox[1]
    draw.text((x, y), word, fill=fg, font=font)
    gray = np.asarray(img, np.uint8)
    mask = (gray < (fg + bg) // 2).astype(np.float32)
    noise = rng.normal(0, 4, gray.shape)
    rgb = np.clip(gray[..., None].astype(np.float32) + noise[..., None], 0, 255)
    rgb = np.repeat(rgb, 3, axis=-1).astype(np.uint8)
    return rgb, mask


def random_words(n: int, rng: np.random.Generator, min_len: int = 2,
                 max_len: int = 8) -> List[str]:
    chars = np.array(list(DICT36))
    return ["".join(rng.choice(chars, size=int(rng.integers(min_len, max_len + 1))))
            for _ in range(n)]


def make_synthetic_batch(n: int, h: int = 32, w: int = 128, seed: int = 0
                         ) -> Tuple[np.ndarray, np.ndarray, List[str]]:
    """(images uint8 (N,h,w,3), masks float (N,h,w), words)."""
    rng = np.random.default_rng(seed)
    words = random_words(n, rng)
    images = np.zeros((n, h, w, 3), np.uint8)
    masks = np.zeros((n, h, w), np.float32)
    for i, word in enumerate(words):
        images[i], masks[i] = render_word(word, h, w, rng)
    return images, masks, words


def write_synthetic_lmdb(path: str, n: int, seed: int = 0, with_mask_lmdb: bool = False,
                         mask_path: Optional[str] = None, h: int = 48, w: int = 160
                         ) -> List[str]:
    """Write a reference-layout LMDB of rendered words; returns the labels.

    Images are stored PNG-encoded at a different (h, w) than the model input
    so the resize path is exercised. If ``with_mask_lmdb``, a parallel mask
    environment is written at ``mask_path`` (mask-%09d keys), mirroring
    mask_create/generate_mask.py's output layout.
    """
    rng = np.random.default_rng(seed)
    words = random_words(n, rng)
    mask_writer = LmdbWriter(mask_path) if with_mask_lmdb and mask_path else None
    with LmdbWriter(path) as w_:
        for i, word in enumerate(words):
            img, mask = render_word(word, h, w, rng)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            w_.put(f"image-{i + 1:09d}".encode(), buf.getvalue())
            w_.put(f"label-{i + 1:09d}".encode(), word.encode())
            if mask_writer is not None:
                mbuf = io.BytesIO()
                Image.fromarray((mask * 255).astype(np.uint8)).save(mbuf, format="PNG")
                mask_writer.put(f"mask-{i + 1:09d}".encode(), mbuf.getvalue())
        w_.put(b"num-samples", str(n).encode())
    if mask_writer is not None:
        mask_writer.put(b"num-samples", str(n).encode())
        mask_writer.close()
    return words
