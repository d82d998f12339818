#!/usr/bin/env python
"""Turnkey released-weight accuracy-parity harness (VERDICT r4 #3).

One command that takes a reference torch ``.pth`` checkpoint (the released
CCD weights, ``/root/reference/README.md:46-53``) plus the benchmark LMDB
roots, converts the checkpoint (``ccd_tpu.checkpoints.torch_import``), runs
the full 11-benchmark evaluation exactly as the reference's ``test.py``
(parity target ``/root/reference/test.py:150-218``), prints a side-by-side
table against the published BASELINE.md numbers, writes a JSON artifact, and
exits nonzero if any benchmark's word accuracy deviates from its baseline by
more than ``--tol`` (default 0.2 percentage points — the BASELINE.json north
star).

Usage:
  python tools/parity_eval.py --pth CCD_vit_small_ARD.pth \
      --test_root /data/evaluation --variant ard [--tol 0.2] \
      [-c ccd_tpu/configs/ccd_finetune_ard.yaml] [--out parity.json]

``--test_root`` may be one or more LMDB dirs (each containing ``data.mdb``)
or a parent directory that is scanned recursively; roots are matched to the
canonical benchmark names by basename. ``--baseline FILE.json`` overrides
the built-in table (``{"IIIT5k": 96.8, ...}`` in word-acc %) — that is also
how the end-to-end test (`tests/test_parity_eval.py`) anchors the harness on
a ``torch_export``-produced pickle + synthetic LMDB without the real
released weights (which are a Google-Drive download, absent in this env).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# Published CCD ViT-Small word accuracy (%), BASELINE.md (source
# /root/reference/README.md:48-51). Keys are canonical benchmark names.
PUBLISHED = {
    "std": {
        "IIIT5k": 96.8, "SVT": 94.4, "IC13": 96.6, "IC15": 87.3,
        "SVTP": 91.3, "CUTE80": 92.4, "COCOText": 64.7, "CTW": 80.4,
        "TotalText": 82.1, "HOST": 77.9, "WOST": 85.8,
    },
    "ard": {
        "IIIT5k": 98.0, "SVT": 96.4, "IC13": 98.3, "IC15": 90.3,
        "SVTP": 92.7, "CUTE80": 98.3, "COCOText": 76.7, "CTW": 86.5,
        "TotalText": 91.3, "HOST": 77.3, "WOST": 86.0,
    },
}

# basename (lowercased) prefixes -> canonical name; ordered longest-first so
# e.g. "ic15_1811" wins over "ic1". Mirrors the reference's eval_data_name
# list (/root/reference/test.py:190-202) and the released lmdb dir names.
_NAME_PREFIXES = [
    ("iiit5k", "IIIT5k"), ("iiit", "IIIT5k"),
    ("svtp", "SVTP"), ("svt", "SVT"),
    ("ic13", "IC13"), ("ic15", "IC15"),
    ("cute80", "CUTE80"), ("cute", "CUTE80"),
    ("totaltext", "TotalText"), ("cocotext", "COCOText"), ("coco", "COCOText"),
    ("ctw", "CTW"), ("host", "HOST"), ("wost", "WOST"),
]


def canonical_name(root: str) -> str:
    base = os.path.basename(os.path.normpath(root)).lower()
    for prefix, name in _NAME_PREFIXES:
        if base.startswith(prefix):
            return name
    return os.path.basename(os.path.normpath(root))


def discover_roots(paths):
    """Expand each path to LMDB roots (dirs containing data.mdb)."""
    roots = []
    for p in paths:
        if os.path.isfile(os.path.join(p, "data.mdb")):
            roots.append(p)
            continue
        for dirpath, _dirnames, filenames in sorted(os.walk(p)):
            if "data.mdb" in filenames:
                roots.append(dirpath)
    return roots


def _parse_arguments():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--pth", required=True,
                   help="reference torch .pth checkpoint (or Orbax dir)")
    p.add_argument("--test_root", nargs="+", required=True,
                   help="benchmark LMDB dirs, or parent dirs to scan")
    p.add_argument("-c", "--config",
                   default="ccd_tpu/configs/ccd_finetune_ard.yaml")
    p.add_argument("--variant", choices=["std", "ard"], default="ard",
                   help="which published column to diff against")
    p.add_argument("--baseline", default=None,
                   help="JSON file {benchmark: word_acc_pct} overriding the "
                        "built-in published table")
    p.add_argument("--tol", type=float, default=0.2,
                   help="max |delta| in word-acc percentage points")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--out", default=None, help="write JSON artifact here")
    return p.parse_args()


def run_parity_eval(pth, test_roots, config_path, baseline, tol=0.2,
                    batch_size=None, out_path=None):
    """Core harness; returns (rows, weighted_acc, ok). Importable for tests."""
    import jax  # noqa: F401  (backend init before building the model)
    from ccd_tpu.config import Config
    from ccd_tpu.utils.cache import setup_compilation_cache
    setup_compilation_cache(config_path)
    from ccd_tpu.builders import build_recognizer, load_recognizer_params
    from ccd_tpu.evaluation.runner import evaluate_benchmarks

    config = Config(config_path)
    if batch_size:
        config.override(dataset_test_batch_size=batch_size)
    model, _convertor = build_recognizer(config)

    import jax.numpy as jnp
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, config.dataset_image_height,
                     config.dataset_image_width, 3))
    tgt = jnp.full((1, model.max_seq_len), model.padding_idx, jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, img, tgt,
                           train_mode=True)
    params = load_recognizer_params(pth, model, variables["params"])

    roots = discover_roots(test_roots)
    if not roots:
        raise FileNotFoundError(f"no LMDB roots under {test_roots}")
    names = [canonical_name(r) for r in roots]
    bsz = config.dataset_test_batch_size or 288
    results, weighted = evaluate_benchmarks(
        model, params, roots, batch_size=bsz,
        max_seq_len=config.decoder_max_seq_len,
        charset_type=config.dataset_charset_type or "DICT90",
        case_sensitive=bool(config.dataset_eval_case_sensitive),
        names=names)

    rows, ok = [], True
    for res in results:
        name = str(res["name"])
        acc = 100.0 * float(res["cwr"])
        base = baseline.get(name)
        delta = None if base is None else acc - float(base)
        within = delta is None or abs(delta) <= tol
        ok = ok and within
        rows.append({"benchmark": name, "words": int(res["words"]),
                     "word_acc_pct": round(acc, 3),
                     "baseline_pct": base,
                     "delta_pct": None if delta is None else round(delta, 3),
                     "within_tol": within})

    dashed = "-" * 88
    print(dashed)
    print(f"{'benchmark':<12} {'words':>7} {'acc %':>8} {'baseline':>9} "
          f"{'delta':>7}  status")
    for r in rows:
        base = "—" if r["baseline_pct"] is None else f"{r['baseline_pct']:.1f}"
        delta = "—" if r["delta_pct"] is None else f"{r['delta_pct']:+.2f}"
        status = "ok" if r["within_tol"] else f"FAIL (> {tol})"
        print(f"{r['benchmark']:<12} {r['words']:>7} "
              f"{r['word_acc_pct']:>8.2f} {base:>9} {delta:>7}  {status}")
    print(f"total_accuracy: {100.0 * weighted:0.2f}")
    print(dashed)

    artifact = {"checkpoint": str(pth), "tol_pct": tol, "ok": ok,
                "weighted_acc_pct": round(100.0 * weighted, 3),
                "benchmarks": rows}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}")
    return rows, weighted, ok


def main():
    args = _parse_arguments()
    if args.baseline:
        with open(args.baseline) as f:
            baseline = {str(k): float(v) for k, v in json.load(f).items()}
    else:
        baseline = PUBLISHED[args.variant]
    _rows, _weighted, ok = run_parity_eval(
        args.pth, args.test_root, args.config, baseline, tol=args.tol,
        batch_size=args.batch_size, out_path=args.out)
    if not ok:
        print(f"PARITY FAIL: at least one benchmark deviates more than "
              f"{args.tol} pct points from baseline", file=sys.stderr)
        sys.exit(1)
    print("PARITY OK")


if __name__ == "__main__":
    main()
