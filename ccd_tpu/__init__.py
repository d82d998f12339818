"""ccd_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of TongkunGuan/CCD.

Self-supervised Character-to-Character Distillation (CCD, ICCV 2023) rebuilt
TPU-first: DINO-style student/teacher ViT pretraining over per-character
features pooled from online glyph clusters, supervised finetuning with an
autoregressive NRTR transformer decoder, and the 11-benchmark word-accuracy
evaluation suite — all as pure-functional JAX with pjit data parallelism over
a device mesh, device-side glyph clustering, and Orbax checkpointing.
"""

__version__ = "0.1.0"
