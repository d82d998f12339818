"""Activation functions shared by the model families.

GELU: torch ``nn.GELU()`` (the reference's activation everywhere —
``vision_transformer.py:90``, ``transformer.py`` FFN) is the exact erf
form, and the fp32 parity paths here reproduce it bit-for-bit. On the bf16
production path the erf polynomial is a measured VPU tax: 1.32 ms per
(32768, 1536) application on the attached v5e vs 0.67 ms for the tanh
form (`tools/tpu_calibrate.py`), and the ViT-S pretrain step applies it
~36 times (student fwd+bwd + teacher, 12 blocks). The tanh approximation
deviates from erf by at most ~3e-3 absolute (around |x|~=2) — the same
order as bf16 rounding itself — so bf16 compute uses tanh and every fp32
path keeps exact erf. The bf16-vs-fp32 trajectory drift test
(tests/test_reference_trajectory.py) bounds the combined effect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-erf GELU in fp32 paths; tanh GELU in bf16 compute."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)
