from ccd_tpu.training.optim import (
    cancel_last_layer_grads, clip_gradients_per_param, ema_update, make_adamw,
    make_optimizer, weight_decay_mask,
)
from ccd_tpu.training.pretrain_step import (
    PretrainState, init_pretrain_state, make_fused_pretrain_step,
    make_multi_pretrain_step, make_pretrain_step, pretrain_state_payload,
)
from ccd_tpu.training.finetune_step import (
    FinetuneState, finetune_state_payload, init_finetune_state,
    make_finetune_step, make_fused_finetune_step, make_multi_finetune_step,
)

__all__ = [
    "cancel_last_layer_grads", "clip_gradients_per_param", "ema_update",
    "make_adamw", "make_optimizer", "weight_decay_mask", "PretrainState",
    "make_pretrain_step", "make_fused_pretrain_step", "make_multi_pretrain_step",
    "init_pretrain_state", "pretrain_state_payload", "FinetuneState", "make_finetune_step",
    "make_fused_finetune_step", "make_multi_finetune_step", "init_finetune_state",
    "finetune_state_payload",
]
