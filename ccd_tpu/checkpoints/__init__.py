from ccd_tpu.checkpoints.orbax_io import CheckpointManager, restore_pytree, save_pytree
from ccd_tpu.checkpoints.torch_import import (
    convert_pretrain_checkpoint, convert_recognizer_checkpoint,
)

__all__ = ["CheckpointManager", "save_pytree", "restore_pytree",
           "convert_pretrain_checkpoint", "convert_recognizer_checkpoint"]
