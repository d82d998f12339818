from ccd_tpu.losses.losses import (
    dino_char_loss, dino_center_update, seg_loss, teacher_temp_schedule, tf_loss,
)

__all__ = ["dino_char_loss", "dino_center_update", "seg_loss",
           "teacher_temp_schedule", "tf_loss"]
