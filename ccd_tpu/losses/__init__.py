from ccd_tpu.losses.losses import (
    dino_char_loss, dino_char_loss_fused, dino_center_update, seg_loss,
    sinkhorn_knopp_teacher, teacher_temp_schedule, tf_loss,
)

__all__ = ["dino_char_loss", "dino_char_loss_fused", "dino_center_update",
           "seg_loss", "sinkhorn_knopp_teacher", "teacher_temp_schedule",
           "tf_loss"]
