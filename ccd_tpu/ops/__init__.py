from ccd_tpu.ops.image import resize_bilinear, resize_bicubic
from ccd_tpu.ops.warp import affine_grid, grid_sample
from ccd_tpu.ops.cc_label import label_clusters
from ccd_tpu.ops.kmeans_mask import kmeans_foreground_mask
from ccd_tpu.ops.pooling import char_attention_pool

__all__ = [
    "resize_bilinear", "resize_bicubic", "affine_grid", "grid_sample",
    "label_clusters", "kmeans_foreground_mask", "char_attention_pool",
]
