from ccd_tpu.models.vit import VisionTransformer, vit_tiny, vit_small, vit_base, VIT_ARCHS
from ccd_tpu.models.heads import DINOHead, SegHead, MlpEncoder
from ccd_tpu.models.nrtr import NRTRDecoder
from ccd_tpu.models.recognizer import CCDRecognizer
from ccd_tpu.models.pretrain import CCDPretrainModel

__all__ = [
    "VisionTransformer", "vit_tiny", "vit_small", "vit_base", "VIT_ARCHS",
    "DINOHead", "SegHead", "MlpEncoder", "NRTRDecoder", "CCDRecognizer",
    "CCDPretrainModel",
]
