from ccd_tpu.data.lmdb import LmdbReader, LmdbWriter

__all__ = ["LmdbReader", "LmdbWriter"]
