from ccd_tpu.evaluation.editdistance import levenshtein
from ccd_tpu.evaluation.accuracy import TextAccuracy

__all__ = ["levenshtein", "TextAccuracy"]
