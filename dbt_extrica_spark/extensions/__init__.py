from . import dedup, similarity, textstats, multimodal

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
