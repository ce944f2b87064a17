from . import dedup, similarity, textstats, multimodal, pipeline

__all__ = ["dedup", "similarity", "textstats", "multimodal", "pipeline"]
