from . import (dedup, evaluation, multimodal, pipeline, profiling,
               similarity, textstats, timeseries)

__all__ = ["dedup", "evaluation", "multimodal", "pipeline", "profiling",
           "similarity", "textstats", "timeseries"]
