from . import merge, materializations, snapshot, seeds

__all__ = ["merge", "materializations", "snapshot", "seeds"]
