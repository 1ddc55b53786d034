from . import engine, experimental, path, segments

__all__ = ["engine", "experimental", "path", "segments"]
