from . import engine, path, segments

__all__ = ["engine", "path", "segments"]
