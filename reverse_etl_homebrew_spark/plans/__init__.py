from . import patients

__all__ = ["patients"]
