from .incremental import run_sync
from . import structured

__all__ = ["run_sync", "structured"]
