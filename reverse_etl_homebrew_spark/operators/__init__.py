from . import aggregates, dedup, joins, merge, scans, similarity, windows

__all__ = ["aggregates", "dedup", "joins", "merge", "scans", "similarity", "windows"]
