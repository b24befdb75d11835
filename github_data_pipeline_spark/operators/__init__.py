from . import blame, ingest, linkers, multimodal

__all__ = ["blame", "ingest", "linkers", "multimodal"]
