from .incremental import stream_signatures, incremental_dedup_batch

__all__ = ["stream_signatures", "incremental_dedup_batch"]
