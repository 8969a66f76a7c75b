from .incremental import stream_signatures, incremental_dedup_batch
from .stateful import stateful_exact_dedup

__all__ = ["stream_signatures", "incremental_dedup_batch", "stateful_exact_dedup"]
