from .incremental import (
    incremental_dedup_batch,
    probe_store,
    stream_signatures,
)
from .stateful import stateful_exact_dedup

__all__ = [
    "stream_signatures",
    "incremental_dedup_batch",
    "probe_store",
    "stateful_exact_dedup",
]
