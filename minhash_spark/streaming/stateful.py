"""Custom stateful streaming operator: cross-batch exact-duplicate
accounting via applyInPandasWithState.

Per content-hash state (total occurrences seen so far) persists in the
streaming state store across micro-batches, so a page whose text first
appeared three batches ago is still flagged a duplicate — the stateful
counterpart of the batch exact-dedup groupBy (operators/exact.py), and the
engine's demonstration of arbitrary-stateful streaming (the watermark/agg
path is covered by incremental.py).

State layout: one long per group (occurrences seen before this batch).
Within a batch, rows are ordered by url so occurrence indices are
deterministic regardless of Arrow chunking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])
DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("text_sha", StringType()),
        StructField("url", StringType()),
        StructField("occurrence", LongType()),
        StructField("is_duplicate", BooleanType()),
    ]
)


def _update_dedup_state(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_sha,) = key
    seen = state.get[0] if state.exists else 0
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("url")
    n = len(rows)
    occurrence = [seen + i for i in range(n)]
    state.update((seen + n,))
    yield pd.DataFrame(
        {
            "text_sha": [text_sha] * n,
            "url": rows["url"].tolist(),
            "occurrence": occurrence,
            "is_duplicate": [o > 0 for o in occurrence],
        }
    )


def stateful_exact_dedup(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming (url, text) → (text_sha, url, occurrence, is_duplicate) with
    occurrence counted ACROSS micro-batches through the state store. Input
    must be a streaming DataFrame; pair with writeStream(outputMode=append)."""
    hashed = pages.select(
        F.sha2(F.col(text_col), 256).alias("text_sha"), F.col("url")
    )
    return hashed.groupBy("text_sha").applyInPandasWithState(
        _update_dedup_state,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
