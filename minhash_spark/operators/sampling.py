"""Deterministic sampling and dataset splitting — the reproducibility
primitives a training-data pipeline needs around dedup/filtering: the same
document must land in the same sample/split on every run, every engine,
every cluster size (Spark's `df.sample` is seed-stable only per partition
layout, which reshuffles under repartitioning — useless as a contract).

Mechanism: hash the stable id with md5 and take hex-prefix ranges. The
first k hex chars give 16^k uniform strata; membership is a pure JVM
expression (md5/substring/comparison — whole-stage codegen, no shuffle,
no UDF) and replays verbatim in any engine with md5 (the DuckDB oracle
runs the identical expression). Granularity 1/16^k is the knob: k=3 →
1/4096 rate steps, plenty for corpus work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_K = 3  # strata = 16^3 = 4096


def _bucket(id_col: Column) -> Column:
    """Uniform integer bucket in [0, 4096) from the md5 hex prefix of the
    id's string form. conv() parses the hex; the md5 string form is
    identical across engines for integer/string ids."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, _HEX_K), 16, 10
    ).cast("int")


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~rate of rows, decided ONLY by the row's id — stable across
    runs, partitionings and engines. rate is quantized to 1/4096 steps."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(round(rate * 16**_HEX_K))
    return df.where(_bucket(F.col(id_col)) < F.lit(cut))


def with_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by
    deterministic hash range; weights must sum to ~1 and quantize to
    1/4096. Membership is a row-local JVM expression — a 10^12-doc corpus
    splits with zero shuffle."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _bucket(F.col(id_col))
    expr = None
    lo = 0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        hi = 16**_HEX_K if i == len(items) - 1 else lo + int(round(w * 16**_HEX_K))
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn(out_col, expr)
