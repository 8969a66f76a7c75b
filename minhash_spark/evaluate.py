"""Evaluation utilities: dup-pair precision/recall against a ground-truth
pair set, and pairwise cluster-assignment metrics — the measurements behind
the north-rule gates (dup-pair recall ≥ 0.99, false-positive control).
All distributed (joins + counts); no driver-side pair materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(pairs: DataFrame, a: str, b: str) -> DataFrame:
    return pairs.select(
        F.least(F.col(a), F.col(b)).alias("pa"),
        F.greatest(F.col(a), F.col(b)).alias("pb"),
    ).distinct()


def pair_metrics(
    found: DataFrame,
    truth: DataFrame,
    found_cols: tuple[str, str] = ("url_a", "url_b"),
    truth_cols: tuple[str, str] = ("url_a", "url_b"),
) -> dict:
    """precision/recall of found pairs vs truth pairs (order-insensitive)."""
    f = _canon(found, *found_cols).persist()
    t = _canon(truth, *truth_cols).persist()
    n_found = f.count()
    n_truth = t.count()
    n_hit = f.join(t, ["pa", "pb"], "inner").count()
    f.unpersist()
    t.unpersist()
    return {
        "n_found": n_found,
        "n_truth": n_truth,
        "n_hit": n_hit,
        "precision": n_hit / n_found if n_found else 1.0,
        "recall": n_hit / n_truth if n_truth else 1.0,
    }


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> dict:
    """ANN quality: fraction of the exact top-k (query, neighbor) edges the
    approximate result recovers (micro-averaged over all queries), plus the
    per-query minimum — the standard recall@k report for an IVF/LSH index
    against the brute-force baseline."""
    a = approx.select(query_col, neighbor_col).distinct()
    e = exact.select(query_col, neighbor_col).distinct()
    per_q = (
        e.join(a.withColumn("_hit", F.lit(1)), [query_col, neighbor_col], "left")
        .groupBy(query_col)
        .agg(
            F.count("*").alias("n_k"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
    )
    stats = per_q.agg(
        F.sum("n_k").alias("n_exact"),
        F.sum("n_hit").alias("n_hit"),
        F.min(F.col("n_hit") / F.col("n_k")).alias("min_r"),
    ).collect()[0]
    n_exact, n_hit = stats["n_exact"] or 0, stats["n_hit"] or 0
    return {
        "n_exact": n_exact,
        "n_hit": n_hit,
        "recall": n_hit / n_exact if n_exact else 1.0,
        "min_query_recall": float(stats["min_r"]) if n_exact else 1.0,
    }


def cluster_pair_metrics(
    assigned: DataFrame,
    truth_clusters: DataFrame,
    id_col: str = "url",
    assigned_label: str = "cluster_id",
    truth_label: str = "cluster_id",
) -> dict:
    """Pairwise precision/recall of a cluster assignment vs truth clusters:
    a pair counts as predicted-positive iff both docs share an assigned
    label, true-positive iff they also share a truth label. Pair sets are
    derived distributively (self-join per label)."""

    def pairs_of(df: DataFrame, label: str) -> DataFrame:
        x = df.select(F.col(id_col).alias("_i"), F.col(label).alias("_l"))
        return (
            x.alias("a")
            .join(x.alias("b"), F.col("a._l") == F.col("b._l"))
            .where(F.col("a._i") < F.col("b._i"))
            .select(F.col("a._i").alias("pa"), F.col("b._i").alias("pb"))
            .distinct()
        )

    pred = pairs_of(assigned, assigned_label).persist()
    true = pairs_of(truth_clusters, truth_label).persist()
    n_pred, n_true = pred.count(), true.count()
    n_hit = pred.join(true, ["pa", "pb"], "inner").count()
    pred.unpersist()
    true.unpersist()
    return {
        "n_predicted_pairs": n_pred,
        "n_truth_pairs": n_true,
        "n_hit": n_hit,
        "precision": n_hit / n_pred if n_pred else 1.0,
        "recall": n_hit / n_true if n_true else 1.0,
    }
