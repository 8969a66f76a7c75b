"""Large-star/small-star connected components: correctness vs the min-label
default, and the O(log n)-round convergence property on the adversarial
(high-diameter) chain graph that min-label would need O(n) rounds for."""

from pyspark.sql import functions as F

from minhash_spark.operators.cluster import connected_components
from minhash_spark.operators.cluster_twostar import connected_components_twostar


def _labels(df):
    return {r["url"]: r["cluster_id"] for r in df.collect()}


def test_twostar_chain_converges_in_log_rounds(spark):
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["url_a", "url_b"]
    )
    stats: dict = {}
    got = _labels(connected_components_twostar(edges, stats_out=stats))
    assert got == {i: 0 for i in range(n)}
    assert stats["converged"]
    # diameter 63; min-label would need ~63 rounds — two-star needs O(log n)
    assert stats["rounds"] <= 10


def test_twostar_matches_minlabel_on_random_graph(spark):
    import random

    rng = random.Random(7)
    # 40 components of mixed shapes: cliques, chains, stars
    edges = []
    base = 0
    for c in range(40):
        size = rng.randint(2, 9)
        ids = list(range(base, base + size))
        base += size + 3  # gaps → ids not contiguous across components
        shape = c % 3
        if shape == 0:  # clique
            edges += [(a, b) for a in ids for b in ids if a < b]
        elif shape == 1:  # chain
            edges += list(zip(ids, ids[1:]))
        else:  # star
            edges += [(ids[0], x) for x in ids[1:]]
    rng.shuffle(edges)
    df = spark.createDataFrame(edges, ["url_a", "url_b"])

    want = _labels(connected_components(df))
    got = _labels(connected_components_twostar(df))
    assert got == want


def test_twostar_two_components_min_roots(spark):
    edges = spark.createDataFrame(
        [(5, 9), (9, 2), (100, 101)], ["url_a", "url_b"]
    )
    got = _labels(connected_components_twostar(edges))
    assert got == {5: 2, 9: 2, 2: 2, 100: 100, 101: 100}
