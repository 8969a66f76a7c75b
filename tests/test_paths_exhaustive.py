"""Exhaustive differential tests for the SimHash and suffix-array paths on
the synthetic corpus: both candidate schemes are deterministic (pigeonhole
banding / winnowed gram index), so the Spark output must EQUAL the local
brute-force ground truth — not just approximate it."""

import numpy as np
import pytest

from minhash_spark.functions.shingles import normalize_text, fnv1a_many
from minhash_spark.operators.simhash import (
    _BITS,
    with_simhash,
    simhash_candidates,
)
from minhash_spark.operators.substring import substring_dedup
from minhash_spark.sources.pages import generate_corpus

N = 500
W, WINNOW_K = 3, 8


@pytest.fixture(scope="module")
def corpus():
    pages, _, _ = generate_corpus(N, seed=11)
    return pages


def _simhash_local(t) -> int:
    """Independent count-weighted distinct-token SimHash (the batched kernel
    sums ±1 per occurrence — algebraically identical; this stays the
    differential cross-check)."""
    toks = normalize_text(t).split(" ")
    if toks == [""]:
        return 0
    h, w = np.unique(fnv1a_many([x.encode("utf-8") for x in toks]), return_counts=True)
    if h.shape[0] == 0:
        return 0
    bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int64)
    v = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    return int(np.bitwise_or.reduce(np.where(v > 0, np.uint64(1), np.uint64(0)) << _BITS))


def test_simhash_path_exact_vs_bruteforce(spark, corpus):
    df = spark.createDataFrame(corpus[["url", "text"]])
    got = {
        (r["url_a"], r["url_b"]): r["hamming"]
        for r in simhash_candidates(with_simhash(df), max_hamming=3).collect()
    }
    fp = {u: _simhash_local(t) for u, t in zip(corpus["url"], corpus["text"])}
    urls = sorted(fp)
    want = {}
    for i, a in enumerate(urls):
        for b in urls[i + 1 :]:
            ham = bin(fp[a] ^ fp[b]).count("1")
            if ham <= 3:
                want[(min(a, b), max(a, b))] = ham
    assert got == want
    assert len(want) > 0, "fixture must produce simhash-detectable pairs"


def test_substring_path_exact_vs_bruteforce(spark, corpus):
    df = spark.createDataFrame(corpus[["url", "text"]])
    got = {
        (r["containee"], r["container"])
        for r in substring_dedup(df, w=W, winnow_k=WINNOW_K).collect()
    }
    norm = {u: normalize_text(t) for u, t in zip(corpus["url"], corpus["text"])}
    # ground truth restricted to the documented min-containee-length floor
    min_tokens = WINNOW_K + W - 1
    want = set()
    for a, ta in norm.items():
        if len(ta.split(" ")) < min_tokens:
            continue
        for b, tb in norm.items():
            if a != b and ta in tb:
                want.add((a, b))
    assert got == want
    assert len(want) > 0, "fixture must contain containment pairs"
