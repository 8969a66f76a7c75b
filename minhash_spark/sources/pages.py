"""Deterministic synthetic Common-Crawl-style corpus with injected duplicate
structure, per FIXTURES.md — the pipeline-level analog of the reference's
synthetic integer-range test inputs (/root/reference/test/test_serial.c:66-68,
test/test_parallel_lock.c:86-98).

Schema is exactly the BASELINE.json input_hint shape:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Ground truth is emitted alongside as truth_pairs(url_a, url_b, kind) and
truth_clusters(url, cluster_id, kind). Everything derives from one seed; no
external data.

The writer targets an Iceberg table when an Iceberg catalog is configured on
the session, falling back to date-partitioned Parquet (this sandbox has no
Iceberg runtime jar — SURVEY.md §7 risk (d)). Both paths give partition
pruning on `ds`.
"""

from __future__ import annotations

import datetime as _dt
import itertools

import numpy as np
import pandas as pd


_EPOCH = _dt.datetime(2026, 1, 1)

# Mix fractions of the corpus (FIXTURES.md §2). Remainder is unique docs.
_MIX = {
    "exact": 0.08,
    "near": 0.20,
    "near_identical": 0.07,
    "contained": 0.05,
    "boilerplate": 0.05,
}

_PUNCT = [",", ".", ";", ":", "!", "?"]


def _vocab(rng: np.random.Generator, n: int = 5000) -> np.ndarray:
    # pronounceable-ish deterministic tokens: cv syllables
    cons = list("bcdfghjklmnpqrstvwz")
    vows = list("aeiou")
    words = []
    for i in range(n):
        k = 2 + (i % 3)
        s = "".join(
            cons[(i * 7 + j * 13) % len(cons)] + vows[(i * 11 + j * 5) % len(vows)]
            for j in range(k)
        )
        words.append(s + str(i % 10))
    return np.array(words)


def _base_doc(rng: np.random.Generator, vocab: np.ndarray) -> list[str]:
    n = int(rng.integers(50, 400))
    return list(rng.choice(vocab, size=n))


def _near_variant(rng, vocab, tokens: list[str]) -> list[str]:
    """1–5% token substitutions/deletions — MinHash+LSH path."""
    out = list(tokens)
    p = rng.uniform(0.01, 0.05)
    for i in range(len(out)):
        r = rng.random()
        if r < p * 0.8:
            out[i] = str(rng.choice(vocab))
        elif r < p:
            out[i] = ""
    return [t for t in out if t]


def _punct_variant(rng, tokens: list[str]) -> list[str]:
    """Punctuation-only edits (survive whitespace/case normalization) —
    SimHash / near-identical path. ~1% of tokens touched: the realistic
    "same page, tiny punctuation drift" case, which lands within the
    standard 64-bit/hamming≤3 SimHash envelope."""
    out = []
    for t in tokens:
        if rng.random() < 0.01:
            out.append(t + str(rng.choice(_PUNCT)))
        else:
            out.append(t)
    return out


def _contained_variant(rng, vocab, tokens: list[str]) -> list[str]:
    """Base doc embedded verbatim inside a longer doc — suffix-array path."""
    pre = list(rng.choice(vocab, size=int(rng.integers(30, 120))))
    post = list(rng.choice(vocab, size=int(rng.integers(30, 120))))
    return pre + list(tokens) + post


def generate_corpus(
    n_pages: int = 1000, seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Returns (pages, truth_pairs, truth_clusters) as pandas DataFrames."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)

    docs: list[tuple[str, str, str]] = []  # (text, kind, cluster)
    cluster_seq = itertools.count()

    def emit_cluster(kind: str, texts: list[list[str]]):
        cid = f"c{next(cluster_seq):06d}"
        for toks in texts:
            docs.append((" ".join(toks), kind, cid))

    budget = {k: int(n_pages * f) for k, f in _MIX.items()}

    # boilerplate: ONE big cluster sharing a template with tiny edits —
    # the adversarial band-key skew fixture (SURVEY.md §7 hard part (e)).
    if budget["boilerplate"] >= 2:
        template = _base_doc(rng, vocab)
        while len(template) < 200:
            template += _base_doc(rng, vocab)
        members = []
        for _ in range(budget["boilerplate"]):
            t = list(template)
            for _ in range(int(rng.integers(1, 4))):
                t[int(rng.integers(0, len(t)))] = str(rng.choice(vocab))
            members.append(t)
        emit_cluster("boilerplate", members)

    def zipf_cluster_size() -> int:
        # sizes 2..40, heavy on 2-3, occasional large
        return min(40, 2 + int(rng.zipf(2.2)) - 1)

    for kind in ("exact", "near", "near_identical", "contained"):
        remaining = budget[kind]
        while remaining >= 2:
            size = min(zipf_cluster_size(), remaining)
            base = _base_doc(rng, vocab)
            texts = [base]
            for _ in range(size - 1):
                if kind == "exact":
                    texts.append(list(base))
                elif kind == "near":
                    texts.append(_near_variant(rng, vocab, base))
                elif kind == "near_identical":
                    texts.append(_punct_variant(rng, base))
                else:
                    texts.append(_contained_variant(rng, vocab, base))
            emit_cluster(kind, texts)
            remaining -= size

    while len(docs) < n_pages:
        docs.append((" ".join(_base_doc(rng, vocab)), "unique", None))
    docs = docs[:n_pages]

    # deterministic shuffle so clusters aren't contiguous on disk
    order = rng.permutation(len(docs))
    docs = [docs[i] for i in order]

    langs = rng.choice(["en", "de", "fr"], size=len(docs), p=[0.9, 0.05, 0.05])
    rows = []
    truth_rows = []
    for i, (text, kind, cid) in enumerate(docs):
        url = f"https://site{i % 97}.example/p/{i}"
        ts = _EPOCH + _dt.timedelta(seconds=int(i) * 137)
        html = ("<html><body>" + text + "</body></html>").encode("utf-8")
        rows.append((url, ts, html, text, str(langs[i])))
        if cid is not None:
            truth_rows.append((url, cid, kind))

    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    truth_clusters = pd.DataFrame(truth_rows, columns=["url", "cluster_id", "kind"])

    pair_rows = []
    for cid, grp in truth_clusters.groupby("cluster_id"):
        urls = sorted(grp["url"])
        kind = grp["kind"].iloc[0]
        for a, b in itertools.combinations(urls, 2):
            pair_rows.append((a, b, kind))
    truth_pairs = pd.DataFrame(pair_rows, columns=["url_a", "url_b", "kind"])
    return pages, truth_pairs, truth_clusters


def write_pages(spark, pages_pdf: pd.DataFrame, path: str) -> None:
    """Write the pages table date-partitioned for partition pruning.

    Iceberg first (`path` treated as a table identifier when an Iceberg
    catalog is configured), Parquet directory fallback otherwise.
    """
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pages_pdf).withColumn(
        "ds", F.date_format("warc_ts", "yyyy-MM-dd")
    )
    try:
        if "." in path and spark.conf.get(
            f"spark.sql.catalog.{path.split('.')[0]}", None
        ):
            df.writeTo(path).partitionedBy("ds").createOrReplace()
            return
    except Exception:
        pass
    df.write.mode("overwrite").partitionBy("ds").parquet(path)


def read_pages(spark, path: str):
    try:
        if "." in path and spark.conf.get(
            f"spark.sql.catalog.{path.split('.')[0]}", None
        ):
            return spark.read.table(path)
    except Exception:
        pass
    return spark.read.parquet(path)
