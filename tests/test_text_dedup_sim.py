"""Unit tests for the parts oracle queries can't cover: analyzer unicode
parity, html2text on dirty input, simhash/jaccard properties, IVF recall
vs brute force, rolling hash determinism."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.analyze import (
    normalize_series,
    tokenize_series,
)
from deces_dataprep_spark.sources.html2text import extract_text


def test_analyzer_unicode_parity():
    """The pandas path implements the full ES chain (asciifold) —
    byte-identical fold of accents/punct/case."""
    s = pd.Series(["Café DÉCÈS — naïve/über?  Ångström21", None, "", "---"])
    toks = tokenize_series(s)
    assert toks.iloc[0] == ["cafe", "deces", "naive", "uber", "angstrom21"]
    assert toks.iloc[1] is None
    assert toks.iloc[2] == []
    assert toks.iloc[3] == []
    assert normalize_series(pd.Series(["  D'Arc—Jeanne "])).iloc[0] == "d arc jeanne"


def test_html2text_dirty_input():
    html = (
        b"<html><head><title>T</title><style>p{x}</style>"
        b"<script>var a=1;</script></head>"
        b"<body><!-- c --><p>Hello&nbsp;<b>world</b></p><div>l2</div></body></html>"
    )
    out = extract_text(html)
    assert "var a" not in out and "p{x}" not in out and "c" not in out.split()
    assert out.splitlines()[0] == "T"
    assert "Hello" in out and "world" in out and "l2" in out


def test_html2text_byte_stable():
    html = "<p>café — décès</p>".encode()
    assert extract_text(html) == extract_text(html) == "café — décès"


def test_jaccard_known_sets(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w v")],
        "doc_id long, text string",
    )
    from deces_dataprep_spark.operators.dedup import jaccard_pairs

    # 3-shingles: doc1 {abc,bcd,cde}, doc2 {abc,bcd,cdf} → J = 2/4 = 0.5
    rows = jaccard_pairs(df, n=3).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert got == {(1, 2): 0.5}


def test_simhash_properties(spark):
    from deces_dataprep_spark.operators.dedup import simhash, simhash_near_pairs

    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely different content about spark shuffles and parquet files"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, far)], "doc_id long, text string"
    )
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    assert sh[1] == sh[2]  # identical text → identical simhash
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             simhash_near_pairs(df, max_hamming=max(ham_near, 1)).collect()}
    assert (1, 2) in pairs


def test_ivf_recall_vs_brute_force(spark):
    from deces_dataprep_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 3).collect()[0]["embedding"])
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    approx_all = {r["vec_id"]
                  for r in ivf_topk(emb, cents, q, k=10, n_probe=16).collect()}
    # probing every bucket must recover exact top-k (sanity of the plan)
    assert approx_all == exact
    approx = {r["vec_id"] for r in ivf_topk(emb, cents, q, k=10, n_probe=4).collect()}
    recall = len(approx & exact) / 10
    assert recall >= 0.3  # partial probe trades recall for 4/16 of the scan


def test_rolling_hash_order_sensitive(spark):
    from deces_dataprep_spark.functions.text import rolling_hash_udf
    from deces_dataprep_spark.functions.analyze import tokens_col

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["h"] for r in df.select(
        "doc_id", rolling_hash_udf(tokens_col("text")).alias("h")).collect()}
    assert out[1] == out[3]
    assert out[1] != out[2]  # order matters (unlike doc_fingerprint)


def test_near_dup_clusters_transitive(spark):
    """Connected components: A~B, B~C, C~D chain collapses to one
    cluster labeled by the min id; disjoint pairs stay separate."""
    from deces_dataprep_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (11, 12)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in near_dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_embedding_near_dups_lsh_recall(spark):
    """Sign-LSH near-dup path: exact-duplicate vectors collide in every
    band (angle 0), so recall on injected dups must be 1.0 and every
    reported pair must also pass the exact brute-force baseline."""
    from deces_dataprep_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dups,
    )
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dups = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000))
    both = emb.unionByName(dups)
    dim = len(emb.first()["embedding"])

    exact = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup_pairs(both, 0.99).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in embedding_near_dups(both, dim, 0.99).collect()}
    assert lsh <= exact            # verified candidates never over-report
    injected = {(r["vec_id"], r["vec_id"] + 1_000_000)
                for r in emb.filter(F.col("vec_id") % 10 == 0).collect()}
    assert injected <= lsh          # identical vectors: recall 1.0
    assert injected <= exact


def test_fast_minhash_lsh_recall(spark):
    """The numeric fast-minhash path: identical docs get identical
    signatures, so every injected exact dup must surface as an LSH
    candidate pair (recall 1.0 on dups), and signatures are stable."""
    import pyspark.sql.functions as F

    from deces_dataprep_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_fast,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000))
    both = docs.unionByName(dups)

    pairs = {(r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(
        both, n_hashes=8, bands=4, hash_fn="fast").collect()}
    injected = {(r["doc_id"], r["doc_id"] + 1_000_000)
                for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    assert injected <= pairs

    # determinism: two evaluations give identical signatures
    s1 = {r["doc_id"]: tuple(r[f"mh_{j}"] for j in range(8))
          for r in minhash_signatures_fast(docs, 8).collect()}
    s2 = {r["doc_id"]: tuple(r[f"mh_{j}"] for j in range(8))
          for r in minhash_signatures_fast(docs, 8).collect()}
    assert s1 == s2
    # short docs (< n tokens) get NULL signatures
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    r = minhash_signatures_fast(tiny, 4).collect()[0]
    assert all(r[f"mh_{j}"] is None for j in range(4))


def test_lsh_verified_jaccard_precision_and_dup_recall(spark):
    """LSH-gated exact-Jaccard verify: a subset of the exact pairwise
    result (precision 1.0), with recall 1.0 on injected exact dups
    (identical signatures collide in every band)."""
    import pyspark.sql.functions as F

    from deces_dataprep_spark.operators.dedup import (
        jaccard_pairs,
        lsh_verified_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000))
    both = docs.unionByName(dups)

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs(both, n=3, min_jaccard=0.5).collect()}
    gated = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in lsh_verified_jaccard_pairs(both, 0.5).collect()}
    assert set(gated) <= set(exact)
    for k, v in gated.items():
        assert v == pytest.approx(exact[k], abs=1e-9)
    injected = {(r["doc_id"], r["doc_id"] + 1_000_000)
                for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    assert injected <= set(gated)


def test_simhash_band_bucket_cap_on_degenerate_corpus(spark):
    """A web corpus full of identical/boilerplate docs collapses to one
    simhash value → one band bucket. The max_bucket guard must drop the
    oversized bucket (bounding the would-be quadratic join) while still
    finding pairs among the docs that clear it."""
    from deces_dataprep_spark.operators.dedup import simhash_near_pairs

    n_same = 2000  # 2000 identical docs would be ~2M uncapped pairs
    same = [(i, "lorem ipsum boilerplate footer text") for i in range(n_same)]
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy")
    df = spark.createDataFrame(
        same + [(100001, base), (100002, base), (100003, near)],
        "doc_id long, text string",
    )
    pairs = simhash_near_pairs(df, max_hamming=8, max_bucket=100).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # every boilerplate pair lives in a >100-strong bucket → dropped
    assert not any(a < n_same for a, _ in got)
    # the small clique is unaffected by the cap
    assert (100001, 100002) in got and (100001, 100003) in got
    # and with the cap above the clique size the pairs come back
    some = simhash_near_pairs(
        df.filter(F.col("doc_id") < 50), max_hamming=0, max_bucket=5000
    ).count()
    assert some == 50 * 49 // 2
