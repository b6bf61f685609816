"""Unit tests for DSIR importance resampling (operators/dsir.py,
Xie et al. 2023). The full selection is oracle-gated as q164; these pin the
feature/bigram edges and the weight direction."""

from pyspark.sql import functions as F

from srm_etl_spark.operators.dsir import dsir_select, hashed_ngram_buckets


def test_hashed_ngram_buckets_counts(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "solo"), (3, ""), (4, None)],
        "id long, text string",
    )
    rows = hashed_ngram_buckets(df, "text", "id").collect()
    per_doc = {}
    for r in rows:
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + r["n"]
    # doc1: 3 unigrams + 2 bigrams; doc2: 1 unigram, no bigrams (the
    # sequence(1,0)-descends guard); empty/null docs contribute nothing
    assert per_doc == {1: 5, 2: 1}


def test_dsir_prefers_target_like_docs(spark):
    # target speaks "quantum physics"; raw has 3 on-topic docs among noise —
    # importance weights must rank the on-topic docs above the noise
    target = spark.createDataFrame(
        [(100 + i, "quantum physics entanglement qubit decoherence") for i in range(5)],
        "doc_id long, text string",
    )
    on_topic = [(i, "quantum physics qubit entanglement") for i in range(3)]
    noise = [(10 + i, f"cooking recipe flour sugar butter batch {i}") for i in range(20)]
    raw = spark.createDataFrame(on_topic + noise, "doc_id long, text string")
    out = dsir_select(raw, target, "text", "doc_id", k=3, num_buckets=64)
    got = out.collect()
    assert {r["id"] for r in got} == {0, 1, 2}
    # weights carry the evidence: on-topic docs score strictly above noise
    all_scored = dsir_select(raw, target, "text", "doc_id", k=23, num_buckets=64)
    w = {r["id"]: r["logw"] for r in all_scored.collect()}
    assert min(w[i] for i in (0, 1, 2)) > max(w[i] for i in w if i >= 10)


def test_dsir_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, f"token{i % 7} token{i % 5} token{i % 3}") for i in range(60)],
        "doc_id long, text string",
    )
    tgt = docs.filter(F.col("doc_id") % 6 == 0)
    raw = docs.filter(F.col("doc_id") % 6 != 0)
    a = sorted(tuple(r) for r in dsir_select(raw, tgt, "text", "doc_id", k=10).collect())
    b = sorted(tuple(r) for r in dsir_select(raw, tgt, "text", "doc_id", k=10).collect())
    assert a == b  # hash-derived Gumbel: the draw is a pure function of ids
