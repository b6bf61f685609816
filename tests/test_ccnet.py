"""CCNet composition kernels (pipelines/ccnet.py, arXiv:1911.00359)."""

import pyspark.sql.functions as F
import pytest

from srm_etl_spark.pipelines.ccnet import (
    ccnet_buckets,
    paragraph_dedup,
    perplexity_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_keeper_and_reassembly(spark):
    # 4-token paragraphs for readability
    p1 = "a b c d"
    p2 = "e f g h"
    p3 = "i j k l"
    docs = _docs(
        spark,
        [
            (1, f"{p1} {p2}"),        # owns both (doc 1 is the min doc_id)
            (2, f"{p2} {p3}"),        # p2 is a corpus-wide dup -> dropped here
            (3, f"{p1}"),             # fully duplicated -> doc vanishes
            (4, ""),                  # zero tokens -> never appears
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, chunk=4).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == f"{p1} {p2}"
    # doc 2 keeps only its novel paragraph, reassembled in position order
    assert out[2]["n_chunks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == p3


def test_paragraph_dedup_tail_inclusive(spark):
    # 6 tokens with chunk=4 -> ceil(6/4)=2 windows; the 2-token tail is a
    # paragraph too (CCNet covers all text — q71's exact-window audit drops
    # tails, dedup must not)
    docs = _docs(spark, [(1, "a b c d e f")])
    row = paragraph_dedup(docs, chunk=4).collect()[0]
    assert row["n_chunks"] == 2 and row["kept_text"] == "a b c d e f"


def test_paragraph_dedup_within_doc_duplicates(spark):
    # the same paragraph twice in ONE document: the min-pos copy survives
    p = "x y z w"
    docs = _docs(spark, [(7, f"{p} {p}")])
    row = paragraph_dedup(docs, chunk=4).collect()[0]
    assert row["n_chunks"] == 2 and row["n_kept"] == 1
    assert row["kept_text"] == p


def test_perplexity_buckets_thresholds_and_ties(spark):
    scored = spark.createDataFrame(
        [
            # lang A: 6 docs, distinct scores -> terciles of 2/2/2
            ("A", 1, -1.0), ("A", 2, -2.0), ("A", 3, -3.0),
            ("A", 4, -4.0), ("A", 5, -5.0), ("A", 6, -6.0),
            # lang B: a 3-way tie straddling the head boundary -> the whole
            # tied group shares the bucket its threshold puts it in
            # (c_gt=0 < ceil(4/3)=2 -> all three are head), and the last doc
            # has c_gt=3 >= ceil(8/3)=3 -> tail
            ("B", 7, -1.5), ("B", 8, -1.5), ("B", 9, -1.5), ("B", 10, -9.0),
        ],
        "lang_pred string, doc_id long, avg_logprob double",
    )
    got = {r["doc_id"]: r["bucket"] for r in perplexity_buckets(scored).collect()}
    assert [got[i] for i in (1, 2, 3, 4, 5, 6)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    assert got[7] == got[8] == got[9] == "head" and got[10] == "tail"


def test_ccnet_buckets_end_to_end(spark):
    # three Hebrew docs (script-range lang-ID) + three English docs; one
    # English doc is a full duplicate of another and must vanish before
    # scoring — the dedup->langid->LM order is the point of the composition
    # scores must DIFFER per doc (ties share a bucket by design): doc 1 is a
    # pure repetition of one high-count bigram pair, doc 2 mixes it with
    # novel tokens, doc 3 is all-novel bigrams
    he = "שלום עולם טוב מאוד "
    docs = _docs(
        spark,
        [
            (1, "שלום עולם שלום עולם שלום עולם שלום עולם"),
            (2, (he + "אחד שתיים שלוש ארבע").strip()),
            (3, "חמש שש שבע שמונה תשע עשר"),
            (4, "the cat sat on the mat and the dog ran"),
            (5, "the cat sat on the mat and the dog ran"),  # dup of 4
            (6, "a completely different english sentence about the weather"),
        ],
    )
    out = {r["doc_id"]: r for r in ccnet_buckets(docs, chunk=4).collect()}
    assert 5 not in out  # every paragraph was owned by doc 4
    assert all(out[i]["lang_pred"] == "he" for i in (1, 2, 3))
    assert out[4]["lang_pred"] == "en" and out[6]["lang_pred"] == "en"
    # buckets partition per language: 3 Hebrew docs -> one per tercile
    assert sorted(out[i]["bucket"] for i in (1, 2, 3)) == ["head", "middle", "tail"]
    # doc 1 dedups against itself (repeated paragraph) -> fewer kept chunks
    assert out[1]["n_kept"] < out[1]["n_chunks"]


def test_bigram_scores_group_col_trains_independent_models(spark):
    from srm_etl_spark.functions.text import bigram_logprob_scores

    df = spark.createDataFrame(
        [
            (1, "g1", "a b a b a b"),
            (2, "g2", "a b c d e f"),
        ],
        "doc_id long, grp string, text string",
    )
    grouped = {
        r["doc_id"]: r
        for r in bigram_logprob_scores(df, "text", "doc_id", group_col="grp").collect()
    }
    assert grouped[1]["grp"] == "g1" and grouped[2]["grp"] == "g2"
    # g1's model sees only g1 text: V=2, c(a,b)=3, c_left(a)=3 -> P(b|a)=4/5
    # g1 bigrams: ab ba ab ba ab -> mean of ln(4/5)*3 and ln(3/4)*2... compute:
    import math

    lp_ab = math.log((3 + 1) / (3 + 2))
    lp_ba = math.log((2 + 1) / (2 + 2))
    want = round((3 * lp_ab + 2 * lp_ba) / 5, 4)
    assert grouped[1]["avg_logprob"] == pytest.approx(want, abs=1e-4)
    # the global (ungrouped) model mixes both docs' counts -> different score
    global_scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_logprob_scores(df, "text", "doc_id").collect()
    }
    assert global_scores[1] != grouped[1]["avg_logprob"]
