"""The vectorized (Arrow/numpy) top-k must agree exactly with the expression
(HOF) top-k — same neighbors, same ranks, cosines equal to float tolerance."""

from pyspark.sql import functions as F

from srm_etl_spark.operators.similarity import brute_force_topk, brute_force_topk_arrow
from srm_etl_spark.sources.tables import load_table


def test_arrow_topk_matches_hof(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    hof = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    arrow = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in brute_force_topk_arrow(emb, queries, k=5).collect()
    }
    assert set(hof) == set(arrow)
    for key, (n_hof, c_hof) in hof.items():
        n_arr, c_arr = arrow[key]
        assert n_hof == n_arr, f"{key}: neighbor {n_hof} != {n_arr}"
        # BLAS matmul vs sequential fold: same math, different summation order
        assert abs(c_hof - c_arr) < 1e-8
