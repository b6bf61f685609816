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


def test_ivf_topk_probes_and_recall(spark, sf_dir):
    """IVF with nprobe=2 returns well-formed ranks and beats the probed-
    fraction recall floor. The synthetic embeddings are isotropic (labels are
    random, within-label cosine ≈ cross-label ≈ 0), so partition-based ANN
    can only recall ≈ nprobe/ncells (2/10) of the exact top-5 — the test
    checks the plumbing and that floor, not clustered-data recall."""
    from srm_etl_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ivf = ivf_topk(emb, queries, k=5, nprobe=2).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
    for qid, rows in per_q.items():
        ranks = sorted(rank for rank, _ in rows)
        assert ranks == list(range(1, len(rows) + 1)), f"{qid}: ranks {ranks}"
        assert qid not in {n for _, n in rows}

    exact = brute_force_topk(emb, queries, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid, want in exact_sets.items():
        got = {n for _, n in per_q.get(qid, [])}
        hits += len(want & got)
        total += len(want)
    assert hits / total >= 0.2, f"IVF recall {hits}/{total}"


def test_exact_rerank_orders_by_true_cosine(spark):
    from pyspark.sql import functions as F

    from srm_etl_spark.operators.similarity import exact_rerank

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (10, [0.9, 0.1]),
            (11, [0.5, 0.5]),
            (12, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") == 1)
    # shortlist deliberately ordered WRONG (by id): rerank must re-order by
    # true cosine and cut to k
    shortlist = spark.createDataFrame(
        [(1, 12), (1, 11), (1, 10)], "query_id long, neighbor_id long"
    )
    out = exact_rerank(shortlist, corpus, queries, k=2).collect()
    got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(10, 1), (11, 2)]


def test_assign_clusters_matrix_path_matches_literal(spark, monkeypatch):
    """The broadcast-matrix assignment (the k>128 codegen-knee fix) must be
    value-identical to the literal-inline path: same fold order, same
    (dist, cid) tie-break."""
    from srm_etl_spark.operators import similarity as S

    import random

    rnd = random.Random(7)
    cents = {i: [rnd.uniform(-1, 1) for _ in range(6)] for i in range(9)}
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(6)]) for i in range(300)]
    # duplicate one centroid to force an exact distance tie -> min-cid break
    cents[8] = list(cents[0])
    df = spark.createDataFrame(rows, "vec_id long, _v array<double>")
    lit = S.assign_clusters(df, cents).select("vec_id", "cluster").collect()
    monkeypatch.setattr(S, "ASSIGN_LITERAL_MAX_K", 0)
    mat = S.assign_clusters(df, cents).select("vec_id", "cluster").collect()
    assert sorted((r.vec_id, r.cluster) for r in lit) == sorted(
        (r.vec_id, r.cluster) for r in mat
    )


def test_kmeans_use_cache_false_bypasses_memo(spark):
    from srm_etl_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    a = S.kmeans(df, k=3, iterations=2)
    assert S._KMEANS_MEMO
    b = S.kmeans(df, k=3, iterations=2, use_cache=False)
    assert not S._KMEANS_MEMO
    assert sorted((r.vec_id, r.cluster) for r in a.collect()) == sorted(
        (r.vec_id, r.cluster) for r in b.collect()
    )
