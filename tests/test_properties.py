"""Property tests (SURVEY §5 implication b): the exact-semantics kernels —
the functions every downstream id and golden hash depends on — checked
against independent driver-side reimplementations of the *reference's*
semantics over hypothesis-generated inputs.

Each example batches all generated rows into one DataFrame (one Spark job
per example, not per row); max_examples is kept small because a local Spark
job costs ~10² ms.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from srm_etl_spark.functions.hashing import hasher, hasher_py
from srm_etl_spark.functions.taxonomy import update_taxonomy_with_parents

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_txt = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
    max_size=12,
)


def _parents_ref(ids):
    """Reference helpers.py:100-107, reimplemented independently."""
    ret = set()
    for i in ids:
        parts = i.split(":")
        for n in range(2, len(parts) + 1):
            ret.add(":".join(parts[:n]))
    return sorted(ret)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(_txt | st.none(), _txt | st.none(), _txt | st.none()), min_size=1, max_size=20))
def test_hasher_matches_reference_bytes(spark, rows):
    """Spark hasher == sha1(utf8 concat of non-null args)[:8] for arbitrary
    unicode and null patterns (reference srm_tools/hash.py:4-6)."""
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [r.h for r in df.select(hasher("a", "b", "c").alias("h")).collect()]
    want = [
        hashlib.sha1("".join(v for v in row if v).encode("utf-8")).hexdigest()[:8]
        for row in rows
    ]
    assert got == want
    # driver twin agrees with itself and with the column expression
    assert [hasher_py(*row) for row in rows] == want


_seg = st.text(alphabet="abcxyz_", min_size=0, max_size=4)
_tax_id = st.builds(lambda segs: ":".join(segs), st.lists(_seg, min_size=1, max_size=4))


@settings(**_SETTINGS)
@given(st.lists(st.lists(_tax_id, max_size=6), min_size=1, max_size=15))
def test_taxonomy_parent_expansion_matches_reference(spark, id_lists):
    """Prefix expansion == the reference's set-union-sorted semantics for
    arbitrary segment shapes incl. empty segments and 1-segment ids
    (reference helpers.py:100-107)."""
    df = spark.createDataFrame([(ids,) for ids in id_lists], "ids array<string>")
    got = [
        r.out
        for r in df.select(
            update_taxonomy_with_parents(F.col("ids")).alias("out")
        ).collect()
    ]
    assert got == [_parents_ref(ids) for ids in id_lists]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(_txt | st.none(), _txt | st.none()),
        min_size=1,
        max_size=20,
    )
)
def test_hash_row_is_whitespace_insensitive_and_field_sensitive(spark, rows):
    """Change-hash invariants (reference update_table.py:28-32): injected
    whitespace never changes the hash; changing a tracked field's non-space
    content always does."""
    from srm_etl_spark.functions.hashing import hash_row

    df = spark.createDataFrame(
        [(a, b, "s", "ACTIVE") for a, b in rows],
        "a string, b string, source string, status string",
    )
    base = [r.h for r in df.select(hash_row(["a", "b"]).alias("h")).collect()]
    # inject whitespace only into non-null values: a NULL field contributes
    # no ### slot at all (concat_ws skips nulls), so NULL -> ' ' would change
    # the field's presence, not its whitespace
    spaced = df.select(
        F.when(
            F.col("a").isNotNull(), F.concat(F.lit(" "), F.col("a"), F.lit("\t "))
        ).alias("a"),
        "b", "source", "status",
    )
    got_spaced = [r.h for r in spaced.select(hash_row(["a", "b"]).alias("h")).collect()]
    assert got_spaced == base  # whitespace stripped before hashing
    changed = df.select(
        F.concat_ws("", F.col("a"), F.lit("Z")).alias("a"), "b", "source", "status"
    )
    got_changed = [r.h for r in changed.select(hash_row(["a", "b"]).alias("h")).collect()]
    assert all(g != b for g, b in zip(got_changed, base))


# --- chunking invariants (operators/chunking.py) -----------------------------

@settings(**_SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=8),
)
def test_chunking_covers_every_token_exactly(spark, n_tokens_per_doc, chunk_tokens, stride):
    from srm_etl_spark.operators.chunking import chunk_documents

    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)) if n else "")
        for i, n in enumerate(n_tokens_per_doc)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk_tokens, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(n_tokens_per_doc):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_start)
        if n == 0:
            assert chunks == []
            continue
        # every token index 1..n appears in at least one window
        covered = set()
        for r in chunks:
            assert 1 <= r.chunk_start <= n
            assert r.n_chunk_tokens == min(chunk_tokens, n - r.chunk_start + 1)
            assert len(r.chunk_text.split(" ")) == r.n_chunk_tokens
            covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
        assert covered == set(range(1, n + 1)) or stride > chunk_tokens
        # starts advance by exactly the stride
        starts = [r.chunk_start for r in chunks]
        assert starts == list(range(1, n + 1, stride))


# --- quantization error bound (operators/similarity.py) ---------------------

@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_quantization_per_component_error_bound(spark, vecs):
    from srm_etl_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    for i, v in enumerate(vecs):
        r = out[i]
        assert all(-127 <= q <= 127 for q in r.qvec)
        if all(x == 0 for x in v):
            assert r.scale == 0.0 and r.mse == 0.0 and all(q == 0 for q in r.qvec)
            continue
        # per-component quantization error bound => mse bound
        assert r.mse <= (0.5 / r.scale) ** 2 + 1e-9
        # round-trip: dequantized values reproduce the input within the bound
        for x, q in zip(v, r.qvec):
            assert abs(x - q / r.scale) <= 0.5 / r.scale + 1e-9


def _spans_ref(docs, L):
    """Independent brute-force of duplicate_substring_spans' contract:
    hash every L-token window, mark positions of windows seen >= 2 times
    anywhere, coalesce marked starts into islands (gap > L breaks)."""
    from collections import Counter

    wins = {}  # doc_id -> [(1-based start, key)] — the operator's convention
    counts = Counter()
    for doc_id, toks in docs:
        ws = [(s + 1, " ".join(toks[s : s + L])) for s in range(len(toks) - L + 1)]
        wins[doc_id] = ws
        for _, k in ws:
            counts[k] += 1
    out = []
    for doc_id, ws in wins.items():
        marked = sorted(s for s, k in ws if counts[k] >= 2)
        island = []
        for s in marked:
            if island and s - island[-1] > L:
                out.append((doc_id, island))
                island = []
            island.append(s)
        if island:
            out.append((doc_id, island))
    return sorted(
        (d, i[0], i[-1] + L - 1, i[-1] + L - i[0], len(i)) for d, i in out
    )


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_substring_spans_match_bruteforce(spark, token_lists):
    from srm_etl_spark.operators.dedup import duplicate_substring_spans

    L = 4
    docs = [(i, toks) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_windows)
        for r in duplicate_substring_spans(df, "text", "doc_id", min_tokens=L).collect()
    )
    assert got == _spans_ref(docs, L)


# first component bounded away from 0 by construction (a list-level
# .filter() here intermittently trips hypothesis's filter_too_much health
# check in long suite runs), so every vector has a nonzero norm
_nonzero_vec = st.tuples(
    st.floats(0.001, 1, allow_nan=False), st.floats(-1, 1, allow_nan=False)
) | st.tuples(
    st.floats(-1, -0.001, allow_nan=False), st.floats(-1, 1, allow_nan=False)
)


@settings(**_SETTINGS)
@given(st.lists(_nonzero_vec, min_size=2, max_size=10))
def test_semantic_dedup_greedy_rule(spark, vecs):
    """kept == no smaller-id cluster-mate at cosine >= tau — checked against
    the operator's own cluster assignment with an independent numpy cosine."""
    import numpy as np

    from srm_etl_spark.operators.dedup import semantic_dedup

    tau = 0.9
    df = spark.createDataFrame(
        [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    rows = semantic_dedup(df, "embedding", "vec_id", k=2, iterations=2, threshold=tau).collect()
    cluster = {r.vec_id: r.cluster for r in rows}
    kept = {r.vec_id: r.kept for r in rows}
    mat = np.array([[a, b] for a, b in vecs], dtype=np.float64)
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = unit @ unit.T
    for i in range(len(vecs)):
        has_smaller_mate = any(
            j < i and cluster[j] == cluster[i] and sims[i, j] >= tau
            for j in range(i)
        )
        assert kept[i] == (not has_smaller_mate), f"vec {i}"


@settings(**_SETTINGS)
@given(st.integers(2, 8))
def test_resolve_entities_variants_always_cluster(spark, n_entities):
    """Each entity's 3 corrupted records resolve to one entity; distinct
    first-token blocks never merge across entities."""
    from srm_etl_spark.operators.relational import resolve_entities

    rows = []
    for i in range(n_entities):
        base = f"org{i} unit alpha"
        rows += [
            (i * 4, base),
            (i * 4 + 1, base),            # exact dup
            (i * 4 + 2, base[:-1]),       # 1-edit typo
        ]
    recs = spark.createDataFrame(rows, "record_id long, nm string")
    blk = F.split(F.col("nm"), " ").getItem(0)
    out = resolve_entities(recs, "nm", "record_id", blk, max_edits=2).collect()
    by_entity = {}
    for r in out:
        by_entity.setdefault(r.entity_id, set()).add(r.record_id)
    assert len(out) == 3 * n_entities
    assert sorted(by_entity) == [i * 4 for i in range(n_entities)]
    for i in range(n_entities):
        assert by_entity[i * 4] == {i * 4, i * 4 + 1, i * 4 + 2}


def _bpe_priority_ref(word: str, merges) -> list[str]:
    """Independent driver-side reimplementation of the q155 kernel's pinned
    semantics: repeatedly merge the LEFTMOST occurrence of the LOWEST-ranked
    adjacent pair until none is in the table."""
    ranks = {p: i for i, p in enumerate(merges)}
    parts = list(word)
    while len(parts) > 1:
        best = None
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, i)
        if best is None:
            break
        i = best[1]
        parts[i : i + 2] = [parts[i] + parts[i + 1]]
    return parts


_bpe_alpha = st.text(alphabet="lehot", min_size=1, max_size=10)


@settings(**_SETTINGS)
@given(
    st.lists(_bpe_alpha, min_size=1, max_size=12),
    st.lists(
        st.tuples(st.sampled_from(["l", "e", "h", "o", "t", "ll", "th", "he"]),
                  st.sampled_from(["l", "e", "h", "o", "t", "ll", "th", "he"])),
        min_size=1, max_size=8, unique=True,
    ),
)
def test_bpe_priority_kernel_matches_reference(spark, words, merges):
    """The Arrow kernel == the driver-side reference for ARBITRARY merge
    tables (same-pair, stacked, shadowed rules included), and every word's
    tokens concatenate back to the word."""
    from srm_etl_spark.functions.text import bpe_tokens_priority

    merges = tuple(merges)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, w string")
    got = {
        r.i: r.toks
        for r in df.select("i", bpe_tokens_priority(F.col("w"), merges).alias("toks")).collect()
    }
    for i, w in enumerate(words):
        assert got[i] == _bpe_priority_ref(w, merges), (w, merges)
        assert "".join(got[i]) == w


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.tuples(st.integers(0, 9), st.integers(0, 99)), min_size=1, max_size=8),
        min_size=1, max_size=3,
    )
)
def test_es_replay_is_last_write_wins(spark, publishes):
    """replay_index_state == a dict replay of the same publishes: per _id the
    LAST publish's doc wins, regardless of spool file layout."""
    import tempfile

    from srm_etl_spark.sinks.es import publish, replay_index_state, spool_ship

    expect: dict = {}
    spools = []
    for seq, docs in enumerate(publishes, start=1):
        # dedup ids within one publish (real payloads are keyed frames)
        dedup = {i: v for i, v in docs}
        df = spark.createDataFrame(
            [(i, v) for i, v in dedup.items()], "doc_id long, v long"
        )
        spool = tempfile.mkdtemp(prefix=f"es_prop_{seq}_")
        publish(df, "idx", "doc_id", spool_ship(spool), lambda i, b: None,
                revision=f"r{seq}", settle_seconds=0)
        spools.append((seq, spool))
        for i, v in dedup.items():
            expect[i] = (v, f"r{seq}")
    got = {
        r.doc_id: (r.v, r.revision)
        for r in replay_index_state(spark, spools, "doc_id long, v long, revision string").collect()
    }
    assert got == expect
