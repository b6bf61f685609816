"""Property tests for the round-12 kernels (any-length maximal repeats,
block-capped entity resolution), checked against independent driver-side
brute-force reimplementations over hypothesis-generated inputs — the
test_properties.py discipline."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from srm_etl_spark.operators.dedup import maximal_repeat_spans

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny alphabet so hypothesis actually produces cross-document duplicated
# windows instead of unique-everything corpora
_tok = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_tok, min_size=0, max_size=14)
_corpus = st.lists(_doc, min_size=1, max_size=6)

_L = 3  # window threshold for the property runs


def _ref_maximal_repeats(token_lists, L=_L):
    """Brute force: every substring occurrence of every length >= L, counted
    corpus-wide; per position the max duplicated length; spans = maximal
    runs of marked window starts."""
    occ_count: dict[tuple, int] = {}
    for toks in token_lists:
        n = len(toks)
        for s in range(n):
            for e in range(s + L, n + 1):
                occ_count[tuple(toks[s:e])] = occ_count.get(tuple(toks[s:e]), 0) + 1
    out = {}
    for did, toks in enumerate(token_lists):
        n = len(toks)
        duplen = {}
        for s in range(n - L + 1):
            best = 0
            for e in range(s + L, n + 1):
                if occ_count[tuple(toks[s:e])] >= 2:
                    best = e - s
            if best:
                duplen[s + 1] = best  # 1-based start
        # runs of consecutive marked starts
        starts = sorted(duplen)
        runs, cur = [], []
        for s in starts:
            if cur and s == cur[-1] + 1:
                cur.append(s)
            else:
                if cur:
                    runs.append(cur)
                cur = [s]
        if cur:
            runs.append(cur)
        for run in runs:
            out[(did, run[0])] = (
                run[-1] + L - 1,            # span_end
                len(run),                    # n_windows
                max(duplen[s] for s in run),  # max_repeat_tokens
            )
    return out


@settings(**_SETTINGS)
@given(_corpus)
def test_maximal_repeats_match_bruteforce(spark, corpus):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start): (r.span_end, r.n_windows, r.max_repeat_tokens)
        for r in maximal_repeat_spans(df, "text", "doc_id", min_tokens=_L).collect()
    }
    assert got == _ref_maximal_repeats(corpus)


_name = st.lists(st.sampled_from(["aa", "ab", "ba"]), min_size=1, max_size=3)


@settings(**_SETTINGS)
@given(st.lists(_name, min_size=1, max_size=12), st.integers(min_value=1, max_value=4))
def test_entity_resolution_cap_invariant(spark, names, cap):
    # The salted path must equal the plain path for EVERY corpus and EVERY
    # cap — including caps far below the largest block.
    from pyspark.sql import functions as F

    from srm_etl_spark.operators.relational import resolve_entities

    recs = spark.createDataFrame(
        [(i, " ".join(n)) for i, n in enumerate(names)],
        "record_id long, nm string",
    )
    blk = F.split(F.col("nm"), " ").getItem(0)
    plain = sorted(
        map(tuple, resolve_entities(recs, "nm", "record_id", blk, max_edits=1).collect())
    )
    capped = sorted(
        map(
            tuple,
            resolve_entities(
                recs, "nm", "record_id", blk, max_edits=1, max_block_size=cap
            ).collect(),
        )
    )
    assert plain == capped
