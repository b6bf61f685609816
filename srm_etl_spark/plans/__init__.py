"""Query plans: the engine's operator inventory exercised as runnable queries.

``REGISTRY`` maps query name -> QueryDef(spark, oracle, covers). Each Spark
callable takes (spark, sf_dir) and returns a DataFrame; ``oracle`` is the
equivalent ANSI SQL for DuckDB over the same parquet tables (None for ops SQL
can't express, which downgrade to a rows-only check).
"""

from .queries import REGISTRY, QueryDef  # noqa: F401
from .queries_ext import EXT_REGISTRY
from .queries_ext2 import EXT2_REGISTRY
from .queries_ext3 import EXT3_REGISTRY
from .queries_ext4 import EXT4_REGISTRY
from .queries_ext5 import EXT5_REGISTRY
from .queries_ext6 import EXT6_REGISTRY
from .queries_ext7 import EXT7_REGISTRY
from .queries_ext8 import EXT8_REGISTRY
from .queries_ext9 import EXT9_REGISTRY
from .queries_ext10 import EXT10_REGISTRY
from .queries_ext11 import EXT11_REGISTRY
from .queries_ext12 import EXT12_REGISTRY
from .queries_ext13 import EXT13_REGISTRY
from .queries_ext14 import EXT14_REGISTRY
from .queries_ext15 import EXT15_REGISTRY
from .queries_ext16 import EXT16_REGISTRY
from .queries_ext17 import EXT17_REGISTRY
from .queries_ext18 import EXT18_REGISTRY
from .queries_ext19 import EXT19_REGISTRY
from .queries_ext20 import EXT20_REGISTRY
from .queries_ext21 import EXT21_REGISTRY
from .queries_ext22 import EXT22_REGISTRY
from .queries_ext23 import EXT23_REGISTRY

REGISTRY.update(EXT_REGISTRY)
REGISTRY.update(EXT2_REGISTRY)
REGISTRY.update(EXT3_REGISTRY)
REGISTRY.update(EXT4_REGISTRY)
REGISTRY.update(EXT5_REGISTRY)
REGISTRY.update(EXT6_REGISTRY)
REGISTRY.update(EXT7_REGISTRY)
REGISTRY.update(EXT8_REGISTRY)
REGISTRY.update(EXT9_REGISTRY)
REGISTRY.update(EXT10_REGISTRY)
REGISTRY.update(EXT11_REGISTRY)
REGISTRY.update(EXT12_REGISTRY)
REGISTRY.update(EXT13_REGISTRY)
REGISTRY.update(EXT14_REGISTRY)
REGISTRY.update(EXT15_REGISTRY)
REGISTRY.update(EXT16_REGISTRY)
REGISTRY.update(EXT17_REGISTRY)
REGISTRY.update(EXT18_REGISTRY)
REGISTRY.update(EXT19_REGISTRY)
REGISTRY.update(EXT20_REGISTRY)
REGISTRY.update(EXT21_REGISTRY)
REGISTRY.update(EXT22_REGISTRY)
REGISTRY.update(EXT23_REGISTRY)

# Driver-window rotation, round 9: the driver's correctness gate only
# verifies the FIRST 50 registry entries. After round 8 every registry entry
# has been driver-gated at least once; from here the window rotates to the
# STALEST-gated queries each round. q06-q50 were last driver-gated in rounds
# 1-4 on much older trees (and the r8 float-mean/envelope fixes touched code
# under q31/q44's families), so this round re-gates that whole head (45
# queries), the three round-9 additions (q158 composed derive DAG, q159
# publish fan-out, q160 composed training-corpus pipeline — each new query
# displaces the newest forward-edge entry, per the standing rule), and the
# two next-stalest entries (q51-q52, round 4) as the forward edge of the
# next rotation. Displaced entries keep their committed local verification
# (CORRECTNESS_LOCAL_r9.txt, full-registry run from the final tree).
_WINDOW = [
    "q158_derive_staged",
    "q159_publish_fanout",
    "q160_training_corpus_staged",
    "q06_upsert_status",
    "q07_collect_set_join",
    "q08_count_per_key",
    "q09_two_level_agg",
    "q10_mode_priority",
    "q11_window_topk",
    "q12_group_count_window",
    "q13_latest_per_user",
    "q14_dedup_composite_key",
    "q15_union_parties",
    "q16_explode_tokens",
    "q17_sessionize",
    "q18_date_math",
    "q19_score_math",
    "q20_surrogate_ids",
    "q21_taxonomy_parents",
    "q22_exact_dedup",
    "q23_text_features",
    "q24_lang_id",
    "q25_fingerprint",
    "q26_minhash_dedup",
    "q27_simhash_pairs",
    "q28_jaccard_pairs",
    "q29_topk_cosine",
    "q30_lsh_topk",
    "q31_centroids",
    "q32_tumbling_window",
    "q33_filter_with_stats",
    "q34_derive_flat_branches",
    "q35_derive_cards",
    "q36_card_search",
    "q37_clean_contacts",
    "q38_fuzzy_nation_match",
    "q39_idf_scores",
    "q40_autocomplete_templates",
    "q41_json_props",
    "q42_geo_points",
    "q43_age_groups",
    "q44_enumerate_topn",
    "q45_embedding_near_dup",
    "q46_taxonomy_fix",
    "q47_sliding_window",
    "q48_asof_last_purchase",
    "q49_token_stats",
    "q50_salted_join_agg",
    "q51_upsert_diff",
    "q52_band_join",
]
assert len(_WINDOW) == 50 and all(n in REGISTRY for n in _WINDOW)
_ordered = {n: REGISTRY[n] for n in _WINDOW} | {
    n: REGISTRY[n] for n in REGISTRY if n not in _WINDOW
}
REGISTRY.clear()
REGISTRY.update(_ordered)
