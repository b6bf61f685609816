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

# Driver-window rotation, round 7: the driver's correctness gate only
# verifies the FIRST 50 registry entries. Rounds 1-6 gated 62 distinct
# queries (q01-q50 + the r5/r6 verticals q126-q137); this round rotates a
# full window of 50 NEVER-yet-driver-gated queries into the head — the new
# q138-q152, the q74/q75/q93 heavyweights, then q51-q83/q88 in registry
# order. Displaced entries keep their committed local verification
# (CORRECTNESS_LOCAL_r7.txt); the remaining never-gated tail — q84-q87,
# q89-q92, q94-q125 — rotates in next round.
_WINDOW = [
    "q138_branch_sources",
    "q139_click_scrape",
    "q140_manual_fixes",
    "q141_manual_fix_status",
    "q142_mhc_branches",
    "q143_mhc_services",
    "q144_daycare_branches",
    "q145_daycare_orgs",
    "q146_childcare_services",
    "q147_kz_orgs",
    "q74_autocomplete_flow",
    "q75_card_surface",
    "q93_incremental_cards",
    "q51_upsert_diff",
    "q52_band_join",
    "q53_stream_tumbling",
    "q54_multimodal_decode",
    "q55_percentiles",
    "q56_rollup_revenue",
    "q57_html_text_clean",
    "q58_address_parts",
    "q59_implements_merge",
    "q60_stream_running_totals",
    "q61_ivf_topk",
    "q62_dup_clusters",
    "q63_sketch_agg",
    "q64_stream_join",
    "q65_redact_pii",
    "q66_quality_flags",
    "q67_repetition_stats",
    "q68_stratified_sample",
    "q69_bloom_semi_join",
    "q70_zorder_key",
    "q71_passage_dedup",
    "q72_bigram_stats",
    "q73_stream_enrich",
    "q76_sequence_packing",
    "q77_bm25_search",
    "q78_curation_funnel",
    "q79_incremental_dedup",
    "q80_decontamination",
    "q81_source_quota",
    "q82_pagerank",
    "q83_kmeans",
    "q88_stream_sessions",
    "q148_mp4_keyframes",
    "q149_curation_with_fixes",
    "q150_deploy",
    "q151_dym_rerank",
    "q152_homepage_query",
]
assert len(_WINDOW) == 50 and all(n in REGISTRY for n in _WINDOW)
_ordered = {n: REGISTRY[n] for n in _WINDOW} | {
    n: REGISTRY[n] for n in REGISTRY if n not in _WINDOW
}
REGISTRY.clear()
REGISTRY.update(_ordered)
