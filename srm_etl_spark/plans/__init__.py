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
from .queries_ext24 import EXT24_REGISTRY

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
REGISTRY.update(EXT24_REGISTRY)

# Driver-window rotation, round 10: the gate verifies the FIRST 50 registry
# entries. This round's window = the three NEW composed certifications (q161
# five-index ES publish, q162 mapbox geo flow, q163 OSM place-bounds twin),
# the two queries whose code changed this round (q159 gained
# organization_kind + the reference's true index set; q117/q157 gained the
# checkpoint-recovery hook — q157 rides the q150-q157 band), and the
# stalest-gated bands the round-9 verdict prescribed: q53-q77 (r7-era gates)
# and q126-q137 + q150-q156 (rounds 5-8). Displaced entries keep their
# committed local verification (CORRECTNESS_LOCAL_r10.txt, full-registry run
# from the final tree). q164 (DSIR, added mid-round) displaces q150_deploy
# (r8-gated — the least-stale member) per the standing displacement rule.
_WINDOW = [
    "q161_es_publish_surfaces",
    "q162_mapbox_geo_flow",
    "q163_place_bounds",
    "q159_publish_fanout",
    "q117_late_data_drops",
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
    "q74_autocomplete_flow",
    "q75_card_surface",
    "q76_sequence_packing",
    "q77_bm25_search",
    "q126_entities_org_enrich",
    "q127_entities_branches",
    "q128_entities_services",
    "q129_entities_staged",
    "q130_entities_unknown_tags",
    "q131_meser_sanitize",
    "q132_meser_transform",
    "q133_meser_staged",
    "q134_external_mde",
    "q135_curation_import",
    "q136_entities_incremental",
    "q137_meser_streaming_staging",
    "q164_dsir_selection",
    "q151_dym_rerank",
    "q152_homepage_query",
    "q153_es_revision_swap",
    "q154_backup_package",
    "q155_bpe_priority_vocab",
    "q156_ivf_partitioned",
    "q157_stream_dedup",
]
assert len(_WINDOW) == 50 and all(n in REGISTRY for n in _WINDOW)
_ordered = {n: REGISTRY[n] for n in _WINDOW} | {
    n: REGISTRY[n] for n in REGISTRY if n not in _WINDOW
}
REGISTRY.clear()
REGISTRY.update(_ordered)
