"""Registry-wide physical-plan linter.

Builds the physical plan of every query in the registry at sf0.01 and greps
it for the anti-patterns that are invisible at test scale and catastrophic at
100 TB:

- ``CartesianProduct``          — both sides replicated everywhere; never OK.
- ``BatchEvalPython``           — row-at-a-time Python UDF in the plan; the
                                  engine's contract is Arrow-batched Python
                                  only (``ArrowEvalPython`` / ``MapInPandas``
                                  / ``FlatMapGroupsInPandas`` are allowed).
- ``Exchange SinglePartition``  — a global funnel; only allowed where a
                                  query's semantics genuinely need it
                                  (global top-N / single-row aggregates /
                                  tiny normalization frames), whitelisted
                                  per query below.

Also emits per-query counters (exchanges, broadcasts, pushed filters) so
plan drift between rounds is diffable in git. ``exchanges``/``broadcasts``
keep the historical basis (regex over the formatted explain, which lists
every node twice — tree + details — and re-prints a persisted frame's
build lineage under every InMemoryTableScan occurrence, so multi-consumer
persists inflate it). ``rt_exchanges``/``rt_broadcasts`` count
runtime-reachable nodes on the executed-plan tree with cached-build
subtrees pruned: what actually executes per action once the persist is
warm.

Known counter artifact (counters only — the anti-pattern FLAGS are
unaffected): a query whose CONSTRUCTION materializes a cache prints that
cache's build lineage as a MATERIALIZED AdaptiveSparkPlan whose
Final/Initial sections drop the enclosing indentation rails, defeating the
depth-based cached-subtree dedup below, so rt_exchanges over-counts the
same cached build many times. In r11 this hit q160/q166 (obsolete: their
pins are now lineage-truncating localCheckpoints — they audit at their
true runtime shape, rt=1); since r12 it hits q159, whose sitemap leg uses
enumerate_rows_scalable (the ranged exchange is pinned and its offsets
collected at build time). q159's true runtime shape is its r11 audit
(rt=13) plus one cached ranged scan; the 2.2x 16x scaling probe confirms
the runtime is leg-shaped, not 376-exchange-shaped.

Usage: python tools/plan_audit.py [query ...]   (writes PLAN_AUDIT.txt)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR_AUDIT", "/root/testdata/sf0.01")

# Queries whose DataFrame construction executes work (streaming replays,
# iterative training) — their returned frame is a materialized/trivial plan,
# so linting it tells us nothing; they are audited by their dedicated tests.
SKIP = {
    "q53_stream_tumbling",
    "q60_stream_running_totals",
    "q64_stream_join",
    "q73_stream_enrich",
    "q88_stream_sessions",
}

# Global single-partition exchanges that are semantically required and sit on
# tiny frames (post-aggregation normalization, global top-N over aggregated
# rows, literal/one-row inputs).
SINGLE_PARTITION_OK = {
    "q44_enumerate_topn",       # global top-N: final ordered limit
    "q55_percentiles",          # single-row percentile summary
    "q63_sketch_agg",           # sketch-vs-exact single-row twins
    "q86_cms_heavy_hitters",    # global top-20 over the per-key aggregate
    "q87_source_mixing",        # global normalization over <=20 source rows
    "q43_age_groups",           # literal age-bracket frame
    "q76_sequence_packing",     # per-stratum pack: tiny ordered stratum
    "q90_quality_drift",        # 5-bin normalization windows
    "q28_jaccard_pairs",        # bitmap vocab row_number: path only taken
                                # when vocab <= bitmap_max_vocab (dedup.py:385)
    "q77_bm25_search",          # single-row corpus stats (N, avgdl)
    "q78_curation_funnel",      # single-row audited stage counters
    "q89_profile",              # the one-pass profile IS a single-row agg
    "q94_skew_report",          # single-row totals agg (partials only); the
                                # all-keys window funnel was removed
    "q96_mixed_sample",         # single-row pow-sum normalizer for quotas
    "q100_curation_v2",         # four single-row audited stage counters
    "q125_lm_perplexity",       # single-row vocabulary-size aggregate (V):
                                # partial distinct counts combine map-side,
                                # the single partition merges one row
    "q154_backup_package",      # six single-row COUNT(*) manifest rows (one
                                # per backed-up resource) — partials combine
                                # map-side, each single partition merges one
                                # row; the data path is the K1 dump itself
    "q105_sitemap",             # global URL ordering: sitemap protocol caps
                                # the corpus at 50k files x 50k URLs
                                # (files.py:sitemap_documents documents the
                                # per-partition-offset swap beyond that)
    "q159_publish_fanout",      # the sitemap LEG of the fan-out — the same
                                # protocol-capped global URL ordering q105
                                # whitelists; the ES/SQL legs stay
                                # partitioned on the persisted card surface
    "q168_doremi_weights",      # single-row global vocabulary aggregate (V,
                                # the q125 precedent) + softmax normalization
                                # window over the <=20-domain aggregate (the
                                # q87 precedent) — both post-aggregation
    "q171_semdedup_production", # single-row 'half-avg' cap aggregate over
                                # the k-row block-sizes frame (one row out,
                                # partials combine map-side — the q125/q87
                                # bounded-aggregate precedent); the corpus
                                # path shuffles only on the kernel's own
                                # (_blk,_gi,_gj) grid key
    # q161 no longer needs a whitelist slot: the published autocomplete leg
    # is a plain hash aggregate on qid (the limit_rows rank gate was a
    # misattribution — reference to_es.py:325-331 publishes UNLIMITED; the
    # 10^4 cap belongs to the commented-out backup flow at :333, now an
    # explicit opt-in arg on autocomplete_publish).
}


def _runtime_counts(tree: str) -> tuple[int, int]:
    """(exchanges, broadcast joins) that execute per action: a persisted
    frame's build lineage (printed again under EVERY InMemoryTableScan
    occurrence) is counted ONCE per distinct cached relation — it runs once
    to fill the cache — and skipped on repeats."""
    n_ex = n_bc = 0
    lines = tree.split("\n")

    def _depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        if m:
            return m.start()
        # lines without a node marker (QueryStage headers, '== Final Plan =='
        # section rows printed once a cache has MATERIALIZED under AQE) still
        # belong to the enclosing subtree — fall back to indent depth, or the
        # cached-build capture would terminate at the first such line and
        # count the cache's internals as runtime nodes (q166's audit showed
        # 2127 phantom runtime exchanges from exactly this)
        return len(line) - len(line.lstrip(" :"))

    seen_caches: set[str] = set()
    skip_until: int | None = None
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line.strip():
            i += 1
            continue
        depth = _depth(line)
        if skip_until is not None:
            if depth > skip_until:
                i += 1
                continue
            skip_until = None
        if "InMemoryTableScan" in line or "InMemoryRelation" in line:
            # signature = the build subtree; count its nodes only once
            j = i + 1
            sub = []
            while j < len(lines) and lines[j].strip() and _depth(lines[j]) > depth:
                sub.append(lines[j].strip().lstrip("+:- "))
                j += 1
            sig = "\n".join(sub)
            if sig in seen_caches:
                skip_until = depth
            seen_caches.add(sig)
            i += 1
            continue
        if re.search(r"\bExchange\b", line):
            n_ex += 1
        if re.search(r"Broadcast(Hash|NestedLoop)Join", line):
            n_bc += 1
        i += 1
    return n_ex, n_bc


def main() -> int:
    from srm_etl_spark.operators.session_cache import (  # noqa: PLC0415
        checkpoint_pool_originals,
        release_all,
    )
    from srm_etl_spark.plans import REGISTRY  # noqa: PLC0415
    from srm_etl_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("plan-audit")
    names = sys.argv[1:] or [n for n in REGISTRY if n not in SKIP]
    failures: list[str] = []
    lines: list[str] = []
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        # bench discipline: each query's pins are its own, so the pool
        # snapshot below holds exactly THIS query's checkpoint-pin builds
        release_all(spark)
        df = REGISTRY[name].spark(spark, SF)
        qe = df._jdf.queryExecution()
        plan = qe.explainString(mode)
        # A lineage-truncating checkpoint pin hides its BUILD lineage (where
        # scans, pushed filters, exchanges and any anti-pattern actually
        # execute) from the final frame's explain — audit the stored
        # originals too, or a pin-heavy query lints as an empty block scan
        # (the r14 q127/q128/q130 blind spot).
        build_plans = [
            orig._jdf.queryExecution().explainString(mode)
            for _pool, orig in checkpoint_pool_originals()
        ]
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        # formatted mode renders the distribution on the node's Arguments
        # line ("Arguments: SinglePartition, ..."), not inline with Exchange
        n_single = len(re.findall(r"\bSinglePartition\b", plan))
        n_bcast = len(re.findall(r"Broadcast(Hash|NestedLoop)Join", plan))
        pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
        b_ex = sum(len(re.findall(r"\bExchange\b", p)) for p in build_plans)
        b_single = sum(len(re.findall(r"\bSinglePartition\b", p)) for p in build_plans)
        b_pushed = any(re.search(r"PushedFilters: \[[^\]]", p) for p in build_plans)
        flags = []
        if "CartesianProduct" in plan or any("CartesianProduct" in p for p in build_plans):
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan or any("BatchEvalPython" in p for p in build_plans):
            flags.append("ROW_PYTHON_UDF")
        if (n_single or b_single) and name not in SINGLE_PARTITION_OK:
            flags.append(f"SINGLE_PARTITION x{n_single + b_single}")
        status = "FLAG " + "+".join(flags) if flags else "ok"
        if flags:
            failures.append(f"{name}: {'+'.join(flags)}")
        rt_ex, rt_bc = _runtime_counts(qe.executedPlan().toString())
        build_note = (
            f" build_plans={len(build_plans)} build_exchanges={b_ex}"
            f" build_pushed={'y' if b_pushed else 'n'}"
            if build_plans
            else ""
        )
        lines.append(
            f"{name}: {status} exchanges={n_exchange} broadcasts={n_bcast} "
            f"rt_exchanges={rt_ex} rt_broadcasts={rt_bc} "
            f"pushed_filters={'y' if pushed else 'n'}{build_note}"
        )
        print(lines[-1], flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.txt")
    if sys.argv[1:]:
        # subset run: MERGE into the committed full audit instead of
        # clobbering it (the round-workflow trap — a 3-query run used to
        # erase the 140+-query baseline the round diffs depend on). Only
        # metric lines merge (the FAILURES footer restates names without
        # metrics and must not overwrite them), and the footer + exit code
        # are recomputed over the MERGED file, so a baseline FLAG a clean
        # subset didn't touch still fails the run.
        merged: dict[str, str] = {}
        if os.path.exists(path):
            for old in open(path):
                if " exchanges=" in old:
                    merged[old.split(":", 1)[0]] = old.rstrip("\n")
        for line in lines:
            merged[line.split(":", 1)[0]] = line
        out_lines = list(merged.values())
    else:
        out_lines = lines
    failures = [
        line.split(" exchanges=")[0].replace(": FLAG ", ": ", 1)
        for line in out_lines
        if ": FLAG " in line
    ]
    out = "\n".join(out_lines) + "\n"
    with open(path, "w") as f:
        f.write(out + ("\nFAILURES:\n" + "\n".join(failures) + "\n" if failures else "\nOK: no plan anti-patterns\n"))
    print("\nFAIL: " + "; ".join(failures) if failures else "\nOK: no plan anti-patterns")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
