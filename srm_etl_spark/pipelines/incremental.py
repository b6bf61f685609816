"""Incremental derive: refresh only the cards affected by changed branches.

At 100 TB you never recompute the world. The reference reruns its whole
derive flow each schedule tick (``operators/derive/__init__.py:8-27``); the
engine's upsert primitive already detects *which* staging rows changed
(hash-diff, ``operators/upsert.py`` / reference ``update_table.py:28-52``) —
this module closes the loop by propagating that change set through the
derive DAG's dependency structure instead of rebuilding every stage.

Dependency analysis (why orgs are the refresh unit): a changed/added/removed
branch affects every card of its ORGANIZATION, not just its own —
``organization_branch_count`` is a per-org window over branches
(derive.py:flat_branches) and ``flat_services`` fans every service of the
org across the org's branch set. Nothing crosses org boundaries in
flat_branches → flat_table → card_data, so the org closure of the changed
branches is exactly the recompute set.

Scale shape:
- the changed-org id set is broadcast (bounded by the tick's change volume);
- recompute runs the normal derive stages over ONLY the affected orgs'
  branches (left-semi prune at the staging scan — pushed below every join);
- the merge is a broadcast anti-join on the previous card table (drop the
  affected orgs' cards) plus a union of the recomputed slice: shuffle is
  proportional to the change set, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import staging_fixtures as FIX
from .derive import card_data, flat_branches, flat_services, flat_table


def _cards_for(branches: DataFrame, locations: DataFrame, organizations: DataFrame,
               services: DataFrame) -> DataFrame:
    from ..operators.session_cache import keep_checkpointed_pooled

    # fb feeds TWO consumers (flat_services and flat_table) — unpinned it is
    # computed twice per call, and this helper runs twice per refresh (the
    # previous table and the recomputed slice): 4 flat_branches executions
    # for 2 distinct results. The checkpoint pin is the run_derive
    # precedent (one pool entry per distinct branch snapshot, lineage
    # truncated so the composed plan stays additive); flat_services /
    # flat_table carry explicit broadcast hints below the pin, so the
    # stats-free checkpoint scan cannot demote their dimension joins.
    fb = keep_checkpointed_pooled(
        flat_branches(branches, locations, organizations),
        "incremental_fb",
        eager=False,
    )
    return card_data(flat_table(flat_services(services, fb), fb))


def changed_orgs_between(
    old_branches: DataFrame, new_branches: DataFrame
) -> DataFrame:
    """Orgs owning any ADDED, REMOVED or MODIFIED branch between two staging
    snapshots — the hash-diff the upsert layer computes (reference
    ``update_table.py:28-52``), widened to the org closure.

    Full-outer join on branch id; a branch counts as changed when it exists
    on only one side or its row content differs. Orgs are taken from BOTH
    sides: a removed branch's org only exists in the old snapshot, and a
    branch that MOVED between orgs dirties both. Output: one ``organization``
    column, distinct."""

    def keyed(df: DataFrame, side: str) -> DataFrame:
        content = F.sha1(F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)])))
        return df.select(
            F.col("id").alias("_bid"),
            F.col("organization").alias(f"_org_{side}"),
            content.alias(f"_h_{side}"),
        )

    diff = keyed(old_branches, "old").join(keyed(new_branches, "new"), "_bid", "full_outer")
    changed = diff.filter(
        F.col("_h_old").isNull()
        | F.col("_h_new").isNull()
        | (F.col("_h_old") != F.col("_h_new"))
    )
    return (
        changed.select(F.col("_org_old").alias("organization"))
        .unionByName(changed.select(F.col("_org_new").alias("organization")))
        .filter(F.col("organization").isNotNull())
        .distinct()
    )


def incremental_card_refresh(
    previous_cards: DataFrame,
    branches: DataFrame,
    locations: DataFrame,
    organizations: DataFrame,
    services: DataFrame,
    changed_orgs: DataFrame,
) -> DataFrame:
    """Refresh ``previous_cards`` for the orgs in ``changed_orgs`` (one
    ``organization`` column — typically :func:`changed_orgs_between` of the
    old and new branch snapshots, so additions, removals and modifications
    are all expressible).

    Result is row-identical to a full recompute over the new staging (the
    q93 oracle proves this): unaffected orgs keep their previous cards
    verbatim; affected orgs are rebuilt from the new staging only — an org
    whose branches all disappeared simply contributes nothing from the
    rebuild, so its stale cards drop out.
    """
    changed_orgs = changed_orgs.select("organization").distinct()
    affected_branches = branches.join(
        F.broadcast(changed_orgs), "organization", "left_semi"
    )
    refreshed = _cards_for(affected_branches, locations, organizations, services)
    kept = previous_cards.join(
        F.broadcast(changed_orgs), "organization", "left_anti"
    ).select(previous_cards.columns)  # the join moved its key first; restore
    return kept.unionByName(refreshed)


def demo_incremental_vs_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable demonstration over the staging fixtures: treat every
    branch whose numeric suffix is divisible by 7 as "arrived in this tick",
    build the previous card table WITHOUT them, then incrementally refresh —
    the output must hash-match the full derive (q35's oracle, reused
    verbatim by q93)."""
    orgs = FIX.organizations(spark, sf_dir)
    locs = FIX.locations(spark, sf_dir)
    brs = FIX.branches(spark, sf_dir)
    svcs = FIX.services(spark, sf_dir)
    is_new = F.xxhash64(F.col("id")) % 7 == 0
    old_brs = brs.filter(~is_new)
    previous = _cards_for(old_brs, locs, orgs, svcs)
    changed = changed_orgs_between(old_brs, brs)
    return incremental_card_refresh(previous, brs, locs, orgs, svcs, changed)
