"""Bloom-filter semi-join pruning — the engine's runtime-filter primitive.

Spark's own row-level runtime filtering (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) injects the same construct automatically inside a
single query; this operator makes it available *across* statements — build a
filter from one table once, prune scans of any number of other tables with
it — which is how a 100 TB pipeline avoids shuffling a fact table into a
semi-join whose build side would have discarded 99% of the rows anyway.

Shape:
- **build** (distributed): k bit-positions per key via seeded ``xxhash64``,
  OR-combined per 64-bit word by a ``bit_or`` hash aggregate — one shuffle of
  at most ``num_bits/64`` rows, regardless of build-side cardinality;
- **ship** (driver): the finished filter is ``num_bits/64`` longs (a 1 Mbit
  filter is 16 KB) — collected once and inlined as an array literal, so the
  probe needs no broadcast variable, no UDF, no Python;
- **probe** (codegen): ``element_at(words, pos div 64) >> (pos % 64) & 1``
  conjoined over the k seeds — whole-stage-codegen expressions that sit
  directly on top of the scan, before any shuffle.

False positives are inherent to the filter, so :func:`bloom_semi_join`
finishes with the exact semi-join — the bloom stage only shrinks what reaches
the shuffle; the result set is exactly the plain semi-join's (which is what
the q69 oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEEDS = (41, 59, 97, 131)


def _positions(col: Column, num_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(num_bits))
        for seed in _SEEDS[:k]
    ]


def build_bloom(
    df: DataFrame, key_col: str, num_bits: int = 1 << 20, k: int = 4
) -> list[int]:
    """Distributed bloom build: returns the filter as ``num_bits/64`` longs.

    The only driver-side data is the finished word array (``num_bits/64 × 8``
    bytes); build-side cardinality never reaches the driver. Sizing: false
    positive rate ≈ (1 - e^(-k·n/m))^k — the 2^20-bit default holds ~1% at
    n = 10^5 distinct keys; size m ≈ 10·n bits for that rate at other scales.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, num_bits, k))).alias("_pos")
    words = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr("shiftleft(1L, CAST(_pos % 64 AS INT))").alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_bit)").alias("_mask"))
        .collect()
    )
    out = [0] * n_words
    for row in words:
        out[int(row["_w"])] = int(row["_mask"])
    return out


def bloom_might_contain(
    key_col: str, words: list[int], num_bits: int, k: int = 4
) -> Column:
    """Codegen probe predicate: true iff every seeded bit is set."""
    arr = F.lit(words)
    key = F.col(key_col).cast("string")
    conds = None
    for pos in _positions(key, num_bits, k):
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        # (word >> (pos % 64)) & 1 == 1 — shift amount must be a column, so
        # route through SQL's shiftright which accepts expressions there
        shifted = _shiftright_col(word, (pos % 64).cast("int"))
        c = shifted.bitwiseAND(F.lit(1)) == 1
        conds = c if conds is None else (conds & c)
    return conds


def _shiftright_col(value: Column, amount: Column) -> Column:
    """``value >> amount`` with a column shift amount (the Python
    ``F.shiftright`` only takes literal ints)."""
    return F.call_function("shiftright", value, amount)


def bloom_prefilter(
    df: DataFrame, key_col: str, words: list[int], num_bits: int, k: int = 4
) -> DataFrame:
    """Scan-side prune: keep rows whose key *may* be in the filter."""
    return df.filter(bloom_might_contain(key_col, words, num_bits, k))


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Exact semi-join with a bloom pre-filter on the probe side.

    Result set is identical to ``probe.join(build, key, 'left_semi')`` — the
    bloom stage removes (typically almost all) non-matching probe rows
    *before* the shuffle; the final semi-join removes the false positives.
    """
    words = build_bloom(build, build_key, num_bits=num_bits, k=k)
    pruned = bloom_prefilter(probe, probe_key, words, num_bits, k=k)
    cond = pruned[probe_key] == build[build_key]
    return pruned.join(build.select(build_key).distinct(), cond, "left_semi")
