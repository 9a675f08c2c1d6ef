"""Bloom-filter-pruned semi-join.

The reference has no join operator at all (SURVEY.md §2.C — joins are
"composable" as tag-and-union Map/Reduce); Spark gives every join
family built-in. What Spark does NOT always give is the *runtime
row-level pre-filter*: its own bloom-pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) only fires in
specific shapes. This operator makes the pattern explicit and
engine-controlled, the way a 100 TB pipeline wants it:

    big ⋉ small  ==  exact_semi_join( bloom_prefilter(big), small )

The bloom bitset is built DISTRIBUTIVELY from the small side (bit_or
partial aggregation — mergeable, constant-size state), collapsed to
one map<word,bits> row, and broadcast. The big side tests k bit
positions inside the scan stage — rows that fail never reach the
shuffle, cutting shuffle volume by the join selectivity. False
positives are removed by the exact semi-join that follows, so the
result is EXACTLY the semi-join (oracle-checkable); the bloom is pure
pruning, never semantics.

Sizing: with m bits and k hashes over n keys, fpr ≈ (1-e^(-kn/m))^k.
The default m=2^16, k=3 holds fpr under ~1% to n≈8k keys; at scale
pick m ≈ 10 bits/key (the driver-side cost is m/8 bytes broadcast
once — 128 MiB at 2^30 bits, still broadcastable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_semi_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    n_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Rows of ``big`` whose ``big_key`` appears in ``small``'s
    ``small_key`` — exact semi-join semantics, bloom-pre-filtered.

    The k bit positions use xxhash64 with distinct seed columns; the
    bitset lives in a map<int,long> (only words with set bits are
    materialized — a sparse bloom costs proportionally less to
    broadcast)."""
    keys = small.select(F.col(small_key).alias("k")).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[F.pmod(F.xxhash64("k", F.lit(i)), F.lit(n_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("int").alias("w"),
        F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("w").agg(F.bit_or("bit").alias("bits"))
    bloom = words.groupBy().agg(
        F.map_from_arrays(F.collect_list("w"), F.collect_list("bits")).alias("bloom")
    )
    probed = big.crossJoin(F.broadcast(bloom))
    cond = None
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col(big_key), F.lit(i)), F.lit(n_bits))
        hit = (
            F.coalesce(F.element_at(F.col("bloom"), (p / 64).cast("int")), F.lit(0).cast("long"))
            .bitwiseAND(F.expr(f"shiftleft(1L, CAST(pmod(xxhash64({big_key}, {i}), {n_bits}) % 64 AS INT))"))
            != 0
        )
        cond = hit if cond is None else (cond & hit)
    candidates = probed.where(cond).drop("bloom")
    return candidates.join(keys, candidates[big_key] == keys["k"], "left_semi")
