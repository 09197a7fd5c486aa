"""Bloom-pruned semi join: shrink the fact-table side of a selective
join BEFORE any shuffle or join executes.

The 100 TB situation: a huge fact scan must be restricted to the keys
of a (much smaller, but possibly not tiny) dimension selection — a
deletion list, a flagged-customer segment, an allow-list. A plain join
ships every fact row into the join; Spark's native runtime bloom
filter covers shuffle joins only and is opaque to tests. This operator
builds the bloom explicitly with the engine's deterministic md5 /
Kirsch–Mitzenmacher machinery (q60/q80's discipline), collects the
sketch (KBs — dimension cost class, like q33's centroid literals), and
probes it IN-ROW inside WholeStageCodegen on the fact scan, so only
true matches plus a bounded-fpr trickle of false positives reach the
actual (exact) semi join. Zero false negatives by construction — the
result is bit-identical to the plain semi join, which is exactly what
the q90 oracle checks.

Sizing: fpr ≈ (1 − e^(−k·n/m))^k; BLOOM_M_BITS is prime so every
double-hash step h2 ∈ [1, m−1] is coprime with m (the q80 rule —
'h2 odd' only works for power-of-two m). Production sizing scales m
with the selected key count n (m ≈ 10–16 bits/key keeps fpr < 1%).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 4093  # prime
BLOOM_WORDS = (BLOOM_M_BITS + 62) // 63  # 63 bits/word: sign bit unused
BLOOM_K = 3
_SALT = "bj:"


def _h12(key: str) -> str:
    """48-bit md5-prefix hash of the key's string form (in-row)."""
    return (
        f"cast(conv(substring(md5(concat('{_SALT}', cast({key} as string))),"
        " 1, 12), 16, 10) as bigint)"
    )


def _probe_bits(key: str) -> str:
    """Array of the key's BLOOM_K bit positions (K–M double hashing:
    one md5, bit_r = (h1 + r·h2) mod m with h2 in [1, m−1])."""
    m = BLOOM_M_BITS
    return (
        f"transform(sequence(0, {BLOOM_K - 1}), r -> "
        f"(({_h12(key)}) % {m}"
        f" + r * (1 + (({_h12(key)}) div {m}) % {m - 1})) % {m})"
    )


def bloom_build(small: DataFrame, key: str) -> list[int]:
    """Aggregate the small side's keys into BLOOM_WORDS packed int64
    words (bit_or partials collapse map-side, q80's shape) and collect
    them — the sketch is KBs regardless of key count."""
    bits = small.select(
        F.explode(F.expr(_probe_bits(key))).alias("bit")
    ).select(
        F.expr("cast(bit div 63 as int)").alias("w"),
        F.expr("shiftleft(1L, cast(bit % 63 as int))").alias("v"),
    )
    got = {
        int(r.w): int(r.v)
        for r in bits.groupBy("w").agg(F.expr("bit_or(v)").alias("v")).collect()
    }
    return [got.get(w, 0) for w in range(BLOOM_WORDS)]


def bloom_probe_col(key: str, words: list[int]) -> Column:
    """True iff every probe bit of ``key`` is set in ``words`` —
    in-row, zero joins; null keys yield null (filtered, matching semi-
    join null semantics)."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    return F.expr(
        f"forall({_probe_bits(key)}, b -> "
        f"(element_at({arr}, cast(b div 63 as int) + 1)"
        " & shiftleft(1L, cast(b % 63 as int))) != 0)"
    )


def bloom_semi_join(
    big: DataFrame, small: DataFrame, big_key: str, small_key: str
) -> DataFrame:
    """``big`` semi-joined to ``small`` with an in-row bloom pre-filter
    on the big side. Result rows are exactly the plain semi join's
    (false positives are removed by the exact join; false negatives
    cannot occur); what changes is that the big side shrinks at the
    SCAN, before any exchange."""
    words = bloom_build(small, small_key)
    pruned = big.filter(bloom_probe_col(big_key, words))
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return pruned.join(F.broadcast(keys), big_key, "left_semi")
