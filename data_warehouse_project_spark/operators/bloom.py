"""Bloom-filter build/probe as pure DataFrame bit arithmetic.

The scale use-case is semi-join pruning: build a compact filter over the
join keys actually present on the fact side, broadcast it (a few KB),
and drop probe-side rows whose keys cannot match — without shuffling
either input. Spark's own runtime row-group filters do this internally;
this operator makes the filter a first-class, storable artifact (e.g.
persisted next to a partition so incremental loads can prune against
history without reading it).

Layout: ``m_bits`` bits packed 63 per BIGINT word (bit 63 is never used
— DuckDB raises on ``1 << 63``, and staying off the sign bit keeps every
mask positive in both engines). ``k`` hash functions come from disjoint
8-hex-digit slices of ``md5(cast(key as string))``, so the construction
is deterministic and engine-identical; the ``bloom_probe_audit`` query
cross-checks the exact words and the zero-false-negative invariant
against DuckDB.

All expressions are codegen-friendly built-ins (md5 / conv / shiftleft /
bit_or); the build is one partial aggregate on a <=ceil(m/63)-value key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 63  # stay off the BIGINT sign bit (cross-engine safe)


def _positions(df: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """k rows per input row: (key, pos) with pos in [0, m_bits)."""
    hashes = df.select(
        F.col(key).alias("__k"), F.md5(F.col(key).cast("string")).alias("__h")
    )
    return hashes.select(
        "__k",
        F.explode(
            F.array(
                *[
                    F.expr(
                        f"cast(conv(substr(__h, {1 + 8 * i}, 8), 16, 10) as bigint)"
                        f" % {m_bits}"
                    )
                    for i in range(k)
                ]
            )
        ).alias("__pos"),
    )


def bloom_build(df: DataFrame, key: str, m_bits: int = 2016, k: int = 3) -> DataFrame:
    """Aggregate ``df[key]`` into filter words: (word_idx, word).

    Words with no set bits are omitted (probe treats absent as zero).
    """
    if m_bits % BITS_PER_WORD:
        raise ValueError(f"m_bits must be a multiple of {BITS_PER_WORD}")
    pos = _positions(df, key, m_bits, k)
    return (
        pos.groupBy(
            F.expr(f"__pos div {BITS_PER_WORD}").cast("bigint").alias("word_idx")
        )
        .agg(
            F.expr(
                f"bit_or(shiftleft(cast(1 as bigint), cast(__pos % {BITS_PER_WORD} as int)))"
            ).alias("word")
        )
    )


def bloom_probe(
    probe: DataFrame, key: str, words: DataFrame, m_bits: int = 2016, k: int = 3
) -> DataFrame:
    """Return (key, bloom_pass) — 1 iff every hashed bit is set.

    ``words`` is dim-sized (m_bits/63 rows) and broadcast; the probe side
    never shuffles on anything but its own k-way explode, which stays
    partition-local.
    """
    pos = _positions(probe, key, m_bits, k)
    hit = (
        F.when(
            (
                F.col("word").bitwiseAND(
                    F.expr(
                        f"shiftleft(cast(1 as bigint), cast(__pos % {BITS_PER_WORD} as int))"
                    )
                )
            )
            != 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("hit")
    )
    joined = pos.join(
        F.broadcast(words),
        F.expr(f"__pos div {BITS_PER_WORD}") == F.col("word_idx"),
        "left",
    ).select("__k", hit)
    return joined.groupBy(F.col("__k").alias(key)).agg(
        F.min("hit").cast("int").alias("bloom_pass")
    )
