"""Broadcast Bloom-filter semi-join pruning.

The 100 TB pattern: semi-joining a huge fact table against a dimension
key set normally either broadcasts the exact key set (fails once the
set outgrows the broadcast budget) or shuffles the fact table on the
join key (the dominant cost at scale). A Bloom filter is the middle
path — the key set compresses to m bits (false positives allowed, no
false negatives), the bits broadcast everywhere, and the fact scan is
pre-pruned map-side BEFORE any exchange; only survivors (true matches
plus an ~(1-e^{-kn/m})^k sliver of false positives) reach the exact
join that removes the FPs. Spark's own runtime row-level filter
(spark.sql.optimizer.runtime.bloomFilter.*) automates exactly this
plan; the explicit form here exposes the measured FP rate and keeps
the hash engine-replayable.

Reference scope note: the reference engine has no relational joins at
all (SURVEY.md §2.2 — joins are "implicit only", id lookups); this is
extension surface for the LLM-pipeline/relational side, built on the
same broadcast-small-side discipline as the vector operators
(e.g. src/flat_index.cpp's scan-with-tiny-resident-state shape).

Determinism: bit positions come from md5 (identical in Spark and
DuckDB), folded to 60-bit ints via the repo-standard
conv(substr(md5(..), 1, 15), 16, 10) idiom, so the filter — and the
exact FP count it produces — replays bit-for-bit in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# m bits / k hashes sized so the sf0.01 fixture (n ~= 300 member keys)
# yields a visible-but-small FP rate ~(1-e^{-kn/m})^k ~= 4% — large
# enough that the oracle comparison is non-vacuous, small enough that
# the prune still removes ~96% of non-member fact rows.
BLOOM_BITS = 2048
BLOOM_HASHES = 3


def _pos_expr(key: Column, seed: int, m: int) -> Column:
    """Bit position of `key` under hash `seed`: md5 keyed by seed,
    first 15 hex chars (60 bits, always non-negative) mod m."""
    h = F.md5(F.concat(F.lit(f"bf{seed}:"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m).cast("int")


def build_bloom_bits(keys: DataFrame, key_col: str, m: int = BLOOM_BITS,
                     k: int = BLOOM_HASHES) -> list[int]:
    """Aggregate the distinct bit positions of a key DataFrame into a
    dense 0/1 list of length m.

    The only driver-resident state is the bit array itself: the
    positions job returns AT MOST m rows no matter how many keys went
    in (the same bounded-collect contract as kmeans.py's centroids and
    topk.py's candidate heads), so this scales to an arbitrarily large
    dim side while the broadcast payload stays m bits.
    """
    key = F.col(key_col)
    pos_union = keys.select(
        F.explode(F.array(*[_pos_expr(key, s, m) for s in range(k)])).alias("pos")
    ).distinct()
    bits = [0] * m
    for row in pos_union.collect():
        bits[row["pos"]] = 1
    return bits


def bloom_pass_expr(key_col: str, bits: list[int],
                    k: int = BLOOM_HASHES) -> Column:
    """Membership-test Column: true iff every hash of `key_col` lands
    on a set bit. Pure native expression — no shuffle, no Python row
    loop; the m-int literal rides the plan exactly like a broadcast
    variable."""
    m = len(bits)
    key = F.col(key_col)
    arr = F.lit(bits)
    cond = F.lit(True)
    for s in range(k):
        cond = cond & (F.element_at(arr, _pos_expr(key, s, m) + 1) == 1)
    return cond


def bloom_prune(fact: DataFrame, key_col: str, bits: list[int],
                k: int = BLOOM_HASHES) -> DataFrame:
    """Filter `fact` to rows whose key passes every hash of the Bloom
    filter — the map-side pre-prune that runs BEFORE any exchange."""
    return fact.where(bloom_pass_expr(key_col, bits, k))
