"""Mergeable sketches and approximate/exact distinct structures.

Reference parity note: eBay/accelerator has no sketch layer at all — its
distinct/frequency work is user Python over hash-partitioned slices
(SURVEY.md §2.6 "absent"). These operators are new surface designed for
the 100 TB regime, where the winning pattern is *mergeable partial
state*: build a small summary per partition / per day, store it, and
answer coarser-grained questions by merging summaries instead of
re-scanning raw data.

Three tiers, by exactness:
- ``bitmap_distinct``: EXACT distinct counts for integer keys via Spark's
  bitmap aggregate functions (bitmap_construct_agg / bitmap_or_agg).
  A bitmap bucket covers 32768 positions, so state is
  ~4 KiB * (key_range / 32768) per group — ideal for dense ID spaces
  (user ids, row ids). Re-aggregatable: OR-merging daily bitmaps gives
  monthly distincts with no rescan.
- ``hll_rollup``: APPROXIMATE distinct via Apache DataSketches HLL
  (hll_sketch_agg / hll_union_agg, Spark 3.5+). Fixed ~2^lgk bytes per
  group regardless of cardinality; ~1.6 % stderr at lgk=12. The choice
  when the key space is unbounded (URLs, ngrams).
- ``heavy_hitters``: EXACT frequent-item detection in two passes:
  per-partition local counting (Arrow-batched, no shuffle) emits a
  candidate superset — any key with global count >= T must reach count
  >= T / num_partitions in at least one partition — then a broadcast
  semi-join + exact recount verifies. Only candidate keys ever shuffle,
  so a 100 TB stream with millions of distinct keys but few hot ones
  shuffles almost nothing.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CountMinSketch:
    """Pure-Python reader for Spark's serialized Count-Min sketch
    (``count_min_sketch`` aggregate, org.apache.spark.util.sketch
    CountMinSketchImpl V1 format: int version, long totalCount,
    int depth, int width, depth longs of hash seeds, then depth*width
    longs of counters in row order — big-endian; layout verified
    empirically with a single-key sketch).

    The sketch is the mergeable frequency summary for 100 TB streams:
    each executor folds its partition into eps-bounded counters, merges
    are element-wise adds, and the driver (or a downstream job) can
    probe any key's frequency from a few KiB of state. Decoding it
    outside the JVM proves the state is portable — a monitoring process
    or a Python service can consume executor-built sketches directly.
    """

    _PRIME = (1 << 31) - 1

    def __init__(self, raw: bytes):
        import struct
        version, self.total, self.depth, self.width = struct.unpack_from(
            ">iqii", raw, 0)
        if version != 1:
            raise ValueError(f"unsupported CMS version {version}")
        off = 20
        n = self.depth * self.width
        self.hash_a = struct.unpack_from(f">{self.depth}q", raw, off)
        flat = struct.unpack_from(f">{n}q", raw, off + 8 * self.depth)
        self.table = [flat[i * self.width:(i + 1) * self.width]
                      for i in range(self.depth)]

    @staticmethod
    def _s64(x: int) -> int:
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= (1 << 63) else x

    def _pos(self, item: int, i: int) -> int:
        # mirrors CountMinSketchImpl.hash(long, i): h = hashA[i]*item;
        # h += h >> 32; h &= PRIME_MODULUS; return (int) h % width
        h = self._s64(self.hash_a[i] * item)
        h = self._s64(h + (h >> 32))
        return (h & self._PRIME) % self.width

    def estimate(self, item: int) -> int:
        """Point frequency estimate (never underestimates)."""
        return min(self.table[i][self._pos(item, i)]
                   for i in range(self.depth))


def bitmap_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                    merge_cols: list[str] | None = None,
                    out_col: str = "distinct_count") -> DataFrame:
    """Exact count-distinct of an integer ``key_col`` per ``group_cols``
    via position bitmaps.

    If ``merge_cols`` is given, bitmaps are first built per
    (group_cols + merge_cols + bucket) — e.g. per day — and then
    OR-merged up to group_cols, demonstrating the re-aggregation path
    (daily state -> monthly answer). Result is identical either way;
    the two-level form is how a 100 TB incremental pipeline would run.
    """
    fine = list(group_cols) + list(merge_cols or [])
    pos = df.select(
        *fine,
        F.bitmap_bucket_number(F.col(key_col)).alias("_bkt"),
        F.bitmap_bit_position(F.col(key_col)).alias("_pos"),
    )
    built = pos.groupBy(*fine, "_bkt").agg(
        F.bitmap_construct_agg(F.col("_pos")).alias("_bm"))
    if merge_cols:
        built = built.groupBy(*group_cols, "_bkt").agg(
            F.bitmap_or_agg(F.col("_bm")).alias("_bm"))
    return (built
            .groupBy(*group_cols)
            .agg(F.sum(F.bitmap_count(F.col("_bm"))).alias(out_col)))


def hll_rollup(df: DataFrame, key_col: str, group_cols: list[str],
               merge_cols: list[str] | None = None, lgk: int = 12,
               out_col: str = "approx_distinct") -> DataFrame:
    """Approximate count-distinct per ``group_cols`` through mergeable
    DataSketches HLL sketches; with ``merge_cols`` the sketch is built at
    the finer grain and union-merged up (the continuous-aggregate shape:
    store per-day sketches, answer per-anything queries by union)."""
    fine = list(group_cols) + list(merge_cols or [])
    sk = df.groupBy(*fine).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("_sk"))
    if merge_cols:
        sk = sk.groupBy(*group_cols).agg(
            F.hll_union_agg(F.col("_sk")).alias("_sk"))
    return sk.select(*group_cols,
                     F.hll_sketch_estimate(F.col("_sk")).alias(out_col))


def heavy_hitters(df: DataFrame, key_col: str, threshold: int) -> DataFrame:
    """All keys whose global row count is >= ``threshold``, with exact
    counts — computed without shuffling the full key stream.

    Pass 1 (map-only): each partition counts its rows per key in an
    Arrow batch loop and emits only keys with local count >=
    ceil(threshold / num_partitions) — a guaranteed superset of the true
    heavy hitters (pigeonhole: a key with global count >= T spread over
    P partitions peaks at >= T/P somewhere).
    Pass 2: the (small) candidate set is broadcast back and only
    candidate rows are counted exactly.

    Returns columns: ``key_col``, ``cnt`` — deterministic regardless of
    partition layout (the candidate superset varies, the verified answer
    does not). NULL keys follow SQL GROUP BY semantics: nulls are
    counted as one key and the verification join is null-safe.

    The candidate pass counts a JVM-side STRING projection of the key,
    never the native value: Arrow->pandas coerces int64-with-nulls to
    float64 (silently rounding ids above 2^53) and conflates NULL with
    NaN for float keys — a string projection is lossless for every
    type, and the candidate values round-trip exactly because the
    verification join compares the same cast("string") on both sides.
    (Exception: for float keys, distinct doubles can format to distinct
    strings 1:1, and NaN formats to "NaN" ≠ NULL — also correct.)"""
    # partition-count BOUND, not the actual count: df.rdd
    # .getNumPartitions() executes the upstream plan just to read a
    # number (a shuffle-derived input ran three times — review r4), and
    # the count it reports can differ from the one the pass below runs
    # with. coalesce() is narrow (no shuffle, no job) and guarantees the
    # pass runs with AT MOST `bound` partitions, which keeps the
    # pigeonhole superset valid: ceil(T/bound) <= ceil(T/P_actual).
    sc = df.sparkSession.sparkContext
    bound = max(sc.defaultParallelism * 4, 64)
    local_min = max(1, math.ceil(threshold / bound))

    def _local(batches: Iterator) -> Iterator:
        import pandas as pd
        c: Counter = Counter()
        n_null = 0
        for pdf in batches:
            col = pdf["_hh_key"]
            n_null += int(col.isna().sum())
            c.update(Counter(dict(col.value_counts())))
        keys = [k for k, v in c.items() if v >= local_min]
        if n_null >= local_min:
            keys.append(None)
        yield pd.DataFrame({"_hh_key": pd.Series(keys, dtype=object)})

    key_str = F.col(key_col).cast("string")
    cands = (df.select(key_str.alias("_hh_key"))
             .coalesce(bound)
             .mapInPandas(_local, schema="_hh_key string")
             .distinct()
             .withColumnRenamed("_hh_key", "_hh_cand"))
    return (df.join(F.broadcast(cands),
                    key_str.eqNullSafe(F.col("_hh_cand")),
                    "left_semi")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= threshold))


# ---------------------------------------------------------------- bloom

class BloomFilter:
    """A deterministic Bloom filter for map-only pre-filtering: the
    100 TB pattern where a bounded key set (URL blocklist, holdout
    ids, decontamination fingerprints) must drop rows from a huge scan
    WITHOUT a join or shuffle. The bitset is MODEL state (m_bits/8
    bytes, built once, compiled into the probe plan as a hex literal),
    so probing is a pure JVM expression at scan speed with zero
    network — the same shape Spark's own runtime-filter bloom uses,
    but with md5-derived positions both this package and a SQL oracle
    can replay bit-for-bit (Spark's native bloom_filter_agg hashing is
    opaque to other engines; use it for ad-hoc join pruning, use this
    where decisions must be reproducible).

    Position j of a key = ``int(md5(key)[8j : 8j+8], 16) % m_bits``
    (j < n_hashes <= 4 — md5 yields four independent 32-bit lanes).
    False-positive rate: standard ``(1 - e^(-kn/m))^k``; no false
    negatives. All-positions-set membership semantics."""

    def __init__(self, bits: int, m_bits: int, n_hashes: int, n_keys: int):
        if m_bits % 4 or m_bits < 16:
            raise ValueError("m_bits must be a multiple of 4, >= 16")
        if not 1 <= n_hashes <= 4:
            raise ValueError("n_hashes must be 1..4 (md5 has 4 lanes)")
        self.bits = bits
        self.m_bits = m_bits
        self.n_hashes = n_hashes
        self.n_keys = n_keys

    @property
    def hex_bitset(self) -> str:
        """Hex char i encodes bit range [4i, 4i+4) — lowest bit first."""
        out = []
        b = self.bits
        for _ in range(self.m_bits // 4):
            out.append(format(b & 0xF, "x"))
            b >>= 4
        return "".join(out)

    def fp_rate(self) -> float:
        k, n, m = self.n_hashes, self.n_keys, self.m_bits
        return (1.0 - math.exp(-k * n / m)) ** k

    def might_contain(self, col) -> "F.Column":
        """JVM membership test: every md5 lane's bit is set in the hex
        literal. NULL keys give NULL (unknown), matching SQL `IN`."""
        h = F.md5(col.cast("string"))
        lit = F.lit(self.hex_bitset)
        checks = []
        for j in range(self.n_hashes):
            p = (F.conv(F.substring(h, 8 * j + 1, 8), 16, 10)
                 .cast("long") % self.m_bits)
            digit = F.conv(
                F.substring(lit, (p / 4).cast("int") + 1, 1), 16, 10
            ).cast("int")
            # shiftright() wants a literal shift — divide instead
            # (digit <= 15, pow of 2 exact in double)
            shifted = (digit / F.pow(F.lit(2.0), (p % 4).cast("double"))
                       ).cast("int")
            checks.append((shifted % 2) == 1)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 1 << 16,
                n_hashes: int = 4) -> BloomFilter:
    """Build the filter distributed: positions are computed JVM-side
    and only DISTINCT set positions collect (<= m_bits ints — bounded
    model state, not data). NULL keys are ignored (they can't match)."""
    BloomFilter(0, m_bits, n_hashes, 0)  # validate params early
    h = F.md5(F.col(key_col).cast("string"))
    pos = F.array(*[
        (F.conv(F.substring(h, 8 * j + 1, 8), 16, 10)
         .cast("long") % m_bits).cast("int")
        for j in range(n_hashes)])
    rows = (df.filter(F.col(key_col).isNotNull())
            .select(F.explode(pos).alias("p")).distinct().collect())
    bits = 0
    for r in rows:
        bits |= 1 << r["p"]
    n_keys = df.filter(F.col(key_col).isNotNull()) \
        .select(key_col).distinct().count()
    return BloomFilter(bits, m_bits, n_hashes, n_keys)


def bloom_prefilter(probe: DataFrame, bf: BloomFilter,
                    key_col: str) -> DataFrame:
    """Map-only pre-filter: keep rows whose key MIGHT be in the build
    set (all true members survive; ~fp_rate() impostors do — chase
    with an exact semi-join when exactness matters, on the
    now-tiny survivor set)."""
    return probe.filter(bf.might_contain(F.col(key_col)))
