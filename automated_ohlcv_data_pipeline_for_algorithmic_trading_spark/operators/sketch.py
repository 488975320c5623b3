"""Deterministic distinct-count sketching (HyperLogLog registers built
from md5, entirely in native column expressions).

Spark's own ``approx_count_distinct`` is a black-box HLL++ whose hash is
engine-private — fine for ad-hoc use, but it cannot be oracle-checked,
cannot be merged with registers produced by another engine, and its
estimate is not reproducible outside Spark. This module builds the HLL
register table explicitly from md5 (the repo's cross-engine hash), so:

- the register table is bit-identical in any engine with md5 (the DuckDB
  oracle regenerates it from the same SQL-expressible arithmetic);
- registers from disjoint partitions/files/days MERGE by ``max`` — the
  sketch is an additive daily artifact, the property that makes HLL the
  right distinct-count structure for a 100 TB incremental pipeline
  (store 2^p bytes per day, union = element-wise max, no rescan);
- the estimator is the published HLL formula (Flajolet et al. 2007) with
  the small-range linear-counting correction.

Scale notes: one hash-groupBy on ``bucket`` (2^p groups — map-side
combine collapses each partition to ≤2^p rows before the shuffle), so
the shuffle is O(2^p × partitions) regardless of row count.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "merge_registers",
    "cms_sketch",
    "cms_estimate",
    "merge_cms",
    "bloom_sketch",
    "merge_bloom",
    "bloom_might_contain",
    "hdr_sketch",
    "hdr_bucket_bounds",
    "kmv_hash",
    "kmv_group_sketch",
    "kmv_theta",
    "kmv_estimate",
    "KMV_SPACE_REPR",
]

#: md5 hex chars used for the hash (15 chars = 60 bits, fits BIGINT both
#: in Spark and in DuckDB's CAST('0x'... AS BIGINT)).
_HEX_CHARS = 15
_HASH_BITS = 4 * _HEX_CHARS


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, col: Column | str, p: int = 8) -> DataFrame:
    """HLL register table for the values of ``col``: one row per
    non-empty bucket, columns ``bucket`` (0..2^p-1) and ``r`` (max rank).

    hash = first 60 bits of md5(value as string); the top ``p`` bits pick
    the bucket, the rank is the position of the highest set bit in the
    remaining ``60-p`` bits (rank = width+1 when they are all zero).
    Integer ``div``/``%`` keep the arithmetic exact (a double division
    would lose bits above 2^53), and ``bin()`` gives the bit position
    without any float log2 — both expressions replay exactly in DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    width = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX_CHARS), 16, 10).cast(
        "long"
    )
    hashed = df.filter(c.isNotNull()).select(h.alias("_h"))
    bucket = F.expr(f"_h div {1 << width}").cast("long")
    rem = (F.col("_h") % F.lit(1 << width)).cast("long")
    rank = F.when(rem == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(rem)) + 1
    )
    return (
        hashed.select(bucket.alias("bucket"), rank.cast("int").alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )


def merge_registers(*register_dfs: DataFrame) -> DataFrame:
    """Union register tables from disjoint slices into one sketch
    (element-wise max) — the HLL merge law. Lets a pipeline keep one
    tiny register table per day/partition and answer "distinct over any
    date range" without touching the fact data."""
    out = register_dfs[0]
    for other in register_dfs[1:]:
        out = out.unionByName(other)
    return out.groupBy("bucket").agg(F.max("r").alias("r"))


def _cms_col(c: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of the count-min sketch: an md5-derived hash of
    the value under a per-row salt, reduced mod width. Exact integer
    arithmetic, replays in any engine with md5."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(f"cms{row}"), c.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % F.lit(width)).cast("long")


def cms_sketch(
    df: DataFrame, col: Column | str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch cells for the multiset of values in ``col``: one
    row per touched (r, c) cell with its count. Frequency twin of
    ``hll_registers``: sketches from disjoint slices MERGE by cell-wise
    SUM (``merge_cms``), so a pipeline can keep <= depth*width longs per
    day and answer "estimated count of x over any date range" without
    rescanning facts; estimates only ever over-count (classic CMS bound:
    err <= e/width * N with prob 1 - e^-depth).

    One hash aggregate on (r, c): map-side combine collapses every
    partition to <= depth*width rows before the shuffle, so shuffle
    volume is independent of input row count.
    """
    c = F.col(col) if isinstance(col, str) else col
    src = df.filter(c.isNotNull()).select(c.alias("_v"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("r"), _cms_col(F.col("_v"), i, width).alias("c")
            )
            for i in range(depth)
        ]
    )
    return (
        src.select(F.explode(rows).alias("cell"))
        .select("cell.r", "cell.c")
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of count-min sketches — the CMS merge law."""
    out = sketches[0]
    for other in sketches[1:]:
        out = out.unionByName(other)
    return out.groupBy("r", "c").agg(F.sum("n").alias("n"))


def cms_estimate(
    cells: DataFrame,
    items: DataFrame,
    col: Column | str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated multiset count for each distinct value in ``items``:
    min over rows of the value's cell counts (0 when a cell is absent).
    The cells table is tiny (<= depth*width rows) and broadcasts; the
    probe side never shuffles more than (item, depth) rows.
    """
    c = F.col(col) if isinstance(col, str) else col
    probes = items.select(c.alias("_v")).distinct()
    exploded = probes.select(
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_col(F.col("_v"), i, width).alias("c"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("_v", "cell.r", "cell.c")
    joined = exploded.join(F.broadcast(cells), ["r", "c"], "left")
    return (
        joined.groupBy("_v")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_count"))
        .select(F.col("_v").alias("value"), "cms_count")
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> float:
    """Scalar distinct-count estimate from ONE register table.

    Convenience finisher for interactive/driver use: delegates to the
    grouped-aggregate algebra (:func:`hll_estimate_cols`) so the
    harmonic sum reduces EXECUTOR-side as an exact BIGINT numerator —
    the driver collects two scalars (n_present, z_num), never the
    register rows, and there is no per-register Python loop anywhere.
    For per-group estimates (the scale path: one sketch per day/key),
    use ``groupBy(...).agg(*hll_estimate_cols(p))`` directly — calling
    this function per group would launch one Spark job per group.
    Applies the standard linear-counting correction in the small range.
    """
    m = 1 << p
    n_present, z_num = registers.agg(*hll_estimate_cols(p=p)).collect()[0]
    if n_present == 0:
        return 0.0
    denom = 1 << (_HASH_BITS - p + 1)
    z = (int(z_num) + (m - int(n_present)) * denom) / float(denom)
    est = _alpha(m) * m * m / z
    if est <= 2.5 * m:
        zeros = m - int(n_present)
        if zeros:
            return m * math.log(m / zeros)
    return est


def hll_daily_registers(
    df: DataFrame, col: Column | str, day_col: Column | str, p: int = 8
) -> DataFrame:
    """Per-day HLL register table: (day, bucket, r) — one tiny sketch
    row set (<= 2^p rows) per calendar day, the artifact a pipeline
    persists to answer distinct-count questions over ANY date range
    later without rescanning facts. Same md5 hash/rank scheme as
    ``hll_registers`` (engine-portable, exactly replayable)."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.col(day_col) if isinstance(day_col, str) else day_col
    width = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HEX_CHARS), 16, 10).cast(
        "long"
    )
    hashed = df.filter(c.isNotNull()).select(d.alias("day"), h.alias("_h"))
    bucket = F.expr(f"_h div {1 << width}").cast("long")
    rem = (F.col("_h") % F.lit(1 << width)).cast("long")
    rank = F.when(rem == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(rem)) + 1
    )
    return (
        hashed.select("day", bucket.alias("bucket"), rank.cast("int").alias("r"))
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_rolling_merge(
    daily: DataFrame, window_days: int = 7, day_num_col: str = "day"
) -> DataFrame:
    """Sliding-window register merge: each day's registers contribute to
    the next ``window_days`` target days (explode-to-targets + max —
    the merge law applied along time). ``day_num_col`` must be an
    integer day ordinal. Contribution rows are days x buckets x window
    — sketch-sized, never fact-sized; target days past the observed max
    are trimmed so every output window is fully covered by data days.

    Output: (day, bucket, r) where r is the register over
    [day - window_days + 1, day].
    """
    d = F.col(day_num_col)
    # the max-day probe and the explode BOTH consume `daily`: cut the
    # lineage once (sketch-sized table) so the register build runs once
    daily = daily.localCheckpoint()
    hi = daily.agg(F.max(d)).collect()[0][0]
    targets = F.explode(
        F.sequence(d, F.least(d + F.lit(window_days - 1), F.lit(hi)))
    )
    return (
        daily.select(targets.alias("day"), "bucket", "r")
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate_cols(p: int = 8):
    """Aggregate EXPRESSIONS for a grouped HLL estimate (one group = one
    sketch): returns (n_present, z_num) columns over (bucket, r) rows.

    The harmonic sum z = sum 2^-r is computed as an EXACT BIGINT
    numerator over the common denominator 2^(width+1):
    z_num = sum(1 << (width+1-r)) + (m - n_present) << (width+1)
    (max rank is width+1, so every shift is >= 0; at p=8/width=52 the
    numerator tops out near 2^61 — inside BIGINT). The raw estimate
    alpha*m^2 * 2^(width+1) / z_num is then ONE IEEE division of exact
    integers — bit-identical on any engine, no pow(), no float
    accumulation."""
    n_present = F.count(F.lit(1))
    # SQL-expr shiftleft: the DataFrame-API helper only takes a literal
    # shift amount, the SQL function accepts a column
    z_num = F.sum(
        F.expr(f"shiftleft(cast(1 as bigint), {_HASH_BITS - p + 1} - r)")
    ).cast("long")
    return n_present.alias("n_present"), z_num.alias("z_num")


# --- Bloom filter (mergeable membership sketch) -----------------------------
#
# Completes the sketch trio next to HLL (distinct) and CMS (frequency):
# a fixed-size bit array answering "might this value be in the set?"
# with NO false negatives. Represented relationally as one row per
# non-zero 32-bit WORD — (word BIGINT, bits BIGINT with only the low 32
# bits used) — so the merge law is a groupBy(word).bit_or and a filter
# can be persisted/unioned like the HLL register tables. 32-bit words
# (not 64) keep every shifted constant strictly positive on BOTH
# engines (1 << 63 wraps negative in any BIGINT).


def _bloom_pos(c: Column, i: int, m_bits: int) -> Column:
    """Position of hash ``i``: md5 under a per-hash salt, first 8 hex
    chars (32 bits, exact in BIGINT), mod the filter width — the _cms_col
    recipe with a 'bloom' salt family."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(f"bloom{i}"), c.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(m_bits)).cast("long")


def bloom_sketch(
    df: DataFrame, col: Column | str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """Build the filter: k salted md5 positions per value, OR-folded into
    32-bit words. Output: (word, bits) — one row per non-zero word,
    <= m_bits/32 rows total regardless of input size (the sketch
    contract). Map-side combinable: bit_or is associative-commutative,
    so the partial aggregation absorbs any skew."""
    c = F.col(col) if isinstance(col, str) else col
    vals = df.filter(c.isNotNull()).select(c.alias("_v"))
    pos = vals.select(
        F.explode(F.array(*[_bloom_pos(F.col("_v"), i, m_bits) for i in range(k)])).alias(
            "_pos"
        )
    )
    return (
        pos.select(
            F.expr("_pos div 32").cast("long").alias("word"),
            (F.col("_pos") % 32).cast("int").alias("_bit"),
        )
        .groupBy("word")
        # shiftleft's python wrapper only takes a literal shift — use the
        # SQL form for a column shift
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")).alias("bits"))
    )


def merge_bloom(*sketches: DataFrame) -> DataFrame:
    """OR-merge word tables from disjoint slices — the Bloom merge law
    (exactly the filter you would have built over the union)."""
    out = sketches[0]
    for other in sketches[1:]:
        out = out.unionByName(other)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_might_contain(
    sketch: DataFrame,
    probes: DataFrame,
    col: Column | str,
    id_cols: "list[str] | None" = None,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Probe the filter: a value is (possibly) present iff ALL k of its
    bit positions are set. The sketch is <= m_bits/32 rows — broadcast,
    so the probe is one map-side join however large the probe set. No
    false negatives by construction; false-positive odds ~(1-e^{-kn/m})^k.
    Output: id_cols + in_filter (boolean)."""
    if not id_cols:
        raise ValueError(
            "bloom_might_contain needs id_cols: the verdict is ALL of a"
            " group's k positions hitting, so rows must group by a probe"
            " identity (an empty grouping would AND every probe together)"
        )
    c = F.col(col) if isinstance(col, str) else col
    ids = list(id_cols)
    # NULL probes are never "in" the filter: the build side drops NULLs
    # (bloom_sketch filters isNotNull), and SQL string concatenation
    # propagates NULL — but Spark's concat_ws SKIPS nulls, so without
    # this flag a NULL probe would hash the bare salt strings and could
    # report a false positive the SQL twin can never report.
    pos = probes.select(
        *ids,
        c.isNull().alias("_pnull"),
        F.explode(
            F.array(*[_bloom_pos(c, i, m_bits) for i in range(k)])
        ).alias("_pos"),
    ).select(
        *ids,
        "_pnull",
        F.expr("_pos div 32").cast("long").alias("word"),
        (F.col("_pos") % 32).cast("int").alias("_bit"),
    )
    joined = pos.join(F.broadcast(sketch), "word", "left")
    hit = (
        (~F.col("_pnull"))
        & F.col("bits").isNotNull()
        & (
            F.col("bits").bitwiseAND(
                F.expr("shiftleft(CAST(1 AS BIGINT), _bit)")
            )
            != 0
        )
    ).cast("int")
    # min, not sum == k: a duplicated probe id contributes k rows PER
    # OCCURRENCE, and sum == k would turn a present value into a false
    # negative — min(hit) == 1 is "every position of every occurrence
    # hit", duplicate-safe and still exactly the k-position AND
    return (
        joined.groupBy(*ids)
        .agg((F.min(hit) == F.lit(1)).alias("in_filter"))
    )


def _pow2_chain(e: Column, max_e: int) -> Column:
    """2^e as a generated when-chain over LITERAL powers — exact BIGINT
    selection without shift functions (whose PySpark signatures want a
    Python-int bit count, not a column)."""
    expr = F.lit(1).cast("long")
    for k in range(1, max_e + 2):
        expr = F.when(e == k, F.lit(1 << k).cast("long")).otherwise(expr)
    return expr


def _hdr_exponent(v: Column, max_e: int = 40) -> Column:
    """Integer base-2 exponent of a positive BIGINT (floor(log2(v)))
    WITHOUT floating-point log — a generated comparison chain, so the
    boundary values (exact powers of two) land identically in any
    engine."""
    expr = F.lit(0)
    for e in range(1, max_e + 1):
        expr = F.when(v >= F.lit(1 << e), F.lit(e)).otherwise(expr)
    return expr


def hdr_sketch(
    df: DataFrame, value_col: Column | str, max_e: int = 40
) -> DataFrame:
    """HDR-histogram quantile sketch — the fourth mergeable sketch next
    to HLL/CMS/Bloom: values (micro-quantized BIGINTs) land in
    log-spaced buckets with 16 linear sub-buckets per octave, giving a
    guaranteed ≤ 1/16 RELATIVE error on any quantile while the sketch
    itself is AT MOST 16·(max_e+1)+1 rows whatever the data volume.

    bucket(v) = e·16 + (v·16 div 2^e) − 16 for v ≥ 1 in [2^e, 2^(e+1));
    non-positive values take the reserved bucket −1 (bound 0). The
    exponent is a generated integer comparison chain (no FP log), so
    the bucketing — and therefore the whole sketch — replays exactly in
    SQL. Merge = add counts per bucket (one map-side-combinable
    groupBy); at 100 TB this is the only quantile structure that
    aggregates in one pass with bounded state, which is why it is the
    histogram HdrHistogram/Prometheus/DataSketches deployments use.

    Returns (bucket int, cnt long).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    # materialize the exponent as a projected column FIRST: the power
    # selector below branches on it 42 times, and inlining the 40-when
    # exponent tree into every branch would blow the expression to
    # ~1700 nodes per row
    staged = df.select(
        v.alias("_hdr_v"), _hdr_exponent(v, max_e).alias("_hdr_e")
    )
    vv, ee = F.col("_hdr_v"), F.col("_hdr_e")
    # (v · 16) div 2^e — the divisor is selected from literal powers of
    # two (PySpark's shiftright wants a Python-int bit count, and a
    # generated when-chain keeps the arithmetic integer-exact anyway).
    # TRUE integer division (`div`), matching the oracle's '>>' on ALL
    # BIGINTs: the earlier floor((v·16)/2^e) double division was only
    # exact for v·16 < 2^53 and could silently wrap v·16 near 2^63
    # (round-10 ADVICE). For e ≥ 4 we divide BEFORE multiplying
    # (v div 2^(e−4)) so the product never forms; for e < 4, v ≤ 15 and
    # v·16 ≤ 240 cannot overflow.
    staged = staged.select(
        vv,
        ee,
        _pow2_chain(ee, max_e).alias("_hdr_pw"),
        _pow2_chain(
            F.greatest(ee - F.lit(4), F.lit(0)), max(max_e - 4, 0)
        ).alias("_hdr_pw4"),
    )
    mant = F.expr(
        "CASE WHEN _hdr_e >= 4 THEN _hdr_v div _hdr_pw4"
        " ELSE (_hdr_v * 16) div _hdr_pw END"
    ).cast("long")
    bucket = F.when(
        vv >= 1, (ee.cast("long") * 16) + mant - F.lit(16)
    ).otherwise(F.lit(-1))
    return (
        staged.select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hdr_bucket_bounds(bucket: Column) -> tuple[Column, Column]:
    """Inclusive (lo, hi) value bounds of an HDR bucket id, integer
    arithmetic only: lo(b) = ceil(2^e·(16+m)/16) with e = b div 16,
    m = b % 16; hi(b) = lo(b+1) − 1; the reserved bucket −1 bounds 0."""

    def lo_of(b: Column) -> Column:
        e = F.floor(b / 16).cast("int")
        m = (b % 16).cast("long")
        pw = _pow2_chain(e, 41)
        return F.floor((pw * (F.lit(16) + m) + F.lit(15)) / 16).cast(
            "long"
        )

    lo = F.when(bucket < 0, F.lit(0).cast("long")).otherwise(lo_of(bucket))
    hi = F.when(bucket < 0, F.lit(0).cast("long")).otherwise(
        lo_of(bucket + 1) - 1
    )
    return lo, hi


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta) distinct sketch — the FIFTH mergeable sketch.
# ---------------------------------------------------------------------------

#: exact double literals shared by both engines (inline the SAME repr —
#: per-engine arithmetic on sub-constants could differ in the ulp).
KMV_SPACE_REPR = "1.152921504606847e+18"  # 2^60, exactly representable
_KMV_SPACE_I = 1 << 60


def kmv_hash(c: Column) -> Column:
    """60-bit md5 hash as nonnegative BIGINT — the same cross-engine
    hash the HLL registers use (DuckDB twin:
    ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, _HEX_CHARS), 16, 10
    ).cast("long")


def kmv_group_sketch(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: the k SMALLEST distinct hash values of
    ``col``, packed as an ascending array — ≤ k BIGINTs per group
    whatever the data volume.

    Why a fifth sketch when HLL already counts distincts: KMV supports
    set INTERSECTION (and therefore Jaccard/overlap) estimates, which
    HLL registers fundamentally cannot — the theta-sketch family's
    reason to exist (Dasgupta et al., DataSketches). Merge law: union
    the arrays, dedup, keep the k smallest — associative and
    commutative, so per-day/per-source sketches compose.

    Build shape at scale: distinct (group, hash) is the one big
    map-side-combinable reduction; the per-group bottom-k is a window
    row_number over the already-distinct rows (≤ one task per group);
    the packed array is the bounded artifact. Deterministic md5 →
    bit-identical in any engine, so even the ESTIMATES replay in SQL.
    """
    from pyspark.sql import Window as W

    c = F.col(col)
    h = kmv_hash(c)
    dist = (
        df.filter(c.isNotNull())
        .select(*group_cols, h.alias("_h"))
        .distinct()
    )
    win = W.partitionBy(*group_cols).orderBy("_h")
    topk = dist.withColumn("_rn", F.row_number().over(win)).filter(
        F.col("_rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_h")).alias("hs")
    )


def kmv_theta(hs: Column, k: int) -> Column:
    """Exclusive counting threshold θ of a sketch array: the kth
    smallest hash when the sketch is full, else the whole hash space
    (the sketch is then the exact distinct set)."""
    return F.when(
        F.size(hs) >= k, F.element_at(hs, k).cast("double")
    ).otherwise(F.lit(float(_KMV_SPACE_I)))


def kmv_estimate(hs: Column, k: int) -> Column:
    """Distinct-count estimate: (k−1) · 2^60 / θ for a full sketch
    (the classic KMV estimator), exact |sketch| otherwise."""
    num = float((k - 1) * _KMV_SPACE_I)
    return F.when(
        F.size(hs) >= k,
        F.lit(num) / F.element_at(hs, k).cast("double"),
    ).otherwise(F.size(hs).cast("double"))
