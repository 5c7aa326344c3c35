"""Sketch / approximate-query-processing operators (engine-new): the
cardinality, frequency, and membership summaries a 100 TB web corpus is
actually profiled with when exact answers would mean shuffling every key.

Four classic sketches, each built from the md5-derived
:func:`~.dedup.portable_hash64` so the Spark plan and the DuckDB oracle
compute bit-identical structures, and each SELF-EVALUATING — every query
emits the exact answer beside the estimate so the error is a column, not a
claim:

- **HyperLogLog** (Flajolet et al. 2007): per-group distinct-count from
  2^p max-rank registers. The register build is a map-side-combinable
  ``groupBy(group, bucket).agg(max(rho))`` — at 100 TB the full key set
  never shuffles, only ≤ 64 longs per group do. The harmonic sum is kept
  in EXACT integer arithmetic (terms ``2^(56-reg)`` summed as longs, one
  final IEEE division) so both engines agree bitwise; the linear-counting
  branch's single ``ln`` is absorbed by the repo-standard ``round(·, 6)``.
- **KMV / bottom-k theta sketch** (Bar-Yossef et al. 2002): the k-th
  minimum hash value estimates cardinality as ``(k-1)·2^60 / h_(k)``.
  Exact below k (the sketch IS the key set), estimator above.
- **Count-min sketch** (Cormode & Muthukrishnan 2005): d×w counter matrix
  from d independent column hashes; point estimate = min over rows. Built
  as one ``groupBy(row, col).count()`` over a d-way posexplode — the
  counters are d·w longs regardless of corpus size. Width is deliberately
  undersized in the demo query (w=8 for 11 keys) so the one-sided
  collision overestimate is visible and oracled.
- **Bloom-filter semi-join pruning** (Bloom 1970): the build side's k bit
  positions materialize as a ≤ m-row ``(pos)`` table that BROADCASTS to
  the probe side; a probe key passes iff all k of its positions match.
  This is the join-pruning shape that kills shuffle volume at scale: the
  big side is filtered by a kilobyte of bits before any exchange, and the
  false-positive rate is measured against the exact semi-join in the same
  query.

No reference analog (EZ-hwh/AutoExtraction has no approximate layer);
engine-new per the training-data-pipeline mandate. All expressions are
pure codegen — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash64

# ---------------------------------------------------------------------------
# HyperLogLog

HLL_P = 6  # 2^6 = 64 registers per group
HLL_M = 1 << HLL_P
# portable_hash64 yields 60 bits; p go to the bucket, the rest to the rank
HLL_RANK_BITS = 60 - HLL_P  # 54
HLL_MAX_RHO = HLL_RANK_BITS + 1  # 55 (all-zero suffix)
# alpha_64 per Flajolet et al. 2007 Fig. 3 (m = 64)
HLL_ALPHA = 0.709
# exact Python float constant embedded verbatim in BOTH engines so the
# raw estimate is ONE IEEE division of a shared constant by an exact long
# (no cross-engine constant-folding-order ambiguity)
HLL_RAW_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_RANK_BITS + 2))
HLL_LC_THRESHOLD = 2.5 * HLL_M  # linear-counting cutover (160.0)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str], seed: str = "#hll"
) -> DataFrame:
    """(group..., bucket, reg) max-rank register table for ``key_col``.

    The only shuffle is the ``groupBy`` on (group, bucket) — map-side
    combinable max, so at most ``m`` rows per group cross the wire no
    matter how many keys the group holds. rho is computed with exact
    integer bit-length (``length(conv(w, 10, 2))``, identical to DuckDB's
    ``length(bin(w))``) — no float log anywhere.
    """
    h = portable_hash64(F.col(key_col).cast("string"), seed)
    bucket = (h % HLL_M).cast("int")
    # shiftright, NOT floor(h / m): h has 60 bits and float division loses
    # exactness above 2^53 — the bucket/rank split must be pure integer
    # (DuckDB mirrors with h >> p)
    w = F.shiftright(h, HLL_P).cast("long")
    nbits = F.length(F.conv(w.cast("string"), 10, 2))
    rho = (
        F.when(w == 0, F.lit(HLL_MAX_RHO))
        .otherwise(F.lit(HLL_MAX_RHO) - nbits)
        .cast("int")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge register tables by per-bucket max onto a coarser grouping —
    the HLL mergeability property that makes the sketch 100 TB-shaped:
    shard-local sketches built independently (one pass, no cross-shard
    traffic) combine into EXACTLY the sketch a global pass would build,
    because max is associative. ``regs`` must carry ``group_cols`` plus
    the finer shard columns being merged away."""
    return regs.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_estimate(
    regs: DataFrame, group_cols: list[str], out_col: str = "hll_estimate"
) -> DataFrame:
    """Distinct-count estimate per group from a register table.

    Empty registers count as reg = 0. The harmonic sum is exact:
    ``sum(2^(56-reg))`` over 64 registers with reg ≤ 55 stays below
    2^63 as a long; the raw estimate is then the shared float constant
    ``HLL_RAW_NUM`` divided by that exact integer. Linear counting
    (``m·ln(m/V)``) takes over below 2.5m when any register is empty.
    """
    groups = regs.select(*group_cols).distinct()
    all_buckets = groups.select(
        *group_cols,
        F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("bucket"),
    )
    full = all_buckets.join(regs, [*group_cols, "bucket"], "left").select(
        *group_cols, F.coalesce(F.col("reg"), F.lit(0)).alias("reg")
    )
    # shiftleft's bit count must be a literal in the DSL; the variable
    # shift 2^(56-reg) goes through expr (still pure codegen)
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RANK_BITS + 2} - reg)")
    agg = full.groupBy(*group_cols).agg(
        F.sum(term).cast("long").alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long").alias("v"),
    )
    raw = F.lit(HLL_RAW_NUM) / F.col("s").cast("double")
    lc = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v").cast("double"))
    est = F.when((raw <= HLL_LC_THRESHOLD) & (F.col("v") > 0), lc).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias(out_col))


# ---------------------------------------------------------------------------
# KMV (bottom-k) theta sketch

KMV_K = 64
KMV_SPACE = float(1 << 60)  # hash space size as an exact float (2^60)


def kmv_kept(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    seed: str = "#kmv",
) -> DataFrame:
    """(group..., h) — the k smallest DISTINCT portable hashes of
    ``key_col`` per group (the bottom-k / theta sketch itself). The
    hash-level distinct also absorbs the measure-zero md5 collision; the
    bottom-k selection is a per-group window over hashes — at scale each
    group ships at most k longs after the map-side distinct."""
    from pyspark.sql import Window

    h = portable_hash64(F.col(key_col).cast("string"), seed)
    hashes = df.select(*group_cols, h.alias("h")).distinct()
    win = Window.partitionBy(*group_cols).orderBy("h")
    return (
        hashes.select(*group_cols, "h", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    seed: str = "#kmv",
) -> DataFrame:
    """(group..., n_kept, kmv_estimate) bottom-k distinct-count estimate.

    Below k the sketch is the exact key set (estimate = count); at k the
    estimator is ``(k-1)·2^60 / h_(k)`` — the numerator ``(k-1)·2^60`` is
    an exactly-representable float constant, so the estimate is one IEEE
    division by an exact long.
    """
    kept = kmv_kept(df, key_col, group_cols, k=k, seed=seed)
    agg = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("hk"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit((k - 1) * KMV_SPACE) / F.col("hk").cast("double")
    )
    return agg.select(
        *group_cols, "n_kept", F.round(est, 6).alias("kmv_estimate")
    )


def kmv_jaccard(
    kept: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """(ga, gb, n_union_kept, kmv_jaccard, kmv_union, kmv_inter) — KMV
    set-operation estimates for every unordered group pair, from the
    bottom-k sketches alone (Beyer et al. 2007, SIGMOD — "On synopses for
    distinct-value estimation under multiset operations").

    The union sketch is the bottom-k of the two kept sets combined (the
    bottom-k of A ∪ B is always contained in bottom-k(A) ∪ bottom-k(B));
    with θ its k-th minimum, ``jaccard ≈ |{h ≤ θ present in BOTH
    sketches}| / k`` and ``|A ∩ B| ≈ jaccard · (k-1)·2^60/θ``. Everything
    downstream of the sketches is O(groups² · k) — at 100 TB the corpus
    is scanned once to build the per-stratum sketches and every pairwise
    overlap in the report comes from kilobytes. Estimates are single IEEE
    divisions/products of exact longs (round-6 absorbed)."""
    from pyspark.sql import Window

    a = kept.select(F.col(group_col).alias("ga"), "h")
    b = kept.select(F.col(group_col).alias("gb"), "h")
    pairs = (
        a.select("ga")
        .distinct()
        .join(b.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    ha = pairs.join(a, "ga").select("ga", "gb", "h")
    hb = pairs.join(b, "gb").select("ga", "gb", "h")
    u = ha.union(hb).distinct()
    win = Window.partitionBy("ga", "gb").orderBy("h")
    stats = (
        u.select("ga", "gb", "h", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") <= k)
        .groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union_kept"),
            F.max("h").cast("long").alias("theta"),
        )
    )
    inter = ha.join(hb, ["ga", "gb", "h"], "left_semi")
    ic = (
        inter.join(stats, ["ga", "gb"])
        .filter(F.col("h") <= F.col("theta"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    out = stats.join(ic, ["ga", "gb"], "left").select(
        "ga",
        "gb",
        "n_union_kept",
        "theta",
        F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
    )
    kk = F.least(F.lit(k), F.col("n_union_kept")).cast("double")
    jacc = F.col("c").cast("double") / kk
    union_est = F.when(
        F.col("n_union_kept") < k, F.col("n_union_kept").cast("double")
    ).otherwise(F.lit((k - 1) * KMV_SPACE) / F.col("theta").cast("double"))
    return out.select(
        "ga",
        "gb",
        "n_union_kept",
        F.round(jacc, 6).alias("kmv_jaccard"),
        F.round(union_est, 6).alias("kmv_union"),
        F.round(jacc * union_est, 6).alias("kmv_inter"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch

CMS_D = 4  # hash rows
CMS_W = 8  # counter columns per row (deliberately tight in the demo query)


def cms_counters(
    df: DataFrame, key_col: str, d: int = CMS_D, w: int = CMS_W, seed: str = "#cms"
) -> DataFrame:
    """(row, col, cnt) d×w count-min counter matrix over ``key_col``.

    One explode to d rows per input row, then a single map-side-combinable
    count — the result is d·w longs total, independent of input size.
    """
    rows = df.select(
        F.col(key_col).alias("k"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    )
    # per-row seed suffix |<row> makes the d hash functions independent
    col = portable_hash64(
        F.concat(F.col("k").cast("string"), F.lit("|"), F.col("row").cast("string")),
        seed,
    ) % w
    return (
        rows.select("row", col.cast("int").alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_point_estimates(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = "#cms",
) -> DataFrame:
    """(key..., cms_estimate) min-over-rows point estimate per probe key.

    The counter matrix (d·w rows) broadcasts; probing is an equi-join on
    (row, col) followed by a min — never a scan of the raw data.
    """
    probe = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
    )
    col = portable_hash64(
        F.concat(
            F.col(key_col).cast("string"), F.lit("|"), F.col("row").cast("string")
        ),
        seed,
    ) % w
    probe = probe.select(F.col(key_col), "row", col.cast("int").alias("col"))
    return (
        probe.join(F.broadcast(counters), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join

BLOOM_M = 1024  # bits
BLOOM_K = 3  # hash functions


def bloom_bits(
    build: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: str = "#bloom",
) -> DataFrame:
    """(pos) distinct set-bit positions of the build side's Bloom filter.

    ≤ m rows regardless of build cardinality — the broadcastable bit set.
    """
    pos = build.select(
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        F.col(key_col).cast("string").alias("key"),
    ).select(
        (
            portable_hash64(
                F.concat(F.col("key"), F.lit("|"), F.col("j").cast("string")), seed
            )
            % m
        )
        .cast("int")
        .alias("pos")
    )
    return pos.distinct()


def bloom_probe_keys(
    probe_keys: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: str = "#bloom",
) -> DataFrame:
    """Adds ``bloom_pass`` to the DISTINCT probe-key table: true iff all k
    bit positions of the key are set. Probing the distinct key domain once
    (then broadcasting the decorated keys back onto the fact table) is the
    scale shape — the fact table itself never joins the bit set."""
    probe = probe_keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
    )
    pos = (
        portable_hash64(
            F.concat(
                F.col(key_col).cast("string"), F.lit("|"), F.col("j").cast("string")
            ),
            seed,
        )
        % m
    ).cast("int")
    probe = probe.select(F.col(key_col), pos.alias("pos"))
    hits = (
        probe.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        probe_keys.select(key_col)
        .distinct()
        .join(hits, key_col, "left")
        .select(
            F.col(key_col),
            (F.coalesce(F.col("n_hit"), F.lit(0)) == k).alias("bloom_pass"),
        )
    )
