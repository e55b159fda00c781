"""Count-Min sketch frequency estimation (Cormode & Muthukrishnan,
J. Algorithms 55(1) 2005) — the bounded-memory, MERGEABLE frequency
summary a 100 TB token stream needs: the sketch is a d×w grid of
exact long cell counts, each cell a plain SUM, so per-partition
sketches combine by cell-wise addition (Spark's partial aggregation
IS the sketch merge) and the whole summary broadcasts at d·w longs
regardless of vocabulary size.

Estimates are deterministic: every cell count is an order-free long
sum and the point estimate is min over d cells, so results are
bit-identical at any parallelism and restatable verbatim in SQL. The
classic guarantee holds per sketch: est >= true always (counts only
collide upward), and est <= true + εN with probability 1−δ for
w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Hashing: the d rows use the portable sha256-derived family
(linking.portable_hash60 with per-row seeds — seed appended behind a
separator inside the digest input, so rows are independent; the
xxhash64 seed-ordering trap documented in operators/linking.py does
not arise for a cryptographic family). Production can swap
xxhash64(lit(i), col) per the seed-first discipline; the portable
family is the oracle-checked default here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import linking
from .textstats import word_tokens


def cms_build(
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """One counting pass -> the sketch as (row, bucket, c) cells
    (missing cells are zero). d·w rows — broadcastable."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    rows = None
    for i in range(depth):
        r = items.select(
            F.lit(i).alias("row"),
            F.pmod(linking.portable_hash60(F.col(col), seed=i), F.lit(width))
            .cast("int")
            .alias("bucket"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.groupBy("row", "bucket").agg(F.count("*").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate every candidate against the sketch ->
    candidates + est_c = min over the d cells. The sketch joins
    broadcast (d·w rows); each candidate probes d cells via one
    union-projection + join + min-agg — no per-row Python."""
    probes = None
    for i in range(depth):
        p = candidates.select(
            F.col(col),
            F.lit(i).alias("row"),
            F.pmod(linking.portable_hash60(F.col(col), seed=i), F.lit(width))
            .cast("int")
            .alias("bucket"),
        )
        probes = p if probes is None else probes.unionAll(p)
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est_c")
    )


def heavy_hitters_check(
    df: DataFrame,
    text_col: str = "text",
    k: int = 30,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Demonstration harness: exact top-k tokens by true count vs
    their Count-Min estimates -> (token, true_c, est_c, overcount).
    overcount = est_c − true_c is >= 0 ALWAYS (the one-sided CMS
    guarantee — asserted by the oracle row-for-row); its size shows
    the ε·N collision noise at the chosen width."""
    toks = df.select(
        F.explode(word_tokens(F.col(text_col))).alias("token")
    )
    true_counts = toks.groupBy("token").agg(F.count("*").alias("true_c"))
    top = true_counts.orderBy(
        F.desc("true_c"), F.col("token").asc()
    ).limit(int(k))
    sketch = cms_build(toks, "token", depth=depth, width=width)
    est = cms_estimate(sketch, top.select("token"), "token",
                       depth=depth, width=width)
    return (
        top.join(est, "token")
        .select(
            "token",
            "true_c",
            "est_c",
            (F.col("est_c") - F.col("true_c")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("true_c"), F.col("token").asc())
    )


def linear_counting(
    items: DataFrame,
    col: str,
    group: str | None = None,
    m: int = 1024,
) -> DataFrame:
    """Linear-counting distinct estimation (Whang, Vander-Zanden &
    Taylor, TODS 15(2) 1990) -> per group: (n_occupied,
    est_distinct): hash every value into an m-bucket bitmap and
    estimate n ≈ −m·ln(V) from the empty fraction V — the
    bounded-memory cardinality sketch that predates HLL and has an
    EXACTLY restatable state: the occupied-bucket set is
    a plain distinct aggregate (deterministic integers, mergeable by
    union — per-partition bitmaps combine exactly like the Count-Min
    cells), and only the derived estimate is a double (same IEEE ln
    on identical integer inputs on any engine).

    Accuracy holds while the bitmap stays unsaturated (standard
    guidance m >~ n; the estimate diverges as n_occupied -> m and is
    returned as NULL at full saturation, where ln(0) is undefined).
    Portable sha256 bucket hash (the sketch family discipline);
    production swaps xxhash64."""
    if m < 1:
        raise ValueError("m must be >= 1")
    keys = [group] if group else []
    occ = (
        items.select(
            *keys,
            F.pmod(linking.portable_hash60(F.col(col)), F.lit(m))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy(*keys)
        .agg(F.countDistinct("bucket").alias("n_occupied"))
    )
    md = float(m)
    return occ.select(
        *keys,
        "n_occupied",
        F.when(
            F.col("n_occupied") < m,
            F.round(
                -F.lit(md)
                * F.log((F.lit(md) - F.col("n_occupied")) / F.lit(md)),
                4,
            ),
        ).alias("est_distinct"),
    )


def hll_registers(
    items: DataFrame,
    col: str,
    group: str | None = None,
    p: int = 10,
) -> DataFrame:
    """HyperLogLog register state (Flajolet, Fusy, Gandouet & Meunier,
    AofA 2007) -> per group: (bucket, register) rows for the occupied
    buckets of an m = 2^p register array over the 60-bit portable
    hash: bucket = the top p bits, register = max over items of
    rho(remaining w = 60−p bits), rho = leading zeros + 1.

    The state is EXACT integers end to end — rho comes from the bit
    length of the remainder (length(bin(x)), no floating log), the
    register is a plain MAX (order-free: Spark's partial aggregation
    IS the HLL merge, and two sketches union by bucket-wise max) — so
    the state is restatable verbatim in SQL despite HLL's reputation
    as an approximate-only structure; only hll_estimate's harmonic
    readout derives doubles, and those from exact longs. p in [7,16]
    keeps every 2^(w+1−register) term inside exact-double range for
    the estimator."""
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16]")
    w = 60 - p
    keys = [group] if group else []
    h = linking.portable_hash60(F.col(col))
    rem = F.pmod(h, F.lit(1 << w))
    rho = (
        F.when(rem == 0, F.lit(w + 1))
        .otherwise(F.lit(w + 1) - F.length(F.bin(rem)))
        .cast("int")
    )
    return (
        items.select(
            *keys,
            F.shiftright(h, w).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group: str | None = None,
    p: int = 10,
) -> DataFrame:
    """Harmonic-mean readout of hll_registers -> per group: (n_zero,
    s_scaled, est_distinct). The indicator sum Σ 2^−M_j is kept as an
    exact long: s_scaled = Σ 2^(w+1−M_j) over present buckets plus
    n_zero·2^(w+1) for the empty ones (every term is a dyadic integer
    ≤ 2^(w+1), the total ≤ m·2^(w+1) = 2^61 — no overflow, no
    order-dependent float rounding), and the raw estimate is ONE
    double division alpha_m·m²·2^(w+1) / s_scaled on identical
    integers. Small-range correction per the paper: when raw ≤ 2.5m
    and zero registers exist, fall back to linear counting
    m·ln(m/n_zero). Standard error ≈ 1.04/sqrt(m) (~3.2% at p=10)."""
    if not 7 <= p <= 16:
        raise ValueError("p must be in [7, 16]")
    m = 1 << p
    w1 = 60 - p + 1
    # one Python-computed double literal, embedded identically in the
    # SQL oracle — no cross-engine expression-shape drift
    num = 0.7213 / (1.0 + 1.079 / m) * (m * m) * float(2 ** w1)
    keys = [group] if group else []
    agg = registers.groupBy(*keys).agg(
        (F.lit(m) - F.count("*")).cast("long").alias("n_zero"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(w1) - F.col("register")).cast("long")
        ).alias("s_present"),
    )
    s = (
        F.col("s_present")
        + F.col("n_zero") * F.lit(1 << w1).cast("long")
    ).cast("long")
    raw = F.lit(num) / s.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")),
    ).otherwise(raw)
    return agg.select(
        *keys,
        "n_zero",
        s.alias("s_scaled"),
        F.round(est, 4).alias("est_distinct"),
    )


def hll_cardinality(
    items: DataFrame,
    col: str,
    group: str | None = None,
    p: int = 10,
) -> DataFrame:
    """hll_registers |> hll_estimate — per group (n_zero, s_scaled,
    est_distinct). One shuffle on (group, bucket) builds the state;
    the readout re-aggregates m rows per group."""
    return hll_estimate(
        hll_registers(items, col, group=group, p=p), group=group, p=p
    )


def bloom_bits(
    keys: DataFrame,
    col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom filter build (Bloom, CACM 13(7) 1970) -> the set-bit
    positions as (bit) rows: each key sets n_hashes seeded portable
    buckets; the state is a plain DISTINCT over exact integers —
    mergeable by union (two filters over the same (m, k) family OR
    together exactly like the Count-Min cells add), at most m_bits
    rows regardless of key count, and restatable verbatim in SQL.
    This is the row-set encoding of the classic bitmap: the
    one-sided guarantee (no false negatives, false positives bounded
    by the fill factor) carries over unchanged."""
    if m_bits < 2 or n_hashes < 1:
        raise ValueError("m_bits must be >= 2 and n_hashes >= 1")
    bits = None
    for i in range(n_hashes):
        b = keys.select(
            F.pmod(linking.portable_hash60(F.col(col), seed=i),
                   F.lit(m_bits)).cast("int").alias("bit")
        )
        bits = b if bits is None else bits.unionAll(b)
    return bits.distinct()


def bloom_semijoin(
    probe: DataFrame,
    col: str,
    bits: DataFrame,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Bloom-filtered semi-join: keep the probe rows whose key sets
    ALL n_hashes bits in the broadcast filter — the classic
    shuffle-avoidance move for a 100 TB fact⋈dim: the dim side
    compresses to <= m_bits integers, broadcasts everywhere, and the
    fact side is pre-filtered BEFORE any shuffle (what Spark's
    runtime rowgroup bloom pushdown does, here as an explicit,
    oracle-checkable operator). Probe keys are deduplicated first
    (the pass decision is a function of the key), probed with one
    union-projection + broadcast join + count == n_hashes, and the
    passing key set semi-joins back — the probe table itself never
    moves. False positives pass (by design); callers needing
    exactness follow with the true join, now over a fraction of the
    rows."""
    keys = probe.select(col).distinct()
    probes = None
    for i in range(n_hashes):
        p = keys.select(
            F.col(col),
            F.pmod(linking.portable_hash60(F.col(col), seed=i),
                   F.lit(m_bits)).cast("int").alias("bit"),
        )
        probes = p if probes is None else probes.unionAll(p)
    passing = (
        probes.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("_nb"))
        .filter(F.col("_nb") == n_hashes)
        .select(col)
    )
    return probe.join(F.broadcast(passing), col, "left_semi")


def bloom_semijoin_audit(
    build: DataFrame,
    probe: DataFrame,
    build_col: str,
    probe_col: str,
    m_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """One-row audit of the Bloom semi-join against the exact
    semi-join -> (n_bits_set, n_probe_rows, n_bloom_pass, n_true,
    n_false_pos, fp_rate): n_false_pos = bloom-passing rows whose key
    is NOT in the build set (>= 0 always — the one-sided guarantee,
    value-checked by the oracle row-for-row; no false negatives means
    n_bloom_pass >= n_true ALWAYS). fp_rate is the derived double
    false-positive fraction of the probe rows."""
    bits = bloom_bits(build, build_col, m_bits=m_bits, n_hashes=n_hashes)
    bkeys = build.select(F.col(build_col).alias(probe_col)).distinct()
    passed = bloom_semijoin(
        probe, probe_col, bits, m_bits=m_bits, n_hashes=n_hashes
    )
    true_rows = probe.join(F.broadcast(bkeys), probe_col, "left_semi")
    fp_rows = passed.join(F.broadcast(bkeys), probe_col, "left_anti")
    return (
        bits.agg(F.count("*").alias("n_bits_set"))
        .crossJoin(probe.agg(F.count("*").alias("n_probe_rows")))
        .crossJoin(passed.agg(F.count("*").alias("n_bloom_pass")))
        .crossJoin(true_rows.agg(F.count("*").alias("n_true")))
        .crossJoin(fp_rows.agg(F.count("*").alias("n_false_pos")))
        .select(
            "n_bits_set", "n_probe_rows", "n_bloom_pass", "n_true",
            "n_false_pos",
            F.when(
                F.col("n_probe_rows") > 0,
                F.round(F.col("n_false_pos") / F.col("n_probe_rows"), 6),
            ).otherwise(F.lit(0.0)).alias("fp_rate"),
        )
    )


#: KMV hash range: portable_hash60 is uniform on [0, 2^60)
KMV_RANGE = float(1 << 60)


def kmv_state(
    items: DataFrame,
    col: str,
    k: int = 128,
    group: str | None = None,
) -> DataFrame:
    """KMV / bottom-k sketch state (Bar-Yossef et al., RANDOM 2002;
    the Theta-sketch base) -> per group: the k smallest DISTINCT
    portable hash values as (h) rows. Exact integers (a distinct +
    per-group bottom-k — deterministic at any parallelism), mergeable
    by union-then-rebottom-k, restatable in SQL as row_number over
    the hash order. Unsaturated groups (< k distinct hashes) retain
    everything — the sketch IS the set there."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window as W

    keys = [group] if group else []
    h = items.select(*keys, linking.portable_hash60(F.col(col)).alias("h"))
    # Two-phase bottom-k. A single global window (empty partitionBy
    # when group=None) funnels EVERY distinct hash through one task —
    # the single-task window trap (see snm_pairs). Phase 1 buckets the
    # hashes by pmod(h, P) and takes each bucket's k smallest DISTINCT
    # values in parallel (dense_rank tolerates duplicate hashes, so no
    # separate global distinct pass is needed); the global k smallest
    # are necessarily within their own bucket's k smallest, so phase 2
    # only ranks the <= P*k survivors — a few thousand rows per group
    # regardless of input size. Output is identical to the one-window
    # form (exact, deterministic at any parallelism and any P).
    par = items.sparkSession.sparkContext.defaultParallelism
    n_buckets = max(8 * par, 64)
    b = h.withColumn("_b", F.pmod(F.col("h"), F.lit(n_buckets)))
    w1 = W.partitionBy(*keys, "_b").orderBy(F.col("h").asc())
    survivors = (
        b.withColumn("_dr", F.dense_rank().over(w1))
        .filter(F.col("_dr") <= k)
        .select(*keys, "h")
        .distinct()
    )
    w2 = W.partitionBy(*keys).orderBy(F.col("h").asc())
    return (
        survivors.select(*keys, "h", F.row_number().over(w2).alias("_r"))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_distinct(
    items: DataFrame,
    col: str,
    k: int = 128,
    group: str | None = None,
) -> DataFrame:
    """Bottom-k distinct estimation -> per group: (n_state, kth_hash,
    est_distinct): saturated groups estimate n̂ = (k−1)·R / h_(k)
    (the classic unbiased bottom-k estimator over hash range R);
    unsaturated groups return the EXACT distinct hash count (the
    sketch saw everything). kth_hash (= max retained hash) and
    n_state are exact longs; the estimate is one double division on
    them. Relative error ~ 1/sqrt(k−2)."""
    keys = [group] if group else []
    state = kmv_state(items, col, k=k, group=group)
    agg = state.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_state"),
        F.max("h").alias("kth_hash"),
    )
    est = F.when(
        F.col("n_state") < k, F.col("n_state").cast("double")
    ).otherwise(
        F.lit((k - 1) * KMV_RANGE) / F.col("kth_hash").cast("double")
    )
    return agg.select(
        *keys, "n_state", "kth_hash",
        F.round(est, 4).alias("est_distinct"),
    )


def theta_intersection(
    items_a: DataFrame,
    items_b: DataFrame,
    col: str,
    k: int = 128,
) -> DataFrame:
    """Theta-sketch intersection estimate (Dasgupta et al., the
    DataSketches theta framework) -> one row (n_a_state, n_b_state,
    theta, n_common_below, est_intersection): θ = min over the two
    sketches of (kth min hash if saturated else R), the common
    retained hashes below θ are an unbiased sample of the true
    intersection at rate θ/R, so est = n_common_below · R / θ — set
    algebra on sketches WITHOUT joining the raw sets, the move that
    answers |A ∩ B| over two 100 TB key sets from two k-row
    summaries. Every input to the estimate is an exact long (hash
    bottom-k states, θ, the common count); the estimate is one
    double division. Unsaturated-on-both-sides degenerates to the
    exact intersection (θ = R)."""
    sa = kmv_state(items_a, col, k=k)
    sb = kmv_state(items_b, col, k=k)
    r_long = F.lit(1 << 60).cast("long")
    agg_a = sa.agg(
        F.count("*").cast("long").alias("n_a_state"),
        F.max("h").alias("_ha"),
    )
    agg_b = sb.agg(
        F.count("*").cast("long").alias("n_b_state"),
        F.max("h").alias("_hb"),
    )
    one = agg_a.crossJoin(agg_b).select(
        "n_a_state", "n_b_state",
        F.least(
            F.when(F.col("n_a_state") >= k, F.col("_ha"))
            .otherwise(r_long),
            F.when(F.col("n_b_state") >= k, F.col("_hb"))
            .otherwise(r_long),
        ).alias("theta"),
    )
    common = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(one.select("theta")))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").cast("long").alias("n_common_below"))
    )
    return one.crossJoin(common).select(
        "n_a_state", "n_b_state", "theta", "n_common_below",
        F.round(
            F.col("n_common_below").cast("double")
            * F.lit(KMV_RANGE)
            / F.col("theta").cast("double"),
            4,
        ).alias("est_intersection"),
    )


def ams_f2(
    items: DataFrame,
    col: str,
    lanes: int = 64,
) -> DataFrame:
    """AMS second-moment sketch (Alon, Matias & Szegedy, STOC 1996 —
    the tug-of-war estimator) -> one row (n_lanes, sum_sq, est_f2):
    F2 = Σ_x f_x² is the SELF-JOIN SIZE of the stream on `col`, the
    quantity a join planner wants before committing to a shuffle.
    Each lane j keeps z_j = Σ over occurrences of ±1 (the portable
    lane hash's parity bit), E[z_j²] = F2 exactly, and averaging
    `lanes` independent lanes gives relative error ~ sqrt(2/lanes).

    Exactness discipline: every z_j is an exact long sum of ±1
    (order-free — partial aggregation IS the sketch merge; two
    sketches combine by lane-wise ADDITION, unlike the max-merge of
    HLL/KMV), sum_sq = Σ z_j² is exact long arithmetic, and est_f2
    = sum_sq / lanes is the single double division. One scan, no
    explode: all lanes are aggregate expressions over the lane-sliced
    digest family (4 lanes per sha256 round), so the sketch costs
    ceil(lanes/4) digests per row and ZERO shuffles beyond the final
    lanes-column aggregate."""
    if lanes < 1:
        raise ValueError("lanes must be >= 1")
    n_digests = (lanes + linking.PORTABLE_LANES_PER_DIGEST - 1) \
        // linking.PORTABLE_LANES_PER_DIGEST
    row = items.select(
        *[
            linking.portable_digest(F.col(col), b).alias(f"_d{b}")
            for b in range(n_digests)
        ]
    )
    sums = []
    for j in range(lanes):
        b, lane = divmod(j, linking.PORTABLE_LANES_PER_DIGEST)
        sign = F.lit(1) - F.lit(2) * F.pmod(
            linking.portable_lane60(F.col(f"_d{b}"), lane), F.lit(2)
        )
        sums.append(F.sum(sign).cast("long").alias(f"_z{j}"))
    agg = row.agg(*sums)
    sum_sq = None
    for j in range(lanes):
        t = F.col(f"_z{j}") * F.col(f"_z{j}")
        sum_sq = t if sum_sq is None else sum_sq + t
    return agg.select(
        F.lit(lanes).alias("n_lanes"),
        sum_sq.cast("long").alias("sum_sq"),
        F.round(
            sum_sq.cast("double") / F.lit(float(lanes)), 4
        ).alias("est_f2"),
    )
