"""Cross-engine-replayable sketches: HyperLogLog and Count-Min, built
from scratch on the repo's 60-bit md5 hash contract (dedupfns.hash60).

Unlike Spark's built-in approx_count_distinct (whose HLL++ internals are
not reproducible outside the JVM), these sketches are DESIGNED so every
intermediate is an exact integer a SQL oracle can replay:

- HLL registers are `max(rho)` per bucket where rho is the position of
  the least-significant set bit of the hash suffix (the LSB variant of
  the classic leading-zeros statistic — identically geometric(1/2), so
  the standard estimator constants apply unchanged). Register building
  is a plain groupBy-max: mergeable (HLL union == elementwise register
  max), shuffle O(buckets), and integer-exact.
- The estimator's only float steps consume exact integers: the register
  sum is carried as the integer sum of 2^(W+1-rho) (never a float sum,
  whose rounding would be accumulation-order-dependent and break
  cross-engine hashes), and ln/division are single IEEE ops on identical
  inputs, rounded to 6 decimals (the repo-wide tactic).
- Count-Min counters are d x w integer cells via one groupBy-count over
  (row, bucket); point estimates are `min` over d cells. Everything is
  a BIGINT; the CMS overestimate invariant (estimate >= true count)
  is asserted in tests and in the oracle-checked output.

Scale shape (100 TB): both sketches reduce the corpus in ONE partial-agg
shuffle to O(m) / O(d*w) cells (map-side combine does the heavy
lifting); estimates then operate on broadcast-sized frames. Register
merge across groups (weeks, sources) is another O(groups * m) groupBy —
this is exactly how distributed sketch libraries shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60

# HLL: m = 2^P buckets; the hash suffix carries W usable bits.
HLL_P = 8
HLL_M = 1 << HLL_P
HLL_W = 52  # 60-bit hash minus 8 bucket bits
# alpha_m for m >= 128 (Flajolet et al. 2007): 0.7213 / (1 + 1.079/m)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

# Count-Min: d rows x w buckets
CMS_D = 4
CMS_W = 512


def hll_bucket_rho(col: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one element: bucket = low P bits of hash60;
    rho = 1-based position of the least-significant set bit of the
    remaining W bits (W+1 when the suffix is all zeros). The LSB isolate
    `suffix & -suffix` is an exact power of two <= 2^51, so log2 of it
    is float-exact and the whole statistic stays integer."""
    h = hash60(col)
    bucket = (h % F.lit(HLL_M)).cast("int")
    # exact integer shift — NOT `/` (float division rounds above 2^53)
    suffix = F.shiftright(h, HLL_P)
    lsb = suffix.bitwiseAND(-suffix)
    rho = F.when(suffix == 0, F.lit(HLL_W + 1)).otherwise(
        (F.log2(lsb.cast("double")) + 1).cast("int")
    )
    return bucket, rho


def hll_registers(df: DataFrame, group_cols: list[str], elem: Column) -> DataFrame:
    """Sketch build: max rho per (group, bucket). One partial-agg
    shuffle of O(groups * m) output; duplicates of an element can never
    change a max, which is what makes this a DISTINCT-count sketch."""
    bucket, rho = hll_bucket_rho(elem)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate per group from registers: integer register sum
    S = sum 2^(W+1-rho) + zeros * 2^(W+1)  (exact BIGINT; max 2^61),
    raw = alpha * m^2 * 2^(W+1) / S, with the standard small-range
    linear-counting correction when raw <= 2.5m and zero buckets exist.
    Rounded to 6 decimals after single IEEE ops on exact integers."""
    scale = F.lit(float(HLL_ALPHA * HLL_M * HLL_M * (1 << (HLL_W + 1))))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - rho)"))
        .alias("s_hit"),
        F.count(F.lit(1)).alias("n_hit"),
    )
    zeros = (F.lit(HLL_M) - F.col("n_hit")).cast("bigint")
    s_total = (
        F.col("s_hit")
        + zeros * F.lit(1 << (HLL_W + 1)).cast("bigint")
    ).cast("double")
    raw = scale / s_total
    corrected = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_hit").cast("bigint").alias("n_registers_hit"),
        F.round(corrected, 6).alias("hll_estimate"),
    )


# Affine universal-hash family for the d CMS rows: one expensive md5
# per term, d cheap derived functions (same ONE-hash pattern as the
# minhash family in dedupfns.shingle_bases). (a*h + b) mod P with
# a, b < P and h reduced mod P first keeps every product < 2^62 —
# exact in BIGINT on both engines. Pairwise independence of the affine
# family is exactly the CMS requirement.
CMS_P = 1_000_000_007
CMS_A = [1_103_515_245, 214_013, 69_069, 134_775_813]
CMS_B = [12_345, 2_531_011, 362_437, 1]


def cms_bucket(term: Column, row: Column) -> Column:
    """Row-i bucket of a term: ((A[i] * (hash60(term) mod P) + B[i])
    mod P) mod w — one md5 per term regardless of d."""
    hm = hash60(term) % F.lit(CMS_P)
    a = F.element_at(F.array(*[F.lit(x) for x in CMS_A]), row + 1)
    b = F.element_at(F.array(*[F.lit(x) for x in CMS_B]), row + 1)
    return (((a * hm + b) % F.lit(CMS_P)) % F.lit(CMS_W)).cast("int")


def _cms_cells(hm: Column) -> Column:
    """Array of (row, bucket) structs derived from the ONE reduced hash
    — the md5 is computed once per term, outside this expression."""
    rows = F.sequence(F.lit(0), F.lit(CMS_D - 1))

    def cell(i: Column) -> Column:
        a = F.element_at(F.array(*[F.lit(x) for x in CMS_A]), i + 1)
        b = F.element_at(F.array(*[F.lit(x) for x in CMS_B]), i + 1)
        bucket = (((a * hm + b) % F.lit(CMS_P)) % F.lit(CMS_W)).cast("int")
        return F.struct(i.cast("int").alias("row"), bucket.alias("bucket"))

    return F.transform(rows, cell)


def cms_counters(df: DataFrame, term_col: str) -> DataFrame:
    """d x w counter matrix: each occurrence increments one cell per
    row. ONE md5 per occurrence (the d row-buckets are cheap affine
    derivations — see CMS_A/CMS_B), transform+explode map-side, then a
    single groupBy-count over (row, bucket) — output is O(d*w) = 2048
    cells, broadcastable."""
    hm = (hash60(F.col(term_col)) % F.lit(CMS_P)).alias("_hm")
    return (
        df.select(hm)
        .select(F.explode(_cms_cells(F.col("_hm"))).alias("c"))
        .select("c.row", "c.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimates(terms: DataFrame, counters: DataFrame, term_col: str) -> DataFrame:
    """min over the d cells a term maps to — the classic CMS point
    query. The counters frame is tiny (d*w cells) and broadcast."""
    hm = (hash60(F.col(term_col)) % F.lit(CMS_P)).alias("_hm")
    probes = terms.select(term_col, hm).select(
        term_col, F.explode(_cms_cells(F.col("_hm"))).alias("c")
    ).select(term_col, "c.row", "c.bucket")
    return (
        probes.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(term_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union law: the sketch of a union is the elementwise register max.
    Exact (not approximate) — the property that makes HLL shardable
    across partitions, micro-batches, and days at 100 TB."""
    merged = register_frames[0]
    for frame in register_frames[1:]:
        merged = merged.unionByName(frame)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))
