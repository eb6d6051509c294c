"""Deterministic sampling / dataset-split operators for training-data
curation.

Beyond-reference surface: a corpus pipeline needs reproducible sampling
— re-running the job on the same data MUST select the same rows, and
membership must be decidable per-row (no global state), or the sample
shifts under retries/partition changes and train/test sets leak into
each other. ``df.sample()`` fails both (seeded per-partition RNG ⇒
partitioning-dependent), so everything here derives from a content
hash of the row's stable id:

- ``hash_unit``: md5-derived 28-bit integer → uniform [0, 1) double.
  Same primitive family as operators.dedup.h28, so a DuckDB oracle
  reproduces it bit-for-bit; salt isolates independent experiments.
- stratified Bernoulli sampling with per-stratum rates (balance
  languages/sources without a shuffle: pure narrow filter),
- train/val/test split by hash threshold (a row's split NEVER changes
  as the corpus grows — the property random splits lack),
- deterministic per-group top-n sample (bounded output per stratum via
  one window; the "give me 20 examples per language" shape).

All narrow or single-shuffle; no UDFs; scale = the scan itself.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = float(1 << 28)  # h28 range; fraction = h / 2^28 is exact in fp64


def hash_unit(col: Column | str, salt: str) -> Column:
    """Uniform [0, 1) double from md5 of (salt | value) — deterministic,
    partition-independent, reproducible in ANSI SQL:
    ``CAST('0x' || substr(md5(salt || '|' || x), 1, 7) AS BIGINT) / 2^28``."""
    tagged = F.concat(F.lit(f"{salt}|"), F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    h = F.conv(F.substring(F.md5(tagged), 1, 7), 16, 10).cast("long")
    return h / F.lit(HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum Bernoulli sample: keep a row iff its hash fraction is
    below its stratum's rate. Narrow (filter only) — sampling 100 TB
    costs exactly one scan, and the kept set is stable under re-runs,
    repartitioning, and corpus append."""
    rate = F.lit(float(default_rate))
    for k, v in rates.items():
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_unit(id_col, salt) < rate)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
) -> DataFrame:
    """Assign every row a split label by hash threshold. Because
    membership depends only on the row id, growing the corpus never
    moves an old row between splits (no train/test leakage across
    dataset versions)."""
    frac = hash_unit(id_col, salt)
    acc = 0.0
    expr = F.lit(names[-1])
    bounds = []
    for w, n in zip(weights[:-1], names[:-1]):
        acc += float(w)
        bounds.append((acc, n))
    for bound, n in reversed(bounds):
        expr = F.when(frac < F.lit(bound), F.lit(n)).otherwise(expr)
    return df.withColumn("split", expr)


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "prio",
) -> DataFrame:
    """Weighted without-replacement sample of ``n`` rows via priority
    sampling (Duffield–Lund–Thorup, JACM 2007): each row gets priority
    q_i = w_i / u_i with u_i uniform on (0, 1], and the sample is the n
    highest-priority rows — inclusion probability approaches
    min(1, n·w_i/Σw) and subset-sum estimates from the sample are
    unbiased under the DLT threshold estimator.

    Everything stays in EXACT integer arithmetic so the sample is
    bit-reproducible and oracle-checkable: u_i = (h_i + 1) / 2^28 with
    h_i the 28-bit content hash, hence

        q_i = (w_i · 2^28) div (h_i + 1)     (BIGINT, no floats).

    Plan: one narrow scan computing q, then a global top-n — Spark
    lowers orderBy+limit to TakeOrderedAndProject (per-partition heap of
    n, merged on one reducer), so there is no full sort and no shuffle
    of the corpus; ties (same q) break by id on both engines."""
    tagged = F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(tagged), 1, 7), 16, 10).cast("long")
    out = df.withColumn("_h1", h + F.lit(1)).withColumn(
        "priority", F.expr(f"(CAST({weight_col} AS BIGINT) * 268435456) div _h1")
    )
    return out.orderBy(F.col("priority").desc(), F.col(id_col)).limit(n).drop("_h1")


def group_sample_topn(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str,
    salt: str = "topn",
) -> DataFrame:
    """Deterministic n-per-group sample: rank rows inside each group by
    (hash, id) — a reproducible random order — and keep the first n.
    One shuffle on the group column; output is bounded at n × #groups
    regardless of input size (the safe "examples per stratum" query at
    any scale)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))), 1, 7),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def shard_assignments(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Deterministic output-shard assignment for corpus export: adds
    ``shard_id`` = floor(hash_unit × n_shards) — content-hashed, so a
    document lands in the same shard across re-runs, retries, and
    corpus repartitioning (rewriting shard k touches only shard k's
    readers downstream). Narrow: sharding 100 TB costs nothing beyond
    the export scan itself; the physical write is
    ``df.repartition(n_shards, "shard_id")`` + partitioned write, one
    shuffle whose keys are uniform by construction (md5), so no shard
    becomes a straggler."""
    return df.withColumn(
        "shard_id", F.floor(hash_unit(id_col, salt) * n_shards).cast("long")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: Mapping[str, float],
    n_target: int,
    salt: str = "mix",
) -> DataFrame:
    """Sample toward a TARGET MIXTURE: given per-stratum mixing weights
    (the data-mixing step of training-corpus assembly — "2 parts web,
    1 part wiki…"), derive each stratum's Bernoulli rate from its
    observed size so the kept set approximates ``n_target`` rows
    distributed proportionally to ``weights``:

        desired_s = n_target · w_s / Σw
        rate_s    = min(1, desired_s / count_s)

    Strata absent from ``weights`` are excluded. A stratum too small
    for its quota saturates at rate 1 (it cannot be oversampled —
    upsampling is a separate epoch-repeat concern, not row sampling).
    Conversely, a ``weights`` entry with NO rows in the data still
    claims its share of ``n_target`` (Σw includes it), so the kept total
    undershoots the target by that share — the quota of an empty stratum
    is deliberately NOT redistributed, keeping every other stratum's
    rate (and therefore its kept membership) independent of which other
    strata happen to be present.

    Plan: one tiny per-stratum count aggregate (map-side partial)
    broadcast back onto the scan, then the same narrow content-hash
    filter as stratified_sample — membership is deterministic and
    partition-independent, so the mixture is reproducible and stable
    under corpus growth of OTHER strata. Cost at 100 TB: the scan,
    twice (count + filter); no corpus shuffle.
    """
    wsum = float(sum(weights.values()))
    wcol = F.lit(None).cast("double")
    for k, v in weights.items():
        wcol = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(wcol)
    rates = (
        df.groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(strata_col, "__n", wcol.alias("__w"))
        # drop unweighted strata BEFORE least(): least() skips nulls, so
        # folding a null weight into it would silently yield rate 1.0.
        .filter(F.col("__w").isNotNull())
        .select(
            strata_col,
            F.least(
                F.lit(1.0),
                (F.lit(float(n_target)) * F.col("__w") / F.lit(wsum)) / F.col("__n"),
            ).alias("__rate"),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_unit(id_col, salt) < F.col("__rate"))
        .drop("__rate")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_target: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened mixture sampling: derive the mixing weights
    FROM the observed stratum sizes, ``w_s ∝ √n_s`` (the multilingual /
    multi-source rebalancing rule w_s ∝ n_s^α with α = 0.5 — small
    sources get boosted relative to their raw share, big sources get
    tempered), then keep each stratum at

        rate_s = round(min(1, (n_target · w_s / Σw) / n_s), 6)

    via the same content-hash Bernoulli filter as stratified_sample.
    α is fixed at 0.5 because IEEE sqrt is correctly rounded — both
    engines (and any partitioning) agree bit-for-bit, which a general
    ``pow(n, α)`` does not guarantee. The rate rounds to 6 decimals so
    the Σ√n summation order (engine-dependent in the last ulp) cannot
    flip a keep decision: hash fractions live on a 2⁻²⁸ grid that never
    sits within an ulp of a 10⁻⁶ grid point.

    Unlike ``mixture_sample`` there is no weights argument to go stale:
    the mixture adapts as the corpus grows. Plan: one tiny per-stratum
    count (map-side partial) + a 1-row Σ√n attach, broadcast back onto
    the scan, then a narrow filter — no corpus shuffle at any scale.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    wsum = counts.agg(F.sum(F.sqrt("__n")).alias("__wsum"))
    rates = counts.crossJoin(F.broadcast(wsum)).select(
        strata_col,
        F.round(
            F.least(
                F.lit(1.0),
                (F.lit(float(n_target)) * F.sqrt("__n") / F.col("__wsum")) / F.col("__n"),
            ),
            6,
        ).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_unit(id_col, salt) < F.col("__rate"))
        .drop("__rate")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    n_buckets: int = 1024,
) -> DataFrame:
    """Global training-order shuffle: every row gets ``shuffle_pos`` =
    its 1-based rank under content-hash order (ties broken by id) — the
    epoch-shuffle of a training pipeline, reproducible across reruns and
    partitioning changes because the order derives only from md5.

    A naive ``row_number() OVER (ORDER BY hash)`` is a single-partition
    window — the anti-pattern at 100 TB. This is the two-level
    distributed rank (same machinery as packing.pack_sequences): the
    hash fraction's leading bits pick one of ``n_buckets`` ORDER-ALIGNED
    buckets (bucket ascending ⇔ hash ascending), rows rank inside their
    bucket in parallel, and each bucket adds the row-count prefix of the
    buckets below it — a window over ``n_buckets`` rows, not the corpus.
    Total: one hash-partition shuffle + a broadcast of bucket offsets.

    Returns the input columns plus ``shuffle_pos`` (long).
    """
    frac = hash_unit(id_col, salt)
    t = df.withColumn("__frac", frac).withColumn(
        "__bucket", F.floor(F.col("__frac") * n_buckets).cast("int")
    )
    local_w = Window.partitionBy("__bucket").orderBy("__frac", id_col)
    t = t.withColumn("__local_rank", F.row_number().over(local_w))

    totals = t.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__total"))
    prefix_w = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.select(
        "__bucket",
        F.coalesce(F.sum("__total").over(prefix_w), F.lit(0)).alias("__prefix"),
    )
    return (
        t.join(F.broadcast(prefixes), "__bucket")
        .withColumn("shuffle_pos", (F.col("__prefix") + F.col("__local_rank")).cast("long"))
        .drop("__frac", "__bucket", "__local_rank", "__prefix")
    )
