"""Relational building blocks — SURVEY.md §2.2–2.6.

Thin, documented compositions of DataFrame built-ins. Everything here is
declarative so Catalyst gets full pushdown / pruning / join-strategy
freedom; the value is the *contract* each function pins down (exact-match
semantics, null handling, determinism) relative to the reference's
imperative pandas code.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# --- joins (SURVEY §2.3) ---------------------------------------------------

def new_rows(parsed: DataFrame, known: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """J1 — rows of ``parsed`` whose key is not in ``known``
    (ref `main_dag.py:143-148,227-229`: per-record membership test)."""
    keys = [key] if isinstance(key, str) else list(key)
    return parsed.join(known.select(*keys), keys, "left_anti")


def deleted_rows(known: DataFrame, parsed: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """J2 — rows of ``known`` never re-seen in ``parsed``
    (ref `main_dag.py:71,146,251-252`; implements the per-row intent —
    the reference's whole-column ``is_seen`` assignment is a bug,
    SURVEY §3.3)."""
    keys = [key] if isinstance(key, str) else list(key)
    return known.join(parsed.select(*keys), keys, "left_anti")


def restrict_to_members(df: DataFrame, members: DataFrame, on: Column | str, broadcast: bool = True) -> DataFrame:
    """J3+J5 — left-semi membership restriction against a (tiny) seed
    dimension (pdf §2.2: authors restricted to cs_researchers.csv).
    ``on`` may be a column name (equi-semi-join) or an arbitrary join
    Column predicate."""
    m = F.broadcast(members) if broadcast else members
    return df.join(m, on, "left_semi")


# --- positional predicates (SURVEY §2.2 P9 / §2.5 W1) -----------------------

def ordered_members(df: DataFrame, group: str, order: Sequence[str], member: str) -> DataFrame:
    """W1 — per-group ordinal-sorted member array: the engine-native form
    of the reference's 1-based author maps (`main_dag.py:159-175`).
    ``array_sort`` over (order…, member) structs keeps everything JVM-side;
    no window shuffle beyond the groupBy. ``order`` must be a TOTAL order
    within the group (pass tiebreak columns) or ordinals are not
    reproducible across engines/partitionings."""
    sort_struct = F.struct(*[F.col(o).alias(f"o{i}") for i, o in enumerate(order)], F.col(member).alias("m"))
    return df.groupBy(group).agg(
        F.transform(F.array_sort(F.collect_list(sort_struct)), lambda s: s["m"]).alias("members")
    )


def nth_member(df: DataFrame, group: str, order: Sequence[str], member: str, n: int) -> DataFrame:
    """P9 — "X is the n-th member" support table: ``(group, nth)`` where
    nth is the 1-based n-th member by ``order`` (docx §Proxy Q1/Q2's
    ``x[2] == pid`` positional test, exact semantics). ``try_element_at``
    tolerates groups with fewer than n members under ANSI mode (the
    reference's ``if len(x) >= 3`` guard)."""
    return ordered_members(df, group, order, member).select(
        F.col(group),
        F.try_element_at("members", F.lit(n)).alias("nth"),
    )


def member_ordinals(df: DataFrame, group: str, order: Sequence[str]) -> DataFrame:
    """W1 as a window: explicit ``row_number`` ordinal per group — exposed
    for workloads that need the window form rather than parse-time arrays.
    ``order`` must be a total order within the group for determinism.
    Null placement is pinned to NULLS LAST (the ANSI / DuckDB row_number
    default — Spark's bare ASC would put nulls first)."""
    w = Window.partitionBy(group).orderBy(*[F.asc_nulls_last(o) for o in order])
    return df.withColumn("ordinal", F.row_number().over(w))


def ordinal_keyed_map(df: DataFrame, group: str, order: Sequence[str], value: Column) -> DataFrame:
    """F9 — the reference's 1-based ordinal-keyed map (`main_dag.py:159-175`)
    per group: ``map<int, value>`` where key = position under the total
    ``order``. Built with array_sort + indexed transform (no window, no
    second shuffle)."""
    sort_struct = F.struct(*[F.col(o).alias(f"o{i}") for i, o in enumerate(order)], value.alias("v"))
    return df.groupBy(group).agg(
        F.map_from_entries(
            F.transform(
                F.array_sort(F.collect_list(sort_struct)),
                lambda s, i: F.struct((i + 1).alias("key"), s["v"].alias("value")),
            )
        ).alias("member_map")
    )


# --- set ops (SURVEY §2.6) ---------------------------------------------------

def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1 — bag union by column NAME (ref ``pd.concat`` axis=0,
    `main_dag.py:227-229,256-258`)."""
    return a.unionByName(b)


def except_by_key(base: DataFrame, remove: DataFrame, key: str | Sequence[str]) -> DataFrame:
    """U2 — remove rows whose key appears in ``remove``
    (ref ``unique.drop(to_be_deleted.index)``, `main_dag.py:259-260`) —
    EXCEPT-by-key, not bag EXCEPT."""
    keys = [key] if isinstance(key, str) else list(key)
    return base.join(remove.select(*keys), keys, "left_anti")


# --- misc (SURVEY §2.4-2.5) --------------------------------------------------

def volume_metrics(new: DataFrame, unique: DataFrame) -> DataFrame:
    """A6 — `main_dag.py:485-488`: one-row (total_new, total_unique).
    Two count aggregates cross-joined; never collects to the driver."""
    n = new.agg(F.count(F.lit(1)).alias("total_new"))
    u = unique.agg(F.count(F.lit(1)).alias("total_unique"))
    return n.crossJoin(u)


def top_k(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """W3 — deterministic LIMIT: callers must pass a total order
    (tie-broken) — an unordered limit is not reproducible across runs."""
    return df.orderBy(*order_cols).limit(k)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: identical semantics to
    ``left.join(right, key, how)`` but a hot key's rows are spread over
    ``n_salts`` shuffle partitions instead of landing on one straggler
    executor.

    Mechanics: each left row gets a deterministic salt (murmur3 of the
    whole row, mod n); the right side is replicated once per salt value
    (explode of a literal sequence — a narrow n× fanout, NOT a shuffle
    n×); the join key becomes (key, salt). Every left row meets each
    matching right row exactly once, so inner/left semantics are
    preserved bag-exactly.

    When to use: a manual escape hatch for skew that AQE's runtime
    skew-join splitting (enabled by default in session.get_spark) can't
    fix — e.g. one key holding >1/n_partitions of the fact table under
    a non-AQE driver, or a skewed LEFT side joining a small-but-not-
    broadcastable right. Replication multiplies the right side's
    shuffle volume by n_salts: keep n_salts ≈ (hot-key share ×
    partition count), and never salt when ``broadcast(right)`` fits.

    Only left-preserving join types are supported: the right side is
    replicated ``n_salts`` times, so right/full-outer (and right_semi/
    right_anti) would emit each unmatched right row once per replica.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports left-preserving joins only {sorted(allowed)}, "
            f"got how={how!r}: the replicated right side would duplicate "
            "unmatched right rows under right/full-outer semantics"
        )
    keys = [key] if isinstance(key, str) else list(key)
    lsalt = left.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lsalt.join(rrep, keys + ["__salt"], how).drop("__salt")


def hot_key_share(df: DataFrame, key: str | Sequence[str], sample_fraction: float = 0.01,
                  seed: int = 42) -> float:
    """Approximate share of the single most frequent key, measured on a
    Bernoulli sample of the (column-pruned) key column. One tiny two-row
    aggregate reaches the driver — this is the AQE-style "measure before
    you re-plan" probe, not a data collect; cost is a sampled scan of
    one column."""
    keys = [key] if isinstance(key, str) else list(key)
    top = (
        df.select(*keys)
        .sample(fraction=sample_fraction, seed=seed)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top"), F.sum("c").alias("total"))
        .collect()[0]
    )
    if not top["total"]:
        return 0.0
    return top["top"] / top["total"]


def adaptive_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
    share_threshold: float | None = None,
    sample_fraction: float = 0.01,
) -> DataFrame:
    """Detect-then-salt: pay the n_salts× right-side replication ONLY
    when the left side is actually skewed. A sampled probe estimates the
    hottest key's share; below ``share_threshold`` (default: one task's
    fair share, 1/defaultParallelism) the plain join is strictly better
    — salting an unskewed join multiplies shuffle volume for nothing.
    This encodes the operator's own guidance ("never salt when the data
    doesn't need it") instead of leaving the decision to the caller."""
    if share_threshold is None:
        share_threshold = 1.0 / left.sparkSession.sparkContext.defaultParallelism
    if hot_key_share(left, key, sample_fraction) > share_threshold:
        return salted_join(left, right, key, n_salts=n_salts, how=how)
    keys = [key] if isinstance(key, str) else list(key)
    return left.join(right, keys, how)
