"""N-dimensional skyline (Pareto frontier) via local-prune → global-resolve.

The 2-D skyline lowers to a running-min sweep (workload/tpch_queries.py
``skyline_parts``) — pure relational ops. At 3+ dimensions no window
trick exists (the frontier is not totally orderable), and the relational
fallback is the quadratic dominance self-join. This module implements
the classic DISTRIBUTED skyline instead (Börzsönyi et al.'s
block-nested-loop kernel inside the two-phase partition scheme):

1. **Local prune** (``mapInPandas``): each Arrow batch is reduced to its
   own skyline. Dominance is transitive, so
   ``skyline(U batchᵢ) = skyline(U skyline(batchᵢ))`` — pruning per
   batch loses nothing and ships only frontier candidates.
2. **Global resolve**: candidates coalesce to one partition and the
   same kernel runs once over the (frontier-sized, not corpus-sized)
   union. Frontier size is data-dependent but typically tiny relative
   to n for correlated dimensions; for anti-correlated worst cases,
   raise dimensions' bucketing upstream or accept the documented cost.

The result is a pure SET property of the input — independent of
partitioning and batch boundaries — so a quadratic NOT-EXISTS SQL
oracle replays it exactly. Exact duplicates of a frontier point all
survive (dominance requires one strict inequality).

Kernel discipline (see tests/test_fetch_staging.py round-2 lessons):
this module registers itself by value with cloudpickle so the worker
needs no repo import, and the kernel yields nothing for empty results
rather than empty frames.
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle as _cp
from pyspark.sql import DataFrame

_cp.register_pickle_by_value(sys.modules[__name__])


def _skyline_block(rows: "list[tuple]", dims: int) -> "list[tuple]":
    """Block-nested-loop skyline over (key, d1..dN) tuples: keep rows no
    other row dominates (<= on all dims, < on at least one). O(n·s) with
    s = current frontier size; sorting by dim-sum first makes likely
    dominators arrive early, shrinking s-scans."""
    rows = sorted(rows, key=lambda r: (sum(r[1:]), r[1:], r[0]))
    front: list[tuple] = []
    for r in rows:
        rd = r[1:]
        dominated = False
        for f in front:
            fd = f[1:]
            if all(fd[i] <= rd[i] for i in range(dims)) and any(
                fd[i] < rd[i] for i in range(dims)
            ):
                dominated = True
                break
        if not dominated:
            front.append(r)
    return front


def skyline_nd(df: DataFrame, key: str, dim_cols: "list[str]") -> DataFrame:
    """Pareto frontier of ``df`` minimizing every column in ``dim_cols``.

    Returns the frontier rows (key + dims). Two ``mapInPandas`` passes:
    per-batch local prune, then a single-partition global resolve over
    the pruned candidates.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    cols = [key] + list(dim_cols)
    ndim = len(dim_cols)
    schema = df.select(*cols).schema

    def _kernel(batches):
        # Fold every Arrow batch of the partition into ONE running
        # frontier — mapInPandas re-batches even a coalesce(1)
        # partition, so per-batch-only pruning would leak dominated
        # points across batch boundaries in the global pass (and carry
        # a larger candidate set in the local pass). Memory stays
        # O(frontier + batch).
        import pandas as pd

        front: list[tuple] = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = [tuple(r) for r in pdf[cols].itertuples(index=False)]
            front = _skyline_block(front + rows, ndim)
        if front:
            yield pd.DataFrame(front, columns=cols)

    pruned = df.select(*cols).mapInPandas(_kernel, schema)
    # Global pass: candidates are frontier-sized; resolve on one task.
    return pruned.coalesce(1).mapInPandas(_kernel, schema)
