"""Deterministic (order-independent) float aggregation.

Float sums are not associative: with different partitioning (N vs 4N
executors) or a different engine, ``sum(double)`` can differ in the last ULP —
enough to flip a rounding boundary and break the north_rule's requirement of
bit-identical output across cluster sizes.

``det_sum`` makes the summation order part of the *definition*: collect the
group's values, sort them, fold left. The result is a pure function of the
value multiset — invariant to partitioning, task order, and engine (DuckDB's
``list_reduce(list_sort(list(x)), (a,b) -> a+b)`` folds identically; IEEE
add is correctly rounded, so the fold is bit-identical).

Cost: collect_list per group — use for bounded-degree groups (neighborhood
aggregations, where degree ~ band density), not for global sums; the default
non-deterministic fast path stays available everywhere.

``portable_round`` adds a 1e-9 epsilon before rounding so values that land
*exactly* on a decimal rounding boundary (possible with exact binary
fractions) do not depend on the engine's tie rule (Spark HALF_UP vs DuckDB
half-to-even).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def det_sum(col: Column | str) -> Column:
    """Order-independent double sum (aggregate function): sorted left fold."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.array_sort(F.collect_list(c.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def det_sum_sql(expr: str) -> str:
    """The identical fold in DuckDB SQL (aggregate context)."""
    return f"coalesce(list_reduce(list_sort(list(CAST({expr} AS DOUBLE))), (a, b) -> a + b), 0.0)"


def portable_round(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c + F.lit(1e-9), n)


def portable_round_sql(expr: str, n: int) -> str:
    return f"round(({expr}) + 1e-9, {n})"
