"""Kernel functions as native Spark SQL column expressions.

Mirrors the reference's kernel library (reference: kernels.py:43-310 — the
modern graph kernel set; dispatcher at kernels.py:258). All nine kernels are
closed-form in exp/pow/cos, so they run JVM-side inside whole-stage codegen —
no Python in the hot path (BASELINE input_hint: "no per-row Python").

Conventions copied from the reference:
- z = distance / bandwidth, clipped to [0, 1] for compact-support kernels
  (kernels.py:43-59 ``_trim``); gaussian and exponential use raw z
  (kernels.py:101-121, :184-201);
- ``taper`` zeroes weights for distance > bandwidth (kernels.py:297-305).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

GAUSS_C = 1.0 / math.sqrt(2.0 * math.pi)


def _trim(dist: Column, bandwidth: Column) -> Column:
    z = F.abs(dist) / bandwidth
    return F.least(F.greatest(z, F.lit(0.0)), F.lit(1.0))


def kernel_expr(name: str, dist: Column, bandwidth: Column, taper: bool = True) -> Column:
    """Column expression K(dist / bandwidth) for the named kernel."""
    z = _trim(dist, bandwidth)
    if name == "triangular":
        k = F.lit(1.0) - z
    elif name == "parabolic":
        k = F.lit(0.75) * (F.lit(1.0) - z * z)
    elif name == "gaussian":
        zr = dist / bandwidth
        k = F.lit(GAUSS_C) * F.exp(F.lit(-0.5) * zr * zr)
    elif name == "bisquare":
        k = F.lit(15.0 / 16.0) * F.pow(F.lit(1.0) - z * z, F.lit(2.0))
    elif name == "tricube":
        k = F.lit(70.0 / 81.0) * F.pow(F.lit(1.0) - F.pow(z, F.lit(3.0)), F.lit(3.0))
    elif name == "cosine":
        k = F.lit(math.pi / 4.0) * F.cos(F.lit(math.pi / 2.0) * z)
    elif name == "exponential":
        k = F.exp(-(dist / bandwidth))
    elif name in ("boxcar", "discrete"):
        k = (dist < bandwidth).cast("double")
    elif name == "identity" or name is None:
        k = dist
    else:
        raise ValueError(f"unknown kernel {name!r}")
    if taper:
        k = F.when(dist > bandwidth, F.lit(0.0)).otherwise(k)
    return k


def kernel_sql(name: str, dist: str, bandwidth: str, taper: bool = True) -> str:
    """The same kernel as an ANSI-SQL string (shared with the DuckDB oracle).

    Keeping one textual definition for both engines guarantees the engine and
    the oracle evaluate bit-identical expressions.
    """
    z = f"least(greatest(abs({dist}) / {bandwidth}, 0.0), 1.0)"
    if name == "triangular":
        k = f"(1.0 - {z})"
    elif name == "parabolic":
        k = f"(0.75 * (1.0 - {z} * {z}))"
    elif name == "gaussian":
        k = f"({GAUSS_C!r} * exp(-0.5 * ({dist} / {bandwidth}) * ({dist} / {bandwidth})))"
    elif name == "bisquare":
        k = f"((15.0/16.0) * power(1.0 - {z} * {z}, 2.0))"
    elif name == "tricube":
        k = f"((70.0/81.0) * power(1.0 - power({z}, 3.0), 3.0))"
    elif name == "cosine":
        k = f"({math.pi / 4.0!r} * cos({math.pi / 2.0!r} * {z}))"
    elif name == "exponential":
        k = f"exp(-({dist} / {bandwidth}))"
    elif name in ("boxcar", "discrete"):
        k = f"(case when {dist} < {bandwidth} then 1.0 else 0.0 end)"
    else:
        raise ValueError(f"unknown kernel {name!r}")
    if taper:
        k = f"(case when {dist} > {bandwidth} then 0.0 else {k} end)"
    return k
