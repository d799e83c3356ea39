"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG/STDDEV are order-dependent; on a cluster the
partition merge order is nondeterministic, so the same query can
return different last bits run-to-run (and will never bitwise-match a
single-threaded oracle). We route additive aggregates through exact
DECIMAL arithmetic — the sum is exact, the final cast back to DOUBLE
is a single deterministic rounding. This is both the correctness-gate
strategy and the right call at 100 TB: results stop depending on
partition count / AQE decisions.

The matching ANSI-SQL spellings (for DuckDB oracles) are provided by
``oracle_sql_fragments`` mirrors in each operator module.

Reference parity notes: the reference computes AVG/SUM/STDDEV in
PostgreSQL (e.g. `sql/analysis_queries.sql:42-46,141`); PG's numeric
aggregates over double precision have the same order-dependence — we
deliberately upgrade the semantics to exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Exact intermediate type: 14 integer digits / 4 fractional digits per
#: term; Spark widens the sum to DECIMAL(28,4) (no overflow up to 1e13
#: rows of 1e14-scale values — fine at 100 TB).
DEC = "decimal(18,4)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column) -> Column:
    """Exact sum of a double column, returned as DOUBLE."""
    return F.sum(_c(col).cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Deterministic mean: exact decimal sum / non-null count."""
    c = _c(col)
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def dravg(col: str | Column) -> Column:
    """Deterministic mean ROUNDED HALF-UP at 4 decimals, computed in
    exact integer arithmetic — the cross-engine replacement for
    ``ROUND(davg(x), 4)``.

    ``ROUND(double, k)`` is NOT cross-engine deterministic at ties:
    when the exact mean terminates at the rounding digit (e.g.
    3.35795), the nearest double sits just below it and Spark rounds
    the binary expansion down (3.3579) while DuckDB rounds the
    shortest decimal repr half-up (3.358) — found by the ×8 strict
    campaign on text_bigram_perplexity. Here the half-up round of
    sum/count is computed on integers — sign·((2·|sum·10⁴| + n) div
    (2n)) — so both engines produce the identical integer, and the
    final /10⁴ is one correctly-rounded IEEE division.

    All decimal steps stay exact: % and - are exact, and the one
    division is of an exactly-divisible pair (quotient integral, so
    no scale rounding can touch it). Spark's decimal ``div`` operator
    is NOT used — it silently overflows through BIGINT."""
    c = _c(col)
    return drdiv(F.sum(c.cast(DEC)), F.count(c))


def drdiv(s: Column, n: Column) -> Column:
    """Half-up round at 4 decimals of exact-DECIMAL ``s`` / positive
    integral ``n``, in exact integer arithmetic (see :func:`dravg` for
    why ROUND(double, 4) of the same ratio is not cross-engine
    deterministic). ``s`` must be a decimal of scale ≤ 4."""
    a = (s * F.lit(10_000)).cast("decimal(38,0)")
    aa = F.abs(a)
    nn = n.cast("decimal(38,0)")
    rem = aa % nn
    k = ((aa - rem) / nn).cast("decimal(38,0)")  # exact: divisible
    q = k + F.when(rem * 2 >= nn, F.lit(1)).otherwise(F.lit(0))
    sign = F.when(a < 0, F.lit(-1)).otherwise(F.lit(1))
    return (sign * q).cast("double") / F.lit(10_000.0)


def dstddev(col: str | Column) -> Column:
    """Deterministic sample stddev from exact sufficient statistics:
    sqrt((sum(x²) − sum(x)²/n) / (n−1)). NULL when n < 2 (matches
    PG/Spark STDDEV_SAMP).

    The square is computed IN DECIMAL (dec(x)·dec(x), exact) rather
    than squaring the double and then rounding to decimal: a double
    square frequently terminates exactly at the rounding digit, and
    engines disagree on tie rounding (Spark rounds the shortest
    decimal repr half-up; DuckDB rounds the exact binary expansion),
    so the double→decimal path is not cross-engine deterministic."""
    c = _c(col)
    n = F.count(c).cast("double")
    cd = c.cast(DEC)
    s = F.sum(cd).cast("double")
    s2 = F.sum(cd * cd).cast("double")
    var = (s2 - (s * s) / n) / (n - F.lit(1.0))
    # Guard tiny negative values from the final double subtraction.
    return F.when(n >= 2, F.sqrt(F.greatest(var, F.lit(0.0))))


def safe_div(num: Column, den: Column) -> Column:
    """NULLIF-style safe division (reference `sql/analysis_queries.sql:305`)."""
    return num / F.nullif(den, F.lit(0))


def sql_dsum(expr: str) -> str:
    """DuckDB spelling of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB spelling of :func:`davg`."""
    return f"({sql_dsum(expr)} / COUNT({expr}))"


def sql_dravg(expr: str) -> str:
    """DuckDB spelling of :func:`dravg`."""
    return sql_drdiv(
        f"SUM(CAST(({expr}) AS DECIMAL(18,4)))", f"COUNT({expr})"
    )


def sql_drdiv(s_expr: str, n_expr: str) -> str:
    """DuckDB spelling of :func:`drdiv` — the same half-up integer
    round in HUGEINT (128-bit, exact up to 1.7e38; ``//`` on
    non-negative HUGEINTs is the exact integral quotient). ``s_expr``
    must be a DECIMAL of scale ≤ 4, ``n_expr`` a positive integer."""
    a = f"CAST(({s_expr}) * 10000 AS HUGEINT)"
    n = f"CAST(({n_expr}) AS HUGEINT)"
    q = f"((2 * ABS({a}) + {n}) // (2 * {n}))"
    sign = f"(CASE WHEN {a} < 0 THEN -1 ELSE 1 END)"
    return f"(CAST({sign} * {q} AS DOUBLE) / 10000.0)"


def sql_dstddev(expr: str) -> str:
    """DuckDB spelling of :func:`dstddev` (square in decimal, exact).

    One operand is widened to DECIMAL(19,4): DuckDB's 18×18 multiply
    takes an int64 fast path that overflows for 1e9-unit values, while
    width 19 forces int128. The product stays DECIMAL(37,8) — the same
    exact type Spark produces for dec(18,4)·dec(18,4)."""
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s = sql_dsum(expr)
    dec = f"CAST(({expr}) AS DECIMAL(18,4))"
    dec_w = f"CAST(({expr}) AS DECIMAL(19,4))"
    # VARCHAR round-trip: DuckDB's int128-decimal→double cast double-
    # rounds (int128→double, then scale), off by 1 ulp from the
    # correctly-rounded conversion Spark/Java produce; strtod on the
    # decimal string is correctly rounded.
    s2 = f"CAST(CAST(SUM({dec_w} * {dec}) AS VARCHAR) AS DOUBLE)"
    return (
        f"(CASE WHEN COUNT({expr}) >= 2 THEN "
        f"SQRT(GREATEST(({s2} - ({s} * {s}) / {n}) / ({n} - 1.0), 0.0)) END)"
    )


def dcorr(x: str | Column, y: str | Column) -> Column:
    """Deterministic Pearson correlation from exact sufficient
    statistics (decimal sums; every cross-product computed IN decimal,
    one correctly-rounded cast each). Assumes non-null inputs (the
    driver tables' numeric columns are non-null); the final double
    formula is evaluated in the same operation order as the SQL twin,
    so results match bitwise."""
    cx, cy = _c(x).cast(DEC), _c(y).cast(DEC)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(cx).cast("double")
    sy = F.sum(cy).cast("double")
    sxy = F.sum(cx * cy).cast("double")
    sxx = F.sum(cx * cx).cast("double")
    syy = F.sum(cy * cy).cast("double")
    return (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )


def sql_dcorr(x: str, y: str) -> str:
    """DuckDB spelling of :func:`dcorr` — decimal cross-sums with the
    width-19 int128 forcing and VARCHAR-roundtrip cast (see
    :func:`sql_dstddev` for why), then the identical double formula."""
    n = "CAST(COUNT(*) AS DOUBLE)"
    dx, dy = f"CAST(({x}) AS DECIMAL(18,4))", f"CAST(({y}) AS DECIMAL(18,4))"
    dxw, dyw = f"CAST(({x}) AS DECIMAL(19,4))", f"CAST(({y}) AS DECIMAL(19,4))"
    sx, sy = sql_dsum(x), sql_dsum(y)
    sxy = f"CAST(CAST(SUM({dxw} * {dy}) AS VARCHAR) AS DOUBLE)"
    sxx = f"CAST(CAST(SUM({dxw} * {dx}) AS VARCHAR) AS DOUBLE)"
    syy = f"CAST(CAST(SUM({dyw} * {dy}) AS VARCHAR) AS DOUBLE)"
    return (
        f"(({n} * {sxy} - {sx} * {sy}) / "
        f"SQRT(({n} * {sxx} - {sx} * {sx}) * ({n} * {syy} - {sy} * {sy})))"
    )
