"""Group-wise ordinary least squares via sufficient statistics — the
"million tiny models" pattern (one linear fit per group, fitted in a
single distributed pass).

OLS on (x, y) needs only the five sufficient statistics
(n, Σx, Σy, Σxy, Σx², [Σy²]); slope/intercept/R² are closed-form
driver-free arithmetic on the aggregated row. That makes per-group
regression a plain ``groupBy().agg()`` — one partial-agg shuffle for
ANY number of groups, no per-group iteration, no ML library. (The
same shape MLlib's summarizers use; re-expressed here relationally so
it composes with the rest of the engine and oracle-checks.)

Determinism discipline (the dsum lesson, functions/portable.py):
double sums accumulate in partition order and would hash-flip. Inputs
are therefore scaled to exact integers FIRST (quantities are integral;
prices to cents), summed exactly (associative, order-free), and the
closed-form division happens ONCE per group on exact operands cast to
double — both engines evaluate the identical IEEE expression tree.

Overflow headroom: at TPC-H cent scale E[y²] ≈ 2e13, so a BIGINT Σy²
wraps near ~4.5e5 rows per group — brand_price_regression already has
~2.4e5 rows/brand at sf1, i.e. BIGINT sums are NOT safe beyond sf≈2.
The second moments are therefore accumulated as DECIMAL(38,0): each
operand is widened to DECIMAL(19,0) so the per-row product is an exact
DECIMAL(38,0), and Spark's decimal SUM keeps 38 digits of headroom
(~1e38 ≈ 1e24 rows/group at cent scale). On the impossible overflow
past that, Spark's non-ANSI decimal sum yields NULL — a loud oracle
mismatch — never a silent two's-complement wrap. The DuckDB oracle
mirrors this with HUGEINT (128-bit) products and sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.portable import pround

__all__ = ["groupwise_ols", "groupwise_pearson"]


def _exact_int(col: Column, scale: int) -> Column:
    """floor(x·10^s + 0.5) → BIGINT, the engine's portable exact-scale
    primitive (Spark floor on double already yields LONG)."""
    return F.floor(col * F.lit(float(10**scale)) + F.lit(0.5))


def groupwise_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    x_scale: int = 0,
    y_scale: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Per-group OLS fit of y on x: (group…, n, slope, intercept, r2),
    rounded portably to ``digits``. Slope/intercept are in the SCALED y
    unit (e.g. cents when ``y_scale=2``) per scaled x unit — exact
    integer statistics are the point; rescale downstream if needed.

    Groups with a single point or zero x-variance yield NULL slope
    (guarded division, identical on both engines).
    """
    x = _exact_int(F.col(x_col), x_scale)
    y = _exact_int(F.col(y_col), y_scale)
    # Second moments: widen to DECIMAL(19,0) so the product is an exact
    # DECIMAL(38,0) and the sum stays decimal — no BIGINT wrap at scale.
    xd = x.cast("decimal(19,0)")
    yd = y.cast("decimal(19,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x > 0, cov_n / var_x)
    r2 = F.when(
        (var_x > 0) & (var_y > 0), (cov_n / var_x) * (cov_n / var_y)
    )
    return agg.select(
        *group_cols,
        "n",
        pround(slope, digits).alias("slope"),
        pround(
            F.when(var_x > 0, (sy - (cov_n / var_x) * sx) / n), digits
        ).alias("intercept"),
        pround(r2, digits).alias("r2"),
    )


def groupwise_pearson(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    x_scale: int = 0,
    y_scale: int = 0,
    digits: int = 6,
) -> DataFrame:
    """Per-group Pearson correlation coefficient from the same exact
    sufficient statistics as :func:`groupwise_ols` (one partial-agg
    shuffle, DECIMAL(38,0) second moments): (group…, n, r).

    r = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²) · √(nΣy²−(Σy)²)) — the two
    variance factors take their square roots SEPARATELY so the IEEE
    expression never forms the ~1e49 product that would fall outside
    exact-decimal range; every operand entering a double op is an
    exact integer on both engines. Degenerate groups (either variance
    zero) yield NULL r.
    """
    x = _exact_int(F.col(x_col), x_scale)
    y = _exact_int(F.col(y_col), y_scale)
    xd = x.cast("decimal(19,0)")
    yd = y.cast("decimal(19,0)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    r = F.when(
        (var_x > 0) & (var_y > 0),
        cov_n / (F.sqrt(var_x) * F.sqrt(var_y)),
    )
    return agg.select(
        *group_cols, "n", pround(r, digits).alias("r")
    )
