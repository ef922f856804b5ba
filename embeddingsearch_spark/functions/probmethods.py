"""Probmethods A5-A12 (reference Probmethods.cs:73-176) as Spark aggregate
Column expressions — fold a group of (key, score) rows into one float.

The reference folds a ``List<(string key, float score)>``; here each fold is
a ``groupBy().agg()`` (partial + final hash aggregation, Catalyst-native).
The two-level cascade (reference Searchdomain.cs:242-258) is two of these
back to back — see operators/search.py.

Declared semantics (constants.py): float64; EPS-tolerant exact-0/exact-1
short-circuits (reference Probmethods.cs:119-120,134,148 use bitwise float
equality, which no independently-computed float64 pipeline can reproduce);
sign-aware log-space GeometricMean; guarded divisions (0 where the
reference would produce NaN/Inf).

``method:params`` parsing (reference Probmethods.cs:49-71) is supported
uniformly at both cascade levels — a declared superset: the reference only
honors it for entity-level methods loaded from the DB (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import EPS, PROBMETHODS


def _is_zero(x: Column) -> Column:
    return F.abs(x) <= EPS


def _is_one(x: Column) -> Column:
    return F.abs(x - 1.0) <= EPS


def _guard_div(num: Column, den: Column) -> Column:
    return F.when(den == 0.0, F.lit(0.0)).otherwise(num / den)


def mean(x: Column) -> Column:
    """Σx/n (reference Probmethods.cs:73-82)."""
    return F.avg(x)


def harmonic_mean(x: Column) -> Column:
    """n_nz / Σ(1/xᵢ over nonzeros) * (n_nz/n_T); 0 if all zero —
    the zero-penalizing variant (reference Probmethods.cs:84-93)."""
    n_t = F.count(F.lit(1)).cast("double")
    n_nz = F.sum(F.when(~_is_zero(x), 1).otherwise(0)).cast("double")
    inv_sum = F.sum(F.when(~_is_zero(x), 1.0 / x).otherwise(0.0))
    return F.when(n_nz == 0.0, F.lit(0.0)).otherwise(
        _guard_div(n_nz, inv_sum) * n_nz / n_t
    )


def quadratic_mean(x: Column) -> Column:
    """sqrt(Σx²/n) (reference Probmethods.cs:95-103)."""
    return F.sqrt(F.avg(x * x))


def geometric_mean(x: Column) -> Column:
    """(Πx)^(1/n), computed sign-aware in log space (declared deviation:
    reference Probmethods.cs:105-114 multiplies raw float32s — underflows
    on long lists, NaN on negative products)."""
    has_zero = F.max(F.when(_is_zero(x), 1).otherwise(0)) == 1
    neg_odd = F.sum(F.when(x < -EPS, 1).otherwise(0)) % 2 == 1
    log_mean = F.avg(F.when(~_is_zero(x), F.log(F.abs(x))))
    sign = F.when(neg_odd, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(has_zero, F.lit(0.0)).otherwise(sign * F.exp(log_mean))


def evew_avg(x: Column) -> Column:
    """Extreme-value-emphasis weighted avg, weight 1/(x(1-x)); any x≈1 → 1
    (checked first), else any x≈0 → 0 (reference Probmethods.cs:116-129)."""
    has_one = F.max(F.when(_is_one(x), 1).otherwise(0)) == 1
    has_zero = F.max(F.when(_is_zero(x), 1).otherwise(0)) == 1
    valid = ~_is_zero(x) & ~_is_one(x)
    f = F.sum(F.when(valid, x / (x * (1.0 - x))).otherwise(0.0))
    fm = F.sum(F.when(valid, 1.0 / (x * (1.0 - x))).otherwise(0.0))
    return (
        F.when(has_one, F.lit(1.0))
        .when(has_zero, F.lit(0.0))
        .otherwise(_guard_div(f, fm))
    )


def hvew_avg(x: Column) -> Column:
    """High-value-emphasis weighted avg, weight 1/(1-x); any x≈1 → 1
    (reference Probmethods.cs:131-143)."""
    has_one = F.max(F.when(_is_one(x), 1).otherwise(0)) == 1
    valid = ~_is_one(x)
    f = F.sum(F.when(valid, x / (1.0 - x)).otherwise(0.0))
    fm = F.sum(F.when(valid, 1.0 / (1.0 - x)).otherwise(0.0))
    return F.when(has_one, F.lit(1.0)).otherwise(_guard_div(f, fm))


def lvew_avg(x: Column) -> Column:
    """Low-value-emphasis weighted avg, weight 1/x; any x≈0 → 0
    (reference Probmethods.cs:145-157)."""
    has_zero = F.max(F.when(_is_zero(x), 1).otherwise(0)) == 1
    valid = ~_is_zero(x)
    f = F.sum(F.when(valid, 1.0).otherwise(0.0))
    fm = F.sum(F.when(valid, 1.0 / x).otherwise(0.0))
    return F.when(has_zero, F.lit(0.0)).otherwise(_guard_div(f, fm))


def dictionary_weighted_average(x: Column, weight: Column) -> Column:
    """Σwᵢxᵢ/Σwᵢ with per-key weights, default 1 (reference
    Probmethods.cs:159-176). ``weight`` is a pre-aggregation column —
    build it with :func:`dwa_weight`."""
    return _guard_div(F.sum(weight * x), F.sum(weight))


def method_base(method: Column) -> Column:
    """'DictionaryWeightedAverage:{...}' → 'DictionaryWeightedAverage'
    (reference Probmethods.cs:55-60 colon split)."""
    return F.substring_index(method, ":", 1)


def dwa_weight(method: Column, key: Column) -> Column:
    """Per-row weight for DictionaryWeightedAverage: parse the JSON after
    the colon in the method string, look up this row's key (datapoint or
    model name), default 1.0 (reference Probmethods.cs:165-172). For
    non-DWA methods returns 1.0 (unused)."""
    colon = F.instr(method, ":")
    params = F.when(colon > 0, F.substring(method, colon + 1, 1 << 20))
    weights = F.from_json(params, "map<string,double>")
    return F.coalesce(F.element_at(weights, key), F.lit(1.0))


_BUILDERS = {
    "Mean": mean,
    "HarmonicMean": harmonic_mean,
    "QuadraticMean": quadratic_mean,
    "GeometricMean": geometric_mean,
    "EVEWAvg": evew_avg,
    "HVEWAvg": hvew_avg,
    "LVEWAvg": lvew_avg,
}


def probmethod_agg(name: str, x: Column, weight: Column | None = None) -> Column:
    """Aggregate expression for a statically-known probmethod name
    (base name, no params)."""
    if name == "DictionaryWeightedAverage":
        if weight is None:
            raise ValueError("DictionaryWeightedAverage needs a weight column")
        return dictionary_weighted_average(x, weight)
    return _BUILDERS[name](x)


def probmethod_dispatch_agg(
    x: Column, method: Column, weight: Column | None = None
) -> Column:
    """Runtime per-group dispatch over all 8 probmethods in ONE aggregate
    expression (single-pass hash aggregation; the 8-way CASE is the cost of
    per-row method heterogeneity — reference Datapoint.cs:10-11).

    ``method`` MUST be one of the grouping columns: it is referenced
    directly in the post-aggregation CASE. (Folding it with ``first()``
    instead would put a string buffer in the aggregation, forcing the
    whole agg from HashAggregate into SortAggregate — an extra sort per
    partition and no whole-stage codegen.)
    """
    if weight is None:
        weight = F.lit(1.0)
    m = method_base(method)
    expr = F.lit(None).cast("double")
    for name in PROBMETHODS:
        agg = probmethod_agg(name, x, weight)
        expr = F.when(m == name, agg).otherwise(expr)
    return expr
