"""Declared numeric semantics of the engine.

The reference computes in float32 with nondeterministic fold order
(`ConcurrentBag` enumeration — reference Entity.cs:10, Searchdomain.cs:194).
A distributed engine cannot (and should not) reproduce those bit patterns,
so this engine *declares* its semantics (SURVEY.md §2.4 warnings):

- all scoring math in float64;
- canonical fold order (model ASC, then datapoint ASC) — note every fold we
  use is order-insensitive up to float addition order, so this only matters
  for documentation;
- exact-0 / exact-1 short-circuits in the probmethods
  (reference Probmethods.cs:119-120,134,148) use an EPS tolerance instead of
  bitwise equality, so that independently-computed float64 pipelines
  (Spark, DuckDB oracle, NumPy) take the same branch;
- GeometricMean is computed sign-aware in log space (reference
  Probmethods.cs:105-114 multiplies raw float32s, which underflows for long
  lists and yields NaN for negative products; we return
  sign * exp(mean(ln|x|)), 0 if any |x|<=EPS — identical for all-positive
  inputs, total-ordered everywhere);
- Cosine similarity of a zero-norm vector is 0.5 (the remapped neutral
  score; reference propagates NaN);
- rankings order by score DESC with entity ASC as a deterministic tiebreak
  (reference ties are nondeterministic — SURVEY.md §2.6);
- topN is applied at read time over the full ranking (the reference's query
  cache returns a stale truncation — SURVEY.md §2.6 quirk, not replicated).

Result columns that hold scores are rounded to ROUND_DIGITS decimals at the
query boundary (both in the engine and in the oracle SQL) so that
cross-engine float64 comparisons are stable.
"""

# Tolerance for the probmethods' exact-0 / exact-1 short-circuits.
EPS = 1e-9

# Decimal digits scores are rounded to at query output boundaries.
ROUND_DIGITS = 6

# Default models of the deterministic test embedder (FIXTURES.md §1.4).
MOCK_MODEL_A = "mock:modelA"
MOCK_MODEL_B = "mock:modelB"

PROBMETHODS = [
    "Mean",
    "HarmonicMean",
    "QuadraticMean",
    "GeometricMean",
    "EVEWAvg",
    "HVEWAvg",
    "LVEWAvg",
    "DictionaryWeightedAverage",
]

SIMMETHODS = ["Cosine", "Euclidian", "Manhattan", "Pearson"]
