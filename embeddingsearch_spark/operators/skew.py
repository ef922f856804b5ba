"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only works for
sort-merge joins and after stats exist. For *known* hot keys (the
Zipf-heavy reality of user/event/entity keys at 100 TB) explicit salting
bounds the worst partition deterministically:

    fact side:  salt = hash(row) % n_salts     (splits the hot key's rows)
    dim side:   exploded × n_salts             (each replica matches one salt)
    join on (key, salt) → every partition ≤ 1/n_salts of the hot key

Result-identical to the plain join (tested); use when one side is
moderate-sized (the explode multiplies it by n_salts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_fact(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Add a deterministic per-row salt (hash of all columns, stable)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*df.columns), F.lit(n_salts))
    )


def explode_dim(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Replicate each dim row once per salt value."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """`fact.join(dim, on, how)` with the shuffle key widened by a salt:
    the hottest join key spreads over ``n_salts`` partitions instead of
    one. Output equals the unsalted join (salt column dropped)."""
    f = salt_fact(fact, n_salts)
    d = explode_dim(dim, n_salts)
    return f.join(d, [*on, SALT_COL], how).drop(SALT_COL)
