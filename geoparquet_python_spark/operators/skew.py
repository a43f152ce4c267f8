"""Skew-handling join utilities (SCALE.md "Relational core": salting
for known-hot keys; the bucketing lever is certified in
tests/test_skew.py).

AQE's skew-join splitting handles most runtime skew, but it only
splits the SHUFFLED side's oversized partitions — when one key is so
hot that a single (key) hash bucket exceeds executor memory on BOTH
sides, the classic remedy is salting: replicate the modest side
n_salt times and scatter the skewed side's hot key across n_salt
sub-keys, turning one giant partition into n_salt bounded ones.

Cost model: the modest side is duplicated n_salt×, the skewed side
gets one extra int column — choose n_salt ≈ hottest-key-rows /
target-partition-rows. Salting beats broadcast only when the modest
side is too big to broadcast; otherwise broadcast wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    modest: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``skewed``.

    The skewed side gets a deterministic per-row salt (hash of the
    whole row — no rand(): retries must re-produce the same salt or a
    recomputed partition would change results); the modest side is
    exploded across all n_salt salts so every (key, salt) pair still
    meets its match. Result rows are identical to ``skewed.join(
    modest, on, how)`` — each skewed row meets exactly one replica.

    Supports how in ('inner', 'left'): semantics preserved because
    replication is on the OTHER side. (A right/full variant would
    need the mirror construction.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt)
    ).cast("int")
    left = skewed.withColumn(_SALT, salt)
    right = modest.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return left.join(right, [*on, _SALT], how).drop(_SALT)
