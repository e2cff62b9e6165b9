"""Skew-mitigated joins: explicit key salting.

AQE's skew-join splitting (on in session.py) handles most skew at runtime,
but it only splits SORT-MERGE join partitions. When a join must shuffle and
one key dominates (the classic: 30% of events carry the same tenant id),
explicit salting is the deterministic fix: replicate the small side across
``salt_buckets`` copies and scatter the big side's rows uniformly over
those buckets, so the hot key's rows land on ``salt_buckets`` reducers
instead of one. Same result set as the plain join — asserted in tests.

Companion to the salted AGGREGATION pattern in queries/extended.py
(salted_event_counts). Reference has no distributed joins at all (pandas
merges in-driver: include/scripts/sync_data.py), so this is scale surface
beyond parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``keys`` with the big side salted.

    The big side gets a uniform per-row bucket (independent of the join key
    — that's what breaks the hot key apart); the small side is replicated
    once per bucket via a literal-range explode (no shuffle: it's a narrow
    projection of an already-small frame). Supported ``how``: inner / left
    (the salted side must be the preserved side; for right joins swap the
    arguments)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' (swap args for right)")
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_big.join(replicated_small, [*keys, SALT_COL], how).drop(SALT_COL)
