"""Deterministic sampling operators for corpus curation.

Complements `llm.curation.dataset_split` (fixed-percent global split) and
`llm.curation.quality_quota_sample` (top-N per stratum): here the contract
is *per-stratum fractions* — e.g. keep 5% of common-crawl, 50% of books,
100% of reference text — the standard mixture-weighting step of a training
-data pipeline. Selection is a pure hash predicate on the row id
(md5-bucket), so it is content-stable: reshuffling, re-partitioning or
re-running never changes membership, and no shuffle is needed at all — the
filter runs map-side against the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..llm.curation import split_bucket


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its md5 bucket (of `id_col`, 0-99) falls under its
    stratum's percentage. Fractions are percents in [0, 100]."""
    b = split_bucket(id_col)
    thr: Column = F.lit(default_fraction)
    for value, pct in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(pct)).otherwise(thr)
    return df.where(b < thr)
