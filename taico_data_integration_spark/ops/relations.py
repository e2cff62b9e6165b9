"""Media-combinations bridge rebuild (M7, SURVEY.md §2.9): distinct N-column
combination rows from the fact, each name column mapped to its dimension id
via a broadcast equi-join, deduped.

Reference: include/scripts/sync_data.py:106-187 (staging) / :373-448 (prod)
does this as a pandas merge chain on one worker after per-row DML; here it is
one declarative pipeline — distinct (map-side partial agg) -> N broadcast
hash joins -> distinct — that scales to any fact size because everything
after the first distinct operates on combination cardinality, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebuild_relations(
    fact: DataFrame,
    dims: dict[str, DataFrame],
    keep_cols: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """dims maps each fact name-column to a (id, name) dimension frame.
    Returns keep_cols + one `<col>_id` per dimension.

    Inner-join semantics match the reference's pandas merge chain
    (sync_data.py:137-146): combos with unmapped names drop out.
    """
    keep_cols = keep_cols or []
    combos = fact.select(*keep_cols, *dims.keys()).distinct()
    out = combos
    for col, dim in dims.items():
        mapped = dim.select(F.col("name").alias(col), F.col("id").alias(f"{col}_id"))
        out = out.join(F.broadcast(mapped), on=col, how=how).drop(col)
    return out.distinct()
