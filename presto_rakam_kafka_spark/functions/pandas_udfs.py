"""The UDF surface (SURVEY §2.B last rows): the three pandas-UDF
shapes a user extends the engine with, each Arrow-batched (never
row-at-a-time Python — 10-100× slower, per the pyspark guide).

The reference's host engine exposed a Java plugin SPI for scalar/agg
functions (none defined in its repo); in this engine the extension
point is the pandas UDF family, demonstrated with SQL-replicable
semantics so each style is oracle-checkable:

* scalar   — element-wise over Arrow batches (token count)
* grouped-agg — one value per group (median: order-insensitive, so
  the nondeterministic in-group row order can't leak into results)
* grouped-map (``applyInPandas``) — full group in, frame out
  (per-group ranking with a deterministic tie-break)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Return types as DataType objects, not DDL strings: string types are
# parsed via the active SparkSession, which doesn't exist at import
# time.


@pandas_udf(T.LongType())
def token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count, vectorized over an Arrow batch."""
    return text.str.split(" ").str.len().astype("int64")


@pandas_udf(T.DoubleType())
def median_udaf(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: exact median of the group."""
    return float(v.median())


def scalar_token_counts(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    )


def scalar_token_counts_oracle(table: str, text_col: str, id_col: str) -> str:
    return f"SELECT {id_col}, len(string_split({text_col}, ' '))::BIGINT AS n_tokens FROM {table}"


def grouped_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    return df.groupBy(group_col).agg(median_udaf(F.col(value_col)).alias("med"))


def grouped_median_oracle(table: str, group_col: str, value_col: str) -> str:
    return f"SELECT {group_col}, median({value_col}) AS med FROM {table} GROUP BY {group_col}"


def grouped_rank(events: DataFrame) -> DataFrame:
    """applyInPandas: per-event_type dense value ranking with
    (value, event_id) tie-break — the grouped-map shape where the whole
    group arrives as one pandas frame.

    Scale note: one shuffle on the group key; a group must fit in one
    worker's memory (event_type cardinality is tiny; for high-card
    keys this is the right operator, for skewed ones pre-salt).
    """

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        pdf["rk"] = pdf.index + 1
        return pdf[["event_id", "event_type", "rk"]]

    return events.select("event_id", "event_type", "value").groupBy(
        "event_type"
    ).applyInPandas(rank, schema="event_id long, event_type string, rk long")


def grouped_rank_oracle(table: str = "events") -> str:
    return f"""
    SELECT event_id, event_type,
           row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk
    FROM {table}
    """
