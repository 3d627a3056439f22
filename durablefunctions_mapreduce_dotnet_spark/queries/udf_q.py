"""User-defined aggregate surface: Arrow-vectorized grouped-agg
pandas UDF with an exact, engine-portable result.

The reference's "UDF surface" is the activity function itself — the
mapper/reducer bodies are arbitrary C# (``Sample.cs:131-240``).  Our
equivalent escape hatch is the pandas UDF family; this module proves
the UDAF flavor end-to-end against the SQL oracle.

Determinism contract: a grouped-agg UDF receives each group as one
pandas batch, but row ORDER within the batch is partition-dependent —
so the UDF body must be order-free.  Here every additive step is an
int64 sum of exact cent values (money is 2-dp, quantity is integral),
so the result is bit-identical under any partitioning and across
engines; a naive ``np.average`` would drift in the low-order bits.

Scale note (100 TB): grouped-agg pandas UDFs are NOT mergeable — the
whole group ships to one worker.  Right tool for bounded groups
(per-key model scoring, per-group curve fits); for unbounded additive
aggregation the decimal-exact built-ins (functions/numeric.py) remain
the scale path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..sources.readers import read_table


# returnType must be a DataType instance, not the DDL string "double":
# string forms are parsed through the active SparkContext at decoration
# time, which would make importing this module require a live session.
@F.pandas_udf(DoubleType())
def _wavg_price(price: pd.Series, qty: pd.Series) -> float:
    # price*qty*100 is mathematically integral (2-dp money × integer
    # qty), so round() only strips FP noise — never a .5 boundary —
    # and the int64 sums are exact and order-free.
    cents = int((price * qty * 100.0).round().astype("int64").sum())
    units = int(qty.astype("int64").sum())
    return float(cents) / 100.0 / float(units)


def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag, computed by a
    grouped-agg pandas UDF (Arrow batch in, scalar out)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(_wavg_price("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )


# Mirrors the UDF exactly: int64 cent sums, then the same left-to-right
# double division chain.
_UDAF_WAVG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(ROUND(l_extendedprice * l_quantity * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row fans out to N output
    rows — here, sentence segmentation of documents, the canonical
    text-pipeline explode.  Registered and invoked through the SQL
    ``LATERAL`` path so the full UDTF machinery (not just ``explode``)
    is exercised; the segmentation rule ('. ' boundaries, trailing
    period stripped, blanks dropped) is deterministic and mirrored in
    the oracle.

    Scale note: UDTFs run row-at-a-time in Python workers — fine for
    fan-out transforms off the hot path; pure-expression
    ``explode(split(...))`` remains the codegen'd fast path (used by
    the curation/text operators)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string")
    class SentenceSplit:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            idx = 0
            for part in (text or "").split(". "):
                # strip(' ') not strip(): the oracle's trim() removes
                # SPACES only, and Python's all-whitespace strip would
                # diverge on text with tabs/newlines at sentence edges
                s = part.strip(" ").rstrip(".")
                if s:
                    yield idx, s
                    idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    read_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )


_UDTF_SENT_SQL = """
WITH parts AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, '. '), 1) - 1 AS raw_idx,
         unnest(string_split(text, '. ')) AS part
  FROM documents WHERE doc_id < 200
), cleaned AS (
  SELECT doc_id, raw_idx, rtrim(trim(part), '.') AS sentence
  FROM parts WHERE length(rtrim(trim(part), '.')) > 0
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY raw_idx) - 1 AS INTEGER) AS sentence_idx,
       sentence
FROM cleaned
"""


def q_udf_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` — the per-group model-fit escape
    hatch (each group arrives as ONE pandas DataFrame, arbitrary Python
    runs, a DataFrame comes back): OLS trend of the daily event count
    per event_type.

    Determinism contract mirrored from the UDAF: the batch's row order
    is partition-dependent, so the body sorts by day and computes the
    closed form from EXACT int64 sums (x = 0..n−1 day index, y =
    counts; slope = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), intercept =
    (ΣyΣxx − ΣxΣxy)/same) — each output is ONE IEEE division of exact
    integers, bit-equal on any engine and any partitioning.

    Scale note: grouped-map ships the whole group to one worker —
    right for bounded groups (a per-series fit over a days-sized
    frame, as here); unbounded groups belong to the built-in aggs."""
    import numpy as np

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        y = pdf["y"].to_numpy(dtype="int64")
        n = len(y)
        x = np.arange(n, dtype="int64")
        sx, sy = int(x.sum()), int(y.sum())
        sxy, sxx = int((x * y).sum()), int((x * x).sum())
        den = n * sxx - sx * sx
        # den == 0 iff n == 1 (x is 0..n-1): a one-day group has no
        # trend — emit NULL slope/intercept instead of crashing the job
        # with ZeroDivisionError (the oracle's CASE mirrors this).  The
        # NULL is an EXPLICIT pd.NA in a nullable Float64 column, not a
        # float NaN relying on pyarrow's NaN-as-null from_pandas default
        # (which is conversion-setting dependent).
        if n < 2:
            slope = intercept = None
        else:
            slope = float(n * sxy - sx * sy) / float(den)
            intercept = float(sy * sxx - sx * sxy) / float(den)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [n],
                "slope": pd.array([slope], dtype="Float64"),
                "intercept": pd.array([intercept], dtype="Float64"),
            }
        )

    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return (
        daily.groupBy("event_type")
        .applyInPandas(
            fit,
            "event_type string, n_days bigint, slope double, intercept double",
        )
        .orderBy("event_type")
    )


# HUGEINT closed form over the row_number day index — the same exact
# integers, the same two final divisions.
_UDF_OLS_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts)::DATE AS d, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, CAST(y AS HUGEINT) AS y,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) - 1
              AS HUGEINT) AS x
  FROM daily
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM idx GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CASE WHEN n >= 2 THEN
         CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS slope,
       CASE WHEN n >= 2 THEN
         CAST(sy * sxx - sx * sxy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
       END AS intercept
FROM s ORDER BY event_type
"""


QUERIES = {
    "udaf_weighted_avg": q_udaf_weighted_avg,
    "udtf_sentence_split": q_udtf_sentences,
    "udf_grouped_ols": q_udf_grouped_ols,
}
ORACLES = {
    "udaf_weighted_avg": _UDAF_WAVG_SQL,
    "udtf_sentence_split": _UDTF_SENT_SQL,
    "udf_grouped_ols": _UDF_OLS_SQL,
}
