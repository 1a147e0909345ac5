"""tableone_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-implementation of the capabilities of
``charlesfcoombsiv/tableone_pyspark`` (reference at /root/reference,
``tableone_pyspark.py``), extended with large-scale data-pipeline
operators (dedup, similarity search, text analysis, streaming).

Public API:
    tableone(df, col_to_strat="", cols_to_analyze=[...], beautify=False,
             p_values=False)  -> DataFrame
        Descriptive-statistics "Table 1" with the reference's exact
        output contract (reference tableone_pyspark.py:20-261), computed
        in O(1) passes over the data instead of O(16·V).

Design (vs. reference):
  * Sufficient statistics only: the engine runs 2-3 single-pass
    aggregation jobs (strat counts; one ``rollup`` over every continuous
    variable; one melted count over every categorical variable) and
    collects k·V scalars — never raw rows (reference pulls full columns
    via toPandas at :453/:500 and scans the input 16× per continuous
    variable at :325-437).
  * Hypothesis tests (t / ANOVA / chi-square) are computed from those
    same collected aggregates; scipy is used only for tail
    probabilities of driver-side scalars.
  * No ``repartition(1)`` (13 sites in the reference), no pandas
    round-trips, no per-stat joins.
"""

from tableone_pyspark_spark.core.engine import tableone, TableOneConfig
from tableone_pyspark_spark.core.memo import memo_clear


def tableone_pyspark(
    df,
    spark_session=None,
    col_to_strat: str = "",
    cols_to_analyze_list=None,
    beautify: bool = False,
    p_values: bool = False,
):
    """Drop-in compatibility shim with the reference's exact signature
    (``/root/reference/tableone_pyspark.py:20``) — same parameter names
    and order, so existing callers switch engines by changing only the
    import. ``spark_session`` is accepted and ignored (the session is
    taken from ``df``; the reference only used it to build driver-side
    literal frames)."""
    return tableone(
        df,
        col_to_strat=col_to_strat,
        cols_to_analyze=list(cols_to_analyze_list or []),
        beautify=beautify,
        p_values=p_values,
    )


__all__ = ["tableone", "tableone_pyspark", "TableOneConfig", "memo_clear"]
__version__ = "0.1.0"
