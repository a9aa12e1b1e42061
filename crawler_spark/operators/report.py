"""The analytics/report job — the reference's ``baogao.py`` re-expressed.

baogao.py:56 (daily) / baogao.py:73 (cumulative) each run one SQL statement:
``news`` left-joined to the three dimension tables, grouped by website with
a count; plus grand totals (baogao.py:70,87). Here that is a single
DataFrame plan: scan → 3 broadcast hash joins (dims are tiny) → filter →
partial+final hash aggregate. Catalyst prunes columns automatically
(baogao selects 9 of 13, SURVEY §2.3 P6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_report(
    docs: DataFrame,
    websites: DataFrame,
    languages: DataFrame,
    countries: DataFrame,
    day_start,
    day_end,
) -> DataFrame:
    """Per-site document counts for one collection day (baogao.py:56).

    Dims are broadcast: the only shuffle is the groupBy, which Spark
    executes as map-side partial count + final merge.
    """
    return (
        docs.filter(
            (F.col("cole_time") >= F.lit(day_start))
            & (F.col("cole_time") < F.lit(day_end))
        )
        .groupBy("website_id")
        .agg(F.count(F.lit(1)).alias("num"))
        .join(F.broadcast(websites), on="website_id", how="left")
        .join(F.broadcast(languages), websites.lan_id == languages.language_id, "left")
        .join(F.broadcast(countries), on="country_id", how="left")
        .select(*_REPORT_COLS)
        .orderBy("website_id")
    )


# baogao.py:56/73 select list, name-for-name: website_id, url,
# website.c_name, website.e_name, count → num, developer,
# language.c_name → language, country.name → country, start_time.
_REPORT_COLS = (
    "website_id",
    "url",
    "c_name",
    "e_name",
    "num",
    "developer",
    "language",
    "country",
    "start_time",
)


def cumulative_report(
    docs: DataFrame,
    websites: DataFrame,
    languages: DataFrame,
    countries: DataFrame,
) -> DataFrame:
    """All-time per-site counts (baogao.py:73) — daily minus the filter."""
    return (
        docs.groupBy("website_id")
        .agg(F.count(F.lit(1)).alias("num"))
        .join(F.broadcast(websites), on="website_id", how="left")
        .join(F.broadcast(languages), websites.lan_id == languages.language_id, "left")
        .join(F.broadcast(countries), on="country_id", how="left")
        .select(*_REPORT_COLS)
        .orderBy("website_id")
    )
