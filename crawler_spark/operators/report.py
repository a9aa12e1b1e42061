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


def _fmt_cell(value, col: str) -> str:
    """baogao.py cell realization: start_time is strftime'd or the literal
    'None' (baogao.py:67); other nulls become empty cells (xlwt skips
    None); everything else is written as-is."""
    if col == "start_time":
        return (
            value.strftime("%Y-%m-%d %H:%M:%S") if value is not None
            else "None"
        )
    return "" if value is None else str(value)


def sheet_cells(report_df: DataFrame, total: int) -> list[list[str]]:
    """One baogao sheet as a cell matrix (baogao.py:54-70): header row,
    one row per site ordered by website_id, a blank spacer row, the
    '总条数' label row, then the grand-total row. The collect is report
    output — bounded by the number of sites, not the corpus."""
    cells = [list(_REPORT_COLS)]
    for r in report_df.orderBy("website_id").collect():
        cells.append([_fmt_cell(r[c], c) for c in _REPORT_COLS])
    cells.append([])
    cells.append(["总条数"])
    cells.append([str(total)])
    return cells


def write_report_workbook(
    path: str,
    daily: DataFrame,
    cumulative: DataFrame,
    daily_total: int,
    cumulative_total: int,
) -> list[str]:
    """The baogao.py:52-89 workbook: two sheets 每日 (daily) and 累计
    (cumulative), identical column layout. Writes a real ``.xls`` when
    xlwt is importable (it is not baked into this container); otherwise
    CSV twin sheets ``<path>.daily.csv`` / ``<path>.cumulative.csv`` with
    the same cells row-for-row. Returns the written paths."""
    import csv

    sheets = [
        ("每日", "daily", sheet_cells(daily, daily_total)),
        ("累计", "cumulative", sheet_cells(cumulative, cumulative_total)),
    ]
    try:
        import xlwt  # type: ignore[import-not-found]
    except ImportError:
        xlwt = None
    if xlwt is not None:
        book = xlwt.Workbook(encoding="utf-8", style_compression=0)
        for sheet_name, _, cells in sheets:
            xlr = book.add_sheet(sheet_name, cell_overwrite_ok=True)
            for i, row in enumerate(cells):
                for j, cell in enumerate(row):
                    xlr.write(i, j, cell)
        book.save(path)
        return [path]
    written = []
    for _, suffix, cells in sheets:
        out = f"{path}.{suffix}.csv"
        with open(out, "w", newline="", encoding="utf-8") as fh:
            csv.writer(fh).writerows(cells)
        written.append(out)
    return written


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


def render_report_email(
    attachment_paths: list[str],
    report_date: str,
    sender: str = "reports@localhost",
    receivers: list[str] | None = None,
) -> str:
    """The baogao.py:91-103 message, rendered instead of sent.

    Assembles the same MIME structure the reference hands to smtplib: a
    multipart root whose Subject is ``数据部每日报告 <date>``, ``To`` the
    comma-joined receiver list, one EMPTY utf-8 text part first, then
    each workbook as a MIMEApplication attachment named by its basename
    (baogao.py:101 splits on ``\\`` because it runs on Windows; basename
    is the portable equivalent). Returns the RFC-822 string — the caller
    persists it (``report --eml``). The SMTP_SSL login+send side effect
    (baogao.py:104-111) is deliberately out of scope: no credentials, no
    network.
    """
    import os
    from email.mime.application import MIMEApplication
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    msg = MIMEMultipart()
    msg["Subject"] = "数据部每日报告 " + report_date
    msg["From"] = sender
    msg["To"] = ",".join(receivers or [])
    msg.attach(MIMEText("", _charset="utf-8"))
    for path in attachment_paths:
        part = MIMEApplication(open(path, "rb").read())
        part.add_header(
            "Content-Disposition",
            "attachment",
            filename=os.path.basename(path),
        )
        msg.attach(part)
    return msg.as_string()
