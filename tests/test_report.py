"""The baogao.py report operators over reference-shaped dimension tables —
exact column list parity with baogao.py:56/73 (website_id, url, c_name,
e_name, num, developer, language, country, start_time) and broadcast-join
plan shape."""

from datetime import datetime

from pyspark.sql import functions as F

from crawler_spark.operators.report import cumulative_report, daily_report


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (1000, datetime(2021, 6, 1, 5)),
            (1000, datetime(2021, 6, 1, 7)),
            (1001, datetime(2021, 6, 1, 9)),
            (1001, datetime(2021, 5, 31, 9)),  # outside the daily window
            (1002, datetime(2021, 6, 1, 3)),
        ],
        "website_id int, cole_time timestamp",
    )
    websites = spark.createDataFrame(
        [
            (1000, "http://site0/", "站点零", "site zero", "dev-a", 1930, 1,
             datetime(2020, 1, 1)),
            (1001, "http://site1/", "站点一", "site one", "dev-b", 1866, 2,
             datetime(2020, 2, 1)),
            (1002, "http://site2/", "站点二", "site two", "dev-a", 1930, 1,
             None),
        ],
        "website_id int, url string, c_name string, e_name string,"
        " developer string, lan_id int, country_id int, start_time timestamp",
    )
    languages = spark.createDataFrame(
        [(1930, "印地语"), (1866, "英语")],
        "language_id int, language string",
    )
    countries = spark.createDataFrame(
        [(1, "India"), (2, "Philippines")], "country_id int, country string"
    )
    return docs, websites, languages, countries


EXPECT_COLS = ["website_id", "url", "c_name", "e_name", "num", "developer",
               "language", "country", "start_time"]


def test_daily_report_columns_and_counts(spark):
    docs, w, l, c = _fixture(spark)
    out = daily_report(docs, w, l, c,
                       datetime(2021, 6, 1), datetime(2021, 6, 2))
    assert out.columns == EXPECT_COLS
    rows = {r.website_id: r for r in out.collect()}
    assert rows[1000].num == 2 and rows[1001].num == 1 and rows[1002].num == 1
    assert rows[1000].c_name == "站点零"  # website.c_name (baogao.py:56)
    assert rows[1000].language == "印地语"  # language.c_name
    assert rows[1001].country == "Philippines"
    assert rows[1002].start_time is None  # left joins keep null dims


def test_report_workbook_golden_cells(spark, tmp_path):
    """The --xls workbook mirrors baogao.py:54-70 cell-for-cell: header,
    per-site rows ordered by website_id (start_time strftime'd or the
    literal 'None', other nulls empty), blank spacer, '总条数' label,
    grand total. Golden-file comparison of the CSV twin sheets (xlwt is
    not in this container, so the CSV fallback is the exercised path)."""
    from crawler_spark.operators.report import (
        cumulative_report,
        daily_report,
        write_report_workbook,
    )

    docs, w, l, c = _fixture(spark)
    daily = daily_report(docs, w, l, c,
                         datetime(2021, 6, 1), datetime(2021, 6, 2))
    cumulative = cumulative_report(docs, w, l, c)
    path = str(tmp_path / "report")
    written = write_report_workbook(path, daily, cumulative, 4, 5)
    assert written == [f"{path}.daily.csv", f"{path}.cumulative.csv"]

    header = ("website_id,url,c_name,e_name,num,developer,language,"
              "country,start_time")
    golden_daily = "\n".join([
        header,
        "1000,http://site0/,站点零,site zero,2,dev-a,印地语,India,"
        "2020-01-01 00:00:00",
        "1001,http://site1/,站点一,site one,1,dev-b,英语,Philippines,"
        "2020-02-01 00:00:00",
        "1002,http://site2/,站点二,site two,1,dev-a,印地语,India,None",
        "",
        "总条数",
        "4",
        "",
    ])
    golden_cumulative = "\n".join([
        header,
        "1000,http://site0/,站点零,site zero,2,dev-a,印地语,India,"
        "2020-01-01 00:00:00",
        "1001,http://site1/,站点一,site one,2,dev-b,英语,Philippines,"
        "2020-02-01 00:00:00",
        "1002,http://site2/,站点二,site two,1,dev-a,印地语,India,None",
        "",
        "总条数",
        "5",
        "",
    ])
    assert open(written[0], encoding="utf-8").read().replace(
        "\r\n", "\n") == golden_daily
    assert open(written[1], encoding="utf-8").read().replace(
        "\r\n", "\n") == golden_cumulative


def test_cumulative_report_and_broadcast_plan(spark):
    docs, w, l, c = _fixture(spark)
    out = cumulative_report(docs, w, l, c)
    assert out.columns == EXPECT_COLS
    rows = {r.website_id: r.num for r in out.collect()}
    assert rows == {1000: 2, 1001: 2, 1002: 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_report_email_mime_structure(tmp_path):
    """render_report_email builds baogao.py:91-103's exact message shape:
    Subject '数据部每日报告 <date>', comma-joined To, an EMPTY utf-8 text
    part FIRST, then one base64 application attachment per workbook file
    carrying its basename — parsed back with the stdlib to prove it is
    well-formed RFC-822, not string-matched."""
    import email
    import email.policy

    from crawler_spark.operators.report import render_report_email

    a = tmp_path / "2021-05-31.daily.csv"
    a.write_bytes("website_id,num\n1000,2\n".encode())
    b = tmp_path / "2021-05-31.cumulative.csv"
    b.write_bytes("website_id,num\n1000,5\n".encode())
    raw = render_report_email(
        [str(a), str(b)], "2021-05-31",
        receivers=["ops@localhost", "data@localhost"],
    )
    # the raw header carries baogao.py:95's exact ','.join (no space);
    # policy.default refolds addresses, so assert it on the wire form
    assert "To: ops@localhost,data@localhost" in raw
    msg = email.message_from_string(raw, policy=email.policy.default)
    assert msg["Subject"] == "数据部每日报告 2021-05-31"
    parts = list(msg.iter_parts())
    assert len(parts) == 3
    # baogao.py:97-98: the empty text part is attached before the files
    assert parts[0].get_content_type() == "text/plain"
    assert parts[0].get_content() in ("", "\n")
    names = [p.get_filename() for p in parts[1:]]
    assert names == ["2021-05-31.daily.csv", "2021-05-31.cumulative.csv"]
    # attachments round-trip byte-for-byte through the base64 encoding
    assert parts[1].get_payload(decode=True) == a.read_bytes()
    assert parts[2].get_payload(decode=True) == b.read_bytes()
    # no SMTP material anywhere in the rendered message
    assert "smtp" not in raw.lower() and "password" not in raw.lower()
