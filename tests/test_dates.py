"""Table-driven parity for format_time2 against the reference's branch
structure (/root/reference/demo/util.py:43-85), anchored to an explicit
as_of (FIXTURES.md §7)."""

from datetime import datetime

from pyspark.sql import functions as F

from crawler_spark.functions.dates import format_time2_py, format_time2_udf

AS_OF = datetime(2021, 6, 1, 0, 0, 0)

CASES = [
    # absolute Month D Y H M (util.py:49-53)
    ("Jan 5, 2021, 02:51", datetime(2021, 1, 5, 2, 51)),
    ("January 5 2021 02 51", datetime(2021, 1, 5, 2, 51)),
    ("Updated: Mar 7, 2021, 18:05", datetime(2021, 3, 7, 18, 5)),
    # absolute Month D Y (util.py:54-58)
    ("Feb 28, 2020", datetime(2020, 2, 28)),
    ("Sept 9 2019", datetime(2019, 9, 9)),
    # tokenizer: / , : and whitespace all split (util.py:45)
    ("Dec/25/2020", datetime(2020, 12, 25)),
    # relative (util.py:59-83), anchored at AS_OF
    ("3 hours ago", datetime(2021, 5, 31, 21, 0, 0)),
    ("1 hour ago", datetime(2021, 5, 31, 23, 0, 0)),
    ("2 days ago", datetime(2021, 5, 30, 0, 0, 0)),
    ("1 week ago", datetime(2021, 5, 25, 0, 0, 0)),
    ("2 months ago", datetime(2021, 4, 2, 0, 0, 0)),  # 30-day months, as util.py:77
    ("1 year ago", datetime(2020, 6, 1, 0, 0, 0)),  # 365-day years, util.py:83
    # Hindi months (zeenews.py:22-35 translated before parse, zeenews.py:91)
    ("जनवरी 5, 2021, 02:51", datetime(2021, 1, 5, 2, 51)),
    ("मई 12 2020", datetime(2020, 5, 12)),
    # fallback → as_of (util.py:85)
    ("gibberish", AS_OF),
    (None, AS_OF),
    # reference would IndexError (digits but no month token) → we fall back
    ("99 88 77 66 55", AS_OF),
]


def test_format_time2_py_cases():
    for raw, want in CASES:
        assert format_time2_py(raw, AS_OF) == want, raw


def test_format_time2_udf_matches_py(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "raw string")
    got = [
        r.ts
        for r in df.select(
            format_time2_udf(F.col("raw"), F.lit(AS_OF)).alias("ts")
        ).collect()
    ]
    assert got == [w for _, w in CASES]
