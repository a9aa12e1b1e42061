"""Fuzzy publish-time parsing — branch-for-branch parity with the
reference's ``Util.format_time2`` (reference demo/util.py:43-85).

The reference anchors relative dates ("3 hours ago") to the wall clock
(util.py:63 ``time.time()``); for determinism our parser takes an explicit
``as_of`` timestamp (SURVEY §7.4). Month-name translation tables (Hindi →
English month tokens, zeenews.py:22-35, aajtak.py:24-37) are applied before
parsing, as the spiders do (zeenews.py:91).

Implemented as an Arrow-batched pandas UDF: the per-string branch cascade is
Python, but it executes once per Arrow batch inside ArrowEvalPython — no
per-row Spark Python.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import TimestampType

# util.py:7-33 — month-name table incl. abbreviations.
MONTHS = {
    "January": 1, "February": 2, "March": 3, "April": 4, "May": 5,
    "June": 6, "July": 7, "August": 8, "September": 9, "October": 10,
    "November": 11, "December": 12,
    "Jan": 1, "Feb": 2, "Mar": 3, "Apr": 4, "Jun": 6, "Jul": 7,
    "Aug": 8, "Sept": 9, "Sep": 9, "Oct": 10, "Nov": 11, "Dec": 12,
}

# zeenews.py:22-35 — Hindi month names mapped onto the English tokens.
HINDI_MONTHS = {
    "जनवरी": "Jan", "फ़रवरी": "Feb", "जुलूस": "Mar", "अप्रैल": "Apr",
    "मई": "May", "जून": "Jun", "जुलाई": "Jul", "अगस्त": "Aug",
    "सितंबर": "Sept", "अक्टूबर": "Oct", "नवंबर": "Nov", "दिसंबर": "Dec",
}

# aajtak.py:24-37 — the SAME Hindi months mapped onto a different English
# spelling set (full names, 'मार्च' for March where zeenews has 'जुलूस');
# each spider ships its own table, so we keep both.
AAJTAK_HINDI_MONTHS = {
    "जनवरी": "Jan", "फ़रवरी": "Feb", "मार्च": "March", "अप्रैल": "April",
    "मई": "May", "जून": "June", "जुलाई": "July", "अगस्त": "August",
    "सितंबर": "September", "अक्टूबर": "October", "नवंबर": "November",
    "दिसंबर": "December",
}

_SPLIT = re.compile(r"/| |,|:|\n|\r|\f|\t|\v")  # util.py:45 token split
_REL_UNITS = [  # util.py:59-83 branch order and unit sizes
    (re.compile(r"\d+ hours? ago"), 3600),
    (re.compile(r"\d+ days? ago"), 86400),
    (re.compile(r"\d+ weeks? ago"), 604800),
    (re.compile(r"\d+ months? ago"), 2592000),  # 30 days, as the reference
    (re.compile(r"\d+ years? ago"), 31536000),  # 365 days, as the reference
]
_ABS_HM = re.compile(r"\S+ \d+ \d+ \d+ \d+")  # util.py:48
_ABS_D = re.compile(r"\S+ \d+ \d+")  # util.py:54
_NUM = re.compile(r"\d+")


def format_time2_py(raw: str | None, as_of: datetime) -> datetime:
    """Pure-Python core, one value. Mirrors util.py:43-85 exactly, except
    that (a) 'now' is the explicit ``as_of`` and (b) inputs the reference
    would crash on (month regex matched but no month token) fall back to
    ``as_of`` instead of raising.
    """
    if raw is None:
        return as_of.replace(microsecond=0)
    for hi, en in HINDI_MONTHS.items():  # spider-side pre-translation
        if hi in raw:
            raw = raw.replace(hi, en)
    toks = [t for t in _SPLIT.split(raw) if t != ""]
    data = " ".join(toks)
    try:
        if _ABS_HM.search(data):
            num = 0
            while toks[num] not in MONTHS:
                num += 1
            return datetime(
                int(toks[num + 2]), MONTHS[toks[num]], int(toks[num + 1]),
                int(toks[num + 3]), int(toks[num + 4]),
            )
        if _ABS_D.search(data):
            num = 0
            while toks[num] not in MONTHS:
                num += 1
            return datetime(int(toks[num + 2]), MONTHS[toks[num]], int(toks[num + 1]))
        for pat, unit in _REL_UNITS:
            if pat.search(data):
                num = 0
                while not _NUM.search(toks[num]):
                    num += 1
                delta = int(_NUM.search(toks[num]).group()) * unit
                return (as_of - timedelta(seconds=delta)).replace(microsecond=0)
    except (IndexError, ValueError):
        pass
    return as_of.replace(microsecond=0)


@pandas_udf(TimestampType())
def format_time2_udf(raw: pd.Series, as_of: pd.Series) -> pd.Series:
    """Arrow-batched fuzzy date parser. ``as_of`` is a timestamp column
    (typically a literal batch timestamp) so results are reproducible."""
    anchors = pd.to_datetime(as_of)
    return pd.Series(
        [format_time2_py(r, a.to_pydatetime()) for r, a in zip(raw, anchors)],
        dtype="datetime64[us]",
    )


def parse_pub_time(raw: Column, as_of: Column) -> Column:
    """Column-API wrapper: ``pub_time = parse_pub_time(col, lit(batch_ts))``."""
    return format_time2_udf(raw, as_of)


def format_time3(col: Column) -> Column:
    """'yyyy-MM-dd HH:mm:ss' string → epoch seconds (util.py:88-91) —
    pure built-in, stays in codegen."""
    return F.unix_timestamp(col, "yyyy-MM-dd HH:mm:ss")


def format_time(epoch: Column) -> Column:
    """Epoch seconds → 'yyyy-MM-dd HH:mm:ss' string (util.py:36-40)."""
    return F.date_format(F.from_unixtime(epoch), "yyyy-MM-dd HH:mm:ss")
