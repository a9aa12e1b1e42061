"""The site-parser registry — the reference's per-spider callback surface
(SURVEY §2.9) as *data*: per-site extraction/pagination rules executed by
one generic batch parser.

The reference ships 116 hand-written spiders with 2-5 callbacks each
(demo/已部署/*.py); every callback is "page in → (article rows ∪ new
request rows) out" (the contract visible at demo/middlewares.py:20-24).
Four pagination rule types cover that corpus (SURVEY §2.9): next-link
(zeenews.py:104), page-number increment (hatawtabloid.py:50-51), offset
params (shangbao.py:50-51), API page param (manila.py:80-82).

``parse_page`` is deliberately pure Python on plain dicts: the engine calls
it over Arrow batches inside mapInPandas (per-batch Python, zero per-row
Spark Python) and the reference-semantics simulator calls it directly —
both sides share one definition of per-site parse rules, so parity tests
isolate the *dataflow* semantics (dedup, politeness, ordering, cutoff).

Faithfully reproduced reference behaviors:
- time-cutoff stop-at-first-old: iterating a list page newest-first, the
  first entry older than the cutoff stops BOTH the entry loop and
  pagination, even if later entries/pages would qualify
  (demo/已部署/zeenews.py:96-101 — the '时间截止' break; we must not "fix"
  this, SURVEY §2.11).
- meta lineage: category labels and list-page-scraped title/time/images
  ride down the traversal in a meta dict (zeenews.py:49,52).
- dont_filter probe: some list rules refetch their first member article
  bypassing the URL-seen check, solely to read its timestamp
  (maharashtratimes.py:43-49).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta, timezone
from urllib.parse import quote, urljoin

from crawler_spark.functions import htmlsel
from crawler_spark.functions.dates import (
    AAJTAK_HINDI_MONTHS,
    MONTHS,
    format_time2_py,
)

# agrasamachar.py:23-24 — yet another per-spider Hindi month table, with
# month NUMBERS and its own October/February spellings ('अक्तूबर',
# 'फ़रवरी'); kept separate from the zeenews/aajtak tables like the
# reference keeps each spider's own dict.
AGRA_HINDI_MONTHS = {
    "जनवरी": 1, "फ़रवरी": 2, "मार्च": 3, "अप्रैल": 4, "मई": 5, "जून": 6,
    "जुलाई": 7, "अगस्त": 8, "सितंबर": 9, "अक्तूबर": 10, "नवंबर": 11,
    "दिसंबर": 12,
}

# panchjanya.py:85-119 time_adjustment — bug-faithful table: the March
# branch tests 'जुलूस' (a mistranslation), BOTH October spellings map,
# and the month-11 branch tests 'दिसंबर' (December) so दिसंबर → 11 and a
# clean 'नवंबर' matches NO branch (month='None' → the caller's
# try/except falls back to now). The mojibake alternates in the
# reference are latin-1 re-encodings of the clean spellings — unreachable
# given UTF-8 pages, not carried.
PANCHJANYA_HINDI_MONTHS = {
    "जनवरी": 1, "फ़रवरी": 2, "जुलूस": 3, "अप्रैल": 4, "मई": 5, "जून": 6,
    "जुलाई": 7, "अगस्त": 8, "सितंबर": 9, "अक्टूबर": 10, "अक्तूबर": 10,
    "दिसंबर": 11,
}

# loktej.py:102-120 time_adjustment factors — relative '<n> <unit> ago'
# stamps subtracted from NOW (deterministically: from ``as_of``); note
# the reference's month = 28 days exactly and year = 365 days.
_AGO_EN_FACTORS = {
    "second": 1, "seconds": 1, "min": 60, "mins": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800, "month": 2419200,
    "months": 2419200, "year": 31536000, "years": 31536000,
}

# hastakshep.py:23-30 hindi_time_ago — relative-unit translation table.
_AGO_HI_UNITS = {
    "महीना": "months", "घंटे": "hours", "मिन": "mins", "साल": "years",
    "सप्ताह": "weeks", "दिन": "days",
}

# hindinewsfresh10.py:112-144 time_adjustment — a CLEAN 12-branch Hindi
# month table (unlike panchjanya's bugged one).
_HNF_HINDI_MONTHS = {
    "जनवरी": 1, "फ़रवरी": 2, "मार्च": 3, "अप्रैल": 4, "मई": 5, "जून": 6,
    "जुलाई": 7, "अगस्त": 8, "सितंबर": 9, "अक्टूबर": 10, "नवंबर": 11,
    "दिसंबर": 12,
}

# Pagination rule names (the 6 corpus types).
NEXT_LINK = "next_link"  # payload carries an explicit next href
PAGE_PARAM = "page_param"  # ?page=N increment while has_more
PAGE_PATH = "page_path"  # /page/N path suffix while has_more
#                          (no_pass/cloudfare/hatawtabloid.py:50-51 — the
#                          reference threads a meta page counter; deriving
#                          N from the URL itself is equivalent and
#                          stateless)
OFFSET_PARAM = "offset_param"  # ?start=N*20 while has_more
API_PAGE = "api_page"  # JSON endpoint with page param while has_more
FORM_PAGE = "form_page"  # POST form body page=N while has_more (yehey.py:70-104)
API_TEMPLATE = "api_template"  # templated API url w/ page & totItems bound
#                                (manila.py:24,66,80-82)
API_OFFSET = "api_offset"  # templated API url: offset += step while
#                            offset < the response's total count
#                            (raftaar.py:29,66-70)
FORM_URL_PAGE = "form_url_page"  # POST where BOTH the URL query page and
#                                  the form body advance, URL rebuilt from
#                                  the originating list URL
#                                  (piagov.py:63-72,75-110)
API_PAGE_TPL = "api_page_tpl"  # templated API url: page += 1 while the
#                                page gate holds and the page is non-empty
#                                (spin.py:91-96, spot.py:46-48,
#                                topgear.py:70-78 — the {page} twin of
#                                API_OFFSET's {offset})

PAGE_SIZE = 20  # offset step (shangbao.py:50-51 uses start=N*20)
API_PAGE_SIZE = 10  # manila.py:80: (page-1)*10 vs totItems


def parse_site_date(raw: str | None, style: str | None,
                    as_of: datetime) -> datetime:
    """Per-site date normalization styles found across the spider corpus —
    the F2/F5 surface as data:

    - None/'fuzzy': Util.format_time2's branch cascade (util.py:43-85),
      incl. Hindi month pre-translation (zeenews.py:22-35,91).
    - 'month_switch': the hand-rolled 12-branch month switch building
      'YYYY-MM-DD 00:00:00' from the text's last 'D Mon YYYY' tokens
      (philboxing.py:69-94,116-139; the branch table is MONTHS data here,
      the token positions are the semantics).
    - 'ymd': already-normalized '%Y-%m-%d %H:%M:%S' strings consumed
      directly (shangbao.py:41 feeds list times straight to format_time3).
    - 'isoT': ISO 'YYYY-MM-DDTHH:MM:SS+ZZ:ZZ' attribute values split on
      T/+ exactly like yehey.py:95-98,136-139 (the zone is DISCARDED, as
      the reference does — bug-faithful).
    - 'dmy_hms': 'D MonthName YYYY, HH:MM:SS' strings rebuilt through the
      month-name table (maharashtratimes.py:50-51,68-69's
      datetime(year, Util.month[name], day) + time-of-day suffix).
    Unparseable input falls back to ``as_of`` (the reference's fallback-now,
    util.py:85).
    """
    if raw is None:
        return as_of.replace(microsecond=0)
    try:
        if style == "epoch_s":
            # spot.py:40 / spin.py:92 / topgear.py:73: the API's
            # date_published is epoch SECONDS compared (and stored via
            # Util.format_time) as an integer — UTC render.
            return datetime(1970, 1, 1) + timedelta(seconds=int(raw))
        if style == "hm_dmy2":
            # spin.py:113-118: the article's published_time meta content
            # ('HH:MM, DD.MM.YY') re-tokenized on :,./space into
            # [H, M, D, Mo, YY] then rendered '20YY-Mo-DD H:M:00' —
            # token positions verbatim, zero-padding as given.
            toks = re.split(r"[:,.\s]+", raw.strip())
            return datetime.strptime(
                f"20{toks[4]}-{toks[3]}-{toks[2]} {toks[0]}:{toks[1]}:00",
                "%Y-%m-%d %H:%M:%S",
            )
        if style == "md_hm_nowyear":
            # abs-cbn.py:61-63 time_format: 'Month D, H:MM' tokens with
            # the CURRENT year assumed (datetime(datetime.now().year, ...))
            # — anchored to as_of here for determinism.
            t = [x for x in re.split(r"/| |,|:|\n|\r|\f|\t|\v", raw)
                 if x != ""]
            if t[0] in MONTHS:
                return datetime(as_of.year, MONTHS[t[0]], int(t[1]),
                                int(t[2]), int(t[3]))
            return as_of.replace(microsecond=0)
        if style == "mdy_slash":
            # cebudailynews.py:90-92 time_format: 'M/D/YYYY' numeric
            # tokens → midnight (datetime(int(list[2]), int(list[0]),
            # int(list[1]))).
            t = [x for x in re.split(r"/| |,|:|\n|\r|\f|\t|\v", raw)
                 if x != ""]
            return datetime(int(t[2]), int(t[0]), int(t[1]))
        if style == "hindi_dmy_agra":
            # agrasamachar.py:23-24,37-38: 'D <Hindi month> YYYY' through
            # the spider's OWN month table (note 'अक्तूबर' — a different
            # October spelling than zeenews'/aajtak's tables) → midnight.
            t = raw.split()
            if t[1] in AGRA_HINDI_MONTHS:
                return datetime(int(t[2]), AGRA_HINDI_MONTHS[t[1]],
                                int(t[0]))
            return as_of.replace(microsecond=0)
        if style == "posted_on":
            # bharatkhabar.py:101-159 time_adjustment: 'Posted On Month D,
            # YYYY at H:MM am/pm' — am & h==12 → 0, pm & h!=12 → h+12
            # (both bug-faithful: the am-12 branch renders hour 0 through
            # str(12-12)), seconds fixed at 00.
            s = raw.replace("Posted On ", "")
            te = s.split(", ")
            md = te[0].split(" ")
            t2 = te[1].split(" ")
            hm = t2[2].split(":")
            hh = int(hm[0])
            if t2[3] == "am":
                if hh == 12:
                    hh = 0
            elif hh != 12:
                hh += 12
            return datetime(int(t2[0]), MONTHS[md[0]], int(md[1]), hh,
                            int(hm[1]))
        if style == "wdmy_hm_dnj":
            # dainiknavajyoti.py:98-148 time_adjustment: 'Weekday, Month
            # D, YYYY HH:MM' split on ', ' — elements[1] carries month+day,
            # elements[2] year+time; seconds pinned to 00.
            te = raw.split(", ")
            md = te[1].split(" ")
            yt = te[2].split(" ")
            hh, mm = yt[1].split(":")
            return datetime(int(yt[0]), MONTHS[md[0]], int(md[1]),
                            int(hh), int(mm))
        if style == "dmy_ord":
            # dekhobhopal.py:104-121 time_adjustment: 'DDth Month YYYY' —
            # the day token ALWAYS loses its last two chars (the ordinal
            # suffix), month through the English table, midnight.
            t = raw.split(" ")
            return datetime(int(t[2]), MONTHS[t[1]],
                            int(t[0].strip()[:-2]))
        if style == "dmy_slash":
            # emsindia.py:49-50 / emstv.py:69-72: the FIRST d+/d+/d+ run
            # in the text, read D/M/YYYY → midnight (abs-cbn's mdy_slash
            # twin with day and month swapped).
            m = re.search(r"(\d+)/(\d+)/(\d+)", raw)
            if m:
                return datetime(int(m.group(3)), int(m.group(2)),
                                int(m.group(1)))
            return as_of.replace(microsecond=0)
        if style == "mdy_switch":
            # ambala.py:88-124 / dainiksandhyaprakash.py:110-147
            # time_adjustment: 'Month D, YYYY' through a hand-rolled month
            # switch → 'YYYY-MM-DD 00:00:00'. doh.py:48-75's re.split(' |,')
            # positional variant lands on the same triple.
            m = re.search(r"(\S+) (\d+), (\d+)", raw)
            if m and m.group(1) in MONTHS:
                return datetime(
                    int(m.group(3)), MONTHS[m.group(1)], int(m.group(2))
                )
            return as_of.replace(microsecond=0)
        if style == "pt_dmy_hm":
            # jb.py:63-92: re.split(',| ') positions [1]=D [3]=Mon [5]=Y
            # [6]=HH:MM over the Portuguese byline ('Qua 26 de Mai de
            # 2021 18:30' shape with English month abbrs incl. 'Sept').
            t = re.split(",| ", raw)
            if t[3] in MONTHS:
                hh, mm = t[6].split(":")
                return datetime(int(t[5]), MONTHS[t[3]], int(t[1]),
                                int(hh), int(mm))
            return as_of.replace(microsecond=0)
        if style == "mdy_hm_dash":
            # poorvanchalmedia.py:8-40 time_font INTENT ('Mon D, YYYY -
            # HH:MM' → 'Y-M-D HH:MM:00'); the reference's token indexing
            # re-splits its own first token and cannot run as written —
            # the comment block documents the intended positions, ported
            # here.
            m = re.search(r"(\S+) (\d+), (\d+) - (\d+):(\d+)", raw)
            if m and m.group(1) in MONTHS:
                return datetime(int(m.group(3)), MONTHS[m.group(1)],
                                int(m.group(2)), int(m.group(4)),
                                int(m.group(5)))
            return as_of.replace(microsecond=0)
        if style == "mdy_hm_ampm_bugged":
            # newstracklive.py:11-47 time_font, bug-faithful TWICE: PM
            # adds 11 (not 12), and the MINUTE field is written from the
            # MONTH number ('{y}-{m}-{d} {h}:{month}:00').
            t = raw.strip().split(" ")
            if t[0] in MONTHS:
                mo = MONTHS[t[0]]
                hh = int(t[3].split(":")[0])
                if t[4] == "PM":
                    hh += 11
                return datetime(int(t[2]), mo, int(t[1]), hh, mo)
            return as_of.replace(microsecond=0)
        if style == "dh_fuzzy":
            # divyahimachal.py:12-86 format_time2: re.split on
            # ' ,:-th/st/nd/rd'; >4 tokens = 'Mon D(th), YYYY H:MM am/pm'
            # (pm +12, 24→12), else 'Month D, YYYY' midnight.
            t = re.split(" |,|:|-|th|st|nd|rd", raw)
            if t[0].strip() not in MONTHS:
                return as_of.replace(microsecond=0)
            mo = MONTHS[t[0].strip()]
            if len(t) > 4:
                hh = int(t[-3]) if t[-1] == "am" else int(t[-3]) + 12
                if hh == 24:
                    hh = 12
                return datetime(int(t[4]), mo, int(t[1]), hh, int(t[-2]))
            return datetime(int(t[3]), mo, int(t[1]))
        if style == "pn_dmy_hm":
            # philippinesnews.py:57-84: re.split(' |,') positions
            # [-6]=D [-5]=Mon [-4]=Y [-2]=HH:MM → 'Y-M-D HH:MM:00'.
            t = re.split(" |,", raw)
            if t[-5] in MONTHS:
                hh, mm = t[-2].split(":")
                return datetime(int(t[-4]), MONTHS[t[-5]], int(t[-6]),
                                int(hh), int(mm))
            return as_of.replace(microsecond=0)
        if style == "tourism_mdy":
            # tourism.py:43-69: re.split(' |,') positions [-4]=MonthFull
            # [-3]=D [-1]=Y, midnight.
            t = re.split(" |,", raw)
            if t[-4] in MONTHS:
                return datetime(int(t[-1]), MONTHS[t[-4]], int(t[-3]))
            return as_of.replace(microsecond=0)
        if style == "dmy_hm_ampm":
            # haribhoomi.py:8-78 format_time2: 'D Month YYYY H:MM AM/PM'
            # ([0]=D [1]=Month [2]=Y, [-3]:[-2] time, PM +12 with the
            # 24→12 quirk).
            t = re.split(" |,|:|-|th|st|nd|rd", raw)
            if t[1].strip() in MONTHS:
                hh = int(t[-3]) if t[-1] == "AM" else int(t[-3]) + 12
                if hh == 24:
                    hh = 12
                return datetime(int(t[2]), MONTHS[t[1].strip()], int(t[0]),
                                hh, int(t[-2]))
            return as_of.replace(microsecond=0)
        if style == "wdmy_hms_ampm":
            # samacharjagat.py:8-54 format_time2: 'Weekday, D Mon YYYY
            # H:MM:SS AM/PM' — re.split(' |,|:') positions [2]=D [3]=Mon
            # [4]=Y [5]=H [6]=M [7]=S, PM +12, 24→12.
            t = re.split(" |,|:", raw)
            if t[3] in MONTHS:
                hh = int(t[5]) if t[-1] == "AM" else int(t[5]) + 12
                if hh == 24:
                    hh = 12
                return datetime(int(t[4]), MONTHS[t[3]], int(t[2]), hh,
                                int(t[6]), int(t[7]))
            return as_of.replace(microsecond=0)
        if style == "fuzzy_devanagari":
            # hindi.py:18-48 translate_all: Devanagari digits ०-९ mapped
            # to ASCII before the fuzzy cascade.
            t = raw.translate(str.maketrans("०१२३४५६७८९", "0123456789"))
            return format_time2_py(t, as_of)
        if style == "iso_date":
            # dailyhindinews.py:68: the ISO datetime attribute's DATE part
            # only, rendered midnight ('...T...'.split('T')[0] + 00:00:00).
            return datetime.strptime(raw.split("T")[0], "%Y-%m-%d")
        if style == "mdy_slash_hms":
            # techpinas.py:52-56 timeformat: 'M/D/YYYY HH:MM:SS ...' —
            # the time-of-day token is pasted verbatim after the
            # re-rendered date (any trailing AM/PM token is ignored).
            t = raw.strip().split(" ")
            mo, dd, yy = t[0].split("/")
            hh, mm, ss = t[1].split(":")
            return datetime(int(yy), int(mo), int(dd), int(hh), int(mm),
                            int(ss))
        if style == "mdy_hm_ampm2":
            # tarunmitra.py:8-49 format_time2: 'MonthFull D, YYYY- H:MM
            # AM/PM' — re.split(' |,|:|-') positions [0]=Month [1]=D
            # [3]=Y [5]=H [-2]=M, PM +12, 24→12.
            t = re.split(" |,|:|-", raw)
            if t[0].strip() in MONTHS:
                hh = int(t[5]) if t[-1] == "AM" else int(t[5]) + 12
                if hh == 24:
                    hh = 12
                return datetime(int(t[3]), MONTHS[t[0].strip()], int(t[1]),
                                hh, int(t[-2]))
            return as_of.replace(microsecond=0)
        if style == "epoch_ms":
            # raftaar.py:56: epoch-millisecond JSON timestamps rendered
            # through time.gmtime(ms / 1000) — UTC, sub-second floored.
            return datetime(1970, 1, 1) + timedelta(
                seconds=int(raw) // 1000
            )
        if style == "dmy_hms":
            m = re.search(r"(\d+) (\S+) (\d+), (\d+):(\d+):(\d+)", raw)
            if m and m.group(2) in MONTHS:
                return datetime(
                    int(m.group(3)), MONTHS[m.group(2)], int(m.group(1)),
                    int(m.group(4)), int(m.group(5)), int(m.group(6)),
                )
            return as_of.replace(microsecond=0)
        if style == "month_switch":
            toks = raw.split(" ")
            day, mon, year = toks[-3], toks[-2], toks[-1]
            if mon in MONTHS:
                return datetime(int(year), MONTHS[mon], int(day))
            return as_of.replace(microsecond=0)
        if style == "ago_en":
            # loktej.py:102-120: '<n> <unit> [ago]' relative stamps,
            # anchored to as_of for determinism (the reference anchors
            # to time.time()).
            t = raw.split(" ")
            fac = _AGO_EN_FACTORS.get(t[1])
            if fac is None:
                return as_of.replace(microsecond=0)
            return (as_of - timedelta(seconds=float(t[0]) * fac)).replace(
                microsecond=0
            )
        if style == "si_hindi_mdy":
            # sinceindependence.py:12-26: '<Hindi month> D, YYYY' via the
            # clean table + the 'सितम्बर' variant spelling (the reference
            # indexes tokens [1]/[2] because its raw byline leads with a
            # space; this side sees whitespace-normalized text, same
            # fields).
            t = re.split(" |,", raw.strip())
            months = dict(_HNF_HINDI_MONTHS, **{"सितम्बर": 9})
            return datetime(int(t[-1]), months[t[0]], int(t[1]))
        if style == "si_mdy_slash":
            # sinceindependence.py:29-38: 'M/D/YY H:MM <Hindi am/pm>' —
            # the am/pm token is read and DISCARDED (no 12-hour shift,
            # bug-faithful: 12:20 अपराह्न stays 12:20).
            mo, d, y, hh, mm, _ap = re.split("/| |:", raw.strip())
            return datetime(2000 + int(y), int(mo), int(d),
                            int(hh), int(mm))
        if style == "swat_colort":
            # swatantraawaz.py:62-64,112-114: the headline byline
            # 'Weekday D MonthFull YYYY H:M:S AM/PM' re-ordered into
            # format_time2; the watchvid byline is an already-normalized
            # Y-m-d stamp stored raw (py:66,117) — the reference
            # dispatches on URL shape, disambiguated here by content.
            if re.match(r"\d{4}-", raw.strip()):
                return datetime.strptime(raw.strip(),
                                         "%Y-%m-%d %H:%M:%S")
            t = raw.split()
            return format_time2_py(
                f"{t[2]} {t[1]} {t[3]} {t[4]} {t[5]}", as_of)
        if style == "tv9_pub":
            # tv9hindi.py:14-17: 'Publish Date -\n\t\tH:MM am, Wkd, D
            # MonthFull YY' through one strptime whose %H ignores the
            # am/pm marker — PM times collapse onto the AM clock,
            # bug-faithful.
            return datetime.strptime(
                raw, "Publish Date -\n\t\t%H:%M %p, %a, %d %B %y")
        if style == "univarta_list":
            # univarta.py:62-63: the '|'-trailed byline's first segment
            # 'D <Hindi month> YYYY' re-ordered 'Mon D Y' into
            # format_time2 (whose Hindi pre-translation maps the month).
            t = raw.split("|")[0].strip().split()
            return format_time2_py(f"{t[1]} {t[0]} {t[2]}", as_of)
        if style == "virarjun_dt":
            # virarjun.py:59-62,78-81: 'D Mon YYYY H:MM am/pm GMT' with
            # an abbreviated-else-full month strptime pair.
            try:
                return datetime.strptime(raw.strip(),
                                         "%d %b %Y %I:%M %p GMT")
            except ValueError:
                return datetime.strptime(raw.strip(),
                                         "%d %B %Y %I:%M %p GMT")
        if style == "dmy_sp":
            # pressnote.py:41-42: 'D Mon YYYY' whitespace tokens
            # re-ordered 'Mon D YYYY' into format_time2 — a plain
            # rebuild here.
            t = raw.split()
            return datetime(int(t[2]), MONTHS[t[1]], int(t[0]))
        if style == "pna_pub":
            # pna.py:66-78: 'Published MonthFull D, YYYY, H:MM AM/PM' —
            # fixed token positions, PM adds 12 unconditionally (the
            # reference renders 12 PM as hour 24 into a raw string; that
            # unrepresentable datetime degrades to fallback-now here).
            parts = raw.split(",")
            head = parts[0].split(" ")
            t = parts[-1].split(" ")
            hh, mm = t[-2].split(":")
            hh = int(hh) + 12 if t[-1] == "PM" else int(hh)
            return datetime(int(parts[1]), MONTHS[head[1]], int(head[2]),
                            hh, int(mm))
        if style == "mdy_hm_ampm_c":
            # khulasaa.py:13-16: 'MonthFull D, YYYY, H:MM am/pm' through
            # one strptime.
            return datetime.strptime(raw.strip(), "%B %d, %Y, %I:%M %p")
        if style == "dmy_slash_fuzzy":
            # nayalook.py:12-32: 'D/M/YYYY' via strptime, anything else
            # (the '3 days ago' listings) through format_time2 — the
            # reference's try/except pair.
            try:
                return datetime.strptime(raw.strip(), "%d/%m/%Y")
            except ValueError:
                return format_time2_py(raw, as_of)
        if style == "cjk_ymd":
            # nhandan.py:11-15: 'YYYY年MM月DD日 星期五' — the weekday token
            # rsplit away, the CJK-delimited date at midnight.
            return datetime.strptime(raw.strip().rsplit(" ", 1)[0],
                                     "%Y年%m月%d日")
        if style == "cjk_ymd_hms":
            # nhandan.py:17-21: 'YYYY年MM月DD日 星期五, HH:MM:SS' — tokens
            # [0] and [2] of the ', '/' ' split recomposed.
            t = re.split(", | ", raw.strip())
            return datetime.strptime(t[0] + t[2], "%Y年%m月%d日%H:%M:%S")
        if style == "ago_hi":
            # hastakshep.py:23-30,50-54: '<n> <हिंदी unit> ago' with the
            # unit translated to English and handed to format_time2; an
            # unmapped unit is the reference's bare except →
            # Util.format_time(0) = now.
            t = raw.split()
            en = _AGO_HI_UNITS[t[1]]  # KeyError → outer fallback-now
            return format_time2_py(f"{t[0]} {en} {t[2]}", as_of)
        if style == "fili_list":
            # fili.py:40-41: '<Weekday>, D Mon YYYY' — the comma's second
            # half re-ordered 'Mon D YYYY' into format_time2.
            t = raw.split(",")[1].split()
            return datetime(int(t[2]), MONTHS[t[1]], int(t[0]))
        if style == "fili_article":
            # fili.py:62-63: dd.published 'Weekday, D Mon YYYY ... HH:MM'
            # rebuilt 'Y-M-D HH:MM:00' from fixed token positions.
            t = raw.split(",")[1].split(" ")[1:]
            hh, mm = t[-1][:5].split(":")
            return datetime(int(t[2]), MONTHS[t[1]], int(t[0]),
                            int(hh), int(mm))
        if style == "hindi_mdy_comma":
            # hindinewsfresh10.py:112-144: '<Hindi month> D, YYYY' at
            # midnight through a clean 12-branch table; an unmapped month
            # renders 'None' and crashes the reference's format_time3 —
            # degraded here to the fallback-now path.
            parts = raw.split(", ")
            md = parts[0].split(" ")
            return datetime(int(parts[1]), _HNF_HINDI_MONTHS[md[0]],
                            int(md[1]))
        if style == "hindi_dmy_dash":
            # panchjanya.py:74-84: the byline's SECOND space token is
            # 'D-<Hindi month>-YYYY'; the bug-faithful month table above
            # (दिसंबर → 11, नवंबर unmapped → fallback-now via the
            # reference's try/except).
            tok = raw.split(" ")[1]
            d, mon, y = tok.split("-")
            return datetime(int(y), PANCHJANYA_HINDI_MONTHS[mon], int(d))
        if style == "dmy_hms_sp":
            # inextlive.py:40-43,67-68: 'D Mon YYYY HH:MM:SS' (no comma)
            # regexed out of the '| Updated Date:' banner; rendered
            # 'Y-m-d ' + the HH:MM:SS token verbatim.
            t = raw.split(" ")
            if t[1] in MONTHS:
                hh, mm, ss = t[3].split(":")
                return datetime(int(t[2]), MONTHS[t[1]], int(t[0]),
                                int(hh), int(mm), int(ss))
            return as_of.replace(microsecond=0)
        if style == "ymd":
            return datetime.strptime(raw.strip(), "%Y-%m-%d %H:%M:%S")
        if style == "hindi_dmy":
            # aajtak.py:92-94: '09 जनवरी 2021' → month translated via the
            # spider's own table, then REORDERED to 'Jan 09 2021' before
            # format_time2 (the D-M-Y order would not parse otherwise).
            toks = raw.split()
            mon = AAJTAK_HINDI_MONTHS.get(toks[1], toks[1])
            return format_time2_py(f"{mon} {toks[0]} {toks[2]}", as_of)
        if style == "isoT":
            parts = re.split(r"T|\+", raw.strip())
            return datetime.strptime(
                parts[0] + " " + parts[1], "%Y-%m-%d %H:%M:%S"
            )
    except (IndexError, KeyError, ValueError):
        return as_of.replace(microsecond=0)
    return format_time2_py(raw, as_of)


def _epoch(dt_str_or_none, as_of: datetime, raw: str | None,
           style: str | None = None) -> float:
    return (
        parse_site_date(raw, style, as_of)
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def next_page_request(rule: str, url: str, body: str,
                      payload: dict,
                      form_page_param: str = "page",
                      form_max_pages_key: str | None = None,
                      ) -> tuple[str, str, str] | None:
    """Next list-page request per pagination rule → (url, method, body).

    FORM_PAGE keeps the URL constant and advances the form body
    (FormRequest infinite scroll, yehey.py:70-71,103); every other rule is
    a GET with an advanced URL. ``form_page_param``: the body field that
    carries the page counter — 'page' for yehey, the theme-specific
    'loopState[currentPage]' for bworldonline.py:72. ``form_max_pages_key``:
    a body field whose value BOUNDS the counter — the page-scraped
    max_num_pages apkaakhbar.py:74,103 rides in its own POST body, and the
    chain stops once the next page would exceed it."""
    if rule == FORM_PAGE:
        if not payload.get("has_more"):
            return None
        params = dict(
            kv.split("=", 1) for kv in body.split("&") if "=" in kv
        ) if body else {}
        page = int(params.get(form_page_param, "1"))
        if form_max_pages_key is not None:
            try:
                if page + 1 > int(params.get(form_max_pages_key, "0")):
                    return None
            except ValueError:
                return None
        params[form_page_param] = str(page + 1)
        new_body = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
        return url, "POST", new_body
    if rule == NEXT_LINK:
        nxt = payload.get("next")
        return (urljoin(url, nxt), "GET", "") if nxt else None
    if not payload.get("has_more"):
        return None
    if rule == PAGE_PATH:
        # hatawtabloid.py:50-51: url + '/page/' + str(page+1); the current
        # page number lives in the URL path (absent ⇒ page 1).
        m = re.match(r"^(.*?)/page/(\d+)/?$", url)
        if m:
            base, page = m.group(1), int(m.group(2))
        else:
            base, page = url.rstrip("/"), 1
        return f"{base}/page/{page + 1}", "GET", ""
    base, _, q = url.partition("?")
    params = dict(kv.split("=", 1) for kv in q.split("&") if "=" in kv) if q else {}
    if rule == PAGE_PARAM or rule == API_PAGE:
        page = int(params.get("page", "1"))
        params["page"] = str(page + 1)
    elif rule == OFFSET_PARAM:
        start = int(params.get("start", "0"))
        params["start"] = str(start + PAGE_SIZE)
    else:
        return None
    return (
        base + "?" + "&".join(f"{k}={v}" for k, v in sorted(params.items())),
        "GET",
        "",
    )


def _is_sel(rule) -> bool:
    """A rule value may be a regex string (default) or a SELECTOR spec —
    a dict with a ``sel`` key (functions/htmlsel.py) that survives
    attribute reordering, extra attributes, and whitespace the way the
    reference's BeautifulSoup selectors do (interaksyon.py:27-29)."""
    return isinstance(rule, dict) and "sel" in rule


def _sel_scalar(tree, spec: dict) -> str | None:
    """One value off the DOM: ``sel`` (+ optional ``index``, default 0 —
    interaksyon.py:29 reads the LAST time/page-nav element via [-1]),
    then ``attr`` (attribute value) or normalized text, then an optional
    ``re`` whose group 1 trims the result. ``join: True`` concatenates
    EVERY match's text instead (apkaakhbar.py:158-160's strong-tag
    abstract accumulation). ``raw: True`` skips whitespace normalization —
    rules that split the value on a specific whitespace character
    (agrasamachar.py:54's '\\xa0' body-line separator) need it verbatim."""
    nodes = htmlsel.select(tree, spec["sel"])
    if spec.get("text_eq") is not None:
        # keep only nodes whose text equals the literal — loktej.py:57-60
        # walks the page-nav anchors looking for the one reading 'Next »'
        nodes = [n for n in nodes if n.text() == spec["text_eq"]]
    if not nodes:
        return None
    if spec.get("join"):
        # ``join: True`` concatenates bare (apkaakhbar's strong-concat);
        # a string join value is the separator (khulasaa.py:74-77's
        # h3 heads joined with newlines)
        sep = spec["join"] if isinstance(spec["join"], str) else ""
        return sep.join(n.text() for n in nodes)
    try:
        n = nodes[spec.get("index", 0)]
    except IndexError:
        return None
    if spec.get("require_child") and not htmlsel.select(
        n, spec["require_child"]
    ):
        # the picked node only counts when it CONTAINS a sub-match —
        # dunvalleymail.py:62-64 follows the page-nav's last link only
        # while it still wraps the next-chevron <i>
        return None
    if spec.get("attr"):
        val = n.attr(spec["attr"])
    elif spec.get("raw"):
        val = n.raw_text()
    else:
        val = n.text()
    if val is not None and spec.get("re"):
        m = re.search(spec["re"], val)
        val = m.group(1) if m else None
    if val is not None and spec.get("suffix"):
        # literal tail appended to the value — virarjun.py:101 bolts
        # three backspace characters onto category1, bug-faithful
        val = val + spec["suffix"]
    return val


def _cond_scalar(dom_fn, html: str, spec):
    """Scalar rule with declarative conditionals: ``{'const': v}`` is the
    literal value (dunvalleymail.py:51 stores a single SPACE as category2
    on one-level pages; emstv.py:63's hardcoded '' abstract);
    ``{'if_count': {'sel': css, 'eq': n}, 'then': …, 'else': …}``
    branches on a selector's match count (dunvalleymail.py:49-51 reads
    its breadcrumb fields by how many <i> separators the trail shows).
    Plain specs fall through to the selector/regex forms."""
    if isinstance(spec, dict):
        if "const" in spec:
            return spec["const"]
        if "if_count" in spec:
            ic = spec["if_count"]
            n = len(htmlsel.select(dom_fn(), ic["sel"]))
            if "ge" in ic:
                # threshold form — inextlive.py:62's 'category2 only when
                # the breadcrumb shows >= 4 spans'
                hit = n >= int(ic["ge"])
            else:
                hit = n == int(ic.get("eq", 1))
            branch = spec["then"] if hit else spec["else"]
            return _cond_scalar(dom_fn, html, branch)
        if "sel" in spec:
            return _sel_scalar(dom_fn(), spec)
    m = re.search(spec, html)
    return m.group(1) if m else None


def _page_scalar(html_text: str | None, spec) -> str | None:
    """One scalar off a raw page (regex group 1, or a SELECTOR spec) —
    used for gate dates read off side-fetched article pages
    (apkaakhbar.py:61-62, ambala.py:55-56)."""
    if html_text is None:
        return None
    if _is_sel(spec):
        return _sel_scalar(htmlsel.parse_html(html_text), spec)
    m = re.search(spec, html_text)
    return m.group(1) if m else None


def _effective_rules(rules: dict, url: str, meta: dict | None = None) -> dict:
    """URL-shape rule dispatch (P5 as data): a rules dict may carry
    ``variants`` = [{'match': regex-on-url, <rule overrides>}, ...]; the
    FIRST matching variant's keys override the base rules — the
    re.match(r'.*photo-gallery.*', response.url) branch cascade of
    zeenews.py:57,72 and aajtak.py:129,140,147 expressed declaratively.

    A variant may instead carry ``match_cat1``: a regex on the request
    lineage's category1 — cebudailynews.py:53,68 renders its 'life'
    section's articles through a different template and dispatches on
    response.meta['category1'], not the URL."""
    cat1 = (meta or {}).get("category1") or ""
    for v in rules.get("variants", ()):
        hit = ("match" in v and re.search(v["match"], url)) or (
            "match_cat1" in v and re.search(v["match_cat1"], cat1)
        )
        if hit:
            merged = dict(rules)
            merged.update({k: val for k, val in v.items()
                           if k not in ("match", "match_cat1")})
            return merged
    return rules


def _json_path(obj, path):
    """Walk a key/index path into parsed JSON ('items', ('item',
    'headline', 0), ...). An empty path returns the object itself —
    APIs whose response root IS the item list (spin.py:76, spot.py:38)."""
    for p in path if isinstance(path, (list, tuple)) else (path,):
        obj = obj[p]
    return obj


def _json_path_first(obj, spec):
    """A path, or {'paths': [p1, p2, ...]} tried in order — the corpus'
    conditional reads (spin.py:78-81: channel.parent.name if the parent
    exists else channel.name; spot.py:41: image | images.main)."""
    if isinstance(spec, dict) and "paths" in spec:
        for p in spec["paths"]:
            try:
                v = _json_path(obj, p)
            except (KeyError, IndexError, TypeError):
                continue
            if v is not None:
                return v
        raise KeyError(str(spec))
    return _json_path(obj, spec)


def _map_api_json(js: dict, amap: dict) -> dict:
    """Translate a site's REAL API JSON schema into the generic payload
    shape via per-site field paths (the raftaar.py:53-70 read pattern as
    data): ``entries`` locates the item list; ``href``/``title``/``time``
    are paths within each item (href optionally prefixed — raftaar builds
    article URLs as base + story.slug, py:60); ``total`` exposes the
    response's total item count for offset-bounded pagination.

    A missing ``entries`` key yields no entries (piagov.py:86's
    'articles' in keys check); ``min_entries`` drops the whole page below
    a count (piagov.py:88-89's len(article)==1 → pass — neither articles
    nor pagination); ``page_time_last`` reads a PAGE-level gate date off
    the LAST item (piagov.py:93-101), with ``y0_patch`` replacing a
    literal '0000' year (py:96-100's 2020 patch — bug-faithful); a
    missing gate key leaves the gate None, which stops pagination (the
    reference's None comparison dies the same way)."""
    try:
        items = list(_json_path(js, amap["entries"]))
    except (KeyError, IndexError, TypeError):
        items = []
    if len(items) < int(amap.get("min_entries", 0)):
        items = []
    entries = []
    for it in items:
        try:
            href = str(_json_path_first(it, amap["href"]))
        except (KeyError, IndexError, TypeError):
            if amap.get("entry_skip_bad"):
                # spot.py:39-45: each item wrapped in try/except
                # Exception: continue — malformed items skipped silently.
                continue
            raise
        if amap.get("href_prefix"):
            href = amap["href_prefix"] + href

        def _opt(key):
            if key not in amap:
                return None
            try:
                return _json_path_first(it, amap[key])
            except (KeyError, IndexError, TypeError):
                if amap.get("entry_skip_bad"):
                    raise
                return None

        try:
            entry = {
                "href": href,
                "title": _opt("title"),
                "pub_time_raw": _opt("time"),
                "img": _opt("img"),
                "abstract": _opt("abstract"),
            }
            # ``gate_time``: the cutoff gate reads a DIFFERENT field than
            # the stored pub time (udaybulletin.py:70,74: gate =
            # content-updated-at, doc = content-created-at).
            if "gate_time" in amap:
                entry["gate_time_raw"] = _json_path_first(
                    it, amap["gate_time"]
                )
        except (KeyError, IndexError, TypeError):
            continue  # entry_skip_bad raised through _opt
        entries.append(entry)
    out: dict = {"entries": entries}
    if "page_cat2_last" in amap and items:
        # spin.py:78-89: meta['category2'] is overwritten per item inside
        # the collection loop, but the article Requests are yielded only
        # AFTER it — every article (and the next page) inherits the LAST
        # item's channel name.
        try:
            out["cat2_last"] = _json_path_first(
                items[-1], amap["page_cat2_last"]
            )
        except (KeyError, IndexError, TypeError):
            pass
    if "page_time_first" in amap:
        # topgear.py:73: the page gate reads the FIRST item's
        # date_published (newest-first feed) — one comparison per page,
        # entries themselves never individually gated.
        gate = None
        if items:
            try:
                gate = _json_path_first(items[0], amap["page_time_first"])
            except (KeyError, IndexError, TypeError):
                gate = None
        out["page_time_raw"] = gate
    if "total" in amap:
        # tolerate a response without the count — 0 stops pagination
        # instead of killing the Arrow batch
        try:
            out["total_count"] = int(_json_path(js, amap["total"]))
        except (KeyError, IndexError, TypeError, ValueError):
            out["total_count"] = 0
    if "page_time_last" in amap:
        gate = None
        if items:
            try:
                gate = _json_path(items[-1], amap["page_time_last"])
            except (KeyError, IndexError, TypeError):
                gate = None
        if gate and amap.get("y0_patch") and str(gate).startswith("0000"):
            gate = amap["y0_patch"] + str(gate)[4:]
        out["page_time_raw"] = gate
    return out


def extract_payload(kind: str, html: str, rules: dict, url: str = "",
                    meta: dict | None = None) -> dict:
    """Raw-HTML extraction driven by per-site rules-as-data — the
    reference's BeautifulSoup selector surface (demo/已部署/zeenews.py:47,
    109-148; philboxing.py:104-158) re-expressed as regex rules stored in
    the site registry, executed by this one generic function. Produces the
    same payload dict shape the JSON path yields, so every downstream
    semantic (cutoff break, pagination, span interleaving) is shared.

    Rule keys (all regex strings unless noted):
      menu:    ``category``  — groups (href, label);
               ``excluded_labels`` — list, P4 category exclusion
               (zeenews.py:51: exclusion is crawler config, not page data);
               ``excluded_slugs``  — list, exclusion on the href's LAST
               path segment (zeenews.py:51 checks url.split('/')[-1])
      menu2:   ``category2`` — groups (href, label): second-level section
               links (aajtak.py:68-70 .widget-title, yehey.py:42-47
               sub-menu, manila.py:49-54 category table)
      list:    ``entry``     — named groups href/title and optional
                               time/img/abstract, one match per list entry
                               IN PAGE ORDER (philboxing carries the
                               abstract on the list page, philboxing.py:
                               44-45,59-60);
               ``next``      — group 1 = next-page href (zeenews.py:104);
               ``more``      — presence ⇒ has_more (page-param sites);
               ``page_time`` — group 1 = a PAGE-level date gating
                               pagination only (philboxing.py:67-95 reads
                               the page's last story date; entries are
                               never individually gated there);
               ``api_params``  — named groups (any) captured off the page
                               and used to instantiate api_url_template
                               (manila.py:61-66 reads the load-more
                               button's onclick params);
               ``form_params`` — same for POST form bootstrap fields
                               (yehey.py:63-69 scrapes currentday out of a
                               script tag);
               ``cat1_self``   — scalar: category1 read off the LIST page
                               ITSELF (its own header), overriding the menu
                               link text for every entry the page emits —
                               each pagination page re-reads it
                               (latestnews1.py:55's page-header h1 span)
      article: ``skip_if``    — presence rule: a page matching it is a
                               SOFT 404 (HTTP 200 rendering an error
                               template) — no document, no children
                               (latestnews1.py:75-77's .error404 check);
               ``body_fallback`` — scalar: when ``block`` yields no
                               paragraphs, this single value becomes both
                               body and abstract (latestnews1.py:90-96's
                               container-text fallback; its LinkedIn…Share
                               trim maps to the spec's ``re`` — over
                               whitespace-NORMALIZED text here, since the
                               DOM engine collapses runs);
               ``title``, ``pub`` (group 1 each), optional ``abstract``,
               ``cat1``/``cat2`` — categories read off the ARTICLE page
               (breadcrumbs: maharashtratimes.py:79-81, shangbao.py:67-71)
               instead of ridden down in meta;
               ``block``     — named groups para|src, matched IN DOCUMENT
                               ORDER: the interleaved text/image span
                               sequence comes straight from match order
                               (zeenews.py:119-122's .children walk).

    SELECTOR forms (markup-robust; functions/htmlsel.py): any rule above
    may instead be a dict —
      scalar rules:   {"sel": css, "attr"?: name, "index"?: i, "re"?: rx}
                      (attr value or normalized text of match #i; [-1]
                      supported — interaksyon.py:29-30)
      category rules: {"sel": css, "attr"?: href-attr, "skip"?: n} — each
                      match is the link; label = its text; ``skip`` drops
                      the first n matches (latestnews1.py:46's menu[1:]
                      Home-link slice). A LIST of such specs = menu
                      GROUPS in spec order, each with a fixed "label"
                      (= category1) and the link text as label2
                      (= category2; suppress with "label2": False) — the
                      boholchronicle.py:28-34 multi-group menu shape
      entry:          {"sel": css} (match IS the <a>) or {"sel": css,
                      "fields": {href/title/time/img/abstract: scalar
                      specs relative to the match}}
      more / list_marker: {"sel": css} — presence
      block:          {"para_sel": css, "img_sel": css, "img_attr"?: a} —
                      matched independently, merged in document order
    ``api_params``/``form_params`` stay regex-only (they read script text
    and onclick attributes, where regex is the right tool).
    """
    rules = _effective_rules(rules, url, meta)
    # Selector rules parse the page into a DOM once, lazily — only pages
    # whose rule-set actually uses selectors pay for tree building.
    _tree = []

    def dom():
        if not _tree:
            _tree.append(htmlsel.parse_html(html))
        return _tree[0]

    if kind in ("menu", "menu2"):
        # A menu2 page that matches the list marker is an article section:
        # it bootstraps a ?curpg=1 list chain instead of linking deeper
        # (maharashtratimes.py:33-34's data-tn check).
        lm = rules.get("list_marker")
        if kind == "menu2" and lm and (
            bool(htmlsel.select(dom(), lm["sel"])) if _is_sel(lm)
            else re.search(lm, html)
        ):
            return {"categories": [], "list_bootstrap": True}
        key = "category2" if kind == "menu2" else "category"
        excluded = set(rules.get("excluded_labels", ()))
        excluded_slugs = set(rules.get("excluded_slugs", ()))
        if rules.get("fixed_categories") is not None:
            # The page is never actually mined for links — the spider
            # hardcodes its collection list (spin.py:60-67's 35 sport
            # slugs); carried here as rule data in the same shape.
            return {
                "categories": [
                    {"href": fc["href"], "label": fc["label"],
                     "excluded": False}
                    for fc in rules["fixed_categories"]
                ]
            }
        cats = []
        smspec = rules[key] if isinstance(rules[key], dict) else None
        if smspec is not None and smspec.get("year_sel"):
            # Sitemap-index menu (entrepreneur.py:29-37): each matched
            # node is a YEAR block (year_sel = its heading) holding month
            # links (children_sel); the year number and the month ordinal
            # of each link's FIRST text token ride out as gate data —
            # parse_page applies the reference's year-break/month-break
            # against the cutoff.
            for bi, n in enumerate(htmlsel.select(dom(), smspec["sel"])):
                ys = htmlsel.select(n, smspec["year_sel"])
                try:
                    year = int(ys[0].text()) if ys else None
                except ValueError:
                    year = None
                for c in htmlsel.select(n, smspec.get("children_sel", "a")):
                    href = c.attr(smspec.get("attr", "href"))
                    if href is None:
                        continue
                    if smspec.get("href_prefix"):
                        href = smspec["href_prefix"] + href
                    label = c.text()
                    cats.append({
                        "href": href, "label": label, "excluded": False,
                        "gate_year": year,
                        "gate_mon": MONTHS.get(
                            (label or "").split(" ")[0]),
                        "gate_block": bi,
                    })
            return {"categories": cats}
        # A LIST of specs = menu GROUPS, each with a FIXED category label
        # and the matched links' text as the second-level label — the
        # boholchronicle.py:28-34 shape (three id-keyed sub-menus, each
        # hardcoding category1, sub-link text as category2, plus one
        # direct link with category2=None). Groups emit in spec order,
        # matching the reference's sequential yield loops.
        specs = rules[key] if isinstance(rules[key], list) else [rules[key]]
        pairs = []  # (href, label, label2 | None)
        for spec in specs:
            if _is_sel(spec):
                # Selector form: each matched node is the link — href off
                # the node's attr (default 'href'), label = its normalized
                # text (or the group's fixed label, link text as label2).
                fixed = spec.get("label")
                # an EXPLICIT ``label: None`` is a group whose category1
                # is unset — pravakta.py:37-46 schedules its sub-menu
                # links before category1 is ever assigned (the shared-item
                # race collapsed to per-request lineage, the
                # divyahimachal convention)
                has_fixed = "label" in spec
                if spec.get("label_from"):
                    # the group's fixed label read off the PAGE itself —
                    # journal.py:36-40 labels its submenu with the page's
                    # own archive title
                    fixed = _sel_scalar(dom(), spec["label_from"])
                    has_fixed = True
                nodes = htmlsel.select(dom(), spec["sel"])
                # ``labels_from``: a PARALLEL selector zipped by position —
                # dailyhindinews.py:35-41 pairs h4.widget-title texts with
                # a.hm-viewall links index-for-index
                zip_labels = None
                if spec.get("labels_from"):
                    lf = spec["labels_from"]
                    zip_labels = [x.text() for x in htmlsel.select(
                        dom(), lf["sel"])][lf.get("skip", 0):]
                # ``slice``: positional [start, stop) selection — the
                # reference's menu_url[2] single pick and cat1s[4:7] range
                # (piagov.py:37,43-45); applied before ``skip``.
                if spec.get("slice"):
                    nodes = nodes[slice(*spec["slice"])]
                # ``drop_seq``: SEQUENTIAL Python dels by index — the
                # dainiknavajyoti.py:37 'del categories[0], categories[-1],
                # categories[-3], categories[-1]' cascade, where each del
                # reindexes the list before the next.
                if spec.get("drop_seq"):
                    nodes = list(nodes)
                    for di in spec["drop_seq"]:
                        try:
                            # a two-element list is a SLICE del —
                            # panchjanya.py:34's 'del categories[13:17]'
                            # after two single dels
                            if isinstance(di, (list, tuple)):
                                del nodes[di[0]:di[1]]
                            else:
                                del nodes[di]
                        except IndexError:
                            pass
                stopped = False
                for zi, n in enumerate(nodes[spec.get("skip", 0):]):
                    # ``exclude_if_sel``: a container matching this
                    # sub-select is NOT a section — agniban.py:36-40 keeps
                    # only li's WITHOUT a nested <ul>.
                    if spec.get("exclude_if_sel") and htmlsel.select(
                        n, spec["exclude_if_sel"]
                    ):
                        continue
                    # ``link_sel``: the matched node is a CONTAINER (e.g. a
                    # nav <li>) and its link is a relative sub-select —
                    # raftaar.py:34-35's li → select_one('a').
                    if spec.get("link_sel"):
                        ln = htmlsel.select(n, spec["link_sel"])
                        link = ln[0] if ln else None
                        if link is None:
                            continue
                    else:
                        link = n
                    href = link.attr(spec.get("attr", "href"))
                    if spec.get("label_attr"):
                        # the category label is an ATTRIBUTE of the link,
                        # not its text — world.py:31-33 reads i.get('title')
                        # as category1
                        text_override = link.attr(spec["label_attr"])
                    else:
                        text_override = None
                    if href is not None and spec.get("href_prefix"):
                        # the spider bolts a FIXED host onto relative menu
                        # hrefs — a different host than the start URL, so
                        # urljoin against the menu page would be wrong
                        # (dainiknavajyoti.py:39 prepends the .net domain
                        # to links mined off the .com home page)
                        href = spec["href_prefix"] + href
                    text = (text_override if text_override is not None
                            else link.text())
                    if spec.get("label_from_href") == "last_segment" \
                            and href is not None:
                        # the category label is the href's LAST path
                        # segment, not the link text — pna.py:32's
                        # href.split('/')[-1]
                        text = href.split("/")[-1]
                    if zip_labels is not None:
                        text = (zip_labels[zi] if zi < len(zip_labels)
                                else text)
                    # ``stop_href``: a sentinel link ENDS the menu walk —
                    # haribhoomi.py:110-111 breaks at '/live-tv' and every
                    # later item is never crawled.
                    # (guard the sentinel against href-less links: an <a>
                    # with no href must be SKIPPED, not treated as a
                    # None == None sentinel match — bhadas4media.py:38-41)
                    if spec.get("stop_href") is not None \
                            and href == spec["stop_href"]:
                        stopped = True
                        break
                    # ``exclude_hrefs``: bare-href skips (dfa.py:38's
                    # `if a.get("href") != "/"`).
                    if href in spec.get("exclude_hrefs", ()):
                        continue
                    # ``href_re``: only matching hrefs are sections —
                    # janadesh.py:26-28's re.match('^http', href),
                    # centralindia.py:52-54's category-prefix filter.
                    if spec.get("href_re") and (
                        href is None
                        or not re.match(spec["href_re"], href)
                    ):
                        continue
                    # ``href_skip_re``: matching hrefs are NOT sections —
                    # nayalook.py:59-60 drops two-segment
                    # /category/x/y/ links, keeping the one-segment ones.
                    if spec.get("href_skip_re") and href is not None \
                            and re.match(spec["href_skip_re"], href):
                        continue
                    children = (
                        htmlsel.select(n, spec["children_sel"])
                        if spec.get("children_sel") else []
                    )
                    # ``children_skip``: drop the first n sub-links —
                    # divyahimachal.py:122-124 walks category2_list[1:].
                    children = children[spec.get("children_skip", 0):]
                    # ``menu2_label_sep``: a label containing the
                    # separator routes to a SECOND-LEVEL menu page and
                    # keeps only the prefix as category1 —
                    # tarunmitra.py:91-97's `if ':' in category`.
                    # ``child_kind`` on the spec routes EVERY link of this
                    # group to the given kind — sunstar.py:30-38's three-
                    # hop menu chain (menu → section page → one more hop)
                    lbl = text
                    # ``label_re``: group 1 trims the link text —
                    # awesome.py:33-36's '.(.*)?' drops the leading '#'
                    if spec.get("label_re") and text is not None:
                        lm = re.match(spec["label_re"], text)
                        lbl = text = lm.group(1) if lm else text
                    ck = spec.get("child_kind")
                    sep = spec.get("menu2_label_sep")
                    if sep and text is not None and sep in text:
                        lbl = text.split(sep)[0]
                        ck = "menu2"
                    # ``children_suppress_parent``: a top-level item WITH
                    # children is only a grouping header, never its own
                    # collection (udaybulletin.py:43-59's if/else — vs
                    # raftaar.py:38-41, which yields the parent too).
                    # ``children_shared_meta``: the reference builds ONE
                    # meta dict per top item, yields the parent, then
                    # mutates meta['category2'] per child — Scrapy keeps
                    # the reference, so by parse time the parent AND every
                    # child all read the LAST child's label
                    # (legendnews.py:31-35's shared-dict loop).
                    shared_last = None
                    if children and spec.get("children_shared_meta"):
                        shared_last = children[-1].text()
                    if not (children and spec.get("children_suppress_parent")):
                        if not has_fixed:
                            # ``label2_const``: a spider-hardcoded second
                            # label on every menu link — newswing.py:32's
                            # category2 = '' (empty STRING, stored as such,
                            # not None).
                            pairs.append((href, lbl,
                                          spec.get("label2_const",
                                                   shared_last),
                                          None, ck))
                        else:
                            if spec.get("label2") is False:
                                label2 = None
                            elif spec.get("label2_default_unless"):
                                # known labels keep their text, anything
                                # else collapses to the default —
                                # dfa.py:39-46's if/elif/else 'Events'
                                d = spec["label2_default_unless"]
                                label2 = (text if text in d["keep"]
                                          else d["default"])
                            else:
                                label2 = text
                            pairs.append((href, fixed, label2, None, None))
                    # ``children_sel``: a NESTED second level inside the
                    # same menu node — each relative match is a sub-link
                    # whose text becomes category2 and whose parent link
                    # rides along for slug composition (raftaar.py:40-48's
                    # li > ul > li walk under the same top item).
                    for c in children:
                        pairs.append((c.attr(spec.get("attr", "href")),
                                      text,
                                      shared_last if shared_last is not None
                                      else c.text(), href, None))
                if stopped:
                    break
            else:
                pairs.extend(
                    (m.group(1), m.group(2), None, None, None)
                    for m in re.finditer(spec, html)
                )
        for href, label, label2, parent_href, child_kind in pairs:
            if href is None:
                continue
            # ``href_sub``: literal replace pairs applied to every menu
            # href — hindinewsfresh10.py:38's .replace(' ', '%20').
            for a, b in rules.get("href_sub", ()):
                href = href.replace(a, b)
            slug = href.rstrip("/").rsplit("/", 1)[-1]
            cat = {
                "href": href,
                "label": label,
                "excluded": label in excluded or slug in excluded_slugs
                or (label2 is not None and label2 in excluded),
            }
            if label2 is not None:
                cat["label2"] = label2
            if parent_href is not None:
                cat["parent_href"] = parent_href
            if child_kind is not None:
                cat["child_kind"] = child_kind
            cats.append(cat)
        out = {"categories": cats}
        if rules.get("menu_dont_filter"):
            # Category hops yielded with dont_filter=True (piagov.py:50,61)
            out["dont_filter"] = True
        return out

    if kind in ("list", "api"):
        # ``require_marker``: a list page missing the marker is really an
        # unexpected submenu — the reference logs and yields NOTHING
        # (haribhoomi.py:121-145's find(text="View All") else-branch).
        rm = rules.get("require_marker")
        if rm is not None and not (
            bool(htmlsel.select(dom(), rm["sel"])) if _is_sel(rm)
            else bool(re.search(rm, html))
        ):
            return {"entries": [], "has_more": False}
        # ``list_if``/``submenu``: presence-dispatched recursion — a page
        # WITHOUT the list container is really a deeper section index
        # whose links feed back into the SAME list callback
        # (inextlive.py:39-53: '.topicList' pages are lists, otherwise
        # the '.MainHd a' links recurse into parse2).
        li_marker = rules.get("list_if")
        if kind == "list" and li_marker is not None and not htmlsel.select(
            dom(), li_marker["sel"]
        ):
            sm = rules.get("submenu")
            links = []
            if sm:
                links = [a.attr(sm.get("attr", "href"))
                         for a in htmlsel.select(dom(), sm["sel"])]
            return {"entries": [], "has_more": False,
                    "submenu_links": [h for h in links if h is not None]}
        entries = []
        # ``entry`` is optional: manila's category pages carry no article
        # links at all — only the load-more API params (manila.py:59-67).
        # A LIST of entry specs concatenates its groups in spec order —
        # divyahimachal.py:139-146 yields the o-topnewsnew FEATURED link
        # first, then the frame-left grid.
        erule = rules.get("entry")
        especs = (erule if isinstance(erule, list)
                  else [erule] if erule is not None else [])
        probe_entry = None
        for espec in especs:
            n_before = len(entries)
            if _is_sel(espec):
                # Selector form: ``sel`` matches each entry (container or
                # the <a> itself), IN PAGE ORDER; optional ``fields``
                # holds relative sub-specs (href/title/time/img/abstract)
                # evaluated within the match — interaksyon.py:27's
                # '.td-ss-main-content .td-module-thumb > a' loop.
                fields = espec.get("fields")
                # ``scope``: entries come from ONE positional pick among
                # the scope selector's matches — apnlive.py:55-56 reads
                # find_all('div', class_='td_block_inner...')[-1] so only
                # the LAST block's items are articles (earlier matches are
                # sidebar widgets).
                roots = [dom()]
                if espec.get("scope"):
                    sc = espec["scope"]
                    scn = htmlsel.select(dom(), sc["sel"])
                    try:
                        roots = [scn[sc.get("index", 0)]]
                    except IndexError:
                        roots = []
                nodes = [n for r in roots
                         for n in htmlsel.select(r, espec["sel"])]
                if espec.get("slice"):
                    # positional entry slice — emsindia.py:42's
                    # .borderT>a[:-1] grid walk
                    nodes = nodes[slice(*espec["slice"])]
                for node in nodes:
                    if fields:
                        vals = {k: _sel_scalar(node, sp)
                                for k, sp in fields.items()}
                    else:
                        vals = {"href": node.attr(espec.get("attr", "href")),
                                "title": node.text() or None}
                    if espec.get("require_field") \
                            and vals.get(espec["require_field"]) is None:
                        # a row missing this field is SKIPPED outright —
                        # tempo.py:44-47's try/except continue around the
                        # .entryDate read
                        continue
                    alt = espec.get("href_alt_if")
                    if alt and vals.get("href") == alt["eq"]:
                        # one sentinel href swaps in an alternate pick —
                        # panchjanya.py:46-49 takes the row's LAST link
                        # when select_one('a') lands on 'Nation.html'
                        vals["href"] = _sel_scalar(node, alt["use"])
                    if vals.get("href") is None:
                        continue
                    if vals["href"] in espec.get("exclude_hrefs", ()):
                        # one hardcoded article skipped by URL —
                        # dainiknavajyoti.py:46-49's editorial carve-out
                        continue
                    entries.append(
                        {
                            "href": vals["href"],
                            "title": vals.get("title"),
                            "pub_time_raw": vals.get("time"),
                            "img": vals.get("img") or None,
                            "abstract": vals.get("abstract") or None,
                            # per-entry category2 scraped off the list row
                            # (businessmirror.py:44-46)
                            "cat2": vals.get("cat2"),
                            # spec-level child kind: emsindia.py:37-39's
                            # featured link is yielded back into parse
                            # (the LIST callback), not parse_item
                            "kind": espec.get("kind"),
                        }
                    )
            else:
                for m in re.finditer(espec, html):
                    d = m.groupdict()
                    entries.append(
                        {
                            "href": d["href"],
                            "title": d.get("title"),
                            "pub_time_raw": d.get("time"),
                            "img": d.get("img") or None,
                            "abstract": d.get("abstract") or None,
                            "cat2": d.get("cat2"),
                        }
                    )
            # ``probe_last_member``: THIS spec's last match is not a
            # normal entry — it becomes the pagination probe, even when
            # later entry groups follow it in the payload
            # (bhadas4media.py:41-44,53: url_list[:-1] articles, then the
            # latest-100 widget links, then the [-1] probe).
            if isinstance(espec, dict) and espec.get("probe_last_member") \
                    and len(entries) > n_before:
                probe_entry = entries.pop()
        out: dict = {"entries": entries}
        if probe_entry is not None:
            out["probe_entry"] = probe_entry

        def scalar(key):
            r = rules.get(key)
            if r is None:
                return None
            return _cond_scalar(dom, html, r)

        out["next"] = scalar("next")
        if out["next"] is not None and rules.get("next_rel_prefix") \
                and not re.match(r"http", out["next"]):
            # pressnote.py:55-61: a next URL mined out of an onclick is
            # bolted onto a FIXED host when it isn't absolute (a DIFFERENT
            # host than the start URL, so urljoin can't stand in)
            out["next"] = rules["next_rel_prefix"] + out["next"]
        if out["next"] is None and rules.get("next_alt_all"):
            # no primary next link — EVERY pagination anchor is scheduled
            # (inextlive.py:44-48: '.last a' if present, else all
            # '.pagination.border0 a' links)
            na = rules["next_alt_all"]
            alts = [a.attr(na.get("attr", "href"))
                    for a in htmlsel.select(dom(), na["sel"])]
            alts = [h for h in alts if h is not None]
            if alts:
                out["next_all"] = alts
        mrule = rules.get("more")
        out["has_more"] = (
            (bool(htmlsel.select(dom(), mrule["sel"])) if _is_sel(mrule)
             else bool(re.search(mrule, html)))
            if mrule else False
        )
        if rules.get("page_time"):
            out["page_time_raw"] = scalar("page_time")
        if rules.get("page_max"):
            # total page count read off the page itself ('Page 1 of N' —
            # apnlive.py:59's span.pages last token); parse_page compares
            # it against the CURRENT page number to bound /page/N chains.
            out["page_max"] = scalar("page_max")
        if rules.get("page_entry_time"):
            # ONE page-level date stamped onto every entry the page
            # emits — bhopalsamachar.py:52-53 reads select_one (the
            # page's FIRST .post-author~span) inside its entry loop, so
            # all entries carry the newest stamp, bug-faithful.
            out["page_entry_time"] = scalar("page_entry_time")
        if rules.get("next_side_check"):
            # variant-scoped side-check rides out with the payload —
            # hindinewsfresh10's PAGE 1 paginates unconditionally, only
            # the updated-max tail pages probe the next page's emptiness
            out["next_side_check"] = rules["next_side_check"]
        if rules.get("page_entry_title"):
            # ONE page-level title stamped onto every entry — the
            # reference reads the PAGE's first h2.entry-title inside its
            # entry loop, so every article of a page carries the first
            # row's title (janoduniya.py:40, select_one over soup).
            out["page_entry_title"] = scalar("page_entry_title")
        if rules.get("next_value"):
            # the value the templated next URL embeds (bicolstandard.py:
            # 45-51's parse.quote of the last timeago @title;
            # bhopalsamachar.py:62-64's %3A/%2B-escaped last datetime)
            out["next_value"] = scalar("next_value")
        if rules.get("cat1_self"):
            out["cat1_self"] = scalar("cat1_self")
        if rules.get("cat2_self"):
            # category2 likewise off the list page itself — agniban.py:
            # 50-51's breadcrumb trail-items (a 'Page N' crumb means a
            # one-level category, handled by the spec's regex)
            out["cat2_self"] = scalar("cat2_self")
        if rules.get("page_abstract"):
            # ONE page-level teaser rides into every entry's meta —
            # aapkikhabar.py:63 sets meta['abstract'] from the list's
            # single div.news_desc for each article it yields
            out["page_abstract"] = scalar("page_abstract")
        for pkey in ("api_params", "form_params"):
            if rules.get(pkey):
                pm = re.search(rules[pkey], html)
                if pm:
                    out[pkey] = pm.groupdict()
        return out

    # article
    sk = rules.get("skip_if")
    if sk is not None and (
        bool(htmlsel.select(dom(), sk["sel"])) if _is_sel(sk)
        else bool(re.search(sk, html))
    ):
        # Soft 404: HTTP 200 serving an error template — the reference
        # logs '该页面404' and returns nothing (latestnews1.py:75-77).
        return {"skipped": True}

    def first(key):
        r = rules.get(key)
        if not r:
            return None
        return _cond_scalar(dom, html, r)

    paras: list[str] = []
    imgs: list[dict] = []
    block = rules["block"]
    if isinstance(block, dict):
        # Selector form: ``para_sel`` / ``img_sel`` matched independently,
        # merged in DOCUMENT ORDER by one tree walk — the .children-walk
        # interleaving of zeenews.py:119-122 without a shared container
        # (interaksyon's featured image lives outside the content div,
        # interaksyon.py:46-48). Either key may be a LIST of selectors
        # (union, document order preserved by the walk) — sites with two
        # image markups, e.g. clickthecity's lead '.elementor-image img'
        # + in-body 'figure img' (clickthecity.py:131-136), the selector
        # twin of the regex side's src/src2/src3 alternation.
        def ids_of(key):
            sels = block.get(key)
            if not sels:
                return set()
            if isinstance(sels, str):
                sels = [sels]
            return {
                id(n) for s in sels for n in htmlsel.select(dom(), s)
            }

        para_ids = ids_of("para_sel")
        fb_paras = False
        if not para_ids and block.get("para_sel_fallback"):
            fb_paras = True
            # Selector fallback CHAIN — the second selector is used only
            # when the first matches nothing (newstracklive.py:108-112's
            # sec-info p else carousel-caption p;
            # dainiksandhyaprakash.py:95-98's artfulstry div).
            para_ids = {
                id(n) for n in htmlsel.select(
                    dom(), block["para_sel_fallback"]
                )
            }
        img_ids = ids_of("img_sel")
        src_attr = block.get("img_attr", "src")
        skip_re = block.get("img_skip_re")
        stop_re = block.get("para_stop_re")
        drop_re = block.get("para_drop_re")
        stopped_paras = False
        for n in htmlsel.walk(dom()):
            if id(n) in para_ids:
                if stopped_paras:
                    continue
                t = n.text()
                # ``para_stop_re``: the body loop BREAKS at a sentinel
                # paragraph (aapkikhabar.py:146-149's 'Trending tweet of
                # india' cutoff) — the sentinel itself is dropped
                if stop_re and re.match(stop_re, t):
                    stopped_paras = True
                    continue
                # ``para_drop_re``: matching paragraphs are skipped, the
                # loop continues — tv9hindi.py:111-117's blue-span ad
                # filter, virarjun.py:90-92's empty-paragraph removal
                if drop_re and re.match(drop_re, t):
                    continue
                paras.append(t)
            elif id(n) in img_ids:
                # ``img_attr2``: secondary attribute when the primary is
                # absent — technobaboy.py:72-77 collects the featured
                # ANCHOR's href alongside content <img> srcs
                src = n.attr(src_attr)
                if src is None and block.get("img_attr2"):
                    src = n.attr(block["img_attr2"])
                if src is None:
                    continue
                if skip_re and re.search(skip_re, src):
                    # placeholder filter — dainiksandhyaprakash.py:88-90
                    # drops data:image/gif lazy-load stubs
                    continue
                if block.get("img_prefix"):
                    # fixed-host prefix instead of page-relative urljoin
                    # (dainiknavajyoti.py:81-84 prepends the .net domain
                    # to every adjimage src)
                    src = block["img_prefix"] + src
                imgs.append({"after_para": len(paras) - 1, "src": src})
        if block.get("img_slice"):
            # positional image slice — apkaakhbar.py:151's
            # soup.select('article img')[:-3] drops the trailing
            # sidebar/footer images
            imgs = imgs[slice(*block["img_slice"])]
        if block.get("img_attr_re"):
            # the image URL lives INSIDE an attribute value — politics.py:
            # 66-67 reads div.relative's style and takes the last quoted
            # string; group 1 of the regex is the URL
            out_imgs = []
            for im in imgs:
                m = re.search(block["img_attr_re"], im["src"])
                if m:
                    out_imgs.append({**im, "src": m.group(1)})
            imgs = out_imgs
        para_start = 0
        if block.get("para_skip"):
            # positional paragraph skip — politics.py:82's body_list[1:]
            para_start = int(block["para_skip"])
            paras = paras[para_start:]
        # ``para_fallback_slice``: a slice applied ONLY when the fallback
        # selector fired — sachkaujala.py:86's div walk drops its wrapper
        # first div and blank last while the p/h3 branch keeps everything
        eff_slice = block.get("para_slice") or (
            block.get("para_fallback_slice") if fb_paras else None
        )
        if eff_slice:
            # positional paragraph slice — sunstar.py:59-60 stores ONLY
            # the first .col-sm-11 paragraph as both body and abstract
            sl = slice(*eff_slice)
            para_start += sl.start or 0
            paras = paras[sl]
        if para_start or eff_slice:
            # re-anchor images onto the KEPT paragraph range (the
            # reference stores images as a separate list, so position is
            # a span-model concern only): shift by the dropped head,
            # clamp tail-anchored images to the last kept paragraph
            cap = len(paras) - 1
            imgs = [
                {**im, "after_para": max(-1, min(im["after_para"]
                                                 - para_start, cap))}
                for im in imgs
            ]
    else:
        for m in re.finditer(block, html):
            d = m.groupdict()
            # Python regexes forbid reusing a group name across alternation
            # branches, so a block rule may carry src/src2/src3 image
            # branches (yehey has header AND in-content image markups,
            # yehey.py:128-134).
            img_src = d.get("src") or d.get("src2") or d.get("src3")
            if d.get("para") is not None:
                paras.append(d["para"])
            elif img_src is not None:
                # Interleaved after the paragraph it follows; an image
                # BEFORE any paragraph is a header image, kept first
                # (after_para=-1 — yehey.py:128-130 appends the
                # primary-header img before the in-paragraph ones).
                imgs.append({"after_para": len(paras) - 1, "src": img_src})
    fb_abstract = None
    if not paras and rules.get("abstract_fallback"):
        # A page with no structured paragraphs may source its abstract
        # from a DIFFERENT element than its fallback body —
        # bharatkhabar.py:86-88 stores the h1 as abstract and the LAST h2
        # as body when post_header has no <p>.
        fb_abstract = first("abstract_fallback")
    if not paras and rules.get("body_fallback"):
        # No structured paragraphs: the whole-container fallback
        # (latestnews1.py:90-96) — one value serving as body AND abstract.
        fb = first("body_fallback")
        if fb:
            fbr = rules["body_fallback"]
            if isinstance(fbr, dict) and fbr.get("split"):
                # the container text is LINE-structured on a separator
                # character: agrasamachar.py:54-56 replaces '\xa0' with
                # newlines, strips the whole, and the first line becomes
                # the abstract — each line is a paragraph here (pair the
                # spec with ``raw: True`` so the normalizer doesn't eat
                # the separator).
                paras = fb.replace(fbr["split"], "\n").strip().split("\n")
            else:
                paras = [fb]
    # Composite date: a site may publish the date and time-of-day in two
    # separate elements joined before parsing (clickthecity.py:138-155:
    # the --type-date span + the regex-trimmed --type-time span; no time
    # span or a failed trim ⇒ the date alone, exactly the reference's
    # branch).
    pub_raw = first("pub")
    if pub_raw is not None and rules.get("pub2"):
        p2 = first("pub2")
        if p2 is not None:
            pub_raw = pub_raw + " " + p2
    return {
        "title": first("title"),
        "abstract": first("abstract"),
        "fb_abstract": fb_abstract,
        "pub_time_raw": pub_raw,
        "cat1": first("cat1"),
        "cat2": first("cat2"),
        "paras": paras,
        "imgs": imgs,
    }


def parse_page(
    url: str,
    response_url: str,
    kind: str,
    payload_json: str | None,
    meta: dict,
    depth: int,
    seq: str,
    cutoff_epoch: float | None,
    rule: str,
    as_of: datetime,
    probe_first: bool = False,
    method: str = "GET",
    body: str = "",
    fmt: str = "json",
    extract: dict | None = None,
    site: dict | None = None,
    req_kind: str | None = None,
    side_fetch=None,
) -> tuple[dict | None, list[dict]]:
    """One page → (document_row | None, ordered child requests).

    Child seq = parent seq + '.' + zero-padded emit index (lineage-stable,
    partition-independent — SURVEY §4 determinism). ``method``/``body``
    are the CURRENT request's identity (S5): FORM_PAGE pagination advances
    the body while the URL stays constant. ``fmt='html'`` routes the raw
    payload through the per-site extraction rules (``extract``) instead of
    json.loads; ``fmt='json_html'`` parses a JSON envelope whose ``data``
    field is HTML (manila.py:71's load-more API). ``site`` is the full
    registry entry (date_style / menu_child_kind / probe_last /
    api_url_template / ...); ``req_kind`` is the REQUEST's parse_kind —
    Scrapy dispatches on the request's callback, not on page content, and
    a 'probe' request parses an article page differently
    (maharashtratimes.py:45 parse_page vs :59 parse_detail).
    """
    site = site or {}
    date_style = site.get("date_style")
    if not payload_json:
        return None, []  # fetch miss / 404: reference logs and moves on
    eff_kind = "probe" if req_kind == "probe" else kind
    # A site's API endpoints may speak a different format than its pages:
    # manila's load-more returns JSON wrapping HTML (manila.py:71), yehey's
    # infinite scroll returns plain JSON (yehey.py:78-97) while both sites'
    # pages are HTML.
    if kind == "api":
        fmt = site.get("api_format", fmt)
    if fmt == "html":
        payload = extract_payload(
            "article" if eff_kind == "probe" else eff_kind,
            payload_json, extract or {}, url, meta,
        )
    elif fmt == "json_html":
        # The envelope key is site data: manila wraps its HTML in 'data'
        # (manila.py:71), bworldonline in 'server_reply_html_data'
        # (bworldonline.py:60). ``json_html_double``: the body is a JSON
        # string INSIDE a JSON string — decoded twice before the key
        # lookup (unbox.py:57's json.loads(json.loads(...))['code']).
        outer = json.loads(payload_json)
        if site.get("json_html_double"):
            outer = json.loads(outer)
        payload = extract_payload(
            "api",
            outer.get(site.get("json_html_key", "data")) or "",
            extract or {}, url, meta,
        )
    else:
        payload = json.loads(payload_json)
        # ``api_map``: the JSON analogue of the HTML extraction rules —
        # per-site field paths into the API's REAL schema (raftaar.py:
        # 53-60's js['items'][i]['story']['slug'] walk) mapped onto the
        # generic payload shape all downstream semantics consume.
        amap = site.get("api_map")
        if amap and kind == "api" and isinstance(payload, (dict, list)):
            payload = _map_api_json(payload, amap)
    if isinstance(payload, dict) and payload.get("skipped"):
        # skip_if soft-404 (latestnews1.py:75-77): fetched and logged, but
        # yields neither a document nor children.
        return None, []
    requests: list[dict] = []

    def emit(child_url: str, parse_kind: str, child_meta: dict,
             dont_filter: bool = False, pub_epoch: float | None = None,
             child_method: str = "GET", child_body: str = "") -> None:
        # ``pub_epoch`` (the list-scraped entry time, when known) feeds the
        # T1 priority scorer — computed by the CALLER: the engine scores
        # vectorized (operators/politeness.priority_score_col), the
        # simulator with the Python mirror. parse_page itself stays
        # score-free so the hot path has zero per-row scoring Python.
        requests.append(
            {
                "url": urljoin(url, child_url),
                "parse_kind": parse_kind,
                "dont_filter": dont_filter,
                "meta": child_meta,
                "depth": depth + 1,
                "pub_epoch": pub_epoch,
                "seq": f"{seq}.{len(requests):03d}",
                "method": child_method,
                "body": child_body,
            }
        )

    if eff_kind == "menu":
        # U1 (zeenews.py:46-52): menu page → category links + labels.
        # A category may declare a POST entry point (form-paginated feeds,
        # yehey.py:70-71) via method/body fields on the menu entry.
        # Two-level sites (aajtak.py:59-70, manila.py:30-54, yehey.py:
        # 29-47) route menu children to second-level menu pages instead.
        child_kind = site.get("menu_child_kind", "list")
        menu_api = site.get("menu_api_template")
        # Sitemap year/month gate (entrepreneur.py:27-37): year blocks
        # BREAK the whole walk when the block's year falls below the
        # cutoff's; within a passing block, a month link below the
        # cutoff's MONTH ORDINAL breaks that block (the reference
        # compares tm_mon only — months never see the year, bug-faithful).
        cats_iter = payload.get("categories", [])
        if cutoff_epoch is not None and cats_iter \
                and cats_iter[0].get("gate_year") is not None:
            cdt = datetime.fromtimestamp(cutoff_epoch, tz=timezone.utc)
            kept, dead_block = [], None
            stop = False
            for cat in cats_iter:
                if stop or cat.get("gate_block") == dead_block:
                    continue
                if cat.get("gate_year") is not None \
                        and cat["gate_year"] < cdt.year:
                    stop = True
                    continue
                if cat.get("gate_mon") is not None \
                        and cat["gate_mon"] < cdt.month:
                    dead_block = cat.get("gate_block")
                    continue
                kept.append(cat)
            cats_iter = kept
        for cat in cats_iter:
            if cat.get("excluded"):  # P4 category exclusion (zeenews.py:51)
                continue
            if menu_api:
                # The menu links are never fetched — each category slug
                # instantiates a templated API collection URL directly
                # (raftaar.py:29,36-38). A NESTED sub-link composes its
                # slug as '<sub>-<top>' off its parent link
                # (raftaar.py:43-47), skipping links outside the site
                # (py:49-50's Invalid URL log). ``menu_compose_labels``
                # restricts composition to listed top labels — everywhere
                # else the sub-link's own slug stands alone
                # (udaybulletin.py:50-55: only 'खेल' children compose).
                # ``menu_api_slug='path'`` keeps the whole query-stripped
                # path as the collection (spot.py:33's href.split('?')[0]).
                href = cat["href"].split("?")[0]
                compose = cat.get("parent_href") is not None
                if compose and "menu_compose_labels" in site:
                    compose = cat["label"] in site["menu_compose_labels"]
                if cat.get("parent_href") is not None:
                    lre = site.get("menu_link_re")
                    if lre and not re.match(lre, href):
                        continue
                if compose:
                    slug = (href.split("/")[-1] + "-"
                            + cat["parent_href"].split("/")[-1])
                elif site.get("menu_api_slug") == "path":
                    slug = href
                else:
                    slug = href.split("/")[-1]
                off = int(site.get("menu_api_start_offset", 0))
                page = int(site.get("menu_api_start_page", 1))
                emit(
                    menu_api.format(collection=slug, offset=off, page=page),
                    "api",
                    {"category1": cat["label"],
                     "category2": cat.get("label2"),
                     "collection": slug, "offset": str(off),
                     "page": str(page)},
                )
                continue
            cmeta = {"category1": cat["label"],
                     "category2": cat.get("label2")}
            curl = cat["href"]
            if site.get("menu_carry_list_url"):
                # the category URL itself rides down in meta as the base
                # every later page's templated next URL is built from
                # (bicolstandard.py:35's meta['url'] + its 'p' counter)
                cmeta["list_url"] = urljoin(url, curl)
                cmeta["page"] = "1"
            if site.get("menu_carry_slug"):
                # the href's last path segment rides down for templated
                # pagination (bhopalsamachar.py:33's split('/')[-1])
                cmeta["cat_slug"] = cat["href"].split("/")[-1]
            if site.get("menu_list_url_fmt"):
                # The menu link is only a BASE — the spider bolts a page
                # counter onto it before the first fetch (jb.py:37-40's
                # href + '/index.php&p=' + 1); the probe pagination later
                # rebuilds from the same base via page_url_fmt.
                base = urljoin(url, curl)
                cmeta["list_url"] = base
                cmeta["page"] = "1"
                curl = site["menu_list_url_fmt"].format(base=base, page=1)
            ck = cat.get("child_kind", child_kind)
            # ``menu_child_kind_re``: the reference's ONE callback
            # dispatches on response.url's shape (mb.py:28-42: root →
            # menu, '/\\w+/$' → topics submenu, '/category/...' → list) —
            # the same dispatch as rule data over the absolute child URL.
            for kr in site.get("menu_child_kind_re", ()):
                if re.search(kr["match"], urljoin(url, curl)):
                    ck = kr["kind"]
                    break
            emit(
                curl,
                # a cat may route to its own child kind (tarunmitra's
                # ':'-labeled two-level sections vs plain lists)
                ck,
                cmeta,
                dont_filter=bool(payload.get("dont_filter")),
                child_method=cat.get("method", "GET"),
                child_body=cat.get("body", ""),
            )
        # ``extra_lists``: hardcoded list entry points the spider yields
        # alongside the mined menu (dfa.py:47-53's gad-feature-news +
        # covid advisories block).
        for ex in site.get("extra_lists", ()):
            emit(ex["url"], "list",
                 {"category1": ex.get("category1"),
                  "category2": ex.get("category2")})
        # ``menu_side_expand``: the spider side-fetches one of the mined
        # category pages (raw requests.get) and harvests MORE list links
        # off it (dainiksandhyaprakash.py:46-54 reads the first
        # category's breadcrumb links as extra sections).
        mse = site.get("menu_side_expand")
        if mse and side_fetch is not None:
            # source: an explicit URL (emalwa.py:35's second requests.get)
            # or the nth mined category page (dainiksandhyaprakash.py:46)
            if mse.get("url"):
                src_url = mse["url"]
            else:
                cats = [c for c in payload.get("categories", [])
                        if not c.get("excluded")]
                idx = int(mse.get("source_index", 0))
                src_url = (urljoin(url, cats[idx]["href"])
                           if 0 <= idx < len(cats) else None)
            src = side_fetch(src_url) if src_url else None
            if src is not None:
                tree = htmlsel.parse_html(src)
                sels = mse.get("sels") or [mse["sel"]]
                for s in sels:
                    for a in htmlsel.select(tree, s):
                        h = a.attr(mse.get("attr", "href"))
                        if h is None:
                            continue
                        m = ({"category1": a.text()}
                             if mse.get("label_from_text") else {})
                        emit(h, "list", m)
        return None, requests

    if eff_kind == "menu2":
        # Second-level menus: section links stamp category2 onto the meta
        # lineage (aajtak.py:68-70, yehey.py:42-47, manila.py:49-54).
        # A menu2 page may instead carry a list bootstrap marker
        # (maharashtratimes.py:33-34: sections with articles start their
        # ?curpg=1 list chain; sections without recurse into submenus).
        if payload.get("list_bootstrap"):
            nmeta = dict(meta)
            nmeta["page"] = "1"
            nmeta["list_url"] = url
            fmt_url = site.get("page_url_fmt", "{base}?curpg={page}")
            emit(fmt_url.format(base=url, page=1), "list", nmeta)
            return None, requests
        child_kind = site.get("menu2_child_kind", "list")
        for cat in payload.get("categories", []):
            if cat.get("excluded"):
                continue
            m2 = dict(meta)
            m2["category2"] = cat["label"]
            # spec-level child_kind: a menu2 page may chain into ANOTHER
            # menu hop before the list (sunstar.py:30-38)
            emit(cat["href"], cat.get("child_kind", child_kind), m2,
                 dont_filter=bool(payload.get("dont_filter")))
        return None, requests

    if eff_kind == "probe":
        # maharashtratimes.py:47-59: the dont_filter-probed LAST list entry
        # decides pagination off its own article date, then re-yields
        # itself as a normal article request (Scrapy's dupefilter never
        # recorded the dont_filter fetch, so the refetch goes through).
        pub_raw = payload.get("pub_time_raw") or meta.get("pub_time_raw")
        pt = _epoch(None, as_of, pub_raw, date_style)
        if cutoff_epoch is None or pt >= cutoff_epoch:
            base = meta.get("list_url")
            lbody = meta.get("list_body")
            if base and lbody is not None:
                # The probed chain is a FORM-paginated API feed: advance
                # by re-POSTing the carried form body with its page field
                # bumped (bworldonline.py:71-73's FormRequest re-post).
                nxt = next_page_request(
                    FORM_PAGE, base, lbody, {"has_more": True},
                    form_page_param=site.get("form_page_param", "page"),
                )
                if nxt:
                    n_url, n_method, n_body = nxt
                    nmeta = dict(meta)
                    nmeta["list_body"] = n_body
                    emit(n_url, "api", nmeta,
                         child_method=n_method, child_body=n_body)
            elif base:
                page = int(meta.get("page", "1")) + 1
                nmeta = dict(meta)
                nmeta["page"] = str(page)
                fmt_url = site.get("page_url_fmt", "{base}?curpg={page}")
                emit(fmt_url.format(base=base, page=page), "list", nmeta)
            elif meta.get("next_url"):
                # the next-page URL was scraped on the LIST page and
                # carried down into the probe's meta
                # (bhadas4media.py:53-58,66-68)
                emit(meta["next_url"], "list", dict(meta))
        if not site.get("probe_keep_last"):
            # ``probe_keep_last``: the last entry was ALREADY yielded as a
            # normal article in the list loop (jb.py:47-55 yields every
            # entry AND probes the last), so the probe only decides
            # pagination — no self-refetch (vs maharashtratimes.py:47-59,
            # whose probe IS the last entry's only article request).
            amet = dict(meta)
            emit(url, "article", amet, pub_epoch=pt)
        return None, requests

    if eff_kind in ("list", "api"):
        # Per-URL PAGINATION-rule dispatch — the pagination twin of the
        # extraction ``variants`` (P5 as data): clickthecity.py:44-52
        # routes its 'Events'/'Campus' menu labels to a /page/N path chain
        # and every other label to the next-link chain (label ≡ URL slug,
        # so URL dispatch is equivalent). ``path_bootstrap``: the category
        # ROOT page parses nothing — it emits only its own /page/1 request
        # with dont_filter=True (parse_special_1, clickthecity.py:54-62).
        for v in site.get("rule_variants", ()):
            if re.search(v["match"], url):
                rule = v.get("rule", rule)
                if v.get("path_bootstrap") and not re.search(
                    r"/page/\d+/?$", url
                ):
                    emit(url.rstrip("/") + "/page/1", kind, dict(meta),
                         dont_filter=True)
                    return None, requests
                break
        # ``api_url_state_re``: pagination state (collection, page/offset)
        # read off the request URL itself instead of meta — STATELESS, so
        # programmatic API seeds need no meta bootstrapping (topgear.py:
        # 70-72 seeds the API chain directly in start_requests; the
        # category1 group mapping lives in ``cat1_map`` as spider data,
        # topgear.py:56-67, with category2 = the collection slug).
        state_re = site.get("api_url_state_re")
        if state_re and kind == "api" and "collection" not in meta:
            sm = re.search(state_re, url)
            if sm:
                meta = dict(meta)
                meta.update(
                    {k: v for k, v in sm.groupdict().items()
                     if v is not None}
                )
                coll = meta.get("collection", "")
                if "category1" not in meta and site.get("cat1_map"):
                    meta["category1"] = site["cat1_map"].get(coll)
                meta.setdefault("category2", coll)
        if "cat2_last" in payload:
            # spin.py:78-89: every article of this page (and its next-page
            # request) inherits the LAST item's channel name — Scrapy meta
            # snapshot taken after the collection loop finished.
            meta = dict(meta)
            meta["category2"] = payload["cat2_last"]
        if payload.get("submenu_links"):
            # presence-dispatched recursion (inextlive.py:49-53): this
            # page had no list container — its section links feed back
            # into the SAME list callback, nothing else is scheduled.
            for h in payload["submenu_links"]:
                emit(h, "list", dict(meta))
            return None, requests
        entries = payload.get("entries", [])
        if site.get("page_gate_drops_entries") and cutoff_epoch is not None:
            # topgear.py:73-77: `if len(js)==0 or js[0].date < time: break`
            # runs BEFORE any yield — a failed page gate drops the page's
            # entries entirely, not just its pagination.
            ptr = payload.get("page_time_raw")
            st = site.get("page_time_style", date_style)
            pgf = site.get("page_gate_fetch_fallback")
            if ptr is None and pgf is not None and side_fetch is not None \
                    and payload.get("entries"):
                # dekhobhopal.py:57-66: a list page with no visible dates
                # side-fetches its LAST entry's article (raw requests.get,
                # invisible to the scheduler) and gates on the date found
                # there.
                ptr = _page_scalar(
                    side_fetch(urljoin(
                        url, payload["entries"][-1]["href"]
                    )),
                    pgf,
                )
            if ptr is None or _epoch(None, as_of, ptr, st) < cutoff_epoch:
                return None, requests
        # probe_last may be scoped to one page kind: bworldonline probes
        # only its API feed pages (bworldonline.py:62-65) while its HTML
        # category pages yield every grid entry unprobed (py:50-51); True
        # applies to both kinds (maharashtratimes lists).
        probe_last = site.get("probe_last", False)
        if isinstance(probe_last, str):
            probe_last = probe_last == kind
        # category1/category2 regexed off the LIST page's own URL
        # (bworldonline.py:45-49 reads response.url path segments); they
        # override the meta lineage for entries AND ride into the form
        # chain below. A non-matching URL (the fixed admin-ajax endpoint)
        # leaves the inherited meta untouched.
        for _ck, _rk in (("category1", "cat1_url_re"),
                         ("category2", "cat2_url_re")):
            _rx = site.get(_rk)
            if _rx:
                _m = re.search(_rx, url)
                if _m:
                    meta = dict(meta)
                    meta[_ck] = _m.group(1)
        # Scrapy snapshots meta at Request construction, so a list loop
        # that mutates meta['abstract'] per entry gives each article the
        # LAST abstract seen so far — carry-forward, not per-entry — and
        # the next-page request inherits the final value
        # (clickthecity.py:75-80's shared-dict mutation).
        abstract_carry = site.get("abstract_carry", False)
        carry_abstract = meta.get("abstract")
        # category1 scraped off THIS list page's own header overrides the
        # menu-link label for every entry it emits; each pagination page
        # re-reads its own (latestnews1.py:55 — the next-page Request is
        # yielded without meta, so the header is the only source there).
        cat1_self = payload.get("cat1_self")
        # ``entry_gate_fetch``: the reference decides each entry's cutoff
        # by side-fetching the ARTICLE page with raw requests.get — a
        # fetch Scrapy never sees (no dupefilter entry, no scheduling, no
        # stats; apkaakhbar.py:57-66 judge_pub_time) — and reading a date
        # off it. ``side_fetch`` is the engine/simulator seam for exactly
        # that invisible fetch; an unavailable page degrades to the
        # fallback-now date (passes the gate), where the reference would
        # crash mid-callback.
        gate_fetch = site.get("entry_gate_fetch")
        gate_style = site.get("entry_gate_style", date_style)
        # ``entry_time_carry``: entries missing a date inherit the last
        # one seen — the reference mutates ONE meta dict per iteration and
        # Scrapy snapshots it at Request construction (dfa.py:63-90's
        # time2 carry).
        time_carry = site.get("entry_time_carry", False)
        carry_time = meta.get("pub_time_raw") if time_carry else None
        flag = True
        for i, entry in enumerate(entries):
            if probe_last and i == len(entries) - 1 \
                    and not site.get("probe_keep_last"):
                break  # the last entry becomes the pagination probe below
            if entry.get("pub_time_raw") is None \
                    and payload.get("page_entry_time") is not None:
                # bhopalsamachar.py:52-53: every entry is stamped with the
                # page's one select_one date
                entry = {**entry, "pub_time_raw": payload["page_entry_time"]}
            if payload.get("page_entry_title") is not None:
                # janoduniya.py:40: the page's FIRST entry title rides on
                # every article the page yields (select_one over soup,
                # not the row)
                entry = {**entry, "title": payload["page_entry_title"]}
            entry_meta = dict(meta)
            if cat1_self is not None:
                entry_meta["category1"] = cat1_self
                if site.get("cat2_from_cat1"):
                    # both categories from the list page's own header —
                    # newstracklive.py:86-89 sets category2 = category1
                    entry_meta["category2"] = cat1_self
            if payload.get("cat2_self") is not None:
                entry_meta["category2"] = payload["cat2_self"]
            if site.get("entry_cat2_from_list"):
                # category2 scraped off each list row, collapsed to None
                # when it just repeats category1 (businessmirror.py:44-47)
                c2 = entry.get("cat2")
                if c2 == entry_meta.get("category1"):
                    c2 = None
                entry_meta["category2"] = c2
            entry_meta.update(
                {
                    "title": entry.get("title"),
                    "pub_time_raw": entry.get("pub_time_raw"),
                    "lead_img": entry.get("img"),
                }
            )
            if time_carry:
                if entry.get("pub_time_raw") is not None:
                    carry_time = entry["pub_time_raw"]
                entry_meta["pub_time_raw"] = carry_time
            if abstract_carry:
                if entry.get("abstract") is not None:
                    carry_abstract = entry["abstract"]
                if carry_abstract is not None:
                    entry_meta["abstract"] = carry_abstract
            elif entry.get("abstract") is not None:
                # list-page abstracts ride down in meta (philboxing.py:44-45)
                entry_meta["abstract"] = entry["abstract"]
            elif payload.get("page_abstract") is not None:
                # the page-level teaser (aapkikhabar.py:63)
                entry_meta["abstract"] = payload["page_abstract"]
            if gate_fetch is not None and side_fetch is not None:
                raw = _page_scalar(
                    side_fetch(urljoin(url, entry["href"])), gate_fetch
                )
                pt = _epoch(None, as_of, raw, gate_style)
            elif entry.get("gate_time_raw") is not None:
                # api_map gate_time: gate on one field, store another
                # (udaybulletin.py:70,74)
                pt = _epoch(None, as_of, entry["gate_time_raw"], gate_style)
            else:
                pt = _epoch(
                    None, as_of,
                    carry_time if time_carry else entry.get("pub_time_raw"),
                    date_style,
                )
            ekind = entry.get("kind") or "article"
            if site.get("entry_gate") is False:
                # Entries are never individually gated — only the page
                # gate below decides pagination; old articles are still
                # fetched and stored (dfa.py:63-90 yields every row).
                emit(entry["href"], ekind, entry_meta, pub_epoch=pt)
            elif cutoff_epoch is None or pt >= cutoff_epoch:
                dont_filter = probe_first and i == 0  # maharashtratimes-style
                emit(entry["href"], ekind, entry_meta,
                     dont_filter=dont_filter, pub_epoch=pt)
            else:
                flag = False  # '时间截止' — zeenews.py:96-101
                if not site.get("entry_gate_no_break"):
                    break
                # emalwa.py:50-59: the gate has no break — old entries are
                # skipped but the loop keeps scanning (unsorted grids), and
                # only pagination dies.
        # API bootstrap (manila.py:59-67): params scraped off the page
        # instantiate the load-more API URL; the chain continues under the
        # API_TEMPLATE rule below.
        if flag and payload.get("api_params") and site.get("api_url_template"):
            params = {k: v for k, v in payload["api_params"].items()}
            params.setdefault("page", "1")
            api_meta = dict(meta)
            api_meta.update(params)
            emit(
                site["api_url_template"].format(
                    currentItems=(int(params["page"]) - 1) * API_PAGE_SIZE,
                    **params,
                ),
                "api", api_meta,
            )
        # FORM bootstrap (yehey.py:55-71): a POST infinite-scroll feed
        # seeded with fields scraped off the page (currentday) plus the
        # category slug regexed out of the list URL.
        # ``form_bootstrap_ungated``: the bootstrap fires even when the
        # page's own entries tripped the cutoff — apkaakhbar.py:82-107
        # gates its HTML grid with flag1 but launches the POST chain on
        # flag2, which the HTML page never touches.
        if (flag or site.get("form_bootstrap_ungated")) \
                and payload.get("form_params") and site.get("form_api_url"):
            # Scraped fields land on site-named body keys (named regex
            # groups must be identifiers, but form field names need not
            # be: bworldonline.py:54's 'loopState[atts][category_id]');
            # constant fields come from form_fixed_params (the spider's
            # class-level data dict, bworldonline.py:21-31); the page
            # counter field + its bootstrap value are site data too
            # (yehey starts at 2, bworldonline re-posts page 1 first).
            pmap = site.get("form_param_map", {})
            params = dict(site.get("form_fixed_params", {}))
            params.update(
                (pmap.get(k, k), v)
                for k, v in payload["form_params"].items()
            )
            params[site.get("form_page_param", "page")] = str(
                site.get("form_start_page", 2)
            )
            if site.get("url_cat_re"):
                m = re.search(site["url_cat_re"], url)
                if m:
                    params["query_args"] = m.group(1)
            fbody = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
            fmeta = dict(meta)
            emit(site["form_api_url"], "api", fmeta,
                 child_method="POST", child_body=fbody)
        # URL-derived form chain (piagov.py:63-72): the category LIST page
        # unconditionally POSTs to ITS OWN URL + '.json?p=N' with the page
        # counter in both the query string and the body — no scraped
        # params, the endpoint is derived from the list URL itself.
        if flag and kind == "list" and site.get("form_url_fmt"):
            p0 = int(site.get("form_bootstrap_page", 1))
            fmeta = dict(meta)
            fmeta["list_url"] = url
            fmeta["page"] = str(p0)
            emit(site["form_url_fmt"].format(base=url, page=p0),
                 "api", fmeta, child_method="POST",
                 child_body=f"page={p0}")
        # Last-entry dont_filter probe (maharashtratimes.py:43-45): the
        # probe inherits list_url/page from meta and drives pagination.
        if probe_last and entries:
            last = entries[-1]
            pmeta = dict(meta)
            pmeta.update(
                {"title": last.get("title"),
                 "pub_time_raw": last.get("pub_time_raw"),
                 "lead_img": last.get("img")}
            )
            if rule == FORM_PAGE:
                # the probe decides pagination by re-POSTing this API
                # page's own form body, page field bumped — carry it
                # (bworldonline.py:64-65 keeps the form dict in meta)
                pmeta["list_url"] = url
                pmeta["list_body"] = body
            emit(last["href"], "probe", pmeta, dont_filter=True)
        # Carried-next-link probe (bhadas4media.py:53-58): the probe is
        # the FIRST entry group's last member (split out of ``entries``
        # by the spec's probe_last_member) and fires ONLY when the page
        # has a next link — on a last page that member is dropped
        # entirely (neither probed nor stored, the reference's [:-1]
        # slice never yields it).
        if payload.get("probe_entry") and payload.get("next"):
            pe = payload["probe_entry"]
            pmeta = dict(meta)
            pmeta.update(
                {"title": pe.get("title"),
                 "pub_time_raw": pe.get("pub_time_raw"),
                 "lead_img": pe.get("img"),
                 "abstract": pe.get("abstract"),
                 "next_url": urljoin(url, payload["next"])}
            )
            emit(pe["href"], "probe", pmeta, dont_filter=True)
        elif payload.get("probe_entry") and site.get("probe_fallback_entry"):
            # ``probe_fallback_entry``: on a page with NO next link the
            # probe member degrades to a NORMAL article request —
            # swatantraawaz.py:88-92's except branch (vs bhadas4media,
            # which drops its probe member entirely).
            pe = payload["probe_entry"]
            pmeta = dict(meta)
            pmeta.update(
                {"title": pe.get("title"),
                 "pub_time_raw": pe.get("pub_time_raw"),
                 "lead_img": pe.get("img"),
                 "abstract": pe.get("abstract")}
            )
            emit(pe["href"], "article", pmeta)
        # Page-level time gate (philboxing.py:67-95, yehey.py:92-101):
        # pagination is decided by a page-level date, not per entry; no
        # parseable page date → no next page (philboxing's `if time and`).
        if "page_time_raw" in payload:
            ptr = payload["page_time_raw"]
            # The gate may speak a different date dialect than the site's
            # articles: piagov's JSON gate is already-normalized Y-M-D
            # fed straight to format_time3 (piagov.py:101) while its
            # article bylines go through the fuzzy parser (py:135-137).
            ptr_style = site.get("page_time_style", date_style)
            if ptr is None:
                flag = False
            elif cutoff_epoch is not None:
                flag = flag and (
                    _epoch(None, as_of, ptr, ptr_style) >= cutoff_epoch
                )
        if time_carry and cutoff_epoch is not None:
            # dfa.py:91-95: pagination gated on the LAST carried entry
            # date — None (no entry ever carried one) stops the chain.
            flag = flag and carry_time is not None and (
                _epoch(None, as_of, carry_time, date_style) >= cutoff_epoch
            )
        pgf = site.get("page_gate_fetch_last")
        if pgf is not None and side_fetch is not None and entries:
            # ambala.py:54-64 / newstracklive.py:93-99: pagination decided
            # by side-fetching an entry's article (raw requests.get,
            # invisible to the scheduler) and reading its date off the
            # given rule — entries themselves were already yielded ungated
            # above. ``page_gate_fetch_index`` picks WHICH entry: -1 (the
            # default, ambala's article_hrefs[-1]) or 0 (mattscradle.py:
            # 50-54 probes the first headline).
            idx = int(site.get("page_gate_fetch_index", -1))
            raw = _page_scalar(
                side_fetch(urljoin(url, entries[idx]["href"])), pgf
            )
            if cutoff_epoch is not None:
                flag = flag and (
                    _epoch(None, as_of, raw, gate_style) >= cutoff_epoch
                )
        if "page_max" in payload:
            # apnlive.py:59-61: the /page/N chain advances only while the
            # CURRENT page number is under the page's own total ('Page 1
            # of N', span.pages' last token); a page without the span
            # never paginates. The current number comes off the URL — the
            # stateless twin of the reference's meta page counter.
            m = re.match(r"^(.*?)/page/(\d+)/?$", url)
            cur = int(m.group(2)) if m else 1
            try:
                payload["has_more"] = cur < int(payload["page_max"])
            except (TypeError, ValueError):
                payload["has_more"] = False
        if flag and not probe_last and not site.get("probe_next_url"):
            if rule == API_TEMPLATE:
                # manila.py:80-82: page+1 while (page-1)*10 ≤ totItems.
                page = int(meta.get("page", "1"))
                tot = int(meta.get("totItems", "0"))
                if (page - 1) * API_PAGE_SIZE <= tot:
                    nmeta = dict(meta)
                    nmeta["page"] = str(page + 1)
                    emit(
                        site["api_url_template"].format(
                            page=page + 1,
                            category=meta.get("category", ""),
                            totItems=tot,
                            currentItems=page * API_PAGE_SIZE,
                        ),
                        "api", nmeta,
                    )
            elif rule == FORM_URL_PAGE:
                # piagov.py:75-110: re-POST the list URL's .json endpoint
                # with the page counter bumped in BOTH the query string
                # and the form body; the page-level last-entry iso gate
                # above has already decided ``flag``.
                base = meta.get("list_url")
                if base:
                    page = int(meta.get("page", "1")) + 1
                    nmeta = dict(meta)
                    nmeta["page"] = str(page)
                    emit(site["form_url_fmt"].format(base=base, page=page),
                         "api", nmeta, child_method="POST",
                         child_body=f"page={page}")
            elif rule == API_OFFSET:
                # raftaar.py:66-70: offset += 20, next page only while the
                # bumped offset is still under the RESPONSE's total-count.
                # ``api_offset_total: False``: the response carries no
                # count and the reference paginates unboundedly while the
                # gate holds (udaybulletin.py:77-80 — which would spin
                # forever on an exhausted collection; the non-empty-
                # entries condition here is the deliberate safety bound,
                # unreachable in any cutoff-gated crawl).
                off = (int(meta.get("offset", "0"))
                       + int(site.get("api_offset_step", 20)))
                if site.get("api_offset_total", True):
                    more = off < int(payload.get("total_count", 0))
                else:
                    more = bool(entries)
                if more:
                    nmeta = dict(meta)
                    nmeta["offset"] = str(off)
                    emit(
                        site["menu_api_template"].format(
                            collection=meta.get("collection", ""),
                            offset=off,
                        ),
                        "api", nmeta,
                    )
            elif rule == API_PAGE_TPL:
                # spin.py:91-96 / spot.py:46-48 / topgear.py:70-78: page+1
                # off the templated collection URL while the gate holds
                # and this page was non-empty (spin: all_time != [];
                # spot: len(js) != 0; topgear: len(js) == 0 breaks).
                if entries:
                    page = int(meta.get("page", "1")) + 1
                    nmeta = dict(meta)
                    nmeta["page"] = str(page)
                    emit(
                        site["menu_api_template"].format(
                            collection=meta.get("collection", ""),
                            page=page,
                        ),
                        "api", nmeta,
                    )
            elif site.get("next_value_tpl"):
                # Templated next URL embedding a value read off the page
                # (Blogger updated-max chains): bicolstandard.py:45-51
                # formats meta['url'] + quote(last timeago @title) + a
                # meta page counter; bhopalsamachar.py:62-64 formats its
                # class-level api_url with the menu slug + the last
                # datetime (its ':'→%3A/'+'→%2B replaces ≡ quote here).
                # No value on the page → no next page (both references'
                # guards).
                nv = payload.get("next_value")
                if nv is not None:
                    page = int(meta.get("page", "1")) + 1
                    nmeta = dict(meta)
                    nmeta["page"] = str(page)
                    # ``next_value_raw``: the value is a URL FRAGMENT
                    # concatenated verbatim (univarta.py:80's cate_url +
                    # '?page=N' href), not a timestamp to quote
                    emit(
                        site["next_value_tpl"].format(
                            base=meta.get("list_url", ""),
                            slug=meta.get("cat_slug", ""),
                            value=(str(nv) if site.get("next_value_raw")
                                   else quote(str(nv))),
                            page=page,
                        ),
                        kind, nmeta,
                    )
            else:
                nxt = next_page_request(
                    rule, url, body, payload,
                    form_page_param=site.get("form_page_param", "page"),
                    form_max_pages_key=site.get("form_max_pages_key"),
                )
                # ``next_url_gate_re``: the gate date is EMBEDDED in the
                # next link itself — coolbuster.py:52-59 regexes the
                # blogger updated-max=ISO parameter out of the older-link
                # URL and compares it; the matched groups join with a
                # space into a 'Y-m-d H:M:S' stamp.
                ng = site.get("next_url_gate_re")
                if nxt and ng and cutoff_epoch is not None:
                    gm = re.search(ng, nxt[0])
                    if gm is None or _epoch(
                        None, as_of, " ".join(gm.groups()), "ymd"
                    ) < cutoff_epoch:
                        nxt = None
                nsc = payload.get("next_side_check") \
                    or site.get("next_side_check")
                if nxt and nsc is not None and side_fetch is not None:
                    # hindinewsfresh10.py:102-106: the next page is
                    # side-fetched with raw requests.get (invisible to the
                    # scheduler) and scheduled only if it still renders
                    # post rows — an empty blogger tail page ends the
                    # chain without ever entering the crawl log.
                    chk = side_fetch(urljoin(url, nxt[0]))
                    if chk is None or not htmlsel.select(
                        htmlsel.parse_html(chk), nsc["sel"]
                    ):
                        nxt = None
                if nxt:
                    n_url, n_method, n_body = nxt
                    page_meta = dict(meta)
                    if abstract_carry and carry_abstract is not None:
                        # the mutated meta dict rides into the next-page
                        # request (clickthecity.py:79,113)
                        page_meta["abstract"] = carry_abstract
                    if site.get("page_abstract_carry") \
                            and payload.get("page_abstract") is not None:
                        # the page-level teaser is folded into meta BEFORE
                        # the older-page request is yielded, so every later
                        # page's articles inherit PAGE 1's snippet
                        # (hindinewsfresh10.py:52-59's meta dict)
                        page_meta["abstract"] = payload["page_abstract"]
                    # ``next_kind``: the next page is parsed by a
                    # DIFFERENT callback — legendnews.py:55-56 hands page
                    # 2 back to parse (the MENU callback), so its menu
                    # links re-yield (and die in the dupefilter) while its
                    # articles are never collected; bug-faithful.
                    emit(n_url, site.get("next_kind", kind), page_meta,
                         child_method=n_method, child_body=n_body)
                elif payload.get("next_all"):
                    # no primary next anchor — EVERY pagination link is
                    # scheduled as a next page (inextlive.py:44-48)
                    for nu in payload["next_all"]:
                        emit(nu, site.get("next_kind", kind), dict(meta))
        return None, requests

    if eff_kind == "article":
        # U3 (zeenews.py:109-148): one document with interleaved spans.
        spans = []
        lead = meta.get("lead_img")
        if lead:  # header image first (yehey.py:127-134 ordering)
            spans.append({"kind": "image", "text": None,
                          "media_ref": lead, "offset": 0})
        paras = payload.get("paras", [])
        inline: dict[int, list[str]] = {}
        for img in payload.get("imgs", []):
            inline.setdefault(img["after_para"], []).append(img["src"])
        # Page-level header images (after_para = -1) come before the first
        # paragraph, after any list-page lead image.
        for src in inline.get(-1, []):
            spans.append({"kind": "image", "text": None,
                          "media_ref": urljoin(url, src),
                          "offset": len(spans)})
        for i, p in enumerate(paras):
            spans.append({"kind": "text", "text": p,
                          "media_ref": None, "offset": len(spans)})
            for src in inline.get(i, []):
                spans.append({"kind": "image", "text": None,
                              "media_ref": urljoin(url, src),
                              "offset": len(spans)})
        # Which side wins when both the list entry and the article page
        # carry a date: zeenews trusts the list-scraped meta
        # (zeenews.py:116), manila/maharashtratimes/yehey re-read it off
        # the article page (manila.py:94-96) — site data, not a constant.
        if site.get("article_pub_priority") == "page":
            pub_raw = payload.get("pub_time_raw") or meta.get("pub_time_raw")
        else:
            pub_raw = meta.get("pub_time_raw") or payload.get("pub_time_raw")
        if site.get("article_drop_old") and cutoff_epoch is not None:
            # ARTICLE-level cutoff: the page was fetched (it is in the
            # crawl log and the seen set) but an old date drops the
            # document itself (ambala.py:73-83's parse_detail gate).
            if _epoch(None, as_of, pub_raw, date_style) < cutoff_epoch:
                return None, requests
        # Title source is per-site: zeenews/aajtak trust the list-scraped
        # meta (zeenews.py:114, aajtak.py:125); philboxing/manila/yehey/
        # maharashtratimes/shangbao re-read it off the article page
        # (philboxing.py:112, manila.py:92).
        if site.get("title_priority") == "page":
            title = payload.get("title") or meta.get("title")
        else:
            title = meta.get("title") or payload.get("title")
        # A site may derive category1 from the ARTICLE URL's path instead
        # of page content or lineage (interaksyon.py:38's
        # response.url.split('/')[3] — the first path segment; post-redirect
        # URL, as the reference reads response.url).
        cat1_url = None
        if site.get("cat1_from_url_re"):
            m = re.search(site["cat1_from_url_re"], response_url)
            cat1_url = m.group(1) if m else None
        # category2 from its own URL segment (spot.py:57-58 reads
        # response.url.split('/')[3] and [4] as the two categories).
        cat2_url = None
        if site.get("cat2_from_url_re"):
            m = re.search(site["cat2_from_url_re"], response_url)
            cat2_url = m.group(1) if m else None
        # Both categories split out of ONE URL path segment (malaya.py:
        # 66-72: url.split('/')[-3].split('_') — a 3-token segment yields
        # its 2nd/3rd tokens, a 2-token segment its 1st/2nd).
        cat1_seg = cat2_seg = None
        seg = site.get("cat_from_url_segment")
        if seg:
            parts = response_url.split("/")[int(seg.get("index", -3))]\
                .split(seg.get("sep", "_"))
            if len(parts) == 3:
                cat1_seg, cat2_seg = parts[1], parts[2]
            else:
                # reference indexes parts[1] unguarded; a 1-token segment
                # would crash the callback there — guard to None here so a
                # malformed URL degrades instead of killing the batch
                cat1_seg = parts[0]
                cat2_seg = parts[1] if len(parts) > 1 else None
        # ``abstract_split``: the fallback abstract is the body's first
        # ``take`` sentence segments on a site-specific separator —
        # doh.py:117's body.split('.')[0] + '...',
        # divyahimachal.py:166's body.split('।')[0],
        # samacharjagat.py:135's two-danda concatenation.
        asplit = site.get("abstract_split")
        split_abstract = None
        if asplit and paras:
            segs = "\n".join(paras).split(asplit.get("sep", "."))
            take = int(asplit.get("take", 1))
            if len(segs) >= take:
                split_abstract = ("".join(segs[:take])
                                  + asplit.get("suffix", ""))
            else:
                split_abstract = "\n".join(paras)
        doc = {
            "title": title,
            # Precedence: list-page abstract in meta (philboxing.py:110) >
            # article-extracted (zeenews.py:123 fallback) > first paragraph
            # (items.py:8 default).
            # first NON-None wins (not first truthy): a hardcoded ''
            # abstract is a real value the reference stores
            # (emstv.py:63's item['abstract'] = '').
            "abstract": next(
                (v for v in (meta.get("abstract"),
                             payload.get("abstract"),
                             payload.get("fb_abstract"),
                             split_abstract)
                 if v is not None),
                # ``abstract_skip_empty``: the default first-paragraph
                # abstract scans for the first NON-EMPTY one
                # (entrepreneur.py:52-56's flag walk); default takes
                # paras[0] verbatim (items.py:8).
                (next((p for p in paras if p), None)
                 if site.get("abstract_skip_empty")
                 else paras[0]) if paras else None,
            ),
            # Breadcrumb categories off the article page override the meta
            # lineage (maharashtratimes.py:79-81, shangbao.py:67-71).
            # ``cat1_const``/``cat2_const``: spider-hardcoded categories
            # (tourism.py:100-101's 'News Updates'/'Featured News').
            # ``cat1_meta_off``: the spider never reads category1 from its
            # request lineage — a missing page crumb leaves it unset
            # (entrepreneur.py:48-49's bare if).
            "category1": site.get("cat1_const") or cat1_seg or cat1_url
            or payload.get("cat1")
            or (None if site.get("cat1_meta_off")
                else meta.get("category1")),
            # ``cat2_meta_off``: the spider never reads category2 from its
            # request lineage — URL/page sources or nothing (sunstar.py:
            # 57-58's digits guard leaves it unset on numeric segments).
            "category2": site.get("cat2_const") or cat2_seg or cat2_url
            or payload.get("cat2")
            or (None if site.get("cat2_meta_off")
                else meta.get("category2")),
            # ``article_pub_style``: the stored pub time may speak a
            # different dialect than the list gates — dailyhindinews.py:68
            # keeps only the ISO DATE at midnight while its entries gate
            # on the full timestamp.
            "pub_time": parse_site_date(
                pub_raw, site.get("article_pub_style", date_style), as_of
            ).strftime("%Y-%m-%d %H:%M:%S"),
            "spans": spans,
            "request_url": url,
            "response_url": response_url,
            # K2: raw page stored as a documents column (pipelines.py:74-78
            # folded per SURVEY §1.4) — only meaningful for HTML sites.
            "html": payload_json if fmt == "html" else None,
        }
        return doc, requests

    return None, requests
