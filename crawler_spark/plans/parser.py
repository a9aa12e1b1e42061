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
from datetime import datetime, timezone
from urllib.parse import urljoin

from crawler_spark.functions.dates import format_time2_py

# Pagination rule names (the 5 corpus types).
NEXT_LINK = "next_link"  # payload carries an explicit next href
PAGE_PARAM = "page_param"  # ?page=N increment while has_more
OFFSET_PARAM = "offset_param"  # ?start=N*20 while has_more
API_PAGE = "api_page"  # JSON endpoint with page param while has_more
FORM_PAGE = "form_page"  # POST form body page=N while has_more (yehey.py:70-104)

PAGE_SIZE = 20  # offset step (shangbao.py:50-51 uses start=N*20)


def _epoch(dt_str_or_none, as_of: datetime, raw: str | None) -> float:
    return format_time2_py(raw, as_of).replace(tzinfo=timezone.utc).timestamp()


def next_page_request(rule: str, url: str, body: str,
                      payload: dict) -> tuple[str, str, str] | None:
    """Next list-page request per pagination rule → (url, method, body).

    FORM_PAGE keeps the URL constant and advances the form body
    (FormRequest infinite scroll, yehey.py:70-71,103); every other rule is
    a GET with an advanced URL."""
    if rule == FORM_PAGE:
        if not payload.get("has_more"):
            return None
        params = dict(
            kv.split("=", 1) for kv in body.split("&") if "=" in kv
        ) if body else {}
        page = int(params.get("page", "1"))
        params["page"] = str(page + 1)
        new_body = "&".join(f"{k}={v}" for k, v in sorted(params.items()))
        return url, "POST", new_body
    if rule == NEXT_LINK:
        nxt = payload.get("next")
        return (urljoin(url, nxt), "GET", "") if nxt else None
    if not payload.get("has_more"):
        return None
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


def extract_payload(kind: str, html: str, rules: dict) -> dict:
    """Raw-HTML extraction driven by per-site rules-as-data — the
    reference's BeautifulSoup selector surface (demo/已部署/zeenews.py:47,
    109-148; philboxing.py:104-158) re-expressed as regex rules stored in
    the site registry, executed by this one generic function. Produces the
    same payload dict shape the JSON path yields, so every downstream
    semantic (cutoff break, pagination, span interleaving) is shared.

    Rule keys (all regex strings unless noted):
      menu:    ``category``  — groups (href, label);
               ``excluded_labels`` — list, P4 category exclusion
               (zeenews.py:51: exclusion is crawler config, not page data)
      list:    ``entry``     — named groups href/title/time and optional
                               img, one match per list entry IN PAGE ORDER;
               ``next``      — group 1 = next-page href (zeenews.py:104);
               ``more``      — presence ⇒ has_more (page-param sites)
      article: ``title``, ``pub`` (group 1 each), optional ``abstract``;
               ``block``     — named groups para|src, matched IN DOCUMENT
                               ORDER: the interleaved text/image span
                               sequence comes straight from match order
                               (zeenews.py:119-122's .children walk).
    """
    if kind == "menu":
        excluded = set(rules.get("excluded_labels", ()))
        cats = []
        for m in re.finditer(rules["category"], html):
            href, label = m.group(1), m.group(2)
            cats.append(
                {"href": href, "label": label, "excluded": label in excluded}
            )
        return {"categories": cats}

    if kind in ("list", "api"):
        entries = []
        for m in re.finditer(rules["entry"], html):
            d = m.groupdict()
            entries.append(
                {
                    "href": d["href"],
                    "title": d.get("title"),
                    "pub_time_raw": d.get("time"),
                    "img": d.get("img") or None,
                }
            )
        out: dict = {"entries": entries}
        nm = re.search(rules["next"], html) if rules.get("next") else None
        out["next"] = nm.group(1) if nm else None
        out["has_more"] = (
            bool(re.search(rules["more"], html)) if rules.get("more") else False
        )
        return out

    # article
    def first(key):
        if not rules.get(key):
            return None
        m = re.search(rules[key], html)
        return m.group(1) if m else None

    paras: list[str] = []
    imgs: list[dict] = []
    for m in re.finditer(rules["block"], html):
        d = m.groupdict()
        if d.get("para") is not None:
            paras.append(d["para"])
        elif d.get("src") is not None and paras:
            # in-body image, interleaved after the paragraph it follows
            imgs.append({"after_para": len(paras) - 1, "src": d["src"]})
    return {
        "title": first("title"),
        "abstract": first("abstract"),
        "pub_time_raw": first("pub"),
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
) -> tuple[dict | None, list[dict]]:
    """One page → (document_row | None, ordered child requests).

    Child seq = parent seq + '.' + zero-padded emit index (lineage-stable,
    partition-independent — SURVEY §4 determinism). ``method``/``body``
    are the CURRENT request's identity (S5): FORM_PAGE pagination advances
    the body while the URL stays constant. ``fmt='html'`` routes the raw
    payload through the per-site extraction rules (``extract``) instead of
    json.loads — the registry-driven selector surface (SURVEY §2.9).
    """
    if not payload_json:
        return None, []  # fetch miss / 404: reference logs and moves on
    if fmt == "html":
        payload = extract_payload(kind, payload_json, extract or {})
    else:
        payload = json.loads(payload_json)
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

    if kind == "menu":
        # U1 (zeenews.py:46-52): menu page → category list links + labels.
        # A category may declare a POST entry point (form-paginated feeds,
        # yehey.py:70-71) via method/body fields on the menu entry.
        for cat in payload.get("categories", []):
            if cat.get("excluded"):  # P4 category exclusion (zeenews.py:51)
                continue
            emit(
                cat["href"],
                "list",
                {"category1": cat["label"], "category2": cat.get("label2")},
                child_method=cat.get("method", "GET"),
                child_body=cat.get("body", ""),
            )
        return None, requests

    if kind in ("list", "api"):
        # U2/U4: entries newest-first; cutoff stops entries AND pagination.
        flag = True
        for i, entry in enumerate(payload.get("entries", [])):
            entry_meta = dict(meta)
            entry_meta.update(
                {
                    "title": entry.get("title"),
                    "pub_time_raw": entry.get("pub_time_raw"),
                    "lead_img": entry.get("img"),
                }
            )
            pt = _epoch(None, as_of, entry.get("pub_time_raw"))
            if cutoff_epoch is None or pt >= cutoff_epoch:
                dont_filter = probe_first and i == 0  # maharashtratimes.py:43-49
                emit(entry["href"], "article", entry_meta,
                     dont_filter=dont_filter, pub_epoch=pt)
            else:
                flag = False  # '时间截止' — zeenews.py:96-101
                break
        if flag:
            nxt = next_page_request(rule, url, body, payload)
            if nxt:
                n_url, n_method, n_body = nxt
                emit(n_url, kind, dict(meta),
                     child_method=n_method, child_body=n_body)
        return None, requests

    if kind == "article":
        # U3 (zeenews.py:109-148): one document with interleaved spans.
        spans = []
        lead = meta.get("lead_img")
        if lead:  # header image first (yehey.py:127-134 ordering)
            spans.append({"kind": "image", "text": None,
                          "media_ref": lead, "offset": 0})
        paras = payload.get("paras", [])
        inline = {img["after_para"]: img["src"] for img in payload.get("imgs", [])}
        for i, p in enumerate(paras):
            spans.append({"kind": "text", "text": p,
                          "media_ref": None, "offset": len(spans)})
            if i in inline:
                spans.append({"kind": "image", "text": None,
                              "media_ref": urljoin(url, inline[i]),
                              "offset": len(spans)})
        pub_raw = meta.get("pub_time_raw") or payload.get("pub_time_raw")
        doc = {
            "title": meta.get("title") or payload.get("title"),
            "abstract": payload.get("abstract") or (paras[0] if paras else None),
            "category1": meta.get("category1"),
            "category2": meta.get("category2"),
            "pub_time": format_time2_py(pub_raw, as_of).strftime("%Y-%m-%d %H:%M:%S"),
            "spans": spans,
            "request_url": url,
            "response_url": response_url,
            # K2: raw page stored as a documents column (pipelines.py:74-78
            # folded per SURVEY §1.4) — only meaningful for HTML sites.
            "html": payload_json if fmt == "html" else None,
        }
        return doc, requests

    return None, requests
