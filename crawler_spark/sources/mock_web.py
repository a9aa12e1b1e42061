"""Deterministic mock web — the crawl tests' stand-in for the network.

Generates a synthetic site graph shaped like the reference's corpus
(SURVEY §2.9, FIXTURES.md §2): per site a menu page → category list chains
(all four pagination rule types) → article pages with interleaved
text/image content. Includes the adversarial features the tests need:
duplicate links across categories (dedup, middlewares.py:50-68), one
skewed host holding most URLs (salting), articles straddling the cutoff
mid-list (stop-at-first-old, zeenews.py:96-101), redirects
(request_url ≠ response_url, items stamped at middlewares.py:25-26), and a
dont_filter probe site (maharashtratimes.py:43-49).

Everything is seeded (random.Random(seed)) — no wall clock, no network.
"""

from __future__ import annotations

import json
import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.plans.parser import (
    API_PAGE,
    FORM_PAGE,
    NEXT_LINK,
    OFFSET_PARAM,
    PAGE_PARAM,
)
from crawler_spark.schema import SEEDS_SCHEMA, SITE_GRAPH_SCHEMA

MONTH_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
RULES = [NEXT_LINK, PAGE_PARAM, OFFSET_PARAM, API_PAGE, FORM_PAGE]


def page_key(url: str, method: str = "GET", body: str = "") -> tuple:
    """Request identity — Scrapy fingerprints (url, method, body), so POST
    form pages sharing one URL are distinct pages (yehey.py:70-104)."""
    return (url, method or "GET", body or "")

AS_OF = datetime(2021, 6, 1, 0, 0, 0)  # deterministic 'now' anchor
BASE_DT = datetime(2021, 5, 30, 12, 0, 0)  # newest article time

WORDS = ("the spark frontier crawls pages with ordered spans and polite "
         "delays while bloom filters prune seen urls fast").split()


def _fmt_pub(dt: datetime) -> str:
    """'Jan 5, 2021, 14:30' — absolute branch of format_time2 (util.py:49-53)."""
    return f"{MONTH_ABBR[dt.month - 1]} {dt.day}, {dt.year}, {dt.hour:02d}:{dt.minute:02d}"


# Two deliberately different HTML markups (a zeenews-like article layout
# and a philboxing-like table-era layout) with their per-site extraction
# rules — proving the rules-as-data seam: one generic extractor
# (plans/parser.extract_payload), N site shapes. ``render`` templates are
# used only by this mock to emit pages; the ``extract`` dicts are what the
# site registry ships to the engine.
HTML_SHAPES = [
    {
        "menu_item": '<a class="cat" href="{href}">{label}</a>',
        "entry": ('<div class="entry"><a class="story" href="{href}">{title}'
                  "</a><time>{time}</time>{img}</div>"),
        "entry_img": '<img class="lead" src="{img}">',
        "next": '<a class="next" href="{next}">more</a>',
        "more": '<span id="more"></span>',
        "title": "<h1>{title}</h1>",
        "date": '<span class="date">{raw}</span>',
        "abstract": '<meta name="description" content="{abstract}">',
        "para": "<p>{para}</p>",
        "img": '<img src="{src}">',
        "extract": {
            "category": r'<a class="cat" href="([^"]+)">([^<]+)</a>',
            "entry": (r'<div class="entry"><a class="story" href="(?P<href>[^"]+)">'
                      r"(?P<title>[^<]*)</a><time>(?P<time>[^<]+)</time>"
                      r'(?:<img class="lead" src="(?P<img>[^"]+)">)?</div>'),
            "next": r'<a class="next" href="([^"]+)">',
            "more": r'<span id="more">',
            "title": r"<h1>([^<]+)</h1>",
            "pub": r'<span class="date">([^<]+)</span>',
            "abstract": r'<meta name="description" content="([^"]+)">',
            "block": r'<p>(?P<para>[^<]*)</p>|<img src="(?P<src>[^"]+)">',
        },
    },
    {
        "menu_item": '<td class="menu"><a href="{href}"><b>{label}</b></a></td>',
        "entry": ('<li class="ni"><a href="{href}">{title}</a>'
                  "<em>{time}</em>{img}</li>"),
        "entry_img": '<img src="{img}">',
        "next": '<a rel="next" href="{next}">&raquo;</a>',
        "more": '<div class="pager-more">',
        "title": '<h2 class="headline">{title}</h2>',
        "date": '<div class="posted">{raw}</div>',
        "abstract": '<p class="lede">{abstract}</p>',
        "para": '<font size="2">{para}</font>',
        "img": '<img border="0" src="{src}">',
        "extract": {
            "category": r'<td class="menu"><a href="([^"]+)"><b>([^<]+)</b></a></td>',
            "entry": (r'<li class="ni"><a href="(?P<href>[^"]+)">(?P<title>[^<]*)'
                      r"</a><em>(?P<time>[^<]+)</em>"
                      r'(?:<img src="(?P<img>[^"]+)">)?</li>'),
            "next": r'<a rel="next" href="([^"]+)">',
            "more": r'<div class="pager-more">',
            "title": r'<h2 class="headline">([^<]+)</h2>',
            "pub": r'<div class="posted">([^<]+)</div>',
            "abstract": r'<p class="lede">([^<]+)</p>',
            "block": (r'<font size="2">(?P<para>[^<]*)</font>'
                      r'|<img border="0" src="(?P<src>[^"]+)">'),
        },
    },
]


def render_html(kind: str, payload: dict, shape: dict) -> str:
    """Render a page payload into the shape's markup (mock-web only)."""
    if kind == "menu":
        items = "".join(
            shape["menu_item"].format(href=c["href"], label=c["label"])
            for c in payload["categories"]
        )
        return f"<html><body><nav>{items}</nav></body></html>"
    if kind in ("list", "api"):
        rows = []
        for e in payload["entries"]:
            img = shape["entry_img"].format(img=e["img"]) if e.get("img") else ""
            rows.append(
                shape["entry"].format(href=e["href"], title=e["title"],
                                      time=e["pub_time_raw"], img=img)
            )
        tail = ""
        if payload.get("next"):
            tail += shape["next"].format(next=payload["next"])
        if payload.get("has_more"):
            tail += shape["more"]
        return "<html><body>" + "".join(rows) + tail + "</body></html>"
    # article — blocks emitted in document order (the span invariant)
    parts = [
        shape["title"].format(title=payload["title"]),
        shape["date"].format(raw=payload["pub_time_raw"]),
    ]
    if payload.get("abstract"):
        parts.append(shape["abstract"].format(abstract=payload["abstract"]))
    inline = {i["after_para"]: i["src"] for i in payload.get("imgs", [])}
    for i, p in enumerate(payload["paras"]):
        parts.append(shape["para"].format(para=p))
        if i in inline:
            parts.append(shape["img"].format(src=inline[i]))
    return "<html><body>" + "".join(parts) + "</body></html>"


def _para(rng: random.Random, n: int = 8) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def build_site_graph(
    n_sites: int = 4,
    cats_per_site: int = 2,
    pages_per_cat: int = 2,
    entries_per_page: int = 4,
    skew_pages: int = 0,
    dup_fraction: float = 0.15,
    flaky_fraction: float = 0.0,
    jitter_times: bool = False,
    cookie_site: int | None = None,
    registry_has_cookie: bool = True,
    html_sites: int = 0,
    seed: int = 42,
) -> dict:
    """Returns {pages, seeds, registry, cutoff_epoch, as_of}.

    ``pages``: (url, method, body) → page dict. ``skew_pages``: extra list
    pages for site 0's first category (the mega-host skew fixture).
    ``cookie_site``: that site index is Cloudflare-style cookie-gated
    (hatawtabloid.py:28,37) — every page requires the clearance cookie;
    ``registry_has_cookie`` controls whether the site registry carries it
    (False models the un-cleared crawler: the site yields nothing).
    Sites cycle through all FIVE pagination rules, including the POST
    form-paginated feed (FORM_PAGE, yehey.py:70-104).
    ``html_sites``: the first N sites serve RAW HTML (alternating between
    the two HTML_SHAPES markups) and their registry entries carry
    format='html' + the shape's extraction rules — the selector surface
    as data. HTML pages keep their source payload dict under ``source``
    so tests can assert the render→extract round trip.
    """
    rng = random.Random(seed)
    pages: dict[tuple, dict] = {}
    seeds = []
    registry: dict[int, dict] = {}
    cookie_value = "cf_clearance=tok42"

    # Cutoff: entries get older one hour per step; put the cutoff so roughly
    # the newest ~60% of each chain passes.
    total_steps = cats_per_site * (pages_per_cat + skew_pages) * entries_per_page
    cutoff_dt = BASE_DT - timedelta(hours=max(2, int(total_steps * 0.6)))
    cutoff_epoch = cutoff_dt.replace(tzinfo=timezone.utc).timestamp()

    def add_page(url, kind, payload, host, response_url=None,
                 method="GET", body="", required_cookie=None, source=None):
        # Flaky pages fail their first 1-2 fetches, then succeed (exercises
        # the W3 retry path; Scrapy's default retry middleware semantics).
        fail_times = (
            rng.randint(1, 2) if rng.random() < flaky_fraction else 0
        )
        pages[page_key(url, method, body)] = {
            "url": url,
            "method": method,
            "body": body,
            "response_url": response_url or url,
            "kind": kind,
            "payload": payload,  # dict (JSON site) or raw HTML string
            "source": source,  # html sites: the pre-render payload dict
            "host": host,
            "bytes": 500 + (len(payload) if isinstance(payload, str)
                            else len(json.dumps(payload))),
            "fail_times": fail_times,
            "required_cookie": required_cookie,
        }

    for s in range(n_sites):
        host = f"site{s}.example.com"
        website_id = 1000 + s
        language_id = 1930 if s % 2 == 0 else 1866  # corpus census (SURVEY §1.1)
        rule = RULES[s % len(RULES)]
        is_html = s < html_sites
        shape = HTML_SHAPES[s % len(HTML_SHAPES)] if is_html else None
        if is_html:
            # HTML menus carry plain hrefs (no method/body), so HTML sites
            # use the GET pagination rules; each shape pairs with one.
            rule = (NEXT_LINK, PAGE_PARAM)[s % len(HTML_SHAPES)]
        gated = cookie_site == s
        req_cookie = cookie_value if gated else None
        registry[website_id] = {
            "rule": rule,
            "probe_first": rule == PAGE_PARAM,  # maharashtratimes-style site
        }
        if is_html:
            ex = dict(shape["extract"])
            # P4 exclusion is crawler-side config (zeenews.py:51), shipped
            # with the extraction rules, not scraped off the page.
            ex["excluded_labels"] = (
                [f"cat{s}-{cats_per_site - 1}"] if s == 1 else []
            )
            registry[website_id]["format"] = "html"
            registry[website_id]["extract"] = ex

        def emit_payload(kind_, payload_):
            """Render to the site's markup for HTML sites; pass dicts for
            JSON sites. Returns (payload, source)."""
            if is_html:
                return render_html(kind_, payload_, shape), payload_
            return payload_, None
        if gated and registry_has_cookie:
            # hatawtabloid.py:28,37 — the manually-obtained clearance
            # cookie carried on every request of that site.
            registry[website_id]["cookie"] = cookie_value
        menu_url = f"http://{host}/"
        seeds.append({"url": menu_url, "website_id": website_id,
                      "language_id": language_id})

        cats = []
        site_articles: list[str] = []  # for cross-category duplicate links
        step = 0
        for c in range(cats_per_site):
            label = f"cat{s}-{c}"
            n_pages = pages_per_cat + (skew_pages if (s == 0 and c == 0) else 0)
            cat = {"label": label,
                   "excluded": c == cats_per_site - 1 and s == 1}
            if rule == NEXT_LINK:
                cat["href"] = f"http://{host}/c{c}"
            elif rule == PAGE_PARAM:
                cat["href"] = f"http://{host}/c{c}?page=1"
            elif rule == OFFSET_PARAM:
                cat["href"] = f"http://{host}/c{c}?start=0"
            elif rule == API_PAGE:
                cat["href"] = f"http://{host}/api/c{c}?page=1"
            else:  # FORM_PAGE: POST feed, URL constant, body carries page
                cat["href"] = f"http://{host}/api/feed{c}"
                cat["method"] = "POST"
                cat["body"] = "page=1"
            cats.append(cat)

            for p in range(n_pages):
                method, body = "GET", ""
                if rule == NEXT_LINK:
                    url = f"http://{host}/c{c}" + (f"?p={p}" if p else "")
                    nxt = f"http://{host}/c{c}?p={p + 1}" if p + 1 < n_pages else None
                elif rule == PAGE_PARAM:
                    url = f"http://{host}/c{c}?page={p + 1}"
                elif rule == OFFSET_PARAM:
                    url = f"http://{host}/c{c}?start={p * 20}"
                elif rule == API_PAGE:
                    url = f"http://{host}/api/c{c}?page={p + 1}"
                else:  # FORM_PAGE
                    url = f"http://{host}/api/feed{c}"
                    method, body = "POST", f"page={p + 1}"

                entries = []
                # ``jitter_times``: permute entry times WITHIN the page so
                # publish order diverges from listing (seq) order — makes
                # the T1 priority ranking observably different from FIFO
                # (and exercises the faithful stop-at-first-old break
                # dropping newer entries later in the list).
                offsets = list(range(entries_per_page))
                if jitter_times:
                    rng.shuffle(offsets)
                for e in range(entries_per_page):
                    pub_dt = BASE_DT - timedelta(hours=step + offsets[e] - e)
                    step += 1
                    if site_articles and rng.random() < dup_fraction:
                        a_url = rng.choice(site_articles)  # duplicate link
                    else:
                        a_url = f"http://{host}/a/{s}_{c}_{p}_{e}"
                        if page_key(a_url) not in pages:
                            redirect = (len(pages) % 7 == 3)
                            paras = [_para(rng) for _ in range(rng.randint(2, 4))]
                            imgs = [
                                {"after_para": i, "src": f"/img/{s}_{c}_{p}_{e}_{i}.jpg"}
                                for i in range(len(paras))
                                if rng.random() < 0.4
                            ]
                            art = {
                                "title": f"Article {s}-{c}-{p}-{e}",
                                "paras": paras,
                                "imgs": imgs,
                                "pub_time_raw": _fmt_pub(pub_dt),
                                "abstract": paras[0] if rng.random() < 0.5 else None,
                            }
                            a_payload, a_src = emit_payload("article", art)
                            add_page(
                                a_url,
                                "article",
                                a_payload,
                                host,
                                response_url=(a_url + "?amp=1") if redirect else None,
                                required_cookie=req_cookie,
                                source=a_src,
                            )
                            site_articles.append(a_url)
                    entries.append(
                        {
                            "href": a_url,
                            "title": f"Entry {s}-{c}-{p}-{e}",
                            "pub_time_raw": _fmt_pub(pub_dt),
                            "img": f"http://{host}/lead/{s}_{c}_{p}_{e}.jpg"
                            if rng.random() < 0.7 else None,
                        }
                    )
                payload = {"entries": entries, "category1_echo": label}
                if rule == NEXT_LINK:
                    payload["next"] = nxt
                else:
                    payload["has_more"] = p + 1 < n_pages
                l_payload, l_src = emit_payload("list", payload)
                add_page(
                    url,
                    "api" if rule in (API_PAGE, FORM_PAGE) else "list",
                    l_payload, host, method=method, body=body,
                    required_cookie=req_cookie, source=l_src,
                )

        m_payload, m_src = emit_payload("menu", {"categories": cats})
        add_page(menu_url, "menu", m_payload, host,
                 required_cookie=req_cookie, source=m_src)

    return {
        "pages": pages,
        "seeds": seeds,
        "registry": registry,
        "cutoff_epoch": cutoff_epoch,
        "as_of": AS_OF,
    }


def payload_str(page: dict) -> str:
    """Wire form of a page payload: raw HTML as-is, dicts JSON-encoded."""
    p = page["payload"]
    return p if isinstance(p, str) else json.dumps(p)


def site_graph_df(spark: SparkSession, graph: dict) -> DataFrame:
    rows = [
        (p["url"], p.get("method", "GET"), p.get("body", ""),
         p["response_url"], p["kind"], payload_str(p),
         p["host"], p["bytes"], p.get("fail_times", 0),
         p.get("required_cookie"))
        for p in graph["pages"].values()
    ]
    return spark.createDataFrame(rows, SITE_GRAPH_SCHEMA)


def seeds_df(spark: SparkSession, graph: dict) -> DataFrame:
    rows = [(s["url"], s["website_id"], s["language_id"]) for s in graph["seeds"]]
    return spark.createDataFrame(rows, SEEDS_SCHEMA)


def add_trap_site(
    graph: dict,
    n_lists: int = 8,
    entries_per_page: int = 3,
    website_id: int = 1999,
    language_id: int = 1930,
) -> dict:
    """Append a calendar-mill trap host to a built site graph (in place).

    The host serves a bounded stand-in for an unbounded archive mill:
    NEXT_LINK-chained list pages and their articles all live 8 path
    segments deep (/cal/2021/5/<d>/view/print/mobile/...) and every entry
    is fresh enough to pass any fixture cutoff — exactly the shape whose
    real-web version never terminates, and the deep-path signal
    operators/traps.py:detect_traps flags. Used by the trap-guard
    lifecycle oracle (oracle_crawl.py): pass 1 crawls it freely, pass 2
    clamps flagged hosts' admission.
    """
    host = "trap.example.com"
    pages, seeds, registry = (
        graph["pages"], graph["seeds"], graph["registry"]
    )
    registry[website_id] = {"rule": NEXT_LINK}
    menu_url = f"http://{host}/"
    seeds.append({"url": menu_url, "website_id": website_id,
                  "language_id": language_id})

    def put(url, kind, payload):
        pages[page_key(url)] = {
            "url": url, "method": "GET", "body": "",
            "response_url": url, "kind": kind, "payload": payload,
            "source": None, "host": host,
            "bytes": 500 + len(json.dumps(payload)),
            "fail_times": 0, "required_cookie": None,
        }

    def list_url(p: int) -> str:
        return f"http://{host}/cal/2021/5/{p + 1}/view/print/mobile/{p}"

    for p in range(n_lists):
        entries = []
        for e in range(entries_per_page):
            pub_dt = BASE_DT - timedelta(minutes=p * entries_per_page + e)
            a_url = (
                f"http://{host}/cal/2021/5/{p + 1}/art/{e}/view/print"
            )
            put(a_url, "article", {
                "title": f"Calendar {p}-{e}",
                "paras": [f"calendar mill body {p}-{e}."],
                "imgs": [],
                "pub_time_raw": _fmt_pub(pub_dt),
                "abstract": None,
            })
            entries.append({
                "href": a_url,
                "title": f"Cal entry {p}-{e}",
                "pub_time_raw": _fmt_pub(pub_dt),
                "img": None,
            })
        payload = {"entries": entries, "category1_echo": "calendar"}
        payload["next"] = list_url(p + 1) if p + 1 < n_lists else None
        put(list_url(p), "list", payload)

    put(menu_url, "menu", {"categories": [
        {"label": "calendar", "href": list_url(0)}
    ]})
    return graph
