"""Real spider rule-sets as registry content, with fixtures shaped on the
actual sites' markup (VERDICT r2 'Next round #4', r3 'Next round #3').

Deployed spiders from the reference corpus are ported as rules-as-data
registry entries — no per-site code, only data consumed by the one
generic extractor (plans/parser.extract_payload) and the shared dataflow
(plans/parser.parse_page):

| site             | wid  | the behaviors it pins down | reference |
|------------------|------|----------------------------|-----------|
| zeenews          | 1033 | Hindi dates, slug-based category exclusion, URL-shape variant dispatch (photo vs story lists), next-link pagination | 已部署/zeenews.py:13-14,22-35,46-107 |
| aajtak           |  467 | TWO-LEVEL menus (category2), D-Mon-Y Hindi dates reordered before parsing, article markup variants by URL | 已部署/aajtak.py:24-37,59-70,86-98,122-154 |
| philboxing       | 1194 | month-switch dates, page-level time gate (entries never gated), list-page abstracts in meta | 已部署/philboxing.py:29-102,104-158 |
| manila           |  190 | two-level menus, API bootstrap scraped off a button onclick, JSON-wrapping-HTML pages, totItems-bound pagination, relative dates | 已部署/manila.py:24,30-82 |
| yehey            | 1225 | two-level menus, POST infinite scroll seeded from scraped form fields, ISO-T dates, header-image-first span order | 已部署/yehey.py:29-107,111-140 |
| maharashtratimes |  473 | nested menus, list bootstrap ?curpg=1, LAST-entry dont_filter pagination probe + self-refetch, breadcrumb categories, D-MonthName-Y,H:M:S dates | 已部署/maharashtratimes.py:26-59,61-83 |
| shangbao         |  184 | programmatic seed pre-fetch, offset pagination without has_more marker, already-normalized Y-M-D dates, breadcrumb categories, strong-tag abstracts | 已部署/shangbao.py:24-52,63-88 |
| interaksyon      |  490 | SELECTOR rules (htmlsel) over attribute-jumbled markup, seed straight into a list page, URL-derived category1, last-time-element pagination gate, featured-image-first spans | 已部署/interaksyon.py:13,25-48 |
| hatawtabloid     |  532 | Cloudflare-clearance cookie on every request (cookie-gated pages), eight-seed category lists with no menu hop, /page/N PATH pagination, positional selector indexing ([1] date span, nth-child(3) breadcrumb) | no_pass/cloudfare/hatawtabloid.py:15-21,28,37-51,53-70 |
| boholchronicle   |  448 | multi-GROUP menus (id-keyed sub-menus each hardcoding category1, link text as category2, one direct link with category2=None), sibling-combinator body selectors (`.heateorSssClear ~ p`), page-level byline pagination gate | 已部署/boholchronicle.py:12-13,28-34,39-43,45-58 |
| latestnews1      |  936 | menu skip-first slice (Home never crawled), category1 re-read off each LIST page's own header (menu labels ignored), SOFT-404 detection by selector (HTTP 200 error template → no doc), ISO+TZ datetime attributes, whole-container body fallback when no <p> survives | 已部署/latestnews1.py:46,55,63,75-77,84-96 |
| clickthecity     | 1248 | per-LABEL menu dispatch (Events/Campus → /page/N path chain bootstrapped with a dont_filter self-request, others → next-link chain), abstract CARRY-FORWARD across list entries (Scrapy meta-snapshot semantics), composite date+time pub spans, lead-image + figure-image selector-list block, excluded menu label | 已部署/clickthecity.py:38-62,70-105,120-155 |
| coconuts         | 1247 | two-level menus sharing ONE exclusion list at both levels, /page/1/ dont_filter bootstrap on EVERY category landing, page-level-only time gate (old entries still stored), body-paragraph IFRAMES as media with the figure image last | 已部署/coconuts.py:27-61,64-87,89-112 |
| parstoday        | 1155 | one-level menu mixing label AND slug ('/' link) exclusions, ?page=N pagination off the bare category URL, unconditional entry yield + last-entry gate, single lead image, introtext-vs-first-paragraph abstract fallback | 已部署/parstoday.py:29-49,51-69 |
| bworldonline     |  191 | href-PREFIX-filtered menu selector, category1/2 from the list URL's path segments, form-POST API chain (admin-ajax) bootstrapped with a page-scraped category_id, JSON-wrapping-HTML under a site-named key, LAST-entry dont_filter probe that re-POSTs the form body with its page field bumped | 已部署/bworldonline.py:21-32,38-56,59-76,78-94 |
| malaya           |  193 | DUPEFILTER-terminated pagination (the WP page-nav's last anchor taken unconditionally — self-points on the final page, the URL-seen check ends the chain), category1+2 split from one URL path segment (token-count-dependent positions), data-src lazy-load images, menu Home skip-slice | 已部署/malaya.py:29,50-60,66-83 |
| piagov           | 1231 | three-hop POSITIONAL menus (navbar anchor [2], sections anchors [4:7]) with dont_filter category hops, URL-derived form-POST .json chain (page counter in query AND body), last-entry iso page gate with the year-0000 → 2020 patch (bug-faithful), single-article-page stop quirk, byline fallback-now dates | 已部署/piagov.py:29-61,63-110,113-141 |
| raftaar          | 1052 | NESTED one-page two-level menu (children_sel) instantiating templated API collection URLs with composed '<sub>-<top>' slugs and off-site links skipped, offset pagination starting at 20 bounded by the response's total-count, REAL JSON schema walked by api_map field paths, epoch-millisecond dates, API-fed titles, image-less articles with abstract == body | 已部署/raftaar.py:29,32-50,52-70,72-83 |
| apkaakhbar       | 1059 | SIDE-FETCH entry gates (judge_pub_time: every entry's cutoff decided by a raw requests.get of its article — invisible to the scheduler), Newspaper-theme admin-ajax POST chain bounded by a page-scraped max_num_pages riding in the body, bootstrap ungated by the grid's own cutoff (flag1 vs flag2), menu [1:-1] slice, strong-concat abstracts, images[:-3] slice, whole-container body | 已部署/apkaakhbar.py:52,57-66,71-107,151-161 |
| udaybulletin     |  941 | nested one-page menu with PARENT SUPPRESSION (tops with children are grouping headers only), label-conditional slug composition (only 'खेल' children compose '<sub>-<top>'), UNBOUNDED offset API pagination closed only by the gate, gate-time ≠ stored-time epoch-ms fields (content-updated-at gates, content-created-at is stored), excluded category2 labels | 已部署/udaybulletin.py:36,41-59,63-80,83-103 |
| spin             | 1192 | seed-variant dispatch (sport → HARDCODED 35-slug collection list, life → four id-keyed menu groups), root-LIST JSON API, last-item channel-name carry (every article of a page inherits the LAST item's category2 — meta mutated in-loop, yielded after), last-item epoch page gate, published_time meta content re-tokenized 'HH:MM, DD.MM.YY' → ISO | 已部署/spin.py:34-67,76-96,104-127 |
| spot             |  495 | query-stripped PATH slugs in the API template (page counter from 0), per-item try/except skip of malformed entries, image path fallback (image → images.main), both categories from the ARTICLE's own URL segments, nth-of-type body scoping | 已部署/spot.py:22,33-48,56-58 |
| topgear          |  487 | 19 programmatic API seeds with a slug→section map (incl. the launch-pad carry-over bug: no branch matches, so it inherits the previous iteration's 'columns'), stateless collection/page state read off the request URL, FIRST-item page gate that drops the page's entries entirely, every-<p> bodies with interleaved images | 已部署/topgear.py:24-78,81-96 |
| unbox            |  485 | SEEDLESS form-POST feed (start_requests POSTs the tie-theme load-more endpoint directly — seed_method/seed_body), DOUBLE-JSON HTML envelope (json.loads twice → 'code'), last-list-date page gate, multi-tag body selection (p/em/h3 in document order) | 已部署/unbox.py:25-61,64-80 |
| ambala           |  965 | ungated entries with ARTICLE-level doc drops (fetched+seen but stored only if fresh), pagination by SIDE-FETCHING the last entry's article date, breadcrumb category1, Month-D-Y switch dates | 已部署/ambala.py:36-64,73-83,88-124 |
| dfa              | 1216 | menu group with a label-DEFAULT map (unknown sections collapse to 'Events'), '/' href skip, HARDCODED extra list URLs, carry-forward entry dates (undated rows inherit the last seen; the final carry gates pagination), styled-paragraph justify/center body/image split | 已部署/dfa.py:33-53,57-95,98-123 |
| doh              | 1218 | single mined category, Drupal view lists with date carry, positional field-item image/body split, first-sentence+'...' abstracts | 已部署/doh.py:27-35,38-88,90-123 |
| jb               |  678 | menu hrefs bolted onto an '/index.php&p=N' counter (menu_list_url_fmt), every entry yielded normally AND the last probed dont_filter for pagination ONLY (probe_keep_last), Portuguese bylines through an English month switch | 已部署/jb.py:29-40,42-55,57-96 |
| poorvanchalmedia | 1144 | dropdown-filtered menu li's, category1 from the LIST page's own h1, list-scraped data-src lead images, last-entry meta page gate, dash-joined article times (reference token bug documented, intent ported) | 已部署/poorvanchalmedia.py:8-72,94-111,113-126 |
| newstracklive    | 1134 | two-group menu (first three + dropdown subs), category2 = category1 from the list's own title, SIDE-FETCH last-entry page gate, the bugged date switch ported bug-for-bug (PM adds 11; the minute field is the MONTH), carousel-caption body fallback | 已部署/newstracklive.py:11-47,66-99,101-124 |
| divyahimachal    | 1091 | slice [1:-1] nested menu with child skips + Epaper exclusion, TWO entry groups (featured-then-grid), byline page gate via the token-count dual date form (ordinals split away), EIGHTH-span article dates, danda-split abstract fallback; the reference's shared-item meta race is deliberately not replicated | 已部署/divyahimachal.py:12-86,105-135,137-152,154-176 |
| philippinesnews  | 1209 | slice [1:4] flat menu, single-page ungated lists, title/date off a shared title_text block with positional [-6..-2] tokens | 已部署/philippinesnews.py:29-45,47-110 |
| tourism          | 1219 | seedless static list (seed IS the list; no menu, no pagination, no gates), title regexed out beside its <small> date, CONSTANT categories | 已部署/tourism.py:16,30-36,38-107 |
| haribhoomi       |  984 | menu walk STOPPED at the /live-tv sentinel, 'View All' list marker (pages without it yield nothing), GMT-suffix-trimmed AM/PM dates, custom <h-img> body images, positional tag-block breadcrumbs trimmed at '>' | 已部署/haribhoomi.py:8-78,101-145,147-176 |
| samacharjagat    | 1095 | pipe-trimmed 'Weekday, D Mon Y H:MM:SS AM/PM' stamps, two-danda-segment abstracts, hspace-attribute body images with the feature image appended last | 已部署/samacharjagat.py:8-54,80-105,107-140 |
| tarunmitra       | 1112 | ':'-labeled menu items route through a SECOND-LEVEL page whose strong links are the real sections (prefix keeps category1), slice [2:-4], dash-joined AM/PM dates | 已部署/tarunmitra.py:8-49,75-106,108-147 |
| dainiksandhyaprakash | 999 | menu expanded by SIDE-FETCHING the first category's breadcrumb links, gif-placeholder image filter, artfulstry body fallback, icon-gated next link | 已部署/dainiksandhyaprakash.py:33-58,60-78,80-108 |
| aapkikhabar      | 1023 | sibling-selector menu with a fixed-label sub-group, machine-readable data-datestring entry gates (already Y-M-D), ONE page-level news_desc teaser riding into every entry's abstract, body STOP-SENTINEL at the trending-tweets widget | 已部署/aapkikhabar.py:42-54,57-74,141-149 |
| bandera          |  376 | four list seeds (no menu), pagination by side-fetching the LAST headline's article date (random-UA requests.get in the reference), breadcrumb category1 | 已部署/bandera.py:18-21,36-53,55-75 |
| centralindia     |  952 | href-PREFIX-filtered menu selector, content-marker lists (a dead 404-template category yields nothing), ISO article datetimes vs Month-D-Y switch list gates, [-2] breadcrumb span | 已部署/centralindia.py:11-18,47-73,75-96 |
| Manilatimes      |  186 | two flat menu groups, meta-info list entries with fuzzy dates, LAST .tdb-entry-category as category2, #fb-root sibling-paragraph bodies, figure data-src images | 已部署/Manilatimes.py:29-54,56-70 |
| abante           |  486 | [:8] menu slice, category1 from the LIST URL's path segment, last-entry time page gate, styled continue-reading-content bodies, data-src featured image | 已部署/abante.py:26-39,41-55 |
| janadesh         | 1067 | ^http-filtered [:-4] menu slice, DATELESS lists (pub falls back to crawl time — the site publishes no dates), fake pagination never followed, CONSTANT category2, list-scraped lead image | 已部署/janadesh.py:23-28,35-55 |
| kickerdaily      |  496 | five list seeds with title-derived categories, li-JOIN abstracts (all bullet texts concatenated, else first paragraph), last-entry meta date page gate | 已部署/kickerdaily.py:12-17,32-46,48-72 |
| yugatech         |  444 | homepage IS the list, category1 from the article URL's first segment, byline page gate, in-paragraph screenshots | 已部署/yugatech.py:25-33,35-50 |
| politics         | 1206 | breadcrumb-SPAN title and category ([1]/[2] of itemprop=name), lead image from a background-image STYLE attribute (last quoted string), body skipping its first teaser paragraph, ISO datetimes | 已部署/politics.py:30-58,60-92 |
| sunstar          |  443 | THREE menu hops (menu → tablecenter[1:8] → one more hop → list), URL-segment categories with a DIGITS guard leaving category2 unset, single-paragraph body==abstract | 已部署/sunstar.py:25-48,50-64 |
| techpinas        |  492 | blogger older-link pagination gated on the FIRST teaser stamp, M/D/YYYY dates with the time-of-day token pasted verbatim, div/i/h3 multi-tag bodies, no categories at all | 已部署/techpinas.py:25-56 |
| emalwa           | 1050 | seed menu PLUS a side-fetched second page harvesting two more link groups (labels from text), NO-BREAK entry gates over unsorted grids, list-scraped title/abstract/date | 已部署/emalwa.py:28-41,46-66,68-84 |
| navsancharsamachar | 1048 | pre-fetched one-level menu, list-scraped title/abstract/date riding into imageless articles | 已部署/navsancharsamachar.py:30-63,65-80 |
| ptvnews          |  445 | sliced sub-menu plus two hardcoded category lists, both categories from the LIST URL with a 'page'-segment guard; the execjs cookie challenge is out of scope — the crawl dataflow is the port | 已部署/ptvnews.py:31-39,52-67,69-92 |
| agniban          | 1108 | menu li's WITH a nested <ul> excluded (exclude_if_sel), BOTH categories from the list's breadcrumb trail with a 'Page N' third-crumb guard, danda abstracts | 已部署/agniban.py:36-60,62-87 |
| coolbuster       | 1238 | gate date EMBEDDED in the blogger older-link URL (updated-max=ISO regexed out of the next href), separator-anchor HREF images, nth-of-type(3) body div, list-snippet abstracts | 已部署/coolbuster.py:29-60,62-90 |
| yashbharat       | 1073 | [1:-1] menu slice + ई-पेपर exclusion + suppressed parents over sub-menus, last-entry time page gate, colormag featured images | 已部署/yashbharat.py:31-72,74-90 |
| puridunia        | 1142 | FIRST-.date page gate, p+h3 multi-tag bodies, paragraph + featured-box image groups | 已部署/puridunia.py:28-59,61-93 |
| starmometer      | 1239 | FIRST loop-meta gate with the date regexed off a '//' separator, span.updated article dates | 已部署/starmometer.py:28-59,61-85 |
| technobaboy      | 1246 | featured-anchor HREF + content-img SRC image collection in one document-order walk (img_attr2 fallback), label-next pagination | 已部署/technobaboy.py:30-53,55-92 |
| pinoyparazzi     | 1241 | two menu hops (header menu → pulldown category filter links), FIRST-time page gate, wp-caption images | 已部署/pinoyparazzi.py:30-69,71-92 |
| tehelkahindi     | 1099 | [1:-2] menu slice with suppressed parents over sub-menus, td-image-wrap entries, per-entry duplicate next-link yields collapsing under the dupefilter | 已部署/tehelkahindi.py:31-60,62-84 |
| mattscradle      | 1232 | page gate by side-fetching the FIRST headline's article (page_gate_fetch_index=0), whole-container bodies with first-paragraph abstracts | 已部署/mattscradle.py:30-63,66-90 |
| awesome          | 1243 | menu labels minus their first character (label_re on '#Restaurants'), per-entry list teaser abstracts, FIRST-datetime isoT page gate, and the reference's BROKEN image selector ported faithfully as no-images | 已部署/awesome.py:27-64,66-90 |
| hindi            | 1071 | DEVANAGARI-DIGIT dates (०-९ translated before the fuzzy cascade), trailing-token-trimmed item dates, intro-paragraph body skip with re-anchored images; the reference's SECOND spider over parstoday.com — fixture host disambiguated | 已部署/hindi.py:18-48,68-98,100-129 |
| dailyhindinews   | 1130 | menu links and labels from two PARALLEL selectors zipped by position, full-ISO entry gates vs DATE-ONLY midnight article stamps (article_pub_style), trailing share-paragraph slice | 已部署/dailyhindinews.py:32-60,62-75 |
| journal          |  196 | submenu labeled by the PAGE'S OWN archive title (label_from), h2-deck abstracts with first-paragraph fallback | 已部署/journal.py:32-54,56-80 |
| remate           |  533 | breadcrumb cat1/cat2 with one-level sections lacking the third crumb, H4-BODIED articles falling back to paragraphs, first-vs-last meta-date split (article pub = first, page gate = last) | 已部署/remate.py:33-61,64-86 |
| cnnphilippines   |  449 | sliced nav, TWO ungated entry groups (grid + carousel), URL categories with a digits guard, fixed-id body container, single-page sections | 已部署/cnnphilippines.py:24-35,37-57 |
| philnews         |  488 | menu filtered by href prefix AND a two-segment regex, 'page'-guarded URL categories, optional h2-deck abstracts, previous_posts pagination | 已部署/philnews.py:25-44,46-63 |

The mock pages here are deterministic miniatures of each site's real
markup (class names, attribute shapes, and nesting mirror the spiders'
BeautifulSoup selectors), rendered by this module and re-parsed by the
registry rules — the render→extract round trip plus the engine-vs-
simulator parity suite are the correctness gate.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.functions.dates import AAJTAK_HINDI_MONTHS, HINDI_MONTHS
from crawler_spark.plans.parser import (
    API_OFFSET,
    API_PAGE_TPL,
    API_TEMPLATE,
    FORM_PAGE,
    FORM_URL_PAGE,
    NEXT_LINK,
    OFFSET_PARAM,
    PAGE_PARAM,
    PAGE_PATH,
)
from crawler_spark.schema import SEEDS_SCHEMA, SITE_GRAPH_SCHEMA

AS_OF = datetime(2021, 6, 1, 0, 0, 0)
BASE_DT = datetime(2021, 5, 30, 12, 0, 0)  # newest article time

_EN2HI = {v: k for k, v in HINDI_MONTHS.items()}
_EN2HI_AAJTAK = {v: k for k, v in AAJTAK_HINDI_MONTHS.items()}

_MON_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
             "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_MON_FULL = ["January", "February", "March", "April", "May", "June",
             "July", "August", "September", "October", "November",
             "December"]


def _t(i: int, spacing_hours: float = 1.0) -> datetime:
    """Article timeline: ``spacing_hours`` older per step. Each site runs
    its own counter with a spacing chosen so the shared cutoff lands
    mid-chain for that site's gate style."""
    return BASE_DT - timedelta(hours=i * spacing_hours)


class _G:
    """Accumulator for one combined graph."""

    def __init__(self):
        self.pages: dict[tuple, dict] = {}
        self.seeds: list[dict] = []
        self.registry: dict[int, dict] = {}

    def page(self, url, kind, payload, host, method="GET", body="",
             response_url=None, source=None):
        self.pages[(url, method or "GET", body or "")] = {
            "url": url,
            "method": method,
            "body": body,
            "response_url": response_url or url,
            "kind": kind,
            "payload": payload,
            "source": source,
            "host": host,
            "bytes": 500 + len(payload),
            "fail_times": 0,
            "required_cookie": None,
        }


# ---------------------------------------------------------------------------
# zeenews — Hindi dates, excluded slugs, photo/story variant dispatch,
# next-link pagination (已部署/zeenews.py)
# ---------------------------------------------------------------------------

def _zeenews_date(dt: datetime) -> str:
    """'मई 30, 2021, 11:00' — the span.date text shape zeenews lists carry
    (zeenews.py:89-93); Hindi month translated by HINDI_MONTHS before the
    Month-D-Y branch of format_time2."""
    return (f"{_EN2HI[_MON_ABBR[dt.month - 1]]} {dt.day}, {dt.year},"
            f" {dt.hour:02d}:{dt.minute:02d}")


ZEENEWS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "extract": {
        # parse(): soup.select('li.channel a') (zeenews.py:48-50)
        "category": r'<li class="channel"><a href="([^"]+)">([^<]+)</a></li>',
        # url.split('/')[-1] not in [...] (zeenews.py:51)
        "excluded_slugs": ["entertainment", "elections", "astro"],
        # story lists: .section-article blocks (zeenews.py:86-95)
        "entry": (
            r'<div class="section-article margin-bt30px clearfix">'
            r'<a href="(?P<href>[^"]+)"><h3 class="margin-bt10px">'
            r"(?P<title>[^<]*)</h3></a>"
            r'<span class="date">(?P<time>[^<]+)</span>'
            r'(?:<img src="(?P<img>[^"]+)">)?</div>'
        ),
        # soup.find(class_='next last') (zeenews.py:104)
        "next": r'<span class="next last"><a href="([^"]+)">',
        # article: .article-heading + .field-items children walk
        # (zeenews.py:114,120-122)
        "title": r'<div class="article-heading">([^<]+)</div>',
        "block": r"<p>(?P<para>[^<]*)</p>",
        # photo-gallery lists use a different markup (zeenews.py:57-65)
        "variants": [
            {
                "match": r"photo-gallery",
                "entry": (
                    r'<div class="col-sm-4 col-md-4 photo-photo-h">'
                    r'<a href="(?P<href>[^"]+)"><h3>(?P<title>[^<]*)</h3></a>'
                    r'<span class="photo-date">(?P<time>[^<]+)</span>'
                    r'<img src="(?P<img>[^"]+)"></div>'
                ),
            },
        ],
    },
}


def _build_zeenews(g: _G) -> None:
    step = [0]  # 4 h spacing × 12 entries → cutoff trips mid-list
    host = "zeenews.india.com"
    wid = 1033
    g.registry[wid] = dict(ZEENEWS_RULES)
    base = f"https://{host}"
    menu_url = f"{base}/hindi"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1930})
    cats = [("india", "इंडिया"), ("photo-gallery", "तस्वीरें"),
            ("entertainment", "मनोरंजन")]  # last one excluded by slug
    menu = "".join(
        f'<li class="channel"><a href="/hindi/{slug}">{label}</a></li>'
        for slug, label in cats
    )
    g.page(menu_url, "menu", f"<html><nav>{menu}</nav></html>", host)

    for slug, _label in cats[:2]:
        photo = slug == "photo-gallery"
        for p in range(2):
            lurl = f"{base}/hindi/{slug}" + (f"?page={p}" if p else "")
            rows = []
            for e in range(3):
                dt = _t(step[0], 4.0)
                step[0] += 1
                aurl = f"{base}/hindi/{slug}/story-{p}-{e}"
                raw = _zeenews_date(dt)
                if photo:
                    rows.append(
                        f'<div class="col-sm-4 col-md-4 photo-photo-h">'
                        f'<a href="{aurl}"><h3>Photo {slug} {p}-{e}</h3></a>'
                        f'<span class="photo-date">{raw}</span>'
                        f'<img src="{base}/th/{slug}{p}{e}.jpg"></div>'
                    )
                else:
                    img = (f'<img src="{base}/th/{slug}{p}{e}.jpg">'
                           if e % 2 == 0 else "")
                    rows.append(
                        f'<div class="section-article margin-bt30px clearfix">'
                        f'<a href="{aurl}"><h3 class="margin-bt10px">'
                        f"Story {slug} {p}-{e}</h3></a>"
                        f'<span class="date">{raw}</span>{img}</div>'
                    )
                paras = "".join(
                    f"<p>zeenews {slug} body para {p}-{e}-{k}</p>"
                    for k in range(2)
                )
                g.page(
                    aurl, "article",
                    f'<html><div class="article-heading">Headline {p}-{e}'
                    f"</div>{paras}</html>",
                    host,
                )
            nxt = (f'<span class="next last"><a href="/hindi/{slug}?page={p+1}">'
                   f"अगला</a></span>") if p == 0 else ""
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# aajtak — two-level menus (category2), reordered Hindi dates, article
# markup variants by URL shape (已部署/aajtak.py)
# ---------------------------------------------------------------------------

AAJTAK_RULES = {
    "rule": PAGE_PARAM,
    "format": "html",
    "menu_child_kind": "menu2",  # parse → parse_essay is two menu hops
    "date_style": "hindi_dmy",  # aajtak.py:92-94 reorder-then-parse
    "article_pub_priority": "meta",
    "extract": {
        # start_requests: .at-menu li a (aajtak.py:62)
        "category": r'<li class="at-menu"><a href="([^"]+)">([^<]+)</a></li>',
        # parse: .widget-title a sets category2 (aajtak.py:68-70)
        "category2": r'<h2 class="widget-title"><a href="([^"]+)">([^<]+)</a></h2>',
        # parse_essay: .widget-listing, title attr + h5 date (aajtak.py:90-93)
        "entry": (
            r'<div class="widget-listing"><a href="(?P<href>[^"]+)"'
            r' title="(?P<title>[^"]*)"></a><h5>(?P<time>[^<]+)</h5></div>'
        ),
        "more": r'<div class="load-more">',
        # story articles (aajtak.py:129-139)
        "title": r'<h1 class="story-heading">([^<]+)</h1>',
        "abstract": r'<div class="sab-head-tranlate-sec">([^<]+)</div>',
        "block": (r'<div class="story-with-main-sec"><p>(?P<para>[^<]*)</p>'
                  r'</div>|<img class="main-img" src="(?P<src>[^"]+)">'),
        "variants": [
            {   # photo articles (aajtak.py:140-146)
                "match": r"/photo/",
                "title": r'<h1 class="photo-heading">([^<]+)</h1>',
                "abstract": r'<div class="photo-Detail-LHS-Heading">([^<]+)</div>',
                "block": (r'<div class="photo-detail-text"><p>(?P<para>[^<]*)'
                          r'</p></div>|<img class="big-photo" src="(?P<src>[^"]+)">'),
            },
        ],
    },
}


def _aajtak_date(dt: datetime) -> str:
    """'09 मई 2021' — aajtak.py:92's h5 text shape."""
    return f"{dt.day:02d} {_EN2HI_AAJTAK[_MON_FULL[dt.month - 1]]} {dt.year}"


def _build_aajtak(g: _G) -> None:
    step = [0]  # 3 h spacing × 16 entries → cutoff trips mid-list
    host = "www.aajtak.in"
    wid = 467
    g.registry[wid] = dict(AAJTAK_RULES)
    base = f"https://{host}"
    menu_url = f"{base}/"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1930})
    cat1s = [("india", "इंडिया"), ("sports", "खेल")]
    g.page(
        menu_url, "menu",
        "<html>" + "".join(
            f'<li class="at-menu"><a href="/{s}">{l}</a></li>'
            for s, l in cat1s
        ) + "</html>",
        host,
    )
    for s1, _l1 in cat1s:
        cat2s = [(f"{s1}-politics", "राजनीति"), (f"{s1}-crime", "अपराध")]
        g.page(
            f"{base}/{s1}", "menu2",
            "<html>" + "".join(
                f'<h2 class="widget-title"><a href="/{s2}">{l2}</a></h2>'
                for s2, l2 in cat2s
            ) + "</html>",
            host,
        )
        for s2, _l2 in cat2s:
            for p in (1, 2):
                lurl = f"{base}/{s2}" + (f"?page={p}" if p > 1 else "")
                rows = []
                for e in range(2):
                    dt = _t(step[0], 3.0)
                    step[0] += 1
                    akind = "story" if e % 2 == 0 else "photo"
                    aurl = f"{base}/{akind}/{s2}-{p}-{e}"
                    rows.append(
                        f'<div class="widget-listing"><a href="{aurl}"'
                        f' title="Aajtak {s2} {p}-{e}"></a>'
                        f"<h5>{_aajtak_date(dt)}</h5></div>"
                    )
                    if akind == "story":
                        body = (
                            f'<h1 class="story-heading">Story {s2} {p}-{e}</h1>'
                            f'<div class="sab-head-tranlate-sec">sab head'
                            f" {p}-{e}</div>"
                            f'<div class="story-with-main-sec"><p>aajtak story'
                            f" para {p}-{e}</p></div>"
                            f'<img class="main-img" src="{base}/im/{s2}{p}{e}.jpg">'
                        )
                    else:
                        body = (
                            f'<h1 class="photo-heading">Photo {s2} {p}-{e}</h1>'
                            f'<div class="photo-Detail-LHS-Heading">photo head'
                            f" {p}-{e}</div>"
                            f'<div class="photo-detail-text"><p>aajtak photo'
                            f" para {p}-{e}</p></div>"
                            f'<img class="big-photo" src="{base}/bp/{s2}{p}{e}.jpg">'
                        )
                    g.page(aurl, "article", f"<html>{body}</html>", host)
                more = '<div class="load-more"></div>' if p == 1 else ""
                g.page(lurl, "list",
                       "<html>" + "".join(rows) + more + "</html>", host)


# ---------------------------------------------------------------------------
# philboxing — month-switch dates, page-level time gate, list abstracts
# (已部署/philboxing.py)
# ---------------------------------------------------------------------------

PHILBOXING_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",  # philboxing.py:112 reads the storytitle
    "date_style": "month_switch",  # philboxing.py:69-94,116-139
    "extract": {
        # parse: the single sidenav category (philboxing.py:32-33)
        "category": r'<a class="sidenav" href="([^"]+)">([^<]+)</a>',
        # list entries: blurb + link, abstract scraped ON the list page
        # (philboxing.py:44-45,59-60)
        "entry": (
            r'<font class="newsblurb">(?P<abstract>[^<]+)</font>'
            r'<a class="story" href="(?P<href>[^"]+)">(?P<title>[^<]*)</a>'
        ),
        # pagination gate: the page's LAST story date (philboxing.py:67-68)
        "page_time": r'<font size="2">([^<]+)</font>',
        # next page link (philboxing.py:96-98)
        "next": r'<font class="boxertablebody"><a href="([^"]+)">',
        # article (philboxing.py:112-157)
        "title": r'<font class="storytitle">([^<]+)</font>',
        "pub": r'<font class="storydate">([^<]+)</font>',
        "block": (r'<font class="storycontent">(?P<para>[^<]*)</font>'
                  r'|<img class="storyimg" src="(?P<src>[^"]+)">'),
    },
}


def _philboxing_date(dt: datetime) -> str:
    """'Sun, 30 May 2021' — storydate/page-date text; the month-switch
    style consumes the last three tokens (philboxing.py:67-68,114-115)."""
    wd = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"][dt.weekday()]
    return f"{wd}, {dt.day} {_MON_ABBR[dt.month - 1]} {dt.year}"


def _build_philboxing(g: _G) -> None:
    host = "philboxing.com"
    wid = 1194
    g.registry[wid] = dict(PHILBOXING_RULES)
    base = f"http://{host}"
    menu_url = f"{base}/"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1866})
    g.page(
        menu_url, "menu",
        f'<html><a class="sidenav" href="{base}/news/">NEWS</a></html>',
        host,
    )
    # Month-switch gating is day-granular: make pages one DAY older each so
    # the cutoff lands between pages.
    for p in range(3):
        lurl = f"{base}/news/" + (f"artpros{p}.php" if p else "")
        # Two DAYS older per page: the cutoff (36 h) lands between p0 and
        # p1's page dates, so p1's gate blocks the fetch of p2 entirely.
        page_dt = BASE_DT - timedelta(days=2 * p)
        rows = []
        for e in range(2):
            aurl = f"{base}/news/story-{p}-{e}.php"
            rows.append(
                f'<font class="newsblurb">Blurb {p}-{e} from the list page'
                f"</font>"
                f'<a class="story" href="{aurl}">Bout report {p}-{e}</a>'
            )
            img = (f'<img class="storyimg" src="{base}/ph/{p}{e}.jpg">'
                   if e == 0 else "")
            g.page(
                aurl, "article",
                f'<html><font class="storytitle">Fight story {p}-{e}</font>'
                f'<font class="storydate">By staff,'
                f" {_philboxing_date(page_dt)}</font>"
                f'<font class="storycontent">philboxing para {p}-{e}-0</font>'
                f"{img}"
                f'<font class="storycontent">philboxing para {p}-{e}-1</font>'
                f"</html>",
                host,
            )
        nxt = (f'<font class="boxertablebody"><a href="artpros{p+1}.php">'
               f"Next</a></font>") if p < 2 else ""
        g.page(
            lurl, "list",
            "<html>" + "".join(rows)
            + f'<font size="2">{_philboxing_date(page_dt)}</font>'
            + nxt + "</html>",
            host,
        )


# ---------------------------------------------------------------------------
# manila — API bootstrap off a button onclick, JSON-wrapping-HTML pages,
# totItems-bound pagination, relative dates (已部署/manila.py)
# ---------------------------------------------------------------------------

MANILA_API = ("https://manilastandard.net/api/sub/articles?page={page}"
              "&category={category}&column=0&totItems={totItems}"
              "&currentItems={currentItems}")  # manila.py:24

MANILA_RULES = {
    "rule": API_TEMPLATE,
    "format": "html",
    "menu_child_kind": "menu2",
    "api_url_template": MANILA_API,
    "api_format": "json_html",  # manila.py:71: JSON whose data field is HTML
    "title_priority": "page",  # manila.py:92
    "article_pub_priority": "page",  # manila.py:94-96 re-reads the date
    "extract": {
        # parse: nav menus (manila.py:32-33)
        "category": r'<div class="col-xs-12"><a href="([^"]+)">([^<]+)</a></div>',
        # parse2: category table (manila.py:49-54; title attr is the label)
        "category2": (r'<td><a class="category-name" href="([^"]+)"'
                      r' title="([^"]+)">'),
        # parse3: loadMore button onclick params (manila.py:61-66)
        "api_params": (r'onclick="loadMoreArticles\((?P<category>\d+), \d+,'
                       r' (?P<totItems>\d+), \d+\)"'),
        # parse4: .articlecontext entries inside the JSON 'data' html with
        # relative dates (manila.py:71-73)
        "entry": (r'<div class="articlecontext"><a href="(?P<href>[^"]+)">'
                  r"</a><span>(?P<time>\d+ hours? ago)</span></div>"),
        # parse_item (manila.py:92-106)
        "title": r'<h1 class="custom-article-title">([^<]+)</h1>',
        "pub": r'<div class="ts-article-author-container">[^<]*?(\w+ \d+, \d+)</div>',
        "block": (r'<div class="article-description"><p>(?P<para>[^<]*)</p>'
                  r'</div>|<figure class="image"><img src="(?P<src>[^"]+)">'
                  r"</figure>"),
    },
}


def _build_manila(g: _G) -> None:
    step = [0]  # 4 h spacing × 12 entries → cutoff trips mid-chain
    host = "manilastandard.net"
    wid = 190
    g.registry[wid] = dict(MANILA_RULES)
    base = f"https://{host}"
    menu_url = base
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1866})
    g.page(
        menu_url, "menu",
        f'<html><nav><div class="col-xs-12"><a href="{base}/news">News</a>'
        f"</div></nav></html>",
        host,
    )
    cat2s = [("12", "national"), ("15", "business")]
    g.page(
        f"{base}/news", "menu2",
        "<html>" + "".join(
            f'<td><a class="category-name" href="{base}/{slug}"'
            f' title="{slug.title()}">{slug.title()}</a></td>'
            for _cid, slug in cat2s
        ) + "</html>",
        host,
    )
    for cid, slug in cat2s:
        tot = 25  # 3 api pages: (1-1)*10, (2-1)*10, (3-1)*10 ≤ 25 < (4-1)*10
        g.page(
            f"{base}/{slug}", "list",
            f'<html><div class="page-category-contents"></div>'
            f'<button onclick="loadMoreArticles({cid}, 0, {tot}, 0)">'
            f"Load more</button></html>",
            host,
        )
        for p in (1, 2, 3, 4):
            import json as _json

            rows = []
            for e in range(2 if p <= 3 else 0):
                dt = _t(step[0], 4.0)
                step[0] += 1
                hours = int((AS_OF - dt).total_seconds() // 3600)
                aurl = f"{base}/{slug}/art-{p}-{e}"
                rows.append(
                    f'<div class="articlecontext"><a href="{aurl}"></a>'
                    f"<span>{hours} hours ago</span></div>"
                )
                pubtxt = f"{_MON_ABBR[dt.month - 1]} {dt.day}, {dt.year}"
                g.page(
                    aurl, "article",
                    f'<html><h1 class="custom-article-title">Manila {slug}'
                    f" {p}-{e}</h1>"
                    f'<div class="ts-article-author-container">By desk on'
                    f" {pubtxt}</div>"
                    f'<figure class="image"><img src="{base}/f/{slug}{p}{e}.jpg">'
                    f"</figure>"
                    f'<div class="article-description"><p>manila body {slug}'
                    f" {p}-{e}</p></div></html>",
                    host,
                )
            api_url = MANILA_API.format(
                page=p, category=cid, totItems=tot, currentItems=(p - 1) * 10
            )
            g.page(api_url, "api", _json.dumps({"data": "".join(rows)}), host)


# ---------------------------------------------------------------------------
# yehey — POST infinite scroll seeded from scraped form fields, isoT dates,
# header-image-first spans (已部署/yehey.py)
# ---------------------------------------------------------------------------

YEHEY_RULES = {
    "rule": FORM_PAGE,
    "format": "html",
    "menu_child_kind": "menu2",
    "api_format": "json",  # yehey.py:78-97: the scroll endpoint is JSON
    "title_priority": "page",  # yehey.py:116-117
    "date_style": "isoT",  # yehey.py:95-98,136-139
    "article_pub_priority": "page",
    "form_api_url": "https://yehey.com/?infinity=scrolling",  # yehey.py:61
    "url_cat_re": r"category/([^/]+)/",  # yehey.py:56-57
    "extract": {
        # parse: li#menu-item-5581 (yehey.py:35-37)
        "category": r'<li id="menu-item-5581"><a href="([^"]+)">([^<]+)</a>',
        # parse_category2: sub-menu items (yehey.py:42-45)
        "category2": r'<ul class="sub-menu"><li><a href="([^"]+)">([^<]+)</a>',
        # parse_category3: main#main articles (yehey.py:51-53)
        "entry": (r'<h2 class="entry-title th-text-md th-mb-0">'
                  r'<a href="(?P<href>[^"]+)">(?P<title>[^<]*)</a></h2>'),
        # currentday scraped out of a script tag (yehey.py:63-64)
        "form_params": r"currentday%22%3A%22(?P<currentday>[0-9.]+)%22%2C%22",
        # parse_detail (yehey.py:116-139)
        "title": (r'<h1 class="entry-title th-mb-0 sm:th-text-8xl'
                  r' th-text-4xl">([^<]+)</h1>'),
        "pub": r'<time class="entry-date published" datetime="([^"]+)">',
        "block": (r'<div class="entry-content th-content"><p>(?P<para>[^<]*)'
                  r"</p></div>"
                  r'|<header id="primary-header"><img src="(?P<src>[^"]+)">'
                  r"</header>"
                  r'|<a class="content-img"><img src="(?P<src2>[^"]+)"></a>'),
    },
}


def _yehey_iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + "+08:00"


def _yehey_article(g: _G, base: str, host: str, slug: str, tag: str,
                   dt: datetime) -> str:
    aurl = f"{base}/{slug}-{tag}/"
    g.page(
        aurl, "article",
        f'<html><header id="primary-header"><img src="{base}/hd/{tag}.jpg">'
        f"</header>"
        f'<h1 class="entry-title th-mb-0 sm:th-text-8xl th-text-4xl">'
        f"Yehey {slug} {tag}</h1>"
        f'<time class="entry-date published" datetime="{_yehey_iso(dt)}">'
        f"</time>"
        f'<div class="entry-content th-content"><p>yehey para {tag}-0</p></div>'
        f'<div class="entry-content th-content"><p>yehey para {tag}-1</p></div>'
        f"</html>",
        host,
    )
    return aurl


def _build_yehey(g: _G) -> None:
    step = [0]  # entries are not time-gated on this site; spacing moot
    import json as _json

    host = "yehey.com"
    wid = 1225
    g.registry[wid] = dict(YEHEY_RULES)
    base = f"https://{host}"
    menu_url = f"{base}/"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1866})
    g.page(
        menu_url, "menu",
        f'<html><li id="menu-item-5581"><a href="{base}/category-index/">News'
        f"</a></li></html>",
        host,
    )
    cat2s = ["nation", "metro"]
    g.page(
        f"{base}/category-index/", "menu2",
        "<html>" + "".join(
            f'<ul class="sub-menu"><li><a href="{base}/category/{c}/">'
            f"{c.title()}</a></li></ul>"
            for c in cat2s
        ) + "</html>",
        host,
    )
    currentday = "30.05.2021"
    for c in cat2s:
        lurl = f"{base}/category/{c}/"
        statics = []
        for e in range(2):
            dt = _t(step[0])
            step[0] += 1
            aurl = _yehey_article(g, base, host, c, f"s{e}", dt)
            statics.append(
                f'<h2 class="entry-title th-text-md th-mb-0">'
                f'<a href="{aurl}">Yehey {c} s{e}</a></h2>'
            )
        g.page(
            lurl, "list",
            "<html><main>" + "".join(statics) + "</main>"
            f'<script type="text/javascript">var inf = "currentday%22%3A%22'
            f'{currentday}%22%2C%22";</script></html>',
            host,
        )
        # POST scroll pages 2..4; page datetimes age one day per page so the
        # cutoff gates the chain (yehey.py:92-101).
        for p in (2, 3, 4):
            body = "&".join(
                f"{k}={v}" for k, v in sorted(
                    {"currentday": currentday, "page": str(p),
                     "query_args": c}.items()
                )
            )
            page_dt = BASE_DT - timedelta(days=p - 1)
            urls = []
            for e in range(2):
                dt = _t(step[0])
                step[0] += 1
                urls.append(_yehey_article(g, base, host, c, f"p{p}e{e}", dt))
            payload = {
                "currentday": currentday,
                "entries": [{"href": u} for u in urls],
                "page_time_raw": _yehey_iso(page_dt),
                "has_more": p < 4,
            }
            g.page("https://yehey.com/?infinity=scrolling", "api",
                   _json.dumps(payload), host, method="POST", body=body)


# ---------------------------------------------------------------------------
# maharashtratimes — nested menus, ?curpg list bootstrap, last-entry
# dont_filter pagination probe, breadcrumb categories
# (已部署/maharashtratimes.py)
# ---------------------------------------------------------------------------

MT_RULES = {
    "rule": PAGE_PARAM,  # pagination driven by the probe, not this rule
    "format": "html",
    "menu_child_kind": "menu2",
    "menu2_child_kind": "menu2",  # parse1 recursion (maharashtratimes.py:36-37)
    "probe_last": True,  # maharashtratimes.py:43-45
    "page_url_fmt": "{base}?curpg={page}",  # maharashtratimes.py:34,55
    "title_priority": "page",  # maharashtratimes.py:64-65
    "date_style": "dmy_hms",  # maharashtratimes.py:50-51
    "article_pub_priority": "page",
    "extract": {
        # parse: #fixedMenu items (maharashtratimes.py:28)
        "category": r'<div id="fixedMenu"><a href="([^"]+)">([^<]+)</a></div>',
        # parse1: childrenContainer either has list entries (data-tn="tn")
        # or recurses into read_more submenus (maharashtratimes.py:33-37)
        "list_marker": r'data-tn="tn"',
        "category2": r'<a class="read_more" href="([^"]+)">([^<]*)</a>',
        # parse2: .con_wrap links (maharashtratimes.py:41-45)
        "entry": (r'<div class="con_wrap"><a href="(?P<href>[^"]+)">'
                  r"(?P<title>[^<]*)</a></div>"),
        # parse_detail (maharashtratimes.py:64-81)
        "title": r'<div class="story-article"><h1>([^<]+)</h1></div>',
        "abstract": r'<div class="story-article"><h2>([^<]+)</h2></div>',
        "pub": r'<div class="source"><span class="time">([^<]+)</span></div>',
        "cat1": r'<div class="breadcrumb"><li>([^<]+)</li>',
        "cat2": r'<div class="breadcrumb"><li>[^<]+</li><li>([^<]+)</li>',
        "block": (r"<article><p>(?P<para>[^<]*)</p></article>"
                  r'|<div class="img_wrap"><img src="(?P<src>[^"]+)"></div>'),
    },
}


def _mt_date(dt: datetime) -> str:
    """'30 May 2021, 11:00:00' — the .source .time text
    (maharashtratimes.py:50's regex \\d+ \\S+ \\d+, \\d+:\\d+:\\d+)."""
    return (f"{dt.day} {_MON_FULL[dt.month - 1]} {dt.year},"
            f" {dt.hour:02d}:{dt.minute:02d}:00")


def _mt_article(g: _G, base: str, host: str, sec: str, tag: str,
                dt: datetime, cat1: str, cat2: str) -> str:
    aurl = f"{base}/{sec}/article-{tag}"
    g.page(
        aurl, "article",
        f'<html><div class="breadcrumb"><li>{cat1}</li><li>{cat2}</li></div>'
        f'<div class="story-article"><h1>MT {sec} {tag}</h1></div>'
        f'<div class="story-article"><h2>mt abstract {tag}</h2></div>'
        f'<div class="source"><span class="time">By desk | Updated:'
        f" {_mt_date(dt)}</span></div>"
        f'<div class="img_wrap"><img src="{base}/mtimg/{tag}.jpg"></div>'
        f"<article><p>mt body {tag}-0</p></article>"
        f"<article><p>mt body {tag}-1</p></article>"
        f"</html>",
        host,
    )
    return aurl


def _build_maharashtratimes(g: _G) -> None:
    host = "maharashtratimes.com"
    wid = 473
    g.registry[wid] = dict(MT_RULES)
    base = f"https://{host}"
    menu_url = f"{base}/"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 1930})
    g.page(
        menu_url, "menu",
        f'<html><div id="fixedMenu"><a href="{base}/mumbai">मुंबई</a></div>'
        f'<div id="fixedMenu"><a href="{base}/desh">देश</a></div></html>',
        host,
    )
    # Section 'mumbai' carries articles directly (list bootstrap); section
    # 'desh' is a nested menu leading to one subsection with articles.
    g.page(f"{base}/mumbai", "menu2",
           '<html><div id="childrenContainer"><a data-tn="tn" href="#">x</a>'
           "</div></html>", host)
    g.page(f"{base}/desh", "menu2",
           f'<html><div id="childrenContainer">'
           f'<a class="read_more" href="{base}/desh/politics">राजकारण</a>'
           f"</div></html>", host)
    g.page(f"{base}/desh/politics", "menu2",
           '<html><div id="childrenContainer"><a data-tn="tn" href="#">x</a>'
           "</div></html>", host)

    for sec, cat1, cat2 in (("mumbai", "महाराष्ट्र", "मुंबई"),
                            ("desh/politics", "देश", "राजकारण")):
        # Probe articles age one DAY per page so the probe's date gates
        # pagination; non-probe entries share the page's day.
        for p in (1, 2, 3):
            page_dt = BASE_DT - timedelta(days=p - 1)
            rows = []
            for e in range(3):  # entries 0,1 → articles; entry 2 → probe
                dt = page_dt - timedelta(minutes=30 * e)
                aurl = _mt_article(g, base, host, sec, f"{p}-{e}", dt,
                                   cat1, cat2)
                rows.append(
                    f'<div class="con_wrap"><a href="{aurl}">MT entry'
                    f" {p}-{e}</a></div>"
                )
            g.page(f"{base}/{sec}?curpg={p}", "list",
                   "<html>" + "".join(rows) + "</html>", host)


# ---------------------------------------------------------------------------
# shangbao — offset pagination without a has_more marker, normalized Y-M-D
# dates, breadcrumb categories, strong-tag abstracts (已部署/shangbao.py)
# ---------------------------------------------------------------------------

SHANGBAO_RULES = {
    "rule": OFFSET_PARAM,
    "format": "html",
    "title_priority": "page",  # shangbao.py:66
    "date_style": "ymd",  # shangbao.py:41 feeds list dates to format_time3
    "article_pub_priority": "page",
    "extract": {
        # start_requests: #nav_left links (shangbao.py:27)
        "category": r'<div id="nav_left"><a href="([^"]+)">([^<]+)</a></div>',
        # parse: table rows, last td is the date (shangbao.py:38-41)
        "entry": (r'<table><tr><td><a href="(?P<href>[^"]+)">'
                  r"(?P<title>[^<]*)</a></td><td>(?P<time>[^<]+)</td></tr>"
                  r"</table>"),
        # parse paginates unconditionally while entries stay fresh
        # (shangbao.py:49-52: `if flag: yield next` — no marker)
        "more": r"<html",
        # parse_item (shangbao.py:66-86)
        "title": r'<div class="con_left"><h1>([^<]+)</h1></div>',
        "pub": r'<div class="left_time">([^<]+)</div>',
        "cat1": r'<div class="dqwz-l"><a>([^<]+)</a>',
        "cat2": r'<div class="dqwz-l"><a>[^<]+</a><a>([^<]+)</a>',
        "abstract": r"<strong>([^<]+)</strong>",
        "block": r'<div id="fontzoom"><p>(?:<strong>)?(?P<para>[^<]*?)'
                 r"(?:</strong>)?</p></div>",
    },
}


def _build_shangbao(g: _G) -> None:
    step = [0]  # 4 h spacing × 12 entries → cutoff trips mid-list
    host = "www.shangbao.com.ph"
    wid = 184
    g.registry[wid] = dict(SHANGBAO_RULES)
    base = f"http://{host}"
    menu_url = f"{base}/"
    g.seeds.append({"url": menu_url, "website_id": wid, "language_id": 2266})
    cats = [("jryw", "今日要闻"), ("fldt", "菲律宾动态")]
    g.page(
        menu_url, "menu",
        "<html>" + "".join(
            f'<div id="nav_left"><a href="http://s.shangbao.com.ph/es/haiwai/'
            f'shangbao/{slug}?start=0">{label}</a></div>'
            for slug, label in cats
        ) + "</html>",
        host,
    )
    lhost = "s.shangbao.com.ph"
    for slug, cat1 in cats:
        for p in range(2):
            lurl = (f"http://{lhost}/es/haiwai/shangbao/{slug}"
                    f"?start={p * 20}")
            rows = []
            for e in range(3):
                dt = _t(step[0], 4.0)
                step[0] += 1
                aurl = f"{base}/{slug}/art-{p}-{e}.html"
                rows.append(
                    f'<table><tr><td><a href="{aurl}">商报 {slug} {p}-{e}'
                    f"</a></td><td>{dt.strftime('%Y-%m-%d %H:%M:%S')}</td>"
                    f"</tr></table>"
                )
                strong = "<strong>" if e == 0 else ""
                strong_c = "</strong>" if e == 0 else ""
                g.page(
                    aurl, "article",
                    f'<html><div class="dqwz-l"><a>{cat1}</a><a>{slug}子栏'
                    f"</a></div>"
                    f'<div class="con_left"><h1>商报头条 {slug} {p}-{e}</h1>'
                    f"</div>"
                    f'<div class="left_time">'
                    f"{dt.strftime('%Y-%m-%d %H:%M:%S')}</div>"
                    f'<div id="fontzoom"><p>{strong}商报摘要 {slug} {p}-{e}'
                    f"{strong_c}</p></div>"
                    f'<div id="fontzoom"><p>商报正文 {slug} {p}-{e}</p></div>'
                    f"</html>",
                    host,
                )
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + "</html>", lhost)


# ---------------------------------------------------------------------------
# interaksyon — SELECTOR rules (functions/htmlsel.py) against deliberately
# jumbled markup: attribute order, extra attributes, and inter-attribute
# whitespace vary per page, which regex rules cannot survive but the
# reference's BeautifulSoup selectors (and ours) shrug off
# (已部署/interaksyon.py)
# ---------------------------------------------------------------------------

INTERAKSYON_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",  # start_urls IS the list page (interaksyon.py:13,25)
    "title_priority": "page",  # interaksyon.py:36 reads .entry-title
    "article_pub_priority": "page",  # interaksyon.py:45 reads .meta-info
    # category1 = response.url.split('/')[3] (interaksyon.py:38)
    "cat1_from_url_re": r"^https?://[^/]+/([^/]+)/",
    "extract": {
        # parse: '.td-ss-main-content .td-module-thumb > a' → attrs['href']
        # (interaksyon.py:27-28); the anchor wraps a thumb, title comes off
        # the article page.
        "entry": {"sel": ".td-ss-main-content .td-module-thumb > a"},
        # pagination gate: the LAST time element's text (interaksyon.py:29's
        # [-1] index), fuzzy-parsed; entries are never individually gated.
        "page_time": {"sel": ".td-ss-main-content > div time", "index": -1},
        # next page: LAST '.page-nav.td-pb-padding-side > a' href
        # (interaksyon.py:30).
        "next": {"sel": ".page-nav.td-pb-padding-side > a", "index": -1,
                 "attr": "href"},
        # parse1 (interaksyon.py:35-48)
        "title": {"sel": ".entry-title"},
        "pub": {"sel": "header > .meta-info"},
        "block": {
            "para_sel": ".td-post-content.td-pb-padding-side p",
            "img_sel": ".td-post-featured-image img",
        },
    },
}


def _jumble(seed: str, tag: str, attrs: list[tuple[str, str]],
            void: bool = False) -> str:
    """Render a start tag whose attribute ORDER, spacing, and junk extra
    attributes are a deterministic function of ``seed`` — the same DOM in
    different bytes, so only structure-aware extraction survives."""
    import hashlib

    h = int(hashlib.md5(seed.encode()).hexdigest(), 16)
    attrs = list(attrs) + [("data-noise", f"n{h % 97}")]
    k = h % len(attrs)
    attrs = attrs[k:] + attrs[:k]
    seps = [" ", "  ", "\n  ", " \t"]
    out = [tag]
    for i, (a, v) in enumerate(attrs):
        out.append(seps[(h >> (4 * i)) % len(seps)] + f'{a}="{v}"')
    return "<" + "".join(out) + ">"


def _build_interaksyon(g: _G) -> None:
    host = "interaksyon.philstar.com"
    wid = 490
    g.registry[wid] = dict(INTERAKSYON_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/news/", "website_id": wid,
                    "language_id": 1866})
    sections = ["politics-issues", "sports"]
    for p in range(3):
        lurl = f"{base}/news/" + (f"page/{p + 1}/" if p else "")
        # Page p's entries are p days older than BASE_DT; the 36 h fixture
        # cutoff passes p0 and p1's gates and stops pagination at p2.
        page_dt = BASE_DT - timedelta(days=p)
        cells = []
        for e in range(3):
            dt = page_dt - timedelta(minutes=45 * e)
            sec = sections[e % 2]
            aurl = f"{base}/{sec}/{2021}/art-{p}-{e}/"
            js = f"{lurl}#{e}"
            cells.append(
                _jumble(js, "div", [("class", "td-block-span6")])
                + _jumble(js + "t", "div",
                          [("class", "td-module-thumb"), ("id", f"tm{p}{e}")])
                + _jumble(js + "a", "a", [("href", aurl),
                                          ("rel", "bookmark")])
                + "</a></div>"
                + _jumble(js + "tm", "time",
                          [("datetime", dt.isoformat()),
                           ("class", "entry-date")])
                + f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                f" {dt.hour:02d}:{dt.minute:02d}</time></div>"
            )
            feat = _jumble(js + "img", "img",
                           [("src", f"{base}/f/{p}{e}.jpg"),
                            ("width", "1100"), ("alt", "featured")])
            paras = "".join(
                f"<p>interaksyon {sec} body {p}-{e}-{k}</p>"
                for k in range(2)
            )
            g.page(
                aurl, "article",
                "<html><body>"
                + _jumble(js + "h", "header", [("class", "td-post-header")])
                + _jumble(js + "ti", "h1",
                          [("class", "entry-title"), ("itemprop", "name")])
                + f"Interaksyon {sec} {p}-{e}</h1>"
                + _jumble(js + "mi", "div",
                          [("class", "meta-info td-post-date")])
                + f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                f" {dt.hour:02d}:{dt.minute:02d}</div></header>"
                + _jumble(js + "fi", "div",
                          [("class", "td-post-featured-image")])
                + feat + "</div>"
                + _jumble(js + "c", "div",
                          [("class",
                            "td-post-content td-pb-padding-side")])
                + paras + "</div></body></html>",
                host,
            )
        nav = (
            _jumble(lurl + "nav", "div",
                    [("class", "page-nav td-pb-padding-side")])
            + _jumble(lurl + "n1", "a", [("href", lurl)]) + "1</a>"
            + _jumble(lurl + "n2", "a",
                      [("href", f"{base}/news/page/{p + 2}/")])
            + "Next</a></div>"
        )
        g.page(
            lurl, "list",
            "<html><body>"
            + _jumble(lurl + "m", "div", [("class", "td-ss-main-content")])
            + "".join(cells) + "</div>" + nav + "</body></html>",
            host,
        )


# ---------------------------------------------------------------------------
# hatawtabloid — Cloudflare-clearance cookie on every request, multi-seed
# category lists (no menu), /page/N PATH pagination, per-entry time gate
# (demo/no_pass/cloudfare/hatawtabloid.py)
# ---------------------------------------------------------------------------

# Synthetic stand-in for the clearance cookie the reference hardcodes
# (hatawtabloid.py:28 — a real captured session string; we never copy it).
HATAW_COOKIE = "cf_clearance=fixture-clearance-532"

HATAW_RULES = {
    "rule": PAGE_PATH,
    "format": "html",
    "seed_kind": "list",  # 8 category start_urls, parse IS the list
    "cookie": HATAW_COOKIE,  # sent with every request (hatawtabloid.py:37)
    "title_priority": "page",
    "article_pub_priority": "page",
    "extract": {
        # parse: soup.select('.post-listing article'), href off 'h2 a',
        # entry date from '.post-meta' text (hatawtabloid.py:43-45)
        "entry": {
            "sel": ".post-listing article",
            "fields": {
                "href": {"sel": "h2 a", "attr": "href"},
                "time": {"sel": ".post-meta"},
            },
        },
        # paginate while entries stay fresh; no marker (flag-driven,
        # hatawtabloid.py:48-51)
        "more": {"sel": ".post-listing article"},
        # parse_news (hatawtabloid.py:53-70)
        "title": {"sel": "h1.post-title.entry-title"},
        # '.post-meta > span' index [1] — the SECOND span is the date
        "pub": {"sel": ".post-meta > span", "index": 1},
        # '#main-content ... span:nth-child(3) > a' breadcrumb — the THIRD
        # breadcrumb span's link text
        "cat1": {"sel": "p.breadcrumbs > span > a", "index": 2},
        "block": {
            "para_sel": "div.entry p",
            "img_sel": "div.single-post-thumb img",
        },
    },
}


# ---------------------------------------------------------------------------
# boholchronicle — multi-GROUP menu (each id-keyed sub-menu hardcodes its
# own category1, sub-link text = category2, plus one direct link with no
# category2), sibling-combinator body extraction (.heateorSssClear ~ p),
# page-level byline gate, LAST-nav-link pagination
# (已部署/boholchronicle.py)
# ---------------------------------------------------------------------------

BOHOL_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",  # boholchronicle.py:47 reads .post-title
    "article_pub_priority": "page",  # boholchronicle.py:55 reads .post-byline
    "extract": {
        # parse(): four menu groups, each selected by its WordPress menu
        # item id with a HARDCODED category1; sub-link text is category2;
        # the Nation link is direct (category2=None)
        # (boholchronicle.py:28-34).
        "category": [
            {"sel": "#menu-item-45526 .sub-menu li a", "label": "News"},
            {"sel": "#menu-item-45298 .sub-menu li a",
             "label": "Commentary"},
            {"sel": "#menu-item-5348 .sub-menu li a", "label": "Features"},
            {"sel": "#menu-item-5349 a", "label": "Nation",
             "label2": False},
        ],
        # parse2: '#loop-container div .post-title a' (boholchronicle.py:39)
        "entry": {"sel": "#loop-container div .post-title a"},
        # pagination gate: the LAST entry's byline, page-level — entries
        # themselves are never gated (boholchronicle.py:42)
        "page_time": {"sel": "#loop-container div .post-byline",
                      "index": -1},
        # next page: LAST '.nav-links > a' (boholchronicle.py:43)
        "next": {"sel": ".nav-links > a", "index": -1, "attr": "href"},
        # parse3 (boholchronicle.py:45-58)
        "title": {"sel": ".post-title"},
        # pub = the byline FOLLOWING the title (sibling combinator,
        # boholchronicle.py:55)
        "pub": {"sel": ".post-title ~ .post-byline"},
        "block": {
            # body = every <p> after the social-share clear div — the
            # reference's '.heateorSssClear ~ p' (boholchronicle.py:50-54)
            "para_sel": ".heateorSssClear ~ p",
            # lead image: '#loop-container img' (boholchronicle.py:56-57
            # takes [0]; the fixture articles carry exactly one)
            "img_sel": "#loop-container img",
        },
    },
}


def _bohol_date(dt: datetime) -> str:
    return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
            f" {dt.hour:02d}:{dt.minute:02d}")


def _build_boholchronicle(g: _G) -> None:
    host = "www.boholchronicle.com.ph"
    wid = 448  # boholchronicle.py:13
    g.registry[wid] = dict(BOHOL_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/", "website_id": wid,
                    "language_id": 1866})
    # (menu-group id, category1, [(slug, category2)...]) — Nation is the
    # direct-link group (no sub-menu, category2 stays null end-to-end).
    groups = [
        ("45526", "News", [("top", "Top Stories"), ("local", "Local")]),
        ("45298", "Commentary", [("editorial", "Editorial")]),
    ]
    items = []
    for gid, _c1, subs in groups:
        links = "".join(
            f'<li><a href="{base}/category/{slug}/">{label}</a></li>'
            for slug, label in subs
        )
        items.append(
            f'<li id="menu-item-{gid}" class="menu-item-has-children">'
            f'<a href="#">x</a><ul class="sub-menu">{links}</ul></li>'
        )
    items.append(
        f'<li id="menu-item-5349"><a href="{base}/category/nation/">'
        "Nation</a></li>"
    )
    g.page(
        f"{base}/", "menu",
        '<html><body><ul id="menu-main">' + "".join(items)
        + "</ul></body></html>",
        host,
    )
    chains = [slug for _gid, _c1, subs in groups for slug, _l in subs]
    chains.append("nation")
    for ci, slug in enumerate(chains):
        for p in range(2):
            lurl = f"{base}/category/{slug}/" + (f"page/{p + 1}/" if p else "")
            # Page 0's last byline is fresh (gate passes → page 2 queued);
            # page 1's is 3 days old (gate fails → pagination stops there).
            page_dt = BASE_DT - timedelta(days=3 * p, hours=ci)
            ents = []
            for e in range(2):
                dt = page_dt - timedelta(minutes=30 * e)
                aurl = f"{base}/{2021}/bohol-{slug}-{p}-{e}/"
                ents.append(
                    '<div class="post type-post">'
                    f'<h2 class="post-title"><a href="{aurl}">'
                    f"Bohol {slug} list {p}-{e}</a></h2>"
                    f'<div class="post-byline">{_bohol_date(dt)}</div></div>'
                )
                paras = "".join(
                    f"<p>bohol {slug} body {p}-{e}-{k}</p>" for k in range(2)
                )
                g.page(
                    aurl, "article",
                    '<html><body><div id="loop-container">'
                    f'<h1 class="post-title">Bohol {slug} story {p}-{e}</h1>'
                    f'<div class="post-byline">{_bohol_date(dt)}</div>'
                    f'<img src="{base}/wp/{slug}{p}{e}.jpg"/>'
                    '<div class="heateorSssClear"></div>'
                    f"{paras}</div></body></html>",
                    host,
                )
            nav = (
                '<div class="nav-links">'
                + (f'<a href="{base}/category/{slug}/">Prev</a>' if p else "")
                + f'<a href="{base}/category/{slug}/page/{p + 2}/">Next</a>'
                "</div>"
            )
            g.page(
                lurl, "list",
                '<html><body><div id="loop-container">' + "".join(ents)
                + "</div>" + nav + "</body></html>",
                host,
            )


# ---------------------------------------------------------------------------
# latestnews1 — menu skip-first slice, category1 re-read off each LIST
# page's own header (menu labels ignored), selector-detected SOFT 404
# (HTTP 200 error template → no doc), ISO+TZ datetime attributes,
# whole-container body fallback when no <p> survives
# (已部署/latestnews1.py)
# ---------------------------------------------------------------------------

LATESTNEWS1_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # both gate and article dates are ISO 'YYYY-MM-DDTHH:MM:SS+05:30'
    # datetime attributes; the zone is discarded
    # (latestnews1.py:12-22's rsplit('+', 1)[0])
    "date_style": "isoT",
    "title_priority": "page",  # latestnews1.py:81 reads .entry-header h1
    "article_pub_priority": "page",  # latestnews1.py:83 reads the time attr
    "extract": {
        # parse(): menu[1:] — the FIRST menu link (Home) is sliced off and
        # never requested (latestnews1.py:44-46)
        "category": {
            "sel": "#header-text-nav-container .inner-wrap.clearfix"
                   " #menu-menu-1 li a",
            "skip": 1,
        },
        # parse_category1: category1 = the list page's OWN header text —
        # the menu label is never used (latestnews1.py:55)
        "cat1_self": {"sel": "header.page-header h1 span"},
        # entry links (latestnews1.py:54)
        "entry": {
            "sel": "#content .article-container article div"
                   " .entry-content.clearfix a",
        },
        # next page: select_one('#content .content a') (latestnews1.py:60)
        "next": {"sel": "#content .content a", "attr": "href"},
        # pagination gate: the LAST article's published datetime attr,
        # page-level — entries themselves are yielded unconditionally
        # (latestnews1.py:62-68)
        "page_time": {
            "sel": ".article-container article .posted-on"
                   " .entry-date.published",
            "index": -1, "attr": "datetime",
        },
        # parse_detail: soup.select('.error404') → log + return
        # (latestnews1.py:75-77)
        "skip_if": {"sel": ".error404"},
        "title": {"sel": "#content .entry-header h1"},
        "pub": {"sel": ".below-entry-meta .posted-on time",
                "attr": "datetime"},
        "block": {
            "para_sel": ".entry-content.clearfix p",
            "img_sel": ".entry-content.clearfix .wp-block-image img",
        },
        # no <p> body: the whole container's text, trimmed to the segment
        # between the share-widget labels (latestnews1.py:90-96; the
        # reference regex runs on raw text, ours on whitespace-normalized)
        "body_fallback": {
            "sel": "#content article div .entry-content.clearfix",
            "re": r"LinkedIn(.*?) Share",
        },
    },
}


def _iso_tz(dt: datetime) -> str:
    return f"{dt:%Y-%m-%dT%H:%M:%S}+05:30"


def _build_latestnews1(g: _G) -> None:
    host = "www.latestnews1.com"
    wid = 936  # latestnews1.py:27
    g.registry[wid] = dict(LATESTNEWS1_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/", "website_id": wid,
                    "language_id": 1930})
    # Menu: Home first (sliced off — /home/ must never appear in the crawl
    # log), then two real categories. The menu labels ('IN', 'WD') are
    # DELIBERATELY different from the list pages' own headers so the docs
    # prove cat1_self overrode them.
    g.page(
        f"{base}/", "menu",
        '<html><body><div id="header-text-nav-container">'
        '<div class="inner-wrap clearfix"><ul id="menu-menu-1">'
        f'<li><a href="{base}/home/">Home</a></li>'
        f'<li><a href="{base}/category/india/">IN</a></li>'
        f'<li><a href="{base}/category/world/">WD</a></li>'
        "</ul></div></div></body></html>",
        host,
    )
    cats = [("india", "India News"), ("world", "World News")]
    for ci, (slug, header) in enumerate(cats):
        for p in range(2):
            lurl = (f"{base}/category/{slug}/"
                    + (f"page/{p + 1}/" if p else ""))
            # Page 0's last datetime is fresh (gate passes → page/2
            # queued); page/2's is 3 days old (gate fails → the page/3
            # link below is never followed).
            page_dt = BASE_DT - timedelta(days=3 * p, hours=ci)
            arts = []
            for e in range(2):
                dt = page_dt - timedelta(minutes=20 * e)
                aurl = f"{base}/{slug}-story-{p}-{e}/"
                arts.append(
                    "<article><div>"
                    '<div class="entry-content clearfix">'
                    f'<a href="{aurl}">{slug} list {p}-{e}</a></div></div>'
                    '<div class="posted-on">'
                    f'<time class="entry-date published"'
                    f' datetime="{_iso_tz(dt)}">x</time></div></article>'
                )
                if slug == "india" and p == 0 and e == 1:
                    # SOFT 404: the server answers 200 with an error
                    # template — fetched + logged, but no document.
                    g.page(
                        aurl, "article",
                        '<html><body class="error404"><div id="content">'
                        "<p>Page not found</p></div></body></html>",
                        host,
                    )
                    continue
                if slug == "world" and p == 0 and e == 1:
                    # Fallback body: no <p> in the container — the doc's
                    # body/abstract come from the LinkedIn…Share trim.
                    g.page(
                        aurl, "article",
                        '<html><body><div id="content"><article>'
                        '<div class="entry-header"><h1>World story '
                        f"{p}-{e}</h1></div><div>"
                        '<div class="entry-content clearfix">'
                        "<span>Share</span><span>n7</span>"
                        "<span>LinkedIn</span>world fallback body text"
                        ' <span>Share</span></div></div>'
                        '<div class="below-entry-meta"><div class="posted-on">'
                        f'<time class="entry-date" datetime="{_iso_tz(dt)}">'
                        "x</time></div></div></article></div></body></html>",
                        host,
                    )
                    continue
                paras = "".join(
                    f"<p>{slug} body {p}-{e}-{k}</p>" for k in range(2)
                )
                g.page(
                    aurl, "article",
                    '<html><body><div id="content"><article>'
                    f'<div class="entry-header"><h1>{header.split()[0]}'
                    f" story {p}-{e}</h1></div><div>"
                    '<div class="entry-content clearfix">'
                    f"{paras}"
                    '<div class="wp-block-image">'
                    f'<img src="{base}/wp/{slug}{p}{e}.jpg"/></div></div>'
                    '</div><div class="below-entry-meta">'
                    '<div class="posted-on"><time class="entry-date"'
                    f' datetime="{_iso_tz(dt)}">x</time></div></div>'
                    "</article></div></body></html>",
                    host,
                )
            nav = (
                '<div class="content">'
                f'<a href="{base}/category/{slug}/page/{p + 2}/">'
                "Older Posts</a></div>"
            )
            g.page(
                lurl, "list",
                '<html><body><div id="content">'
                '<header class="page-header"><h1>'
                f"<span>{header}</span></h1></header>"
                f'<div class="article-container">{"".join(arts)}</div>'
                f"{nav}</div></body></html>",
                host,
            )


def _build_hatawtabloid(g: _G) -> None:
    host = "www.hatawtabloid.com"
    wid = 532
    g.registry[wid] = dict(HATAW_RULES)
    base = f"https://{host}"
    # Two of the reference's eight category seeds; each is its own
    # seed-to-list chain (hatawtabloid.py:15-21,39-41).
    cats = [("news", "News"), ("sports", "Sports")]
    # Entry ages (hours before BASE_DT) per category per page; the 36 h
    # cutoff trips mid-page-3 for news (page/4 never fetched) and
    # mid-page-2 for sports (page/3 never fetched).
    ages = {
        "news": [[0, 2], [26, 28], [50, 52]],
        "sports": [[12, 14], [30, 38], [54, 56]],
    }
    for slug, label in cats:
        cat_url = f"{base}/category/{slug}/"
        g.seeds.append({"url": cat_url, "website_id": wid,
                        "language_id": 2117})
        for p, page_ages in enumerate(ages[slug], start=1):
            lurl = cat_url if p == 1 else f"{base}/category/{slug}/page/{p}"
            arts = []
            for e, age in enumerate(page_ages):
                dt = BASE_DT - timedelta(hours=age)
                dtxt = (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                        f" {dt.hour:02d}:{dt.minute:02d}")
                aurl = f"{base}/{slug}-story-{p}-{e}/"
                js = f"{aurl}#x"
                arts.append(
                    "<article>"
                    + _jumble(js + "h2", "h2", [("class", "post-box-title")])
                    + _jumble(js + "a", "a", [("href", aurl)])
                    + f"Hataw {slug} {p}-{e}</a></h2>"
                    + _jumble(js + "pm", "p", [("class", "post-meta")])
                    + f'<span class="tie-date">{dtxt}</span></p></article>'
                )
                crumbs = "".join(
                    f"<span><a>{t}</a></span>"
                    for t in ("Home", "Hataw Tabloid", label)
                )
                g.page(
                    aurl, "article",
                    "<html><body>"
                    + _jumble(js + "mc", "div", [("id", "main-content")])
                    + "<div><article><div>"
                    + _jumble(js + "bc", "p", [("class", "breadcrumbs")])
                    + crumbs + "</p>"
                    + _jumble(js + "t", "h1",
                              [("class", "post-title entry-title")])
                    + f"Hataw {slug} headline {p}-{e}</h1>"
                    + _jumble(js + "m2", "p", [("class", "post-meta")])
                    + f'<span class="author">By Staff</span>'
                    f'<span class="date">{dtxt}</span></p>'
                    + _jumble(js + "th", "div",
                              [("class", "single-post-thumb")])
                    + _jumble(js + "im", "img",
                              [("src", f"{base}/th/{slug}{p}{e}.jpg")])
                    + "</div>"
                    + _jumble(js + "en", "div", [("class", "entry")])
                    + f"<p>hataw {slug} lead {p}-{e}</p>"
                    f"<p>hataw {slug} body {p}-{e}</p>"
                    "</div></div></article></div></div></body></html>",
                    host,
                )
                g.pages[(aurl, "GET", "")]["required_cookie"] = HATAW_COOKIE
            g.page(
                lurl, "list",
                "<html><body>"
                + _jumble(lurl + "pl", "div", [("class", "post-listing")])
                + "".join(arts) + "</div></body></html>",
                host,
            )
            g.pages[(lurl, "GET", "")]["required_cookie"] = HATAW_COOKIE


# ---------------------------------------------------------------------------
# clickthecity — per-LABEL menu dispatch (Events/Campus route to a /page/N
# path chain bootstrapped with a dont_filter self-request; every other
# label to a next-link chain), abstract carry-forward across list entries
# (Scrapy meta-snapshot semantics), composite date+time pub spans, lead
# image + in-body figure images via a selector-list block
# (已部署/clickthecity.py)
# ---------------------------------------------------------------------------

CLICKTHECITY_RULES = {
    "rule": NEXT_LINK,  # parse_category2's a.page-numbers.next chain
    "format": "html",
    "title_priority": "page",  # clickthecity.py:125 reads the article h1
    "article_pub_priority": "page",
    # parse_special_2/parse_category2 mutate ONE meta dict per entry and
    # Scrapy snapshots it at Request construction, so each article carries
    # the LAST abstract seen so far and the next page inherits the final
    # value (clickthecity.py:75-80,101-105)
    "abstract_carry": True,
    # parse() dispatches by menu LABEL: 'Events'/'Campus' →
    # parse_special_1's /page/N path chain (bootstrapped dont_filter),
    # everything else → parse_category2 (clickthecity.py:40-52); label ≡
    # URL slug, so URL dispatch expresses it
    "rule_variants": [
        {"match": r"clickthecity\.com/(events|campus)/",
         "rule": PAGE_PATH, "path_bootstrap": True},
    ],
    "extract": {
        # parse(): ul li>a with span labels; 'Privileges' skipped
        # (clickthecity.py:38-42)
        "category": {"sel": "ul.menu-ctc li a"},
        "excluded_labels": ["Privileges"],
        "variants": [
            # the special (/page/N) list markup: div#blog-entries article
            # (clickthecity.py:70-85)
            {"match": r"/(events|campus)/page/",
             "entry": {
                 "sel": "#blog-entries article",
                 "fields": {
                     "href": {"sel": "h2.blog-entry-title.entry-title a",
                              "attr": "href"},
                     "abstract": {"sel": ".blog-entry-summary.clr p"},
                 },
             },
             # continues while the page has entries AND the LAST entry's
             # date passes the cutoff (clickthecity.py:80-93; a missing
             # date div kills pagination — ddl=None → stop)
             "more": {"sel": "#blog-entries article"},
             "page_time": {"sel": "#blog-entries article"
                                  " .blog-entry-date.clr", "index": -1}},
        ],
        # parse_category2's elementor list markup (clickthecity.py:97-105)
        "entry": {
            "sel": ".elementor-widget-container article",
            "fields": {
                "href": {"sel": "h3.elementor-post__title a",
                         "attr": "href"},
                "abstract": {"sel": ".elementor-post__excerpt p"},
            },
        },
        "next": {"sel": "a.page-numbers.next", "attr": "href"},
        "page_time": {"sel": "span.elementor-post-date", "index": -1},
        # article (parse_category3, clickthecity.py:120-155)
        "title": {"sel": ".elementor-widget-container h1"},
        # composite pub: the --type-date span + the regex-trimmed
        # --type-time span ('10:15 am' → '10:15'); no time span ⇒ date
        # alone (clickthecity.py:138-155)
        "pub": {"sel": "span.elementor-post-info__item--type-date"},
        "pub2": {"sel": "span.elementor-post-info__item--type-time",
                 "re": r"(.*?) .*?m.*?"},
        # lead select_one('div.elementor-image img') first, then every
        # in-body 'figure img' (clickthecity.py:128-136) — a selector
        # LIST, merged in document order by the tree walk
        "block": {
            "para_sel": ".elementor-widget-container p",
            "img_sel": [".elementor-image img",
                        ".elementor-widget-container figure img"],
        },
    },
}


def _ctc_date(dt: datetime) -> str:
    return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"


def _ctc_article(g: _G, base: str, host: str, slug: str, tag: str,
                 dt: datetime, with_time: bool = True) -> str:
    url = f"{base}/{slug}-story-{tag}/"
    time_span = (
        '<span class="elementor-icon-list-text elementor-post-info__item'
        ' elementor-post-info__item--type-time">10:15 am PHT</span>'
        if with_time else ""
    )
    g.page(
        url, "article",
        "<html><body>"
        f'<div class="elementor-image"><img src="{base}/img/{slug}{tag}'
        'lead.jpg"/></div>'
        '<div class="elementor-widget-container">'
        f"<h1>{slug.capitalize()} story {tag}</h1>"
        f"<p>{slug} para {tag}-0</p>"
        f'<figure><img src="{base}/img/{slug}{tag}fig.jpg"/></figure>'
        f"<p>{slug} para {tag}-1</p></div>"
        '<span class="elementor-icon-list-text elementor-post-info__item'
        f' elementor-post-info__item--type-date">{_ctc_date(dt)}</span>'
        f"{time_span}</body></html>",
        host,
    )
    return url


def _build_clickthecity(g: _G) -> None:
    host = "www.clickthecity.com"
    wid = 1248  # clickthecity.py:17
    g.registry[wid] = dict(CLICKTHECITY_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        f"{base}/", "menu",
        '<html><body><ul class="menu-ctc">'
        f'<li><a href="/privileges/"><span>Privileges</span></a></li>'
        f'<li><a href="/events/"><span>Events</span></a></li>'
        f'<li><a href="/campus/"><span>Campus</span></a></li>'
        f'<li><a href="/food/"><span>Food</span></a></li>'
        "</ul></body></html>",
        host,
    )
    # -- special route: category ROOT pages parse nothing (bootstrap only)
    for slug in ("events", "campus"):
        g.page(f"{base}/{slug}/", "list",
               "<html><body><div>landing</div></body></html>", host)

    def special_list(slug: str, page: int, dts: list[datetime],
                     first_abstract: bool) -> None:
        arts = []
        for e, dt in enumerate(dts):
            aurl = _ctc_article(g, base, host, slug, f"{page}-{e}", dt)
            summary = (
                f'<div class="blog-entry-summary clr"><p>{slug} abstract'
                f" {page}-{e}</p></div>"
                if first_abstract and e == 0 else ""
            )
            arts.append(
                "<article>"
                f'<h2 class="blog-entry-title entry-title">'
                f'<a href="{aurl}">{slug} list {page}-{e}</a></h2>'
                f"{summary}"
                f'<div class="blog-entry-date clr">{_ctc_date(dt)}</div>'
                "</article>"
            )
        g.page(
            f"{base}/{slug}/page/{page}", "list",
            '<html><body><div id="blog-entries">' + "".join(arts)
            + "</div></body></html>",
            host,
        )

    # events: page/1 fresh (last date ≥ cutoff → page/2 fetched), page/2's
    # last date 3+ days old (→ page/3 never requested)
    special_list("events", 1, [BASE_DT, BASE_DT - timedelta(hours=2)], True)
    special_list("events", 2,
                 [BASE_DT - timedelta(days=3),
                  BASE_DT - timedelta(days=3, hours=2)], True)
    # campus: page/1's last date is already old → the chain stops at once
    special_list("campus", 1, [BASE_DT - timedelta(days=4)], True)

    # -- next-link route (Food): elementor list markup
    def food_list(url: str, page: int, dts: list[datetime],
                  next_url: str | None) -> None:
        arts = []
        for e, dt in enumerate(dts):
            aurl = _ctc_article(g, base, host, "food", f"{page}-{e}", dt,
                                with_time=(e == 0))
            excerpt = (
                f'<div class="elementor-post__excerpt"><p>food excerpt'
                f" {page}-{e}</p></div>" if e == 0 else ""
            )
            arts.append(
                "<article>"
                f'<h3 class="elementor-post__title">'
                f'<a href="{aurl}">food list {page}-{e}</a></h3>'
                f"{excerpt}"
                f'<span class="elementor-post-date">{_ctc_date(dt)}</span>'
                "</article>"
            )
        nav = (f'<a class="page-numbers next" href="{next_url}">Next</a>'
               if next_url else "")
        g.page(
            url, "list",
            '<html><body><div class="elementor-widget-container">'
            + "".join(arts) + f"</div>{nav}</body></html>",
            host,
        )

    food_list(f"{base}/food/", 1,
              [BASE_DT - timedelta(hours=1), BASE_DT - timedelta(hours=3)],
              f"{base}/food/page-2/")
    # page-2's last date is old: the page-3 link exists but the gate stops
    food_list(f"{base}/food/page-2/", 2,
              [BASE_DT - timedelta(days=4),
               BASE_DT - timedelta(days=4, hours=2)],
              f"{base}/food/page-3/")


# ---------------------------------------------------------------------------
# coconuts — TWO-level menus with the SAME exclusion list at both levels,
# a /page/1/ dont_filter bootstrap on EVERY second-level landing page
# (parse_category3), page-level-only time gating (every fetched page's
# entries become articles, even past the cutoff), iframes-as-media inside
# body paragraphs with the figure image appended LAST
# (已部署/coconuts.py)
# ---------------------------------------------------------------------------

COCONUTS_RULES = {
    "rule": PAGE_PATH,  # parse_category4's url + 'page/' + N advance
    "format": "html",
    "title_priority": "page",  # coconuts.py:94-95 reads the article h1
    "article_pub_priority": "page",
    "menu_child_kind": "menu2",  # parse → parse_category2 (two levels)
    # parse_category3 parses NOTHING on the category landing — it emits
    # only its own /page/1 request with dont_filter=True
    # (coconuts.py:54-61); every list URL takes the same chain.
    "rule_variants": [
        {"match": r"coconuts\.co/", "path_bootstrap": True},
    ],
    "extract": {
        # parse(): ul.main-menu li a labels (coconuts.py:33-40)
        "category": {"sel": "ul.main-menu.list-float li a"},
        # parse_category2(): the global navbar links (coconuts.py:44-52);
        # the SAME label exclusions apply at both menu levels
        # (coconuts.py:36,47)
        "category2": {
            "sel": "ul.global-navbar__links-main.global-navbar__links"
                   " li a",
        },
        "excluded_labels": ["Join COCO+", "Newsletters", "SHOP"],
        # parse_category4(): div.co-river__entry links; NO per-entry time
        # gate — every entry of a fetched page is requested, the cutoff
        # decides only whether page N+1 is fetched, off the LAST entry's
        # <time> text (coconuts.py:69-78)
        "entry": {"sel": "div.co-river__entry a.today-news-link"},
        "more": {"sel": "div.co-river__entry"},
        "page_time": {"sel": "div.co-river__entry time", "index": -1},
        # parse_category5(): h1.post-title, div.post-body paragraphs with
        # in-paragraph IFRAMES collected as media, then the figure image
        # appended after the body loop (coconuts.py:94-107); pub from the
        # time.post-timeago datetime attribute → format_time2
        # (coconuts.py:108-111)
        "title": {"sel": "h1.post-title"},
        "pub": {"sel": "time.post-timeago", "attr": "datetime"},
        "block": {
            "para_sel": "div.post-body p",
            "img_sel": ["div.post-body p iframe", "figure img"],
        },
    },
}


def _coco_date(dt: datetime) -> str:
    return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
            f" {dt.hour:02d}:{dt.minute:02d}")


def _coco_article(g: _G, base: str, host: str, slug: str, tag: str,
                  dt: datetime) -> str:
    url = f"{base}/{slug}-news-{tag}/"
    g.page(
        url, "article",
        "<html><body>"
        f'<h1 class="post-title">{slug.capitalize()} news {tag}</h1>'
        '<div class="post-body">'
        f"<p>{slug} para {tag}-0 "
        f'<iframe src="{base}/embed/{slug}{tag}.mp4"></iframe></p>'
        f"<p>{slug} para {tag}-1</p></div>"
        f'<figure><img src="{base}/img/{slug}{tag}.jpg"/></figure>'
        f'<time class="post-timeago" datetime="{_coco_date(dt)}">ago'
        "</time></body></html>",
        host,
    )
    return url


def _build_coconuts(g: _G) -> None:
    host = "coconuts.co"
    wid = 1247  # coconuts.py:14
    g.registry[wid] = dict(COCONUTS_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        f"{base}/", "menu",
        '<html><body><ul class="main-menu list-float">'
        '<li><a href="/plus/">Join COCO+</a></li>'
        '<li><a href="/bangkok/">Bangkok</a></li>'
        '<li><a href="/manila/">Manila</a></li>'
        '<li><a href="/shop/">SHOP</a></li>'
        "</ul></body></html>",
        host,
    )
    # second-level menus (the navbar); Newsletters excluded at THIS level
    g.page(
        f"{base}/bangkok/", "menu2",
        "<html><body>"
        '<ul class="global-navbar__links-main global-navbar__links">'
        '<li><a href="/bangkok/news/">News</a></li>'
        '<li><a href="/newsletters/">Newsletters</a></li>'
        "</ul></body></html>",
        host,
    )
    g.page(
        f"{base}/manila/", "menu2",
        "<html><body>"
        '<ul class="global-navbar__links-main global-navbar__links">'
        '<li><a href="/manila/news/">News</a></li>'
        "</ul></body></html>",
        host,
    )
    # category landings: nothing to parse — bootstrap-only pages
    for c in ("bangkok", "manila"):
        g.page(f"{base}/{c}/news/", "list",
               "<html><body><div>landing</div></body></html>", host)

    def coco_list(slug: str, page: int, dts: list[datetime]) -> None:
        entries = []
        for e, dt in enumerate(dts):
            aurl = _coco_article(g, base, host, slug, f"{page}-{e}", dt)
            entries.append(
                '<div class="co-river__entry">'
                f'<a class="today-news-link" href="{aurl}">'
                f"{slug} entry {page}-{e}</a>"
                f"<time>{_coco_date(dt)}</time></div>"
            )
        g.page(f"{base}/{slug}/news/page/{page}", "list",
               "<html><body>" + "".join(entries) + "</body></html>", host)

    # bangkok: page 1 fresh (last entry ≥ cutoff → page 2 fetched);
    # page 2's entries are OLD yet still stored (no per-entry gate) and
    # its last entry kills page 3
    coco_list("bangkok", 1, [BASE_DT - timedelta(hours=2),
                             BASE_DT - timedelta(hours=4)])
    coco_list("bangkok", 2, [BASE_DT - timedelta(days=3),
                             BASE_DT - timedelta(days=4)])
    # manila: the first page's only entry is old → stored, chain stops
    coco_list("manila", 1, [BASE_DT - timedelta(days=5)])


# ---------------------------------------------------------------------------
# parstoday — one-level menu mixing label AND slug exclusions (the bare
# '/' link + 'Products'), ?page=N pagination off the BARE category URL
# (no bootstrap page), unconditional entry yield with a last-entry page
# gate, single lead image, introtext-vs-first-paragraph abstract
# (已部署/parstoday.py)
# ---------------------------------------------------------------------------

PARSTODAY_RULES = {
    "rule": PAGE_PARAM,  # parse2: meta['url'] + '?page=' + N
    "format": "html",
    "title_priority": "page",  # parse_news reads .item-title
    "article_pub_priority": "page",
    "extract": {
        # parse(): '#menu > div > div > div > ul > li' anchors; the bare
        # '/' link and the 'Products' label are skipped
        # (parstoday.py:31-35)
        "category": {"sel": "#menu > div > div > div > ul > li a"},
        "excluded_labels": ["Products"],
        "excluded_slugs": [""],  # url != '/' — '' is '/'.split('/')[-1]
        # parse2(): itemlist entries, yielded UNCONDITIONALLY; the LAST
        # entry's div.date text gates ?page=N+1 (parstoday.py:39-49)
        "entry": {
            "sel": "#itemlist > div > div.panel-body.items > ul > li a",
        },
        "more": {"sel": "#itemlist > div > div.panel-body.items > ul > li"},
        "page_time": {
            "sel": "#itemlist > div > div.panel-body.items > ul > li"
                   " div.date",
            "index": -1,
        },
        # parse_news(): .item-title / .item-date / one .item-media lead
        # image / .item-text paragraphs / .introtext abstract with
        # first-body-line fallback (parstoday.py:56-62)
        "title": {"sel": ".item-title"},
        "pub": {"sel": ".item-date"},
        "abstract": {"sel": ".introtext"},
        "block": {
            "para_sel": ".item-text p",
            "img_sel": ".item-media img",
        },
    },
}


def _build_parstoday(g: _G) -> None:
    host = "parstoday.com"
    wid = 1155  # parstoday.py:13
    g.registry[wid] = dict(PARSTODAY_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/hi", "website_id": wid,
                    "language_id": 1930})
    g.page(
        f"{base}/hi", "menu",
        '<html><body><div id="menu"><div><div><div><ul>'
        '<li><a href="/">Home</a></li>'
        f'<li><a href="{base}/hi/world">World</a></li>'
        f'<li><a href="{base}/hi/sports">Sports</a></li>'
        '<li><a href="/products">Products</a></li>'
        "</ul></div></div></div></div></body></html>",
        host,
    )

    def pars_article(slug: str, tag: str, dt: datetime,
                     introtext: bool) -> str:
        url = f"{base}/hi/{slug}/item/{tag}"
        intro = ('<div class="introtext">intro for '
                 f"{slug} {tag}</div>" if introtext else "")
        g.page(
            url, "article",
            "<html><body>"
            f'<div class="item-title">{slug.capitalize()} item {tag}</div>'
            f'<div class="item-date">{_coco_date(dt)}</div>'
            f'<div class="item-media"><img src="{base}/img/{slug}{tag}.jpg"'
            "/></div>"
            f"{intro}"
            f'<div class="item-text"><p>{slug} body {tag}-0</p>'
            f"<p>{slug} body {tag}-1</p></div>"
            "</body></html>",
            host,
        )
        return url

    def pars_list(slug: str, url: str, page: int,
                  dts: list[datetime]) -> None:
        lis = []
        for e, dt in enumerate(dts):
            aurl = pars_article(slug, f"{page}-{e}", dt,
                                introtext=(e == 0))
            lis.append(
                f'<li><a href="{aurl}">{slug} {page}-{e}</a>'
                f'<div class="date">{_coco_date(dt)}</div></li>'
            )
        g.page(
            url, "list",
            '<html><body><div id="itemlist"><div>'
            '<div class="panel-body items"><ul>' + "".join(lis)
            + "</ul></div></div></div></body></html>",
            host,
        )

    # world: bare category URL is page 1; its last entry is fresh →
    # ?page=2 fetched; page 2's old entries still stored, chain stops
    pars_list("world", f"{base}/hi/world", 1,
              [BASE_DT - timedelta(hours=1), BASE_DT - timedelta(hours=3)])
    pars_list("world", f"{base}/hi/world?page=2", 2,
              [BASE_DT - timedelta(days=3), BASE_DT - timedelta(days=4)])
    # sports: one old entry → stored, no ?page=2
    pars_list("sports", f"{base}/hi/sports", 1,
              [BASE_DT - timedelta(days=5)])


# ---------------------------------------------------------------------------
# bworldonline — menu links filtered by an href PREFIX selector,
# category1/category2 derived from the list URL's path segments, a grid of
# unprobed articles on the HTML category page, then a form-POST API chain
# (admin-ajax.php) bootstrapped with a category_id scraped off the page
# text, JSON wrapping HTML under 'server_reply_html_data', and pagination
# decided by a dont_filter probe of each API page's LAST entry that
# re-POSTs the form with its page field bumped
# (已部署/bworldonline.py)
# ---------------------------------------------------------------------------

BWORLD_API_URL = ("https://www.bworldonline.com/wp-admin/admin-ajax.php"
                  "?td_theme_name=Newsmag&v=3.3.1")  # bworldonline.py:32

# the spider's class-level form dict minus the scraped/advanced fields
# (bworldonline.py:21-31)
BWORLD_FIXED = {
    "action": "td_ajax_loop",
    "loopState[sidebarPosition]": "",
    "loopState[moduleId]": "td_module_category_list",
    "loopState[max_num_pages]": "0",
    "loopState[atts][offset]": "3",
    "loopState[ajax_pagination_infinite_stop]": "0",
    "loopState[server_reply_html_data]": "",
}

BWORLD_RULES = {
    "rule": FORM_PAGE,
    "format": "html",
    "title_priority": "page",  # parse_item reads .entry-title
    "article_pub_priority": "page",
    "api_format": "json_html",  # parse2: json.loads(...)['server_reply...']
    "json_html_key": "server_reply_html_data",
    # parse1: category1/2 = response.url.split('/')[4]/[5]
    # (bworldonline.py:45-49); a one-segment category yields '' for
    # category2, exactly list[5] of '/category/<c1>/'
    "cat1_url_re": r"/category/([^/]+)",
    "cat2_url_re": r"/category/[^/]+/([^/]*)",
    # parse1 → FormRequest(self.url, formdata=data) with the scraped
    # category_id and currentPage still at its class-dict value '1'
    # (bworldonline.py:53-56); parse_time advances 'loopState[currentPage]'
    # (bworldonline.py:71-73)
    "form_api_url": BWORLD_API_URL,
    "form_fixed_params": BWORLD_FIXED,
    "form_param_map": {"cat_id": "loopState[atts][category_id]"},
    "form_page_param": "loopState[currentPage]",
    "form_start_page": 1,
    # only the API feed pages probe their last entry (parse2,
    # bworldonline.py:62-65); the HTML grid yields everything
    "probe_last": "api",
    "extract": {
        # parse(): menu anchors filtered to category links by href prefix
        # (bworldonline.py:40)
        "category": {
            "sel": '#menu-main-menu > li >'
                   ' a[href^="https://www.bworldonline.com/category/"]',
        },
        # parse1(): the big-grid article links (bworldonline.py:50)
        "entry": {
            "sel": ".td-pb-span12 .td-big-grid-wrapper"
                   " .td-module-thumb > a",
        },
        # the scraped form field (bworldonline.py:54) — regex over raw
        # page text, mapped onto loopState[atts][category_id]
        "form_params": r"'category_id':(?P<cat_id>\d+)",
        "variants": [
            # parse2(): the API fragment's module list markup
            # (bworldonline.py:62)
            {"match": r"admin-ajax\.php",
             "entry": {
                 "sel": ".td_module_category_list.td_module_wrap"
                        ".td-meta-info-hide .td-module-thumb > a",
             }},
        ],
        # parse_item(): .entry-title; body = '.column-meta ~ p' siblings;
        # single featured image; pub off '.td-post-date > time'
        # (bworldonline.py:81-93)
        "title": {"sel": ".entry-title"},
        "pub": {"sel": ".td-post-date > time"},
        "block": {
            "para_sel": ".td-post-content-area .column-meta ~ p",
            "img_sel": ".td-post-content-area .td-post-featured-image img",
        },
    },
}


def _bworld_body(cat_id: str, page: int) -> str:
    """The exact engine-built form body: fixed fields + scraped
    category_id + the page counter, '&'-joined in sorted key order."""
    params = dict(BWORLD_FIXED)
    params["loopState[atts][category_id]"] = cat_id
    params["loopState[currentPage]"] = str(page)
    return "&".join(f"{k}={v}" for k, v in sorted(params.items()))


def _build_bworldonline(g: _G) -> None:
    host = "www.bworldonline.com"
    wid = 191  # bworldonline.py:11
    g.registry[wid] = dict(BWORLD_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": f"{base}/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        f"{base}/", "menu",
        '<html><body><ul id="menu-main-menu">'
        f'<li><a href="{base}/about/">About</a></li>'
        f'<li><a href="{base}/category/economy/banking/">Banking</a></li>'
        f'<li><a href="{base}/category/corporate/">Corporate</a></li>'
        "</ul></body></html>",
        host,
    )

    def bw_article(slug: str, tag: str, dt: datetime) -> str:
        url = f"{base}/{slug}-report-{tag}/"
        g.page(
            url, "article",
            "<html><body>"
            f'<h1 class="entry-title">{slug.capitalize()} report {tag}</h1>'
            '<div class="td-post-date"><time>'
            f"{_coco_date(dt)}</time></div>"
            '<div class="td-post-content-area">'
            '<div class="td-post-featured-image">'
            f'<img src="{base}/img/{slug}{tag}.jpg"/></div>'
            '<div class="column-meta">meta</div>'
            f"<p>{slug} para {tag}-0</p><p>{slug} para {tag}-1</p>"
            "</div></body></html>",
            host,
        )
        return url

    def bw_grid_page(cat_path: str, slug: str, cat_id: str,
                     dts: list[datetime]) -> None:
        links = "".join(
            '<div class="td-module-thumb">'
            f'<a href="{bw_article(slug, f"g-{e}", dt)}">g{e}</a></div>'
            for e, dt in enumerate(dts)
        )
        g.page(
            f"{base}/category/{cat_path}/", "list",
            "<html><body>"
            f"<script>var x = {{'category_id':{cat_id}}};</script>"
            '<div class="td-pb-span12"><div class="td-big-grid-wrapper">'
            f"{links}</div></div></body></html>",
            host,
        )

    def bw_api_page(slug: str, cat_id: str, page: int,
                    dts: list[datetime]) -> None:
        links = "".join(
            '<div class="td-module-thumb">'
            f'<a href="{bw_article(slug, f"{page}-{e}", dt)}">a{e}</a>'
            "</div>"
            for e, dt in enumerate(dts)
        )
        frag = ('<div class="td_module_category_list td_module_wrap'
                f' td-meta-info-hide">{links}</div>')
        g.page(
            BWORLD_API_URL, "api",
            json.dumps({"server_reply_html_data": frag}),
            host, method="POST", body=_bworld_body(cat_id, page),
        )

    # banking (two-segment category → category2='banking'): grid of 2
    # fresh articles; API page 1's probe (last entry) is fresh → page 2;
    # page 2's probe is old → stop (the probe itself is still stored)
    bw_grid_page("economy/banking", "banking", "77",
                 [BASE_DT - timedelta(hours=1),
                  BASE_DT - timedelta(hours=2)])
    bw_api_page("banking", "77", 1,
                [BASE_DT - timedelta(hours=5),
                 BASE_DT - timedelta(hours=6),
                 BASE_DT - timedelta(hours=7)])
    bw_api_page("banking", "77", 2,
                [BASE_DT - timedelta(days=3),
                 BASE_DT - timedelta(days=3, hours=1),
                 BASE_DT - timedelta(days=4)])
    # corporate (one-segment category → category2=''): grid of 1, API
    # page 1's probe already old → chain stops at once
    bw_grid_page("corporate", "corporate", "88",
                 [BASE_DT - timedelta(hours=3)])
    bw_api_page("corporate", "88", 1,
                [BASE_DT - timedelta(hours=4),
                 BASE_DT - timedelta(days=5)])


# ---------------------------------------------------------------------------
# raftaar — nested one-page two-level menu instantiating templated API
# collection URLs (composed '<sub>-<top>' slugs, off-site links skipped),
# offset pagination starting at 20 bounded by the response's total-count,
# epoch-millisecond timestamps, API-fed titles, image-less articles
# (已部署/raftaar.py)
# ---------------------------------------------------------------------------

RAFTAAR_BASE = "https://news.raftaar.in"
RAFTAAR_API = (RAFTAAR_BASE + "/api/v1/collections/{collection}"
               "?item-type=story&offset={offset}&limit=20")  # raftaar.py:29

RAFTAAR_RULES = {
    "rule": API_OFFSET,
    "format": "html",
    "api_format": "json",  # raftaar.py:53: collections endpoint is JSON
    "date_style": "epoch_ms",  # raftaar.py:56: last-published-at in ms
    "menu_api_template": RAFTAAR_API,
    "menu_api_start_offset": 20,  # raftaar.py:37: offset STARTS at 20
    "api_offset_step": 20,  # raftaar.py:67
    "menu_link_re": r"https://news\.raftaar\.in",  # raftaar.py:43
    # The API's real schema walked by field paths (raftaar.py:55-60)
    "api_map": {
        "entries": "items",
        "href": ("story", "slug"),
        "href_prefix": RAFTAAR_BASE + "/",  # raftaar.py:60
        "title": ("item", "headline", 0),  # raftaar.py:58
        "time": ("story", "last-published-at"),
        "total": "total-count",  # raftaar.py:68
    },
    "extract": {
        # parse: top nav li with nested sub-menus (raftaar.py:34-47)
        "category": {
            "sel": "div.header-one-m__default-menu__1eHwj>ul>li",
            "link_sel": "a",
            "children_sel": "ul a",
        },
        # parse_item: body = abstract = the single wrapper paragraph
        # (raftaar.py:77-78); no images (py:79)
        "block": {"para_sel": ".element-wrapper p"},
    },
}


def _epoch_ms(dt: datetime) -> int:
    return int((dt - datetime(1970, 1, 1)).total_seconds() * 1000)


def _build_raftaar(g: _G) -> None:
    host = "news.raftaar.in"
    wid = 1052
    g.registry[wid] = dict(RAFTAAR_RULES)
    g.seeds.append({"url": RAFTAAR_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(
        RAFTAAR_BASE + "/", "menu",
        '<html><div class="header-one-m__default-menu__1eHwj"><ul>'
        f'<li><a href="{RAFTAAR_BASE}/india">India</a><ul>'
        f'<li><a href="{RAFTAAR_BASE}/politics">Politics</a></li>'
        '<li><a href="https://hindi.example.com/feeds">Partner</a></li>'
        "</ul></li>"
        f'<li><a href="{RAFTAAR_BASE}/world">World</a><ul>'
        f'<li><a href="{RAFTAAR_BASE}/cricket">Cricket</a></li>'
        "</ul></li>"
        "</ul></div></html>",
        host,
    )

    def rf_api_page(collection: str, offset: int, total: int,
                    dts: list[datetime]) -> None:
        items = []
        for i, dt in enumerate(dts):
            slug = f"{collection}/art-{offset}-{i}"
            items.append({
                "item": {"headline": [f"Raftaar {collection} {offset}-{i}"]},
                "story": {"slug": slug,
                          "last-published-at": _epoch_ms(dt)},
            })
            g.page(
                f"{RAFTAAR_BASE}/{slug}", "article",
                '<html><div class="element-wrapper">'
                f"<p>raftaar body {collection} {offset}-{i}</p>"
                "</div></html>",
                host,
            )
        g.page(
            RAFTAAR_API.format(collection=collection, offset=offset),
            "api",
            json.dumps({"items": items, "total-count": total}),
            host,
        )

    h = timedelta(hours=1)
    # india: 3 offset pages; the third's first item is stale → '时间截止'
    rf_api_page("india", 20, 65,
                [BASE_DT - 1 * h, BASE_DT - 2 * h, BASE_DT - 3 * h])
    rf_api_page("india", 40, 65, [BASE_DT - 4 * h, BASE_DT - 5 * h])
    rf_api_page("india", 60, 65, [BASE_DT - timedelta(days=5)])
    # politics-india (composed sub slug): one page, total bound stops at 40
    rf_api_page("politics-india", 20, 30,
                [BASE_DT - 7 * h, BASE_DT - 8 * h])
    # world: second item is 40 h old → cutoff trips mid-page; total would
    # have allowed more pages (the time gate, not the bound, stops it)
    rf_api_page("world", 20, 100,
                [BASE_DT - 6 * h, BASE_DT - timedelta(hours=40)])
    # cricket-world: single fresh item; bumped offset 40 ≥ 25 stops it
    rf_api_page("cricket-world", 20, 25, [BASE_DT - 9 * h])


# ---------------------------------------------------------------------------
# malaya — DUPEFILTER-terminated pagination (the page-nav's last link
# self-points on the final page and the URL-seen check, not a has_more
# marker, ends the chain), both categories split out of one URL path
# segment, data-src lazy-load images, menu skip-slice (已部署/malaya.py)
# ---------------------------------------------------------------------------

MALAYA_BASE = "https://malaya.com.ph"

MALAYA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",  # malaya.py:74: title always off the page
    "article_pub_priority": "page",  # malaya.py:76
    # malaya.py:66-72: url.split('/')[-3].split('_') → 3 tokens give
    # (category1, category2) = (parts[1], parts[2]), 2 tokens (0, 1)
    "cat_from_url_segment": {"index": -3, "sep": "_"},
    "extract": {
        # parse: '#menu-main_menu-1 a' sliced [1:] (malaya.py:29 — Home
        # is never crawled)
        "category": {"sel": "#menu-main_menu-1 a", "skip": 1},
        # parse_essay: '.td-block-span6' entries, relative link + fuzzy
        # '.td-post-date' text (malaya.py:50-52)
        "entry": {
            "sel": ".td-block-span6",
            "fields": {
                "href": {"sel": "a", "attr": "href"},
                "time": {"sel": ".td-post-date"},
            },
        },
        # malaya.py:60: soup.select('.page-nav.td-pb-padding-side a')[-1]
        # — taken UNCONDITIONALLY; on the last page it self-points and the
        # dupefilter (not page data) stops the chain
        "next": {"sel": ".page-nav.td-pb-padding-side a",
                 "attr": "href", "index": -1},
        # parse_item (malaya.py:74-83)
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "span.td-post-date > time"},
        "block": {"para_sel": "div.td-post-content > p",
                  "img_sel": "div.td-post-content img",
                  "img_attr": "data-src"},
    },
}


def _malaya_date(dt: datetime) -> str:
    return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"


def _build_malaya(g: _G) -> None:
    host = "malaya.com.ph"
    wid = 193
    g.registry[wid] = dict(MALAYA_RULES)
    g.seeds.append({"url": MALAYA_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        MALAYA_BASE + "/", "menu",
        '<html><ul id="menu-main_menu-1">'
        f'<li><a href="{MALAYA_BASE}/">Home</a></li>'
        f'<li><a href="{MALAYA_BASE}/news_business/">Business</a></li>'
        f'<li><a href="{MALAYA_BASE}/malaya_special_features/">Special'
        "</a></li>"
        "</ul></html>",
        host,
    )

    def ml_article(seg: str, tag: str, dt: datetime) -> str:
        aurl = f"{MALAYA_BASE}/{seg}/{tag}/"
        g.page(
            aurl, "article",
            f'<html><h1 class="entry-title">Malaya {seg} {tag}</h1>'
            '<span class="td-post-date">'
            f"<time>{_malaya_date(dt)}</time></span>"
            '<div class="td-post-content">'
            f"<p>malaya lead {tag}</p>"
            f'<img data-src="{MALAYA_BASE}/i/{tag}.jpg">'
            f"<p>malaya more {tag}</p>"
            "</div></html>",
            host,
        )
        return aurl

    def ml_list(seg: str, page: int, dts: list[datetime],
                last_page: int) -> None:
        url = (f"{MALAYA_BASE}/{seg}/" if page == 1
               else f"{MALAYA_BASE}/{seg}/page/{page}/")
        rows = []
        for i, dt in enumerate(dts):
            aurl = ml_article(seg, f"art-{page}-{i}", dt)
            rows.append(
                f'<div class="td-block-span6"><a href="{aurl}"></a>'
                f'<div class="td-post-date">{_malaya_date(dt)}</div></div>'
            )
        # WordPress page-nav: the LAST anchor is the next page while one
        # exists; on the final page it self-points (dupefilter stops it)
        nxt = (f"{MALAYA_BASE}/{seg}/page/{page + 1}/" if page < last_page
               else url)
        g.page(
            url, "list",
            "<html>" + "".join(rows)
            + '<div class="page-nav td-pb-padding-side">'
            f'<a href="{MALAYA_BASE}/{seg}/">1</a>'
            f'<a href="{nxt}">next</a></div></html>',
            host,
        )

    h = timedelta(hours=1)
    # business (2-token segment → news/business): two pages, all fresh —
    # ONLY the self-pointing nav link ends the chain
    ml_list("news_business", 1, [BASE_DT - 1 * h, BASE_DT - 2 * h], 2)
    ml_list("news_business", 2, [BASE_DT - 3 * h], 2)
    # special (3-token segment → special/features): the second page's
    # second entry is stale — the TIME gate stops this chain instead
    ml_list("malaya_special_features", 1,
            [BASE_DT - 4 * h, BASE_DT - 5 * h], 3)
    ml_list("malaya_special_features", 2,
            [BASE_DT - 6 * h, BASE_DT - timedelta(hours=48)], 3)


# ---------------------------------------------------------------------------
# piagov — three-hop positional menus (navbar [2] single pick, cat1s[4:7]
# slice) with dont_filter category hops, a URL-derived form-POST .json
# chain (page counter in BOTH the query string and the body), last-entry
# iso page gate with the year-0000 → 2020 patch, single-article page stop
# quirk, byline fallback-now dates (已部署/piagov.py)
# ---------------------------------------------------------------------------

PIAGOV_BASE = "https://pia.gov.ph"

PIAGOV_RULES = {
    "rule": FORM_URL_PAGE,
    "format": "html",
    "api_format": "json",  # piagov.py:86: the .json?p=N endpoint
    "menu_child_kind": "menu",  # navbar → the sections page, also a menu
    "menu2_child_kind": "list",
    # piagov.py:63-72: request_url = cat2_url + '.json?p=' + page, POSTed
    # with formdata {'page': page} — both advance together
    "form_url_fmt": "{base}.json?p={page}",
    "form_bootstrap_page": 1,
    # the JSON gate date is already-normalized Y-M-D fed to format_time3
    # (piagov.py:101); article bylines go through the fuzzy parser
    "page_time_style": "ymd",
    "api_map": {
        "entries": "articles",  # piagov.py:86's 'articles' in keys check
        "href": ("url",),  # piagov.py:91
        "min_entries": 2,  # piagov.py:88-89: len(article)==1 → pass
        "page_time_last": ("headlineDate", "timeStamp", "iso"),  # py:93-95
        "y0_patch": "2020",  # py:96-100: year '0000' rewritten to 2020
    },
    "extract": {
        # parse (homepage): navbar anchors, single positional pick [2]
        # (piagov.py:36-37)
        "category": {"sel": "div#navbar li.nav-item>a", "slice": [2, 3]},
        "variants": [
            # parse_category2 (sections page): cat1 anchors sliced [4:7],
            # hopped with dont_filter=True (piagov.py:42-50)
            {"match": r"/sections$",
             "category": {"sel": "ul.list-unstyled>li>a", "slice": [4, 7]},
             "menu_dont_filter": True},
            # parse_category3 (each cat1 page): grouped cat2 anchors,
            # dont_filter hops (piagov.py:53-61)
            {"match": r"/(features|news|regional)$",
             "category2": {"sel": "div.listing-container"
                                  " li.category.grouping a"},
             "menu_dont_filter": True},
        ],
        # parse_detail (piagov.py:113-141)
        "title": {"sel": "div.container h1"},
        "pub": {"sel": "p.byline span.date", "re": "Published on (.*)"},
        "block": {"para_sel": "div.col-24 p",
                  "img_sel": "div.col-24 figure img"},
    },
}


def _build_piagov(g: _G) -> None:
    host = "pia.gov.ph"
    wid = 1231
    g.registry[wid] = dict(PIAGOV_RULES)
    g.seeds.append({"url": PIAGOV_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        PIAGOV_BASE + "/", "menu",
        '<html><div id="navbar"><ul>' + "".join(
            f'<li class="nav-item"><a href="{PIAGOV_BASE}/{slug}">'
            f"{label}</a></li>"
            for slug, label in (
                ("about", "About"), ("gallery", "Gallery"),
                ("sections", "Sections"), ("contact", "Contact"),
            )
        ) + "</ul></div></html>",
        host,
    )
    g.page(
        f"{PIAGOV_BASE}/sections", "menu",
        '<html><ul class="list-unstyled">' + "".join(
            f'<li><a href="{PIAGOV_BASE}/{slug}">{label}</a></li>'
            for slug, label in (
                ("about2", "About"), ("careers", "Careers"),
                ("privacy", "Privacy"), ("terms", "Terms"),
                ("features", "Features"), ("news", "News"),
                ("regional", "Regional"),
            )
        ) + "</ul></html>",
        host,
    )
    cat2s = {
        "features": [("Culture", "features/culture")],
        "news": [("National", "news/national"), ("Capital", "news/capital")],
        "regional": [("Luzon", "regional/luzon")],
    }
    for c1, subs in cat2s.items():
        g.page(
            f"{PIAGOV_BASE}/{c1}", "menu2",
            '<html><div class="listing-container"><ul>' + "".join(
                f'<li class="category grouping">'
                f'<a href="{PIAGOV_BASE}/{slug}">{label}</a></li>'
                for label, slug in subs
            ) + "</ul></div></html>",
            host,
        )
        for _label, slug in subs:
            g.page(f"{PIAGOV_BASE}/{slug}", "list", "<html></html>", host)

    def pia_article(slug: str, tag: str, byline: bool = True) -> str:
        aurl = f"{PIAGOV_BASE}/{slug}/{tag}"
        by = ('<p class="byline"><span class="date">Published on'
              f" {_MON_FULL[BASE_DT.month - 1]} {BASE_DT.day},"
              f" {BASE_DT.year}</span></p>" if byline else "")
        g.page(
            aurl, "article",
            f'<html><div class="container"><h1>PIA {tag}</h1></div>{by}'
            f'<div class="col-24"><p>pia lead {tag}</p>'
            f'<figure><img src="{PIAGOV_BASE}/f/{tag}.jpg"></figure>'
            f"<p>pia more {tag}</p></div></html>",
            host,
        )
        return aurl

    def pia_api_page(slug: str, page: int, tags: list[str],
                     last_iso: str | None | dict = "fresh") -> None:
        arts = []
        fresh_iso = (BASE_DT - timedelta(hours=2)).strftime(
            "%Y-%m-%d %H:%M:%S")
        for i, tag in enumerate(tags):
            ts: dict = {"iso": fresh_iso}
            if i == len(tags) - 1:
                if last_iso == "fresh":
                    pass
                elif last_iso is None:
                    ts = {}  # piagov.py:102-103: missing 'iso' → stop
                else:
                    ts = {"iso": last_iso}
            arts.append({"url": pia_article(slug, tag),
                         "headlineDate": {"timeStamp": ts}})
        g.page(
            f"{PIAGOV_BASE}/{slug}.json?p={page}", "api",
            json.dumps({"articles": arts}), host,
            method="POST", body=f"page={page}",
        )

    # national: p=1 fresh gate → p=2 whose LAST iso is year-0000 (patched
    # to 2020 → stale) — articles on the stale page are still yielded
    pia_api_page("news/national", 1, ["n-1-0", "n-1-1", "n-1-2"])
    pia_api_page("news/national", 2, ["n-2-0", "n-2-1"],
                 last_iso="0000-05-28 10:00:00")
    # capital: a single article → len==1 'pass' quirk, nothing emitted
    pia_api_page("news/capital", 1, ["c-1-0"])
    # culture: last item has NO 'iso' key → both yielded, chain stops
    pia_api_page("features/culture", 1, ["f-1-0", "f-1-1"], last_iso=None)
    # luzon: p=1 fresh → p=2 last iso 48 h old → both yielded, stop;
    # r-2-1 also exercises the missing-byline fallback-now date
    pia_api_page("regional/luzon", 1, ["r-1-0", "r-1-1"])
    pia_api_page("regional/luzon", 2, ["r-2-0", "r-2-1"],
                 last_iso=(BASE_DT - timedelta(hours=48)).strftime(
                     "%Y-%m-%d %H:%M:%S"))
    # overwrite r-2-1 with a byline-less page (same URL key): exercises
    # the Util.format_time() fallback-now path (piagov.py:138-141)
    pia_article("regional/luzon", "r-2-1", byline=False)


# ---------------------------------------------------------------------------
# Combined graph
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# apkaakhbar — side-fetch entry gates (judge_pub_time), Newspaper-theme
# admin-ajax POST chain bounded by a page-scraped max_num_pages, menu
# [1:-1] slice, strong-concat abstract, trailing-image slice
# (已部署/apkaakhbar.py)
# ---------------------------------------------------------------------------

APKAAKHBAR_POST_URL = ("https://apkaakhbar.com/wp-admin/admin-ajax.php"
                       "?td_theme_name=Newspaper&v=8.0")
# the theme's static loopState fields (apkaakhbar.py:29-39); the dynamic
# three (category_id, max_num_pages, currentPage) are scraped/advanced
APKAAKHBAR_FIXED = {
    "action": "td_ajax_loop",
    "loopState[sidebarPosition]": "",
    "loopState[moduleId]": "6",
    "loopState[atts][offset]": "2",
    "loopState[ajax_pagination_infinite_stop]": "0",
    "loopState[server_reply_html_data]": "",
}

APKAAKHBAR_RULES = {
    "rule": FORM_PAGE,
    "format": "html",
    "api_format": "json_html",  # POST replies wrap HTML in JSON
    "json_html_key": "server_reply_html_data",  # apkaakhbar.py:92
    "form_api_url": APKAAKHBAR_POST_URL,
    "form_fixed_params": APKAAKHBAR_FIXED,
    # page-scraped fields land on theme-named body keys (apkaakhbar.py:
    # 71-77: max_num_pages regexed off a script, category_id off another)
    "form_param_map": {"max_num_pages": "loopState[max_num_pages]",
                       "category_id": "loopState[atts][category_id]"},
    "form_page_param": "loopState[currentPage]",
    "form_start_page": 1,  # first POST carries currentPage=1 (py:76,104)
    # the chain stops once the NEXT page would exceed the scraped bound
    # riding in the body (apkaakhbar.py:103)
    "form_max_pages_key": "loopState[max_num_pages]",
    # the HTML grid's gate (flag1) never touches the POST bootstrap —
    # only the POST pages' own gate (flag2) ends the chain (py:82-107)
    "form_bootstrap_ungated": True,
    # judge_pub_time (py:57-66): EVERY entry is gated by side-fetching
    # its article and reading the module date — a raw requests.get the
    # scheduler never sees
    "entry_gate_fetch": {"sel": ".entry-date.updated.td-module-date"},
    "article_pub_priority": "page",  # py:156: date read off the article
    "extract": {
        # start_requests: #menu-td-demo-header-menu-1 li a [1:-1] (py:52)
        "category": {"sel": "#menu-td-demo-header-menu-1 li a",
                     "slice": [1, -1]},
        # category page grid: .td-big-grid-wrapper > div (py:79-88)
        "entry": {"sel": ".td-big-grid-wrapper > div",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "title": {"sel": "a", "attr": "title"}}},
        # the three dynamic loopState params scraped off the page (py:71-75)
        "form_params": (r"tdAjaxLoop\.loopState\.max_num_pages = "
                        r"(?P<max_num_pages>\d+)[\s\S]*?"
                        r"'category_id':(?P<category_id>\d+)"),
        "pub": {"sel": ".entry-date.updated.td-module-date"},
        # abstract: EVERY <strong> text concatenated (py:157-160)
        "abstract": {"sel": "strong", "join": True},
        # body: the whole td-post-content container text (py:161)
        "body_fallback": {"sel": ".td-post-content"},
        # images: article img [:-3] — the trailing related/footer images
        # are positionally dropped (py:151)
        "block": {"img_sel": "article img", "img_slice": [0, -3]},
        "variants": [
            {   # POST replies list articles as td-block-span6 tiles
                # (py:93-95); has_more is structural — the scraped
                # max_num_pages bound ends the chain, not a marker
                "match": r"admin-ajax\.php",
                "entry": {"sel": "div.td-block-span6",
                          "fields": {"href": {"sel": "a", "attr": "href"},
                                     "title": {"sel": "a",
                                               "attr": "title"}}},
                "more": r"td-block-span6",
            },
        ],
    },
}


def _apk_body(cat_id: str, max_pages: int, page: int) -> str:
    """The canonical POST body parse_page constructs (sorted k=v join) —
    the fixture must key its POST pages on the exact same string."""
    params = dict(APKAAKHBAR_FIXED)
    params["loopState[atts][category_id]"] = cat_id
    params["loopState[max_num_pages]"] = str(max_pages)
    params["loopState[currentPage]"] = str(page)
    return "&".join(f"{k}={v}" for k, v in sorted(params.items()))


def _apk_date(dt: datetime) -> str:
    """'January 11, 2021' — the td-module-date text (apkaakhbar.py:61)."""
    return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"


def _apk_article(g: _G, base: str, host: str, slug: str,
                 dt: datetime) -> str:
    url = f"{base}/{slug}/"
    imgs = "".join(f'<img src="{base}/img/{slug}-{k}.jpg">'
                   for k in range(4))  # [:-3] keeps exactly one
    g.page(
        url, "article",
        f'<html><article><span class="entry-date updated td-module-date">'
        f"{_apk_date(dt)}</span>{imgs}"
        f"<p><strong>Lead {slug}.</strong><strong> More.</strong></p>"
        f'<div class="td-post-content">Body of {slug} runs here.</div>'
        f"</article></html>",
        host,
    )
    return url


def _build_apkaakhbar(g: _G) -> None:
    step = [0]  # 5 h spacing: the cutoff (36 h) trips at entry 8
    host = "apkaakhbar.com"
    wid = 1059
    g.registry[wid] = dict(APKAAKHBAR_RULES)
    base = f"https://{host}"
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    cats = [("national", "21"), ("world", "34")]
    menu = ('<ul id="menu-td-demo-header-menu-1">'
            f'<li><a href="{base}/">Home</a></li>'
            + "".join(f'<li><a href="{base}/category/{c}/">{c.title()}</a>'
                      "</li>" for c, _ in cats)
            + f'<li><a href="{base}/contact/">Contact</a></li></ul>')
    g.page(base + "/", "menu", f"<html>{menu}</html>", host)

    max_pages = 2
    for cslug, cid in cats:
        curl = f"{base}/category/{cslug}/"
        grid = []
        for e in range(2):
            dt = _t(step[0], 5.0)
            step[0] += 1
            aurl = _apk_article(g, base, host, f"{cslug}-g{e}", dt)
            grid.append(
                f'<div class="td-big-grid-wrapper"><div>'
                f'<a href="{aurl}" title="Grid {cslug} {e}"></a></div></div>'
            )
        script = (f"<script>tdAjaxLoop.loopState.max_num_pages = {max_pages}"
                  f";\nvar atts = {{'category_id':{cid}}};</script>")
        g.page(curl, "list",
               "<html>" + "".join(grid) + script + "</html>", host)
        for p in range(1, max_pages + 1):
            tiles = []
            for e in range(3):
                dt = _t(step[0], 5.0)
                step[0] += 1
                aurl = _apk_article(g, base, host, f"{cslug}-p{p}-{e}", dt)
                tiles.append(
                    f'<div class="td-block-span6">'
                    f'<a href="{aurl}" title="Post {cslug} {p}-{e}"></a>'
                    f"</div>"
                )
            g.page(
                APKAAKHBAR_POST_URL, "api",
                json.dumps({"server_reply_html_data":
                            "<html>" + "".join(tiles) + "</html>"}),
                host, method="POST", body=_apk_body(cid, max_pages, p),
            )


# ---------------------------------------------------------------------------
# udaybulletin — nested one-page menu with parent suppression and
# label-conditional slug composition, UNBOUNDED offset API pagination,
# gate-time ≠ stored-time epoch-ms fields (已部署/udaybulletin.py)
# ---------------------------------------------------------------------------

UDAY_BASE = "https://www.udaybulletin.com"
UDAY_API = (UDAY_BASE + "/api/v1/collections/{collection}"
            "?item-type=story&offset={offset}&limit=10")

UDAYBULLETIN_RULES = {
    "rule": API_OFFSET,
    "format": "html",
    "api_format": "json",
    "menu_api_template": UDAY_API,  # udaybulletin.py:36
    "menu_api_start_offset": 10,  # py:46,59: offset_num starts at 10
    "api_offset_step": 10,  # py:78: offset_num += 10
    # the response carries no total count and the reference paginates
    # unboundedly while the gate holds (py:77-80)
    "api_offset_total": False,
    # only 'खेल' children compose '<sub>-<top>' slugs (py:49-55); every
    # other child's own slug stands alone
    "menu_compose_labels": ["खेल"],
    "date_style": "epoch_ms",
    "api_map": {
        "entries": "items",
        "href": ("story", "url"),  # absolute URLs (py:68)
        "title": ("story", "headline"),
        # stored pub time = content-created-at (py:74); the cutoff gate
        # reads content-updated-at (py:70) — two different fields
        "time": ("story", "content-created-at"),
        "gate_time": ("story", "content-updated-at"),
    },
    "extract": {
        # parse(): div.header-three-m__default-menu__24xMV>ul>li walk —
        # tops with children are grouping headers only (py:41-59)
        "category": {"sel": "div.header-three-m__default-menu__24xMV"
                            " > ul > li",
                     "link_sel": "a",
                     "children_sel": "ul > li > a",
                     "children_suppress_parent": True},
        "excluded_labels": ["ऑटोमोबाइल", "अन्य खबर", "अन्य खेल"],  # py:47
        # abstract div's theme class chain (py:93)
        "abstract": {"sel": ".subheadline-m__subheadline__3H1ig"
                            ".subheadline-m__dark__31XBm"},
        # body paragraphs + the single lazy-loaded figure image (py:96-103)
        "block": {"para_sel": ".arr--story-page-card-wrapper p",
                  "img_sel": "figure img", "img_attr": "data-src"},
    },
}


def _uday_item(url: str, headline: str, created: datetime,
               updated: datetime) -> dict:
    ems = int(created.replace(tzinfo=timezone.utc).timestamp() * 1000)
    ums = int(updated.replace(tzinfo=timezone.utc).timestamp() * 1000)
    return {"story": {"url": url, "headline": headline,
                      "content-created-at": ems,
                      "content-updated-at": ums}}


def _build_udaybulletin(g: _G) -> None:
    host = "www.udaybulletin.com"
    wid = 941
    g.registry[wid] = dict(UDAYBULLETIN_RULES)
    g.seeds.append({"url": UDAY_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = (
        '<div class="header-three-m__default-menu__24xMV"><ul>'
        f'<li><a href="{UDAY_BASE}/desh">देश</a></li>'
        f'<li><a href="{UDAY_BASE}/khel">खेल</a><ul>'
        f'<li><a href="{UDAY_BASE}/khel/cricket">क्रिकेट</a></li>'
        f'<li><a href="{UDAY_BASE}/khel/anya">अन्य खेल</a></li>'
        "</ul></li>"
        f'<li><a href="{UDAY_BASE}/manoranjan">मनोरंजन</a><ul>'
        f'<li><a href="{UDAY_BASE}/manoranjan/film">फिल्म</a></li>'
        f'<li><a href="{UDAY_BASE}/manoranjan/auto">ऑटोमोबाइल</a></li>'
        "</ul></li>"
        "</ul></div>"
    )
    g.page(UDAY_BASE + "/", "menu", f"<html>{menu}</html>", host)

    # collections actually emitted: desh (plain top), cricket-khel
    # (composed — label खेल), film (plain child slug)
    for coll in ("desh", "cricket-khel", "film"):
        step = [0]  # per collection, 8 h spacing: page 2's third entry's
        # UPDATED time (40 h − 30 min) trips the gate — closing the
        # otherwise-unbounded offset chain exactly as the reference's
        # cutoff does
        for page, off in ((1, 10), (2, 20)):
            items = []
            for e in range(3):
                dt = _t(step[0], 8.0)
                step[0] += 1
                aurl = f"{UDAY_BASE}/story/{coll}-{page}-{e}"
                items.append(_uday_item(
                    aurl, f"कहानी {coll} {page}-{e}", dt,
                    dt + timedelta(minutes=30),
                ))
                g.page(
                    aurl, "article",
                    f'<html><div class="p-alt subheadline-m__subheadline__'
                    f'3H1ig subheadline-m__dark__31XBm">सार {coll} {page}-'
                    f'{e}</div><div class="arr--story-page-card-wrapper">'
                    f"<p>पहला {coll} {page}-{e}</p><p>दूसरा</p></div>"
                    f'<figure><img data-src="{UDAY_BASE}/im/{coll}{page}'
                    f'{e}.jpg"></figure></html>',
                    host,
                )
            g.page(UDAY_API.format(collection=coll, offset=off), "api",
                   json.dumps({"items": items}), host)


# ---------------------------------------------------------------------------
# spin — two seeds dispatching to a hardcoded 35-slug collection list
# (sport) vs four selector menu groups (life), root-list JSON API with a
# last-item channel-name carry and last-item page gate, published_time
# meta reformat dates (已部署/spin.py)
# ---------------------------------------------------------------------------

SPIN_BASE = "https://www.spin.ph"
SPIN_API = ("https://api.summitmedia-digital.com/spin/v1/channel/get"
            "/{collection}/{page}/6")
# the sport branch's collection list is spider data, kept verbatim
# (spin.py:60-66)
SPIN_SPORT_SLUGS = [
    "american-football", "athletics", "badminton", "baseball", "basketball",
    "billiards", "bowling", "boxing", "cheerdance", "chess", "cycling",
    "dragon-boat", "extreme-sports", "football", "golf", "gymnastics",
    "horse-racing", "karatedo", "lifestyle", "mma", "moto-racing",
    "multisport", "polo", "rugby", "running", "sailing", "softball",
    "swimming", "taekwondo", "volleyball", "wrestling", "tennis",
    "triathlon", "weightlifting", "winter-sports",
]

SPIN_RULES = {
    "rule": API_PAGE_TPL,
    "format": "html",
    "api_format": "json",
    "menu_api_template": SPIN_API,
    "menu_api_start_page": 1,  # spin.py:57: /{slug}/1/6
    # article pub: the published_time meta content re-tokenized
    # 'HH:MM, DD.MM.YY' → '20YY-MM-DD HH:MM:00' (spin.py:112-118)
    "date_style": "hm_dmy2",
    # the page gate compares the LAST item's epoch directly (py:90-92)
    "page_time_style": "epoch_s",
    "article_pub_priority": "page",
    "api_map": {
        "entries": [],  # the response root IS the item list (py:76)
        "href": "url",
        "href_prefix": SPIN_BASE,  # py:83
        # category2 = channel.parent.name, else channel.name — and ALL of
        # a page's articles inherit the LAST item's value (py:77-89)
        "page_cat2_last": {"paths": [("channel", "parent", "name"),
                                     ("channel", "name")]},
        "page_time_last": "date_published",  # py:90-92
    },
    "extract": {
        "title": {"sel": "h1"},  # py:120
        "pub": {"sel": "meta[property=published_time]",
                "attr": "content"},  # py:109-111
        # lead image .artl__head img precedes the .wrap__ctnt paragraphs
        # in document order (py:104-107,121-127)
        "block": {"para_sel": ".wrap__ctnt p",
                  "img_sel": ".artl__head img"},
        "variants": [
            {   # the sport seed never mines the page — 35 hardcoded
                # slugs (spin.py:58-67)
                "match": r"spin\.ph/\?ref=nav",
                "fixed_categories": [
                    {"href": s, "label": "sport"} for s in SPIN_SPORT_SLUGS
                ],
            },
            {   # the life seed walks four id-keyed sub-menus (py:41-53)
                "match": r"spin\.ph/life\?ref=nav",
                "category": [
                    {"sel": f"#{mid} > li", "link_sel": "a",
                     "label": "life", "label2": False}
                    for mid in ("menu-guide-subchs",
                                "menu-active-lifestyle-subchs",
                                "menu-people-subchs",
                                "menu-cars-and-tech-subchs")
                ],
            },
        ],
    },
}


def _spin_meta_time(dt: datetime) -> str:
    """'HH:MM, DD.MM.YY' — the published_time meta content shape the
    reformat at spin.py:113-118 expects."""
    return (f"{dt.hour:02d}:{dt.minute:02d}, "
            f"{dt.day:02d}.{dt.month:02d}.{dt.year % 100:02d}")


def _build_spin(g: _G) -> None:
    host = "www.spin.ph"
    api_host = "api.summitmedia-digital.com"
    wid = 1192
    g.registry[wid] = dict(SPIN_RULES)
    sport_seed = SPIN_BASE + "/?ref=nav"
    life_seed = SPIN_BASE + "/life?ref=nav"
    g.seeds.append({"url": sport_seed, "website_id": wid,
                    "language_id": 1866})
    g.seeds.append({"url": life_seed, "website_id": wid,
                    "language_id": 1866})
    g.page(sport_seed, "menu", "<html><body>sport home</body></html>", host)
    g.page(
        life_seed, "menu",
        "<html>"
        '<ul id="menu-guide-subchs">'
        f'<li><a href="{SPIN_BASE}/life/food?ref=m">Food</a></li></ul>'
        '<ul id="menu-active-lifestyle-subchs">'
        f'<li><a href="{SPIN_BASE}/life/fitness?ref=m">Fitness</a></li>'
        "</ul>"
        '<ul id="menu-people-subchs"></ul>'
        '<ul id="menu-cars-and-tech-subchs"></ul>'
        "</html>",
        host,
    )
    live = {"basketball": "Basketball", "boxing": None,
            "food": "Food Trips", "fitness": None}
    for slug in SPIN_SPORT_SLUGS + ["food", "fitness"]:
        if slug not in live:
            # exhausted collection: empty root list → no entries, no
            # gate date, no pagination (spin.py:90's all_time != [])
            g.page(SPIN_API.format(collection=slug, page=1), "api",
                   "[]", api_host)
            continue
        parent = live[slug]
        step = [0]  # per collection: page 2's LAST entry (39 h) closes
        for page in (1, 2):  # the chain at the 36 h cutoff
            items = []
            for e in range(2):
                dt = _t(step[0], 13.0)
                step[0] += 1
                path = f"/{slug}/story-{page}-{e}"
                chan = ({"parent": {"name": parent}, "name": slug}
                        if parent else {"parent": None, "name": slug})
                items.append({
                    "url": path, "channel": chan,
                    "date_published": int(
                        dt.replace(tzinfo=timezone.utc).timestamp()
                    ),
                })
                g.page(
                    SPIN_BASE + path, "article",
                    f'<html><div class="artl__head">'
                    f'<img src="{SPIN_BASE}/th{path}.jpg"></div>'
                    f'<meta property="published_time" '
                    f'content="{_spin_meta_time(dt)}">'
                    f"<h1>Spin {slug} {page}-{e}</h1>"
                    f'<div class="wrap__ctnt"><p>spin body {slug} '
                    f"{page}-{e} a</p><p>more</p></div></html>",
                    host,
                )
            g.page(SPIN_API.format(collection=slug, page=page), "api",
                   json.dumps(items), api_host)


# ---------------------------------------------------------------------------
# spot — path-slug API collections (page counter from 0), per-item
# try/except skip, image path fallback, article categories from its own
# URL segments (已部署/spot.py)
# ---------------------------------------------------------------------------

SPOT_BASE = "https://www.spot.ph"
SPOT_API = ("https://api.summitmedia-digital.com/spot/v1/channel/get"
            "{collection}/{page}/100")

SPOT_RULES = {
    "rule": API_PAGE_TPL,
    "format": "html",
    "api_format": "json",
    "menu_api_template": SPOT_API,  # spot.py:22
    "menu_api_start_page": 0,  # py:35: page starts at 0
    "menu_api_slug": "path",  # py:33: the whole query-stripped href path
    "date_style": "epoch_s",
    # parse3 (py:56-58): both categories from the ARTICLE's own URL
    "cat1_from_url_re": r"^https?://[^/]+/([^/]+)/",
    "cat2_from_url_re": r"^https?://[^/]+/[^/]+/([^/]+)/",
    "api_map": {
        "entries": [],  # root list
        "href": "url",
        "href_prefix": SPOT_BASE,  # py:41
        "title": "title",
        "time": "date_published",
        "abstract": "blurb",
        # i['image'] if present else i['images']['main'] (py:41)
        "img": {"paths": ["image", ("images", "main")]},
        # each item wrapped in try/except Exception: continue (py:39-45)
        "entry_skip_bad": True,
    },
    "extract": {
        # parse(): .c-nav.c-nav--sub a[:6] (py:33)
        "category": {"sel": ".c-nav.c-nav--sub a", "slice": [0, 6]},
        # parse3: first content section's paragraphs (py:58)
        "block": {"para_sel": "section.content"
                              " > section:nth-of-type(1) p"},
    },
}


def _build_spot(g: _G) -> None:
    host = "www.spot.ph"
    api_host = "api.summitmedia-digital.com"
    wid = 495
    g.registry[wid] = dict(SPOT_RULES)
    g.seeds.append({"url": SPOT_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    nav = ('<nav class="c-nav c-nav--sub">'
           f'<a href="/newsfeatures?ref=nav">News</a>'
           f'<a href="/eatdrink?ref=nav">Eat+Drink</a></nav>')
    g.page(SPOT_BASE + "/", "menu", f"<html>{nav}</html>", host)

    for coll in ("/newsfeatures", "/eatdrink"):
        step = [0]  # per collection, 9 h spacing: page 1's third entry
        for page in (0, 1):  # (45 h) trips the per-entry gate mid-page
            items = []
            for e in range(3):
                dt = _t(step[0], 9.0)
                step[0] += 1
                path = f"{coll}/sub-{coll.strip('/')}/{page}{e}01/story/"
                item = {
                    "url": path,
                    "title": f"Spot {coll.strip('/')} {page}-{e}",
                    "date_published": int(
                        dt.replace(tzinfo=timezone.utc).timestamp()
                    ),
                    "blurb": f"blurb {coll.strip('/')} {page}-{e}",
                }
                if e % 2 == 0:
                    item["image"] = f"{SPOT_BASE}/im{coll}{page}{e}.jpg"
                else:
                    item["images"] = {
                        "main": f"{SPOT_BASE}/imm{coll}{page}{e}.jpg"
                    }
                items.append(item)
                g.page(
                    SPOT_BASE + path, "article",
                    f'<html><section class="content"><section>'
                    f"<p>spot body {coll.strip('/')} {page}-{e}</p>"
                    f"<p>second</p></section>"
                    f"<section><p>related teaser — not body</p></section>"
                    f"</section></html>",
                    host,
                )
            # one malformed item exercising the try/except skip (py:39-45)
            items.append({"title": "no url — skipped"})
            g.page(SPOT_API.format(collection=coll, page=page), "api",
                   json.dumps(items), api_host)


# ---------------------------------------------------------------------------
# topgear — programmatic API seeds over 19 collections with a
# slug→section mapping (including the launch-pad carry-over bug), page
# gate on the FIRST item, entries never individually gated, all-page-
# paragraph bodies (已部署/topgear.py)
# ---------------------------------------------------------------------------

TOPGEAR_BASE = "https://www.topgear.com.ph/"
TOPGEAR_API = ("https://api.summitmedia-digital.com/topgear/v1/channel"
               "/get/{collection}/{page}/10")
# the start_requests if/elif chain (topgear.py:56-67) as data. category1
# is assigned BEFORE the loop and only reassigned when a branch matches —
# 'launch-pad' matches none, so it inherits the PREVIOUS iteration's
# 'columns' (wheels-of-justice). Bug-faithful.
TOPGEAR_CAT1 = {
    **{s: "drives" for s in ("car-reviews", "big-test")},
    **{s: "news" for s in ("car-news", "industry-news", "motoring-news",
                           "racing-news", "technology-news")},
    **{s: "features" for s in ("feature-articles", "lifestyle",
                               "tip-sheet")},
    **{s: "columns" for s in ("head-over-wheels", "rust-n-pieces",
                              "the-decision", "motor-mouth-online",
                              "wheels-of-justice", "launch-pad")},
    **{s: "moto-sapiens" for s in ("motorcycle-news", "motorcycle-feature",
                                   "motorcycle-review")},
}

TOPGEAR_RULES = {
    "rule": API_PAGE_TPL,
    "format": "html",
    "api_format": "json",
    "seed_kind": "api",  # seeds ARE the page-0 API URLs (topgear.py:70-72)
    "menu_api_template": TOPGEAR_API,
    # stateless: collection + page read off the request URL itself, so
    # the programmatic seeds need no meta bootstrap
    "api_url_state_re": r"/channel/get/(?P<collection>[^/]+)/(?P<page>\d+)"
                        r"/10$",
    "cat1_map": TOPGEAR_CAT1,
    "page_time_style": "epoch_s",  # py:73's raw epoch compare
    # the gate check runs BEFORE any yield: a failed page drops its
    # entries entirely (py:73-77's break-before-else)
    "page_gate_drops_entries": True,
    "article_pub_priority": "page",
    "title_priority": "page",
    "api_map": {
        "entries": [],  # root list
        "href": "url",
        "href_prefix": TOPGEAR_BASE,  # py:77 (trailing slash + rel url)
        # gate: FIRST item's date_published; entries themselves are all
        # yielded ungated (py:73-77)
        "page_time_first": "date_published",
    },
    "extract": {
        "title": {"sel": ".ch ~ div > h1"},  # py:83
        "pub": {"sel": ".card__body"},  # py:92 — fuzzy format_time2
        # body = EVERY <p> on the page; images interleave within them
        # (py:86-95)
        "block": {"para_sel": "p", "img_sel": "p img"},
    },
}

# live collections: per-page entry ages in HOURS before BASE_DT. The 36 h
# cutoff sits mid-chain: car-news survives two pages and dies on its
# third's FIRST item; lifestyle dies on page 1; launch-pad's very first
# page is already old — the reference yields NOTHING for it (the gate
# breaks before any yield), the strongest page_gate_drops_entries probe.
TOPGEAR_LIVE = {
    "car-news": [(0.0, 9.0), (18.0, 27.0), (50.0, 59.0)],
    "lifestyle": [(0.0, 9.0), (45.0, 54.0)],
    "launch-pad": [(40.0, 49.0)],
}


def _build_topgear(g: _G) -> None:
    host = "www.topgear.com.ph"
    api_host = "api.summitmedia-digital.com"
    wid = 487
    g.registry[wid] = dict(TOPGEAR_RULES)
    for coll in TOPGEAR_CAT1:
        seed = TOPGEAR_API.format(collection=coll, page=0)
        g.seeds.append({"url": seed, "website_id": wid,
                        "language_id": 1866})
        if coll not in TOPGEAR_LIVE:
            g.page(seed, "api", "[]", api_host)
            continue
        for page, ages in enumerate(TOPGEAR_LIVE[coll]):
            items = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                rel = f"{coll}/tg-{page}-{e}"
                items.append({
                    "url": rel,
                    "date_published": int(
                        dt.replace(tzinfo=timezone.utc).timestamp()
                    ),
                })
                g.page(
                    TOPGEAR_BASE + rel, "article",
                    f'<html><div class="ch">crumb</div>'
                    f"<div><h1>TG {coll} {page}-{e}</h1></div>"
                    f'<div class="card__body">'
                    f"{_MON_ABBR[dt.month - 1]} {dt.day}, {dt.year}</div>"
                    f"<p>tg body {coll} {page}-{e} first</p>"
                    f'<p><img src="{TOPGEAR_BASE}im/{coll}{page}{e}.jpg">'
                    f"</p><p>tg closing para</p></html>",
                    host,
                )
            g.page(TOPGEAR_API.format(collection=coll, page=page), "api",
                   json.dumps(items), api_host)


# ---------------------------------------------------------------------------
# unbox — seedless form-POST feed (start_requests POSTs the theme's
# load-more endpoint directly), DOUBLE-JSON HTML envelope, page gate on
# the last list date, multi-tag body selection (已部署/unbox.py)
# ---------------------------------------------------------------------------

UNBOX_POST_URL = "https://www.unbox.ph/wp-admin/admin-ajax.php"
# the tie theme's static block config (unbox.py:25-44); only 'page' moves
UNBOX_FIXED = {
    "action": "tie_blocks_load_more",
    "block[order]": "latest",
    "block[source]": "id",
    "block[number]": "10",
    "block[pagi]": "load-more",
    "block[excerpt]": "true",
    "block[post_meta]": "true",
    "block[read_more]": "true",
    "block[breaking_effect]": "reveal",
    "block[sub_style]": "big",
    "block[style]": "default",
    "block[title_length]": "",
    "block[excerpt_length]": "",
    "block[media_overlay]": "",
    "block[read_more_text]": "",
    "width": "single",
}

UNBOX_RULES = {
    "rule": FORM_PAGE,
    "format": "html",
    "api_format": "json_html",
    "json_html_double": True,  # json.loads TWICE (unbox.py:57)
    "json_html_key": "code",
    "seed_kind": "api",
    "seed_method": "POST",  # start_requests POSTs page 1 directly
    "form_page_param": "page",
    "extract": {
        # li > a — hrefs only; titles come off the article (py:58-59)
        "entry": {"sel": "li > a"},
        "more": r"<li",  # structural: the date gate ends the chain
        # gate: the LAST li date, fuzzy-parsed (py:60-61)
        "page_time": {"sel": "li .date.meta-item.tie-icon", "index": -1},
        "title": {"sel": ".entry-header > h1"},  # py:68
        "pub": {"sel": "span.date.meta-item.tie-icon"},  # py:76
        # body: p,em,strong,h3 inside entry-content, document order
        # (py:70-75); images from the same container (py:78-79)
        "block": {
            "para_sel": [".entry-content.entry.clearfix p",
                         ".entry-content.entry.clearfix em",
                         ".entry-content.entry.clearfix h3"],
            "img_sel": ".entry-content.entry.clearfix img",
        },
    },
    "article_pub_priority": "page",
    "title_priority": "page",
}


def _unbox_body(page: int) -> str:
    params = dict(UNBOX_FIXED)
    params["page"] = str(page)
    return "&".join(f"{k}={v}" for k, v in sorted(params.items()))


UNBOX_RULES["seed_body"] = _unbox_body(1)


def _unbox_date(dt: datetime) -> str:
    return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"


def _build_unbox(g: _G) -> None:
    step = [0]  # 8 h spacing; the 36 h cutoff trips on page 2's last date
    host = "www.unbox.ph"
    wid = 485
    base = f"https://{host}"
    g.registry[wid] = dict(UNBOX_RULES)
    g.seeds.append({"url": UNBOX_POST_URL, "website_id": wid,
                    "language_id": 1866})
    for page in (1, 2, 3):
        lis = []
        for e in range(2):
            dt = _t(step[0], 8.0)
            step[0] += 1
            aurl = f"{base}/review-{page}-{e}/"
            lis.append(
                f'<li><a href="{aurl}"></a>'
                f'<span class="date meta-item tie-icon">'
                f"{_unbox_date(dt)}</span></li>"
            )
            g.page(
                aurl, "article",
                f'<html><div class="entry-header"><h1>Unbox {page}-{e}'
                f'</h1></div><span class="date meta-item tie-icon">'
                f"{_unbox_date(dt)}</span>"
                f'<div class="entry-content entry clearfix">'
                f"<h3>Specs {page}-{e}</h3><p>unbox body {page}-{e}</p>"
                f'<img src="{base}/shot{page}{e}.png">'
                f"<em>verdict em</em></div></html>",
                host,
            )
        html = "<html><ul>" + "".join(lis) + "</ul></html>"
        g.page(UNBOX_POST_URL, "api",
               json.dumps(json.dumps({"code": html})),
               host, method="POST", body=_unbox_body(page))


# ---------------------------------------------------------------------------
# ambala — ungated entries with ARTICLE-level doc drops, pagination by
# side-fetching the LAST entry's article date, breadcrumb category,
# Month-D-Y switch dates (已部署/ambala.py)
# ---------------------------------------------------------------------------

AMBALA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "mdy_switch",  # time_adjustment (ambala.py:88-124)
    "entry_gate": False,  # every href yielded before any gate (py:50-55)
    # pagination gated by a requests.get of the LAST entry (py:57-60)
    "page_gate_fetch_last": {"sel": "span.thetime.date.updated"},
    # the article itself drops the doc when old (py:73-83)
    "article_drop_old": True,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "nav ul li", "link_sel": "a"},  # py:36-40
        "entry": {"sel": "div.article-three-posts article",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "next": {"sel": "li.nav-previous a", "attr": "href"},  # py:62-64
        "title": {"sel": "header h1"},
        "pub": {"sel": "span.thetime.date.updated"},
        "cat1": {"sel": "span.thecategory"},  # breadcrumb (py:79)
        "block": {"para_sel": "div.thecontent p"},
    },
}

# per-page entry ages (hours before BASE_DT): the news chain's page 2
# simply has no nav-previous link (gate passed, chain exhausted); the
# sports chain's page-1 LAST article is old — the side-fetch gate stops
# pagination AND its own doc is dropped by the article-level cutoff.
AMBALA_PAGES = {
    "news": [(0.0, 5.0, 10.0), (15.0, 20.0, 25.0)],
    "sports": [(30.0, 35.0, 40.0)],
}


def _build_ambala(g: _G) -> None:
    host = "ambalavaani.com"
    wid = 965
    base = f"http://{host}"
    g.registry[wid] = dict(AMBALA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    menu = "".join(
        f'<li><a href="{base}/category/{c}/">{c.title()}</a></li>'
        for c in AMBALA_PAGES
    )
    g.page(base + "/", "menu", f"<html><nav><ul>{menu}</ul></nav></html>",
           host)
    for cslug, pages in AMBALA_PAGES.items():
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-story-{p}-{e}/"
                rows.append(
                    f'<div class="article-three-posts"><article>'
                    f'<a href="{aurl}">t</a></article></div>'
                )
                g.page(
                    aurl, "article",
                    f"<html><header><h1>Ambala {cslug} {p}-{e}</h1>"
                    f"</header>"
                    f'<span class="thetime date updated">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                    f'<span class="thecategory">{cslug.title()}</span>'
                    f'<div class="thecontent"><p>ambala lead {p}-{e}.'
                    f"</p><p>more text.</p></div></html>",
                    host,
                )
            nxt = (f'<li class="nav-previous">'
                   f'<a href="{base}/category/{cslug}/page/{p + 1}/">'
                   f"Older</a></li>") if p < 2 else ""
            lurl = (f"{base}/category/{cslug}/" if p == 1
                    else f"{base}/category/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# dfa — menu group with a label-default map, hardcoded extra list URLs,
# carry-forward entry dates, justify/center styled-paragraph bodies
# (已部署/dfa.py)
# ---------------------------------------------------------------------------

DFA_BASE = "https://dfa.gov.ph"

DFA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "month_switch",  # 'D Month YYYY' switch (dfa.py:64-88)
    "entry_gate": False,  # every row yielded, dated or not (py:63-90)
    # entries missing a date inherit the last one seen; the final carried
    # value gates pagination (py:63-95)
    "entry_time_carry": True,
    # hardcoded entry points yielded alongside the mined menu (py:47-53)
    "extra_lists": [
        {"url": DFA_BASE + "/gad-feature-news",
         "category1": "Gender and Development", "category2": None},
    ],
    "extract": {
        "category": [
            {"sel": "li.item-1048 ul > li > a", "label": "News",
             "exclude_hrefs": ["/"],
             # known section names keep their text; everything else
             # collapses to 'Events' (py:39-46)
             "label2_default_unless": {
                 "keep": ["DFA Releases", "Statements and Advisories",
                          "News from our Foreign Service Posts"],
                 "default": "Events"}},
            {"sel": "li.item-1130 a", "label": "COVID-19 Advisories",
             "label2": False},
        ],
        "entry": {"sel": "tbody > tr",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": "td.list-date"}}},
        "next": {"sel": "li.pagination-next > a", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "block": {
            "para_sel": 'div[itemprop=articleBody]'
                        ' p[style="text-align: justify;"]',
            "img_sel": 'p[style="text-align: center;"] img',
        },
    },
}


def _dfa_date(dt: datetime) -> str:
    return f"{dt.day} {_MON_FULL[dt.month - 1]} {dt.year}"


def _build_dfa(g: _G) -> None:
    host = "dfa.gov.ph"
    wid = 1216
    g.registry[wid] = dict(DFA_RULES)
    g.seeds.append({"url": DFA_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = (
        '<li class="item-1048 deeper parent gmenu"><ul>'
        f'<li><a href="/">Home</a></li>'
        f'<li><a href="{DFA_BASE}/dfa-releases">DFA Releases</a></li>'
        f'<li><a href="{DFA_BASE}/dfa-updates">Updates</a></li>'
        "</ul></li>"
        f'<li class="item-1130 gmenu"><a href="{DFA_BASE}/covid-advisories">'
        "COVID-19</a></li>"
    )
    g.page(DFA_BASE + "/", "menu", f"<html><nav>{menu}</nav></html>", host)

    def art(slug: str, dt: datetime | None) -> str:
        aurl = f"{DFA_BASE}/news/{slug}"
        img = (f'<p style="text-align: center;">'
               f'<img src="/img/{slug}.jpg"></p>')
        g.page(
            aurl, "article",
            f'<html><h1 class="entry-title">DFA {slug}</h1>'
            f'<div itemprop="articleBody">'
            f'<p style="text-align: justify;">dfa body {slug} one</p>'
            f'<p style="text-align: justify;">dfa body {slug} two</p>'
            f"{img}</div></html>",
            host,
        )
        d = f'<td class="list-date small">{_dfa_date(dt)}</td>' if dt else ""
        return f'<tr><a href="{aurl}">{slug}</a>{d}</tr>'

    # dfa-releases: page 1 exercises the carry (middle row undated),
    # page 2's carried last date is stale → chain stops. The other three
    # lists are single pages without a next link.
    rows = [art("rel-1-0", BASE_DT),
            art("rel-1-1", None),  # carries rel-1-0's date
            art("rel-1-2", BASE_DT - timedelta(hours=10))]
    g.page(
        DFA_BASE + "/dfa-releases", "list",
        "<html><table><tbody>" + "".join(rows) + "</tbody></table>"
        f'<li class="pagination-next">'
        f'<a href="{DFA_BASE}/dfa-releases?page=2">next</a></li></html>',
        host,
    )
    rows = [art("rel-2-0", BASE_DT - timedelta(hours=20)),
            art("rel-2-1", BASE_DT - timedelta(hours=40))]
    g.page(
        DFA_BASE + "/dfa-releases?page=2", "list",
        "<html><table><tbody>" + "".join(rows) + "</tbody></table>"
        f'<li class="pagination-next">'
        f'<a href="{DFA_BASE}/dfa-releases?page=3">next</a></li></html>',
        host,
    )
    for lst, slug in (("/dfa-updates", "upd"), ("/gad-feature-news", "gad"),
                      ("/covid-advisories", "cov")):
        rows = [art(f"{slug}-0", BASE_DT - timedelta(hours=2)),
                art(f"{slug}-1", BASE_DT - timedelta(hours=4))]
        g.page(DFA_BASE + lst, "list",
               "<html><table><tbody>" + "".join(rows)
               + "</tbody></table></html>", host)


# ---------------------------------------------------------------------------
# doh — single mined category, Drupal view lists with carry-forward
# dates, positional field-item image/body split, first-sentence+ellipsis
# abstracts (已部署/doh.py)
# ---------------------------------------------------------------------------

DOH_BASE = "https://doh.gov.ph"

DOH_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "mdy_switch",  # 'Month D, YYYY' switch (doh.py:48-75)
    "entry_gate": False,
    "entry_time_carry": True,  # time2 persists across undated rows
    "extract": {
        "category": {"sel": "li#menu-1929-1 a"},  # ONE section (py:32-35)
        "entry": {"sel": "div.panel > div > div.view-content > div",
                  "fields": {
                      "href": {"sel": "a", "attr": "href"},
                      "time": {"sel": "span.field-content.content-time"},
                  }},
        "next": {"sel": "li.pager-next > a", "attr": "href"},
        "title": {"sel": "h5.page__title.title"},
        # the 2-div field-item split is positional in the reference
        # (py:97-105: div_list[0] image, div_list[-1] body) — the markup
        # itself keeps images out of the body div, so one selector pair
        # lands on the same nodes
        "block": {"para_sel": "div.field-item.even p",
                  "img_sel": "div.field-item.even img"},
    },
    # abstract = body's first sentence + '...' (py:117)
    "abstract_split": {"sep": ".", "take": 1, "suffix": "..."},
    "title_priority": "page",
}


def _build_doh(g: _G) -> None:
    host = "doh.gov.ph"
    wid = 1218
    g.registry[wid] = dict(DOH_RULES)
    g.seeds.append({"url": DOH_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        DOH_BASE + "/", "menu",
        f'<html><li id="menu-1929-1"><a href="{DOH_BASE}/press-releases">'
        "Press Releases</a></li></html>",
        host,
    )
    pages = [(0.0, None, 12.0), (24.0, 40.0)]
    for p, ages in enumerate(pages, 1):
        rows = []
        for e, age in enumerate(ages):
            aurl = f"{DOH_BASE}/press/{p}-{e}"
            d = ""
            if age is not None:
                dt = BASE_DT - timedelta(hours=age)
                d = (f'<span class="field-content content-time">'
                     f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                     f"</span>")
            rows.append(f'<div>{d}<a href="{aurl}">doh {p}-{e}</a></div>')
            g.page(
                aurl, "article",
                f'<html><h5 class="page__title title">DOH {p}-{e}</h5>'
                f'<div class="field-item even">'
                f'<img src="{DOH_BASE}/img/{p}{e}.jpg"></div>'
                f'<div class="field-item even">'
                f"<p>doh first sentence {p}-{e}. doh second sentence.</p>"
                f"</div></html>",
                host,
            )
        nxt = (f'<li class="pager-next"><a href="/press-releases?page={p}">'
               "next</a></li>") if p == 1 else ""
        lurl = (DOH_BASE + "/press-releases" if p == 1
                else f"{DOH_BASE}/press-releases?page={p - 1}")
        g.page(lurl, "list",
               f'<html><div class="panel"><div><div class="view-content">'
               + "".join(rows) + f"</div></div></div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# jb — menu hrefs bolted onto an '/index.php&p=N' counter, every entry
# yielded AND the last probed dont_filter for pagination only,
# Portuguese bylines through an English month switch (已部署/jb.py)
# ---------------------------------------------------------------------------

JB_BASE = "https://www.jb.com.br"

JB_RULES = {
    "rule": NEXT_LINK,  # pagination is probe-driven; no direct next link
    "format": "html",
    "date_style": "pt_dmy_hm",  # jb.py:63-92's positional month switch
    "entry_gate": False,  # all entries yielded before the probe (py:47-50)
    "probe_last": True,
    # the last entry was already yielded normally — the probe ONLY
    # decides pagination (py:52-55, parse_next_page yields no article)
    "probe_keep_last": True,
    # the menu href is only a base: '/index.php&p=' + page (py:37-40)
    "menu_list_url_fmt": "{base}/index.php&p={page}",
    "page_url_fmt": "{base}/index.php&p={page}",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "div.css-1llhclm > ul.css-1vxc2sl"
                            " > li.css-cwdrld > a.css-1wjnrbv",
                     "skip": 1},
        "entry": {"sel": "li.css-ye6x8s > article.css-1cp3ece"
                         " > div.css-1l4spti > a"},
        "title": {"sel": "h1#link-1b44e840"},
        "pub": {"sel": "time.css-1sbuyqj"},
        "abstract": {"sel": "p#article-summary"},
        "block": {"para_sel": "p.css-158dogj",
                  "img_sel": "picture > img"},
    },
}


def _jb_date(dt: datetime) -> str:
    """'Qua 26 de May de 2021 18:30' — the byline token shape jb.py:66's
    re.split(',| ') positions expect (English month abbreviations)."""
    return (f"Qua {dt.day} de {_MON_ABBR[dt.month - 1]} de {dt.year} "
            f"{dt.hour}:{dt.minute:02d}")


def _build_jb(g: _G) -> None:
    host = "www.jb.com.br"
    wid = 678
    g.registry[wid] = dict(JB_RULES)
    g.seeds.append({"url": JB_BASE + "/", "website_id": wid,
                    "language_id": 2122})
    menu = (
        '<div class="css-1llhclm"><ul class="css-1vxc2sl">'
        + "".join(
            f'<li class="css-cwdrld"><a class="css-1wjnrbv" '
            f'href="{JB_BASE}/{c}">{c.title()}</a></li>'
            for c in ("home", "pais", "rio")
        )
        + "</ul></div>"
    )
    g.page(JB_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = {"pais": [(0.0, 10.0), (20.0, 40.0)],
             "rio": [(5.0, 15.0), (25.0, 45.0)]}
    for cslug, page_ages in pages.items():
        for p, ages in enumerate(page_ages, 1):
            lis = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{JB_BASE}/{cslug}/noticia-{p}-{e}"
                lis.append(
                    f'<li class="css-ye6x8s"><article class="css-1cp3ece">'
                    f'<div class="css-1l4spti"><a href="{aurl}">t</a>'
                    f"</div></article></li>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 id="link-1b44e840">JB {cslug} {p}-{e}</h1>'
                    f'<time class="css-1sbuyqj">{_jb_date(dt)}</time>'
                    f'<picture><img src="{JB_BASE}/f/{cslug}{p}{e}.jpg">'
                    f"</picture>"
                    f'<p id="article-summary">resumo {cslug} {p}-{e}</p>'
                    f'<p class="css-158dogj">corpo {cslug} {p}-{e} um</p>'
                    f'<p class="css-158dogj">corpo dois</p></html>',
                    host,
                )
            g.page(
                f"{JB_BASE}/{cslug}/index.php&p={p}", "list",
                '<html><ol aria-live="polite">' + "".join(lis)
                + "</ol></html>",
                host,
            )


# ---------------------------------------------------------------------------
# poorvanchalmedia — dropdown-filtered menu, list-scraped lead images
# (data-src), category1 from the LIST page's own title, last-entry meta
# page gate, dash-time article dates (已部署/poorvanchalmedia.py)
# ---------------------------------------------------------------------------

PVM_BASE = "https://www.poorvanchalmedia.com"

POORVANCHALMEDIA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # time_font's INTENT ('Mon D, YYYY - HH:MM'; the reference's token
    # indexing re-splits its own first token — see parser.parse_site_date)
    "date_style": "mdy_hm_dash",
    "page_time_style": "mdy_switch",  # time_font_2 (py:42-72)
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # only li's carrying a dropdown-toggle link are sections (py:94-97)
        "category": {"sel": "ul.nav.navbar-nav li", "skip": 1,
                     "link_sel": "a.dropdown-toggle.disabled"},
        "cat1_self": {"sel": "h1.page-title"},  # py:101
        "entry": {"sel": "#content div.post-item-image",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "img": {"sel": "img", "attr": "data-src"}}},
        # gate: the LAST post-item's meta date (py:106-111)
        "page_time": {"sel": "#content div.post-item p.post-meta",
                      "index": -1},
        "next": {"sel": "ul.pagination li.next a", "attr": "href"},
        "title": {"sel": "h1.title"},
        "pub": {"sel": ".post-details-meta-date span.sp-left"},
        "block": {"para_sel": ".post-text.show_data_between_para p"},
    },
}


def _build_poorvanchalmedia(g: _G) -> None:
    host = "www.poorvanchalmedia.com"
    wid = 1144
    g.registry[wid] = dict(POORVANCHALMEDIA_RULES)
    g.seeds.append({"url": PVM_BASE + "/", "website_id": wid,
                    "language_id": 1740})
    menu = (
        "<ul class=\"nav navbar-nav\">"
        f'<li><a href="{PVM_BASE}/">Home</a></li>'
        f'<li><a class="dropdown-toggle disabled" href="{PVM_BASE}/up">'
        "यूपी</a></li>"
        f'<li><a href="{PVM_BASE}/tv">TV</a></li>'  # no dropdown → skipped
        f'<li><a class="dropdown-toggle disabled" href="{PVM_BASE}/bihar">'
        "बिहार</a></li>"
        "</ul>"
    )
    g.page(PVM_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 12.0), (24.0, 40.0)]
    for cslug, label in (("up", "यूपी खबरें"), ("bihar", "बिहार खबरें")):
        for p, ages in enumerate(pages, 1):
            items = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{PVM_BASE}/{cslug}/khabar-{p}-{e}"
                items.append(
                    f'<div class="post-item"><div class="post-item-image">'
                    f'<a href="{aurl}"></a>'
                    f'<img data-src="{PVM_BASE}/im/{cslug}{p}{e}.jpg">'
                    f'</div><p class="post-meta">'
                    f"{_MON_ABBR[dt.month - 1]} {dt.day}, {dt.year}</p>"
                    f"</div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="title">PVM {cslug} {p}-{e}</h1>'
                    f'<div class="post-details-meta-date">'
                    f'<span class="sp-left">{_MON_ABBR[dt.month - 1]} '
                    f"{dt.day}, {dt.year} - {dt.hour}:{dt.minute:02d}"
                    f"</span></div>"
                    f'<div class="post-text show_data_between_para">'
                    f"<p>pvm body {cslug} {p}-{e} पहला</p><p>दूसरा</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<ul class="pagination"><li class="next">'
                   f'<a href="{PVM_BASE}/{cslug}?page={p + 1}">»</a>'
                   "</li></ul>")
            lurl = (f"{PVM_BASE}/{cslug}" if p == 1
                    else f"{PVM_BASE}/{cslug}?page={p}")
            g.page(lurl, "list",
                   f'<html><h1 class="page-title">{label}</h1>'
                   f'<div id="content">' + "".join(items)
                   + f"</div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# newstracklive — two-group menu (first three + dropdown subs), both
# categories from the LIST page's own title, side-fetch last-entry page
# gate, the bugged AM/PM+minute-is-month date switch, carousel body
# fallback (已部署/newstracklive.py)
# ---------------------------------------------------------------------------

NTL_BASE = "https://www.newstracklive.com"

NEWSTRACKLIVE_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # time_font, bug-faithful: PM adds 11 and the minute field is the
    # MONTH number (newstracklive.py:11-47)
    "date_style": "mdy_hm_ampm_bugged",
    "entry_gate": False,
    # pagination decided by requests.get of the LAST entry (py:93-99)
    "page_gate_fetch_last": {"sel": "div.time"},
    "cat2_from_cat1": True,  # category2 = category1 (py:86-89)
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": [
            {"sel": "div.collapse.navbar-collapse ul li",
             "slice": [0, 3], "link_sel": "a"},
            {"sel": "div.collapse.navbar-collapse ul li.dropdown"
                    " ul.dropdown-menu.text-capitalize li",
             "link_sel": "a"},
        ],
        "cat1_self": {"sel": "div.main-title-outer div.main-title"},
        "entry": {"sel": "div.col-md-4.col-sm-8.col-xs-16"
                         " div.topic.nt_topic a"},
        "next": {"sel": "div.ntdv_pagination li a", "index": -1,
                 "attr": "href"},
        "title": {"sel": ".col-sm-16.sec-info > h1"},
        "pub": {"sel": "div.text-danger.sub-info-bordered div.time"},
        "block": {"para_sel": ".col-sm-16.sec-info p",
                  # body falls back to the photo-carousel captions when
                  # the article has no sec-info paragraphs (py:108-112)
                  "para_sel_fallback": ".carousel-caption p",
                  "img_sel": "div.ntdv_imgcon > img"},
    },
}


def _ntl_date(dt: datetime) -> str:
    """'May 29 2021 3:45 PM' — the div.time token shape time_font
    (newstracklive.py:11-21) splits on single spaces."""
    h12 = dt.hour % 12 or 12
    half = "PM" if dt.hour >= 12 else "AM"
    return (f"{_MON_ABBR[dt.month - 1]} {dt.day} {dt.year} "
            f"{h12}:{dt.minute:02d} {half}")


def _build_newstracklive(g: _G) -> None:
    host = "www.newstracklive.com"
    wid = 1134
    g.registry[wid] = dict(NEWSTRACKLIVE_RULES)
    g.seeds.append({"url": NTL_BASE + "/", "website_id": wid,
                    "language_id": 1740})
    menu = (
        '<div class="collapse navbar-collapse"><ul>'
        f'<li><a href="{NTL_BASE}/news/national">National</a></li>'
        f'<li><a href="{NTL_BASE}/news/world">World</a></li>'
        f'<li><a href="{NTL_BASE}/news/sports">Sports</a></li>'
        f'<li><a href="{NTL_BASE}/tv">TV</a></li>'  # beyond [:3]
        '<li class="dropdown"><a href="#">More</a>'
        '<ul class="dropdown-menu text-capitalize">'
        f'<li><a href="{NTL_BASE}/news/tech">Tech</a></li>'
        "</ul></li></ul></div>"
    )
    g.page(NTL_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 14.0), (28.0, 42.0)]
    for cslug in ("national", "world", "sports", "tech"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{NTL_BASE}/{cslug}/story-{p}-{e}"
                rows.append(
                    f'<div class="col-md-4 col-sm-8 col-xs-16">'
                    f'<div class="topic nt_topic"><a href="{aurl}">t</a>'
                    f"</div></div>"
                )
                caro = cslug == "tech" and e == 0
                body = (
                    '<div class="carousel-caption"><p>ntl carousel '
                    f"{cslug} {p}-{e}</p></div>" if caro else
                    f'<div class="col-sm-16 sec-info">'
                    f"<h1>NTL {cslug} {p}-{e}</h1>"
                    f"<p>ntl body {cslug} {p}-{e}</p><p>more</p></div>"
                )
                head = ("" if not caro else
                        f'<div class="col-sm-16 sec-info">'
                        f"<h1>NTL {cslug} {p}-{e}</h1></div>")
                g.page(
                    aurl, "article",
                    f"<html>{head}"
                    f'<div class="text-danger sub-info-bordered">'
                    f'<div class="time">{_ntl_date(dt)}</div></div>'
                    f"{body}"
                    f'<div class="ntdv_imgcon">'
                    f'<img src="{NTL_BASE}/im/{cslug}{p}{e}.jpg"></div>'
                    f"</html>",
                    host,
                )
            nxt = (f'<div class="ntdv_pagination">'
                   f'<li><a href="?page={p + 1}">next</a></li></div>')
            lurl = (f"{NTL_BASE}/news/{cslug}" if p == 1
                    else f"{NTL_BASE}/news/{cslug}?page={p}")
            g.page(lurl, "list",
                   f'<html><div class="main-title-outer pull-left">'
                   f'<div class="main-title">{cslug.title()} News</div>'
                   "</div>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# divyahimachal — skip-sliced nested menu with child skips, TWO entry
# groups (featured + grid), byline page gate with the token-count dual
# date form, 8th-span article dates, danda-split abstract fallback
# (已部署/divyahimachal.py)
# ---------------------------------------------------------------------------

DH_BASE = "https://www.divyahimachal.com"

DIVYAHIMACHAL_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # format_time2's dual form: ordinal'd 'Mon D(th), YYYY H:MM am/pm' on
    # articles, 'Month D, YYYY' midnight on list bylines (py:12-86).
    # NOTE the reference mutates ONE shared item dict across its menu
    # loop (meta={"item": item}) — which categories a doc ends up with
    # depends on response arrival order there; this port keeps the sane
    # per-request lineage instead of replicating the race.
    "date_style": "dh_fuzzy",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul.navbar.left > li", "slice": [1, -1],
                     "link_sel": "a", "children_sel": "ul > li > a",
                     "children_skip": 1,
                     "children_suppress_parent": True},
        "excluded_labels": ["Epaper"],  # py:117-118
        # the featured o-topnewsnew link is yielded BEFORE the grid
        # (py:139-146)
        "entry": [
            {"sel": "div.o-topnewsnew",
             "fields": {"href": {"sel": "a", "attr": "href"}}},
            {"sel": "div.frame.left",
             "fields": {"href": {"sel": "a", "attr": "href"}}},
        ],
        # gate: last byline minus its first token (py:147's
        # text.split(" ", 1)[1])
        "page_time": {"sel": "span.byline", "index": -1,
                      "re": r"^\S+ (.*)$"},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "article.storybox h1"},
        # the EIGHTH span on the page (py:162's find_all("span")[7])
        "pub": {"sel": "span", "index": 7},
        "abstract": {"sel": "div.content-body p > strong"},
        "block": {"para_sel": "div.content-body p",
                  "img_sel": "img.attachment-post-thumbnail"
                             ".size-post-thumbnail.wp-post-image"},
    },
    "abstract_split": {"sep": "।"},  # py:166's body.split('।')[0]
}


def _dh_article_date(dt: datetime) -> str:
    h12 = dt.hour % 12 or 12
    half = "pm" if dt.hour >= 12 else "am"
    return (f"{_MON_ABBR[dt.month - 1]} {dt.day}th, {dt.year} "
            f"{h12}:{dt.minute:02d} {half}")


def _build_divyahimachal(g: _G) -> None:
    host = "www.divyahimachal.com"
    wid = 1091
    g.registry[wid] = dict(DIVYAHIMACHAL_RULES)
    g.seeds.append({"url": DH_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = (
        '<ul class="navbar left">'
        f'<li><a href="/">Home</a></li>'
        f'<li><a href="/himachal">हिमाचल</a><ul>'
        f'<li><a href="/himachal">सभी</a></li>'  # children_skip drops this
        f'<li><a href="/himachal/shimla">शिमला</a></li>'
        f'<li><a href="/himachal/mandi">मंडी</a></li>'
        "</ul></li>"
        f'<li><a href="/desh">देश</a></li>'
        f'<li><a href="/epaper">Epaper</a></li>'
        f'<li><a href="/dh-tv">DH TV</a></li>'  # [1:-1] drops this
        "</ul>"
    )
    g.page(DH_BASE + "/", "menu", f"<html>{menu}</html>", host)

    def art(slug: str, dt: datetime) -> str:
        aurl = f"{DH_BASE}/story/{slug}"
        fillers = "".join(f"<span>m{k}</span>" for k in range(7))
        g.page(
            aurl, "article",
            f"<html>{fillers}<span>{_dh_article_date(dt)}</span>"
            f'<article class="storybox"><h1>DH {slug}</h1></article>'
            f'<img class="attachment-post-thumbnail '
            f'size-post-thumbnail wp-post-image" src="/th/{slug}.jpg">'
            f'<div class="content-body"><p><strong>सार {slug}</strong>'
            f"</p><p>पहला वाक्य {slug}। दूसरा वाक्य।</p></div></html>",
            host,
        )
        return aurl

    pages = [(0.0, 8.0, 16.0), (24.0, 32.0, 40.0)]
    for cpath in ("/himachal/shimla", "/himachal/mandi", "/desh"):
        cslug = cpath.rsplit("/", 1)[-1]
        for p, ages in enumerate(pages, 1):
            dts = [BASE_DT - timedelta(hours=a) for a in ages]
            featured = art(f"{cslug}-f{p}", dts[0])
            frames = "".join(
                f'<div class="frame left">'
                f'<a href="{art(f"{cslug}-{p}-{e}", dt)}">t</a>'
                f'<span class="byline">By {_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</span></div>"
                for e, dt in enumerate(dts[1:])
            )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{DH_BASE}{cpath}/page/{p + 1}/">»</a>')
            lurl = (DH_BASE + cpath if p == 1
                    else f"{DH_BASE}{cpath}/page/{p}/")
            g.page(lurl, "list",
                   f'<html><div class="o-topnewsnew">'
                   f'<a href="{featured}">f</a></div>{frames}{nxt}</html>',
                   host)


# ---------------------------------------------------------------------------
# philippinesnews — sliced flat menu, single-page lists with no
# pagination and no gating, title/date off a shared title_text block
# (已部署/philippinesnews.py)
# ---------------------------------------------------------------------------

PN_BASE = "https://www.philippinesnews.net"

PHILIPPINESNEWS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "pn_dmy_hm",  # py:57-84's [-6..-2] positional switch
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul.dropdown.menu li a", "slice": [1, 4]},
        "entry": {"sel": "div.media-object-section h5",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "title": {"sel": "div.title_text a"},
        "pub": {"sel": "div.title_text p"},
        "block": {"para_sel": "div.detail_text p",
                  "img_sel": "div.article_image img"},
    },
}


def _build_philippinesnews(g: _G) -> None:
    host = "www.philippinesnews.net"
    wid = 1209
    g.registry[wid] = dict(PHILIPPINESNEWS_RULES)
    g.seeds.append({"url": PN_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = ('<ul class="dropdown menu">'
            + "".join(f'<li><a href="/{c}">{c.title()}</a></li>'
                      for c in ("home", "news", "sport", "biz", "extra"))
            + "</ul>")
    g.page(PN_BASE + "/", "menu", f"<html>{menu}</html>", host)
    step = [0]
    for cslug in ("news", "sport", "biz"):
        rows = []
        for e in range(3):
            dt = _t(step[0], 3.0)
            step[0] += 1
            aurl = f"{PN_BASE}/{cslug}/item-{e}"
            rows.append(f'<div class="media-object-section"><h5>'
                        f'<a href="/{cslug}/item-{e}">t</a></h5></div>')
            g.page(
                aurl, "article",
                f'<html><div class="title_text"><a href="#">PN {cslug} '
                f"{e}</a><p>Updated {dt.day} "
                f"{_MON_ABBR[dt.month - 1]} {dt.year} at "
                f"{dt.hour}:{dt.minute:02d} PST</p></div>"
                f'<div class="detail_text"><p>pn body {cslug} {e}</p>'
                f"<p>second para</p></div>"
                f'<div class="article_image">'
                f'<img src="{PN_BASE}/i/{cslug}{e}.jpg"></div></html>',
                host,
            )
        g.page(f"{PN_BASE}/{cslug}", "list",
               "<html>" + "".join(rows) + "</html>", host)


# ---------------------------------------------------------------------------
# tourism — seedless static list (no menu, no pagination, no gates),
# title regexed out from beside its date <small>, constant categories
# (已部署/tourism.py)
# ---------------------------------------------------------------------------

TOURISM_BASE = "http://www.tourism.gov.ph"

TOURISM_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",  # start_urls IS the list (tourism.py:16,30-36)
    "date_style": "tourism_mdy",  # py:43-69's [-4..-1] switch
    "cat1_const": "News Updates",  # py:100-101
    "cat2_const": "Featured News",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "entry": {"sel": "h4.media-heading > a"},
        # title = the page-header text with its <small> extracted
        # (py:72-74) — regex keeps everything before the tag
        "title": r'<h2 class="page-header">([^<]+?)\s*<small',
        "pub": {"sel": "h2.page-header > small"},
        "block": {"para_sel": "div.col-md-12 > p",
                  "img_sel": "center > img"},
    },
}


def _build_tourism(g: _G) -> None:
    host = "www.tourism.gov.ph"
    wid = 1219
    g.registry[wid] = dict(TOURISM_RULES)
    g.seeds.append({"url": TOURISM_BASE + "/news", "website_id": wid,
                    "language_id": 1866})
    rows = []
    for e in range(4):
        dt = _t(e, 4.0)
        aurl = f"{TOURISM_BASE}/news/update-{e}"
        rows.append(f'<h4 class="media-heading">'
                    f'<a href="/news/update-{e}">t</a></h4>')
        g.page(
            aurl, "article",
            f'<html><h2 class="page-header">Tourism Update {e} '
            f"<small>on {_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
            f"</small></h2>"
            f'<div class="col-md-12"><p>tourism body {e} single line</p>'
            f"</div><center><img src=\"/img/t{e}.jpg\"></center></html>",
            host,
        )
    g.page(TOURISM_BASE + "/news", "list",
           "<html>" + "".join(rows) + "</html>", host)


# ---------------------------------------------------------------------------
# haribhoomi — sentinel-terminated menu walk, 'View All' list marker
# (pages without it yield nothing), GMT-suffixed AM/PM dates, custom
# <h-img> body images, positional tag-block breadcrumbs
# (已部署/haribhoomi.py)
# ---------------------------------------------------------------------------

HB_BASE = "https://www.haribhoomi.com"

HARIBHOOMI_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "dmy_hm_ampm",  # py:8-78 'D Month YYYY H:MM AM/PM'
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # the walk BREAKS at the /live-tv link — everything after is
        # never crawled (py:110-111)
        "category": {"sel": "div.main-menu.navbar-collapse.collapse"
                            " nav ul a",
                     "stop_href": "/live-tv"},
        # a page without 'View All' is an unexpected submenu: log-and-
        # yield-nothing (py:121,144-145)
        "require_marker": r"View All",
        "entry": {"sel": "div.news_listing_main_v2 div.list_content",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": "div.list_content span.convert-to-localtime",
                      "index": -1, "re": r"^(.*?)(?: GMT.*)?$"},
        "next": {"sel": "a.page-numbers.next.last", "attr": "href"},
        "title": {"sel": "h1"},
        "pub": {"sel": "span.convert-to-localtime",
                "re": r"^(.*?)(?: GMT.*)?$"},
        "abstract": {"sel": "h2.desc_data"},
        # tag-block breadcrumbs, positional: a[1] = category1, a[2] =
        # category2, text trimmed at '>' (py:169-170)
        "cat1": {"sel": "div.tag-block a", "index": 1,
                 "re": r"^\s*([^>]*[^>\s])"},
        "cat2": {"sel": "div.tag-block a", "index": 2,
                 "re": r"^\s*([^>]*[^>\s])"},
        "block": {"para_sel": "div.story_content p",
                  "img_sel": ["div.image-wrap-article img",
                              "h-img.hocalwire-draggable"]},
    },
    "abstract_split": {"sep": "।"},
}


def _hb_date(dt: datetime) -> str:
    h12 = dt.hour % 12 or 12
    half = "PM" if dt.hour >= 12 else "AM"
    return (f"{dt.day} {_MON_FULL[dt.month - 1]} {dt.year} "
            f"{h12}:{dt.minute:02d} {half} GMT+0530")


def _build_haribhoomi(g: _G) -> None:
    host = "www.haribhoomi.com"
    wid = 984
    g.registry[wid] = dict(HARIBHOOMI_RULES)
    g.seeds.append({"url": HB_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = (
        '<div id="sticky"><div class="main-menu navbar-collapse collapse">'
        "<nav><ul>"
        f'<li><a href="/state">राज्य</a></li>'
        f'<li><a href="/astro">ज्योतिष</a></li>'  # submenu page: no marker
        f'<li><a href="/live-tv">Live TV</a></li>'
        f'<li><a href="/never">Never crawled</a></li>'
        "</ul></nav></div></div>"
    )
    g.page(HB_BASE + "/", "menu", f"<html>{menu}</html>", host)
    # /astro: an unexpected submenu — no 'View All', yields nothing
    g.page(HB_BASE + "/astro", "list",
           "<html><nav>submenu only</nav></html>", host)
    pages = [(0.0, 13.0), (26.0, 39.0)]
    for p, ages in enumerate(pages, 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{HB_BASE}/state/khabar-{p}-{e}"
            rows.append(
                f'<div class="list_content"><a href="/state/khabar-{p}-{e}">'
                f't</a><span class="convert-to-localtime">{_hb_date(dt)}'
                f"</span></div>"
            )
            g.page(
                aurl, "article",
                f'<html><div id="details-page-infinite-scrolling-data">'
                f"<h1>HB state {p}-{e}</h1>"
                f'<span class="convert-to-localtime">{_hb_date(dt)}</span>'
                f'<div class="tag-block"><a href="#">होम</a>'
                f'<a href="#">राज्य &gt; </a><a href="#">हरियाणा &gt; </a>'
                f"</div>"
                f'<div class="image-wrap-article">'
                f'<img src="/th/s{p}{e}.jpg"></div>'
                f'<div class="story_content"><p>पहला वाक्य {p}-{e}। '
                f"दूसरा।</p>"
                f'<h-img class="hocalwire-draggable" src="/in/s{p}{e}.jpg">'
                f"</h-img></div></div></html>",
                host,
            )
        nxt = (f'<a class="page-numbers next last page-numbers" '
               f'href="{HB_BASE}/state?page={p + 1}">next</a>')
        lurl = (HB_BASE + "/state" if p == 1
                else f"{HB_BASE}/state?page={p}")
        g.page(lurl, "list",
               '<html>View All<div class="news_listing_main_v2">'
               + "".join(rows) + f"</div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# samacharjagat — pipe-trimmed weekday timestamps with seconds, danda
# two-segment abstracts, hspace-attribute body images with the feature
# image appended last (已部署/samacharjagat.py)
# ---------------------------------------------------------------------------

SJ_BASE = "https://www.samacharjagat.com"

SAMACHARJAGAT_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # 'Weekday, D Mon YYYY H:MM:SS AM/PM' (py:8-54). The reference's
    # shared-item meta race (see divyahimachal) is likewise kept sane
    # per-request here.
    "date_style": "wdmy_hms_ampm",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul.nav.navbar-nav li > a", "skip": 1},
        "entry": {"sel": "div.col-md-8 div.col-md-3 > a"},
        "page_time": {"sel": "div.cat_page > div", "index": -1},
        "next": {"sel": "ul.pager li > a", "index": -1, "attr": "href"},
        "title": {"sel": "div.post_heading h1"},
        # the byline text after '|', minus the reference's odd first-char
        # drop (py:122-125's pub_time[1:] char loop)
        "pub": {"sel": "div.post_heading div.post_meta",
                "re": r"\|.(.*)$"},
        "block": {"para_sel": "div.post_body > p",
                  "img_sel": ["img[hspace=0]", "div.feature_image img"]},
    },
    # abstract = first TWO danda segments concatenated (py:135)
    "abstract_split": {"sep": "।", "take": 2},
}


def _sj_date(dt: datetime) -> str:
    h12 = dt.hour % 12 or 12
    half = "PM" if dt.hour >= 12 else "AM"
    return (f"Tuesday, {dt.day} {_MON_ABBR[dt.month - 1]} {dt.year} "
            f"{h12}:{dt.minute:02d}:00 {half}")


def _build_samacharjagat(g: _G) -> None:
    host = "www.samacharjagat.com"
    wid = 1095
    g.registry[wid] = dict(SAMACHARJAGAT_RULES)
    g.seeds.append({"url": SJ_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<ul class="nav navbar-nav">'
            f'<li><a href="{SJ_BASE}/">होम</a></li>'
            f'<li><a href="{SJ_BASE}/rajasthan">राजस्थान</a></li>'
            f'<li><a href="{SJ_BASE}/national">राष्ट्रीय</a></li></ul>')
    g.page(SJ_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 11.0), (22.0, 44.0)]
    for cslug in ("rajasthan", "national"):
        for p, ages in enumerate(pages, 1):
            rows, gates = [], []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{SJ_BASE}/{cslug}/news-{p}-{e}"
                rows.append(f'<div class="col-md-3">'
                            f'<a href="{aurl}">t</a></div>')
                gates.append(f"<div>{_sj_date(dt)}</div>")
                g.page(
                    aurl, "article",
                    f'<html><div class="post_heading">'
                    f"<h1>SJ {cslug} {p}-{e}</h1>"
                    f'<div class="post_meta">SJ News | {_sj_date(dt)}'
                    f"</div></div>"
                    f'<div class="post_body"><p>पहला खंड {p}-{e}।'
                    f"दूसरा खंड।तीसरा।</p>"
                    f'<img hspace="0" src="/b/{cslug}{p}{e}.jpg"></div>'
                    f'<div class="col-md-12 feature_image img-responsive">'
                    f'<img src="/f/{cslug}{p}{e}.jpg"></div></html>',
                    host,
                )
            nxt = (f'<ul class="pager"><li><a href="?page={p + 1}">'
                   "आगे</a></li></ul>")
            lurl = (f"{SJ_BASE}/{cslug}" if p == 1
                    else f"{SJ_BASE}/{cslug}?page={p}")
            g.page(
                lurl, "list",
                f'<html><div class="col-md-8">' + "".join(rows)
                + f'<div class="col-md-9"><div class="cat_page">'
                + "".join(gates) + f"</div></div></div>{nxt}</html>",
                host,
            )


# ---------------------------------------------------------------------------
# tarunmitra — ':'-labeled menu items route through a SECOND-LEVEL page
# whose strong links are the real sections, slice [2:-4], tie-theme next
# link, dash-joined AM/PM dates (已部署/tarunmitra.py)
# ---------------------------------------------------------------------------

TM_BASE = "https://tarunmitra.in"

TARUNMITRA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "mdy_hm_ampm2",  # 'MonthFull D, YYYY- H:MM AM/PM'
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # labels with ':' are two-level sections; category1 keeps the
        # prefix (py:91-97)
        "category": {"sel": "#menu-main-menu li", "slice": [2, -4],
                     "link_sel": "a", "menu2_label_sep": ":"},
        # the second-level page's strong links (py:98-106)
        "category2": {"sel": "div.entry p > strong > a"},
        "entry": {"sel": "article.item-list",
                  "fields": {"href": {"sel": "h2 > a", "attr": "href"}}},
        "page_time": {"sel": "#main-content div.content article > p"
                             " > span", "index": -1},
        "next": {"sel": "#tie-next-page > a", "attr": "href"},
        "title": {"sel": "h1.name.post-title.entry-title"},
        "pub": {"sel": "span.tie-date"},
        "block": {"para_sel": "#the-post div.entry > p",
                  "img_sel": "img.attachment-full.size-full"
                             ".wp-post-image"},
    },
}


def _tm_date(dt: datetime) -> str:
    h12 = dt.hour % 12 or 12
    half = "PM" if dt.hour >= 12 else "AM"
    return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}- "
            f"{h12}:{dt.minute:02d} {half}")


def _build_tarunmitra(g: _G) -> None:
    host = "tarunmitra.in"
    wid = 1112
    g.registry[wid] = dict(TARUNMITRA_RULES)
    g.seeds.append({"url": TM_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    lis = (
        [f'<li><a href="{TM_BASE}/x{k}">x{k}</a></li>' for k in range(2)]
        + [f'<li><a href="{TM_BASE}/desh">देश</a></li>',
           f'<li><a href="{TM_BASE}/rajya">राज्य: सभी</a></li>']
        + [f'<li><a href="{TM_BASE}/y{k}">y{k}</a></li>' for k in range(4)]
    )
    g.page(TM_BASE + "/", "menu",
           f'<html><ul id="menu-main-menu">{"".join(lis)}</ul></html>',
           host)
    # the ':'-labeled section routes through this second-level page
    g.page(
        TM_BASE + "/rajya", "menu2",
        f'<html><div class="entry"><p><strong>'
        f'<a href="{TM_BASE}/rajya/up">उत्तर प्रदेश</a></strong></p>'
        f'<p><strong><a href="{TM_BASE}/rajya/bihar">बिहार</a></strong>'
        f"</p></div></html>",
        host,
    )
    pages = [(0.0, 12.0), (24.0, 48.0)]
    for cslug in ("desh", "rajya/up", "rajya/bihar"):
        flat = cslug.replace("/", "-")
        for p, ages in enumerate(pages, 1):
            rows, spans = [], []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{TM_BASE}/{cslug}/lekh-{p}-{e}"
                rows.append(f'<article class="item-list"><h2>'
                            f'<a href="{aurl}">t</a></h2></article>')
                spans.append(f"<p><span>{_tm_date(dt)}</span></p>")
                g.page(
                    aurl, "article",
                    f'<html><h1 class="name post-title entry-title">'
                    f"TM {flat} {p}-{e}</h1>"
                    f'<span class="tie-date">{_tm_date(dt)}</span>'
                    f'<img class="attachment-full size-full wp-post-image"'
                    f' src="/i/{flat}{p}{e}.jpg">'
                    f'<div id="the-post"><div><div class="entry">'
                    f"<p>tm सार {flat} {p}-{e}</p><p>tm आगे</p>"
                    f"</div></div></div></html>",
                    host,
                )
            nxt = (f'<div id="tie-next-page">'
                   f'<a href="{TM_BASE}/{cslug}/page/{p + 1}/">»</a></div>')
            lurl = (f"{TM_BASE}/{cslug}" if p == 1
                    else f"{TM_BASE}/{cslug}/page/{p}/")
            g.page(
                lurl, "list",
                f'<html><div id="main-content"><div class="content">'
                f"<div><article>" + "".join(spans)
                + "</article></div></div></div>"
                + "".join(rows) + nxt + "</html>",
                host,
            )


# ---------------------------------------------------------------------------
# dainiksandhyaprakash — menu expanded by SIDE-FETCHING the first
# category's breadcrumb links, Newspaper-theme grids, gif-placeholder
# image filter, artfulstry body fallback (已部署/dainiksandhyaprakash.py)
# ---------------------------------------------------------------------------

DSP_BASE = "http://dainiksandhyaprakash.com"

DAINIKSANDHYAPRAKASH_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "mdy_switch",  # time_adjustment (py:110-147)
    "entry_gate": False,
    # requests.get of the FIRST category page harvests its breadcrumb
    # links as extra sections (py:46-54)
    "menu_side_expand": {"source_index": 0, "sel": "li.entry-category a"},
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul#menu-main-1 li a", "skip": 1},
        "entry": {"sel": "div.td-block-span6 div h3 a"},
        "page_time": {"sel": "div.td-ss-main-content span.td-post-date",
                      "index": -1},
        "next": {"sel": "div.page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "div.meta-info span.td-post-date"},
        "cat1": {"sel": "li.entry-category a"},
        "block": {"para_sel": "div.td-post-content.td-pb-padding-side p",
                  "para_sel_fallback": "div.artfulstry div",
                  "img_sel": "div.td-post-featured-image img",
                  # lazy-load stubs are dropped (py:88-90)
                  "img_skip_re": r"^data:image/gif"},
    },
}


def _build_dainiksandhyaprakash(g: _G) -> None:
    host = "dainiksandhyaprakash.com"
    wid = 999
    g.registry[wid] = dict(DAINIKSANDHYAPRAKASH_RULES)
    g.seeds.append({"url": DSP_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<ul id="menu-main-1">'
            f'<li><a href="{DSP_BASE}/">Home</a></li>'
            f'<li><a href="{DSP_BASE}/shimla">शिमला</a></li>'
            f'<li><a href="{DSP_BASE}/solan">सोलन</a></li></ul>')
    g.page(DSP_BASE + "/", "menu", f"<html>{menu}</html>", host)

    def art(slug: str, dt: datetime, cat: str,
            artfulstry: bool = False) -> str:
        aurl = f"{DSP_BASE}/story/{slug}"
        body = (
            '<div class="artfulstry"><div>dsp कैरोसेल '
            f"{slug}</div></div>" if artfulstry else
            f'<div class="td-post-content td-pb-padding-side">'
            f"<p>dsp पहला {slug}</p><p>dsp दूसरा</p></div>"
        )
        g.page(
            aurl, "article",
            f'<html><h1 class="entry-title">DSP {slug}</h1>'
            f'<ul><li class="entry-category">'
            f'<a href="{DSP_BASE}/{cat}">{cat}</a></li></ul>'
            f'<div class="meta-info"><span class="td-post-date">'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span></div>"
            f'<div class="td-post-content td-pb-padding-side">'
            f'<div class="td-post-featured-image">'
            f'<img src="data:image/gif;base64,R0lGOD">'
            f'<img src="{DSP_BASE}/f/{slug}.jpg"></div></div>'
            f"{body}</html>",
            host,
        )
        return aurl

    pages = [(0.0, 10.0), (20.0, 40.0)]
    # shimla carries the breadcrumb links the side expand harvests
    for cslug in ("shimla", "solan", "mandi"):
        for p, ages in enumerate(pages, 1):
            rows, dates = [], []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = art(f"{cslug}-{p}-{e}", dt, cslug,
                           artfulstry=(cslug == "solan" and e == 0
                                       and p == 1))
                rows.append(f'<div class="td-block-span6"><div><h3>'
                            f'<a href="{aurl}">t</a></h3></div></div>')
                dates.append(
                    f'<span class="td-post-date">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                )
            nxt = (f'<div class="page-nav td-pb-padding-side">'
                   f'<i class="td-icon-menu-right"></i>'
                   f'<a href="{DSP_BASE}/{cslug}/page/{p + 1}/">»</a>'
                   "</div>") if p == 1 else ""
            crumb = ('<ul><li class="entry-category">'
                     f'<a href="{DSP_BASE}/mandi">mandi</a></li></ul>'
                     if cslug == "shimla" and p == 1 else "")
            lurl = (f"{DSP_BASE}/{cslug}" if p == 1
                    else f"{DSP_BASE}/{cslug}/page/{p}/")
            g.page(
                lurl, "list",
                f'<html>{crumb}<div class="td-ss-main-content">'
                + "".join(rows) + "".join(dates) + f"</div>{nxt}</html>",
                host,
            )


# ---------------------------------------------------------------------------
# aapkikhabar — sibling-selector menu with a fixed-label sub-group,
# machine-readable data-datestring gates, ONE page-level teaser riding
# into every entry, body stop-sentinel (已部署/aapkikhabar.py)
# ---------------------------------------------------------------------------

AAPKI_BASE = "https://aapkikhabar.com"

AAPKIKHABAR_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "ymd",  # data-datestring is already Y-M-D H:M:S
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": [
            {"sel": "li.home_icon ~ li > a"},  # py:44-48
            # the second li's sub-menu under a FIXED प्रदेश label
            # (py:50-54; only that li carries a ul)
            {"sel": "li.home_icon ~ li ul a", "label": "प्रदेश"},
        ],
        "entry": {"sel": "#listing_main_level_top > div > div",
                  "fields": {
                      "href": {"sel": "h3 > a", "attr": "href"},
                      "time": {"sel": "span.date > span",
                               "attr": "data-datestring"},
                  }},
        # the list's single news_desc teaser becomes every entry's
        # abstract (py:63)
        "page_abstract": {"sel": "div.news_desc"},
        "next": {"sel": "a.page-numbers.next.last", "attr": "href"},
        "title": {"sel": "#detailsContentSectionWrapper > h1"},
        "pub": {"sel": "span.date span", "attr": "data-datestring"},
        "block": {"para_sel": "div.share-section ~ div p",
                  # the body loop breaks at the trending-tweets widget
                  # (py:146-149)
                  "para_stop_re": r"Trending tweet of india",
                  "img_sel": "div.single-image img"},
    },
}


def _build_aapkikhabar(g: _G) -> None:
    host = "aapkikhabar.com"
    wid = 1023
    g.registry[wid] = dict(AAPKIKHABAR_RULES)
    g.seeds.append({"url": AAPKI_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = (
        '<ul><li class="home_icon"><a href="/">Home</a></li>'
        f'<li><a href="/desh">देश</a></li>'
        f'<li><a href="/pradesh">प्रदेश</a><ul>'
        f'<li><a href="/pradesh/up">यूपी</a></li>'
        f'<li><a href="/pradesh/mp">एमपी</a></li></ul></li>'
        "</ul>"
    )
    g.page(AAPKI_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 12.0), (24.0, 40.0)]
    for cpath in ("/desh", "/pradesh", "/pradesh/up", "/pradesh/mp"):
        cslug = cpath.strip("/").replace("/", "-")
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                ds = dt.strftime("%Y-%m-%d %H:%M:%S")
                aurl = f"{AAPKI_BASE}/{cslug}-khabar-{p}-{e}"
                rows.append(
                    f'<div><div><h3><a href="/{cslug}-khabar-{p}-{e}">t'
                    f'</a></h3><span class="date">'
                    f'<span data-datestring="{ds}">आज</span></span>'
                    f"</div></div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><div id="detailsContentSectionWrapper">'
                    f"<h1>AK {cslug} {p}-{e}</h1></div>"
                    f'<span class="date"><span data-datestring="{ds}">'
                    f"आज</span></span>"
                    f'<div class="single-image">'
                    f'<img src="{AAPKI_BASE}/im/{cslug}{p}{e}.jpg"></div>'
                    f'<div class="share-section"></div>'
                    f"<div><p>ak body {cslug} {p}-{e}</p>"
                    f"<p>Trending tweet of india widget</p>"
                    f"<p>never stored</p></div></html>",
                    host,
                )
            nxt = (f'<a class="page-numbers next last page-numbers" '
                   f'href="{AAPKI_BASE}{cpath}?page={p + 1}">»</a>')
            lurl = (AAPKI_BASE + cpath if p == 1
                    else f"{AAPKI_BASE}{cpath}?page={p}")
            g.page(
                lurl, "list",
                f'<html><div class="news_desc">तीज़र {cslug} पेज {p}</div>'
                f'<div id="listing_main_level_top"><div>'
                + "".join(rows) + f"</div></div>{nxt}</html>",
                host,
            )


# ---------------------------------------------------------------------------
# bandera — four list seeds, pagination by side-fetching the LAST
# headline's article date (random-UA requests.get in the reference),
# breadcrumb category (已部署/bandera.py)
# ---------------------------------------------------------------------------

BANDERA_BASE = "https://bandera.inquirer.net"

BANDERA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",  # four start_urls ARE lists (bandera.py:18-21)
    "entry_gate": False,
    # pagination gate: requests.get of the last #lmd-headline article,
    # reading #m-pd2's last span (py:43-47)
    "page_gate_fetch_last": {"sel": "#m-pd2 span", "index": -1},
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "entry": {"sel": "#lmd-headline",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "next": {"sel": "#landing-read-more > a", "attr": "href"},
        "title": {"sel": "#landing-headline > h1"},
        "pub": {"sel": "#m-pd2 > span", "index": -1},
        "cat1": {"sel": "#m-bread2 > a"},
        "block": {"para_sel": "#article-content p",
                  "img_sel": ".wp-caption.aligncenter img"},
    },
}


def _build_bandera(g: _G) -> None:
    host = "bandera.inquirer.net"
    wid = 376
    g.registry[wid] = dict(BANDERA_RULES)
    pages = {"balita": [(0.0, 10.0), (20.0, 40.0)],
             "chika": [(5.0, 42.0)]}
    for seed in ("balita", "category/opinyon", "chika", "category/lotto"):
        g.seeds.append({"url": f"{BANDERA_BASE}/{seed}", "website_id": wid,
                        "language_id": 2117})
    for cslug, page_ages in pages.items():
        for p, ages in enumerate(page_ages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{BANDERA_BASE}/{cslug}/balita-{p}-{e}"
                rows.append(f'<div id="lmd-headline">'
                            f'<a href="{aurl}">t</a></div>')
                g.page(
                    aurl, "article",
                    f'<html><div id="m-bread2">'
                    f'<a href="/{cslug}">{cslug.title()}</a></div>'
                    f'<div id="landing-headline"><h1>Bandera {cslug} '
                    f"{p}-{e}</h1></div>"
                    f'<div id="m-pd2"><span>By Staff</span>'
                    f"<span>{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></div>"
                    f'<div class="wp-caption aligncenter">'
                    f'<img src="{BANDERA_BASE}/i/{cslug}{p}{e}.jpg"></div>'
                    f'<div id="article-content"><p>bandera una {cslug} '
                    f"{p}-{e}</p><p>pangalawa</p></div></html>",
                    host,
                )
            nxt = (f'<div id="landing-read-more">'
                   f'<a href="{BANDERA_BASE}/{cslug}/page/{p + 1}">Next'
                   f"</a></div>")
            lurl = (f"{BANDERA_BASE}/{cslug}" if p == 1
                    else f"{BANDERA_BASE}/{cslug}/page/{p}")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)
    # the two category/ seeds are single pages with no next link
    for seed, slug in (("category/opinyon", "opinyon"),
                       ("category/lotto", "lotto")):
        dt = BASE_DT - timedelta(hours=3.0)
        aurl = f"{BANDERA_BASE}/{slug}/solo-0"
        g.page(
            aurl, "article",
            f'<html><div id="m-bread2"><a href="/{slug}">'
            f"{slug.title()}</a></div>"
            f'<div id="landing-headline"><h1>Bandera {slug} 0</h1></div>'
            f'<div id="m-pd2"><span>{_MON_FULL[dt.month - 1]} {dt.day}, '
            f"{dt.year}</span></div>"
            f'<div id="article-content"><p>bandera {slug} body</p></div>'
            f"</html>",
            host,
        )
        g.page(f"{BANDERA_BASE}/{seed}", "list",
               f'<html><div id="lmd-headline"><a href="{aurl}">t</a>'
               f"</div></html>", host)


# ---------------------------------------------------------------------------
# centralindia — href-prefix-filtered menu, content-marker lists (a dead
# category yields nothing), ISO article dates vs switch list gates,
# [-2] breadcrumb span (已部署/centralindia.py)
# ---------------------------------------------------------------------------

CI_BASE = "https://www.centralindia.news"

CENTRALINDIA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "isoT",  # time_switch2 (centralindia.py:16-18)
    "page_time_style": "mdy_switch",  # time_switch1 (py:11-14)
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # only /category/ links are sections (py:52-54)
        "category": {"sel": "ul#menu-main-menu-1 li "
                            f'a[href^="{CI_BASE}/category/"]'},
        # a page without main content (or a 404 template) yields nothing
        # (py:61-62)
        "require_marker": {"sel": ".td-ss-main-content div"},
        "entry": {"sel": ".td-ss-main-content .td-module-thumb a"},
        "page_time": {"sel": ".td-ss-main-content div span.td-post-date",
                      "index": -1},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "div.td-ss-main-content .td-post-header"
                         " header h1"},
        "pub": {"sel": ".td-module-meta-info time", "attr": "datetime"},
        # breadcrumbs: the second-to-last span (py:95)
        "cat1": {"sel": ".entry-crumbs span", "index": -2},
        "block": {"para_sel": ".td-post-content p",
                  "img_sel": ".td-post-content .td-post-featured-image"
                             " a img"},
    },
}


def _build_centralindia(g: _G) -> None:
    host = "www.centralindia.news"
    wid = 952
    g.registry[wid] = dict(CENTRALINDIA_RULES)
    g.seeds.append({"url": CI_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<ul id="menu-main-menu-1">'
            f'<li><a href="{CI_BASE}/">Home</a></li>'
            f'<li><a href="{CI_BASE}/category/bhopal/">भोपाल</a></li>'
            f'<li><a href="{CI_BASE}/category/dead/">पुराना</a></li>'
            f'<li><a href="{CI_BASE}/video/">Video</a></li></ul>')
    g.page(CI_BASE + "/", "menu", f"<html>{menu}</html>", host)
    # the dead category renders a 404 template: no main-content marker
    g.page(CI_BASE + "/category/dead/", "list",
           '<html><div class="td-404-title">404</div></html>', host)
    pages = [(0.0, 12.0), (24.0, 40.0)]
    for p, ages in enumerate(pages, 1):
        rows, gates = [], []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{CI_BASE}/bhopal-khabar-{p}-{e}/"
            rows.append(f'<div class="td-module-thumb">'
                        f'<a href="{aurl}">t</a></div>')
            gates.append(f'<span class="td-post-date">'
                         f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                         f"</span>")
            iso = dt.strftime("%Y-%m-%dT%H:%M:%S+00:00")
            g.page(
                aurl, "article",
                f'<html><div class="td-ss-main-content">'
                f'<div class="td-post-header"><header>'
                f"<h1>CI भोपाल {p}-{e}</h1></header></div></div>"
                f'<div class="td-module-meta-info">'
                f'<time datetime="{iso}">date</time></div>'
                f'<div class="entry-crumbs"><span>होम</span>'
                f"<span>भोपाल</span><span>CI भोपाल {p}-{e}</span></div>"
                f'<div class="td-post-content">'
                f'<div class="td-post-featured-image"><a href="#">'
                f'<img src="{CI_BASE}/f/{p}{e}.jpg"></a></div>'
                f"<p>ci पहला {p}-{e}</p><p>ci दूसरा</p></div></html>",
                host,
            )
        nxt = (f'<div class="page-nav td-pb-padding-side">'
               f'<a href="{CI_BASE}/category/bhopal/page/{p + 1}/">'
               f'<i class="td-icon-menu-right"></i></a></div>')
        lurl = (f"{CI_BASE}/category/bhopal/" if p == 1
                else f"{CI_BASE}/category/bhopal/page/{p}/")
        g.page(lurl, "list",
               f'<html><div class="td-ss-main-content"><div>'
               + "".join(rows) + "".join(gates)
               + f"</div></div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# Manilatimes — two flat menu groups, meta-info list entries with fuzzy
# dates, last-entry-category article category2, fb-root sibling bodies
# (已部署/Manilatimes.py)
# ---------------------------------------------------------------------------

MT2_BASE = "https://www.manilatimes.net"

MANILATIMES_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "extract": {
        "category": [
            {"sel": "#tdb-block-menu li a"},  # py:31-33
            {"sel": "div.td-pulldown-filter-list > li > a"},  # py:34-36
        ],
        "entry": {"sel": "div.td-module-meta-info",
                  "fields": {
                      "href": {"sel": "a", "attr": "href"},
                      "time": {"sel": ".td-post-date"},
                  }},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": ".tdb-title-text"},
        "cat2": {"sel": ".tdb-entry-category", "index": -1},  # py:63
        "block": {"para_sel": "#fb-root ~ p",
                  "img_sel": "figure > img", "img_attr": "data-src"},
    },
    "title_priority": "page",
}


def _build_manilatimes(g: _G) -> None:
    host = "www.manilatimes.net"
    wid = 186
    g.registry[wid] = dict(MANILATIMES_RULES)
    g.seeds.append({"url": MT2_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = (
        '<div id="tdb-block-menu"><ul>'
        f'<li><a href="{MT2_BASE}/news">News</a></li></ul></div>'
        '<div class="td-pulldown-filter-list">'
        f'<li><a href="{MT2_BASE}/sports">Sports</a></li></div>'
    )
    g.page(MT2_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 11.0), (22.0, 44.0)]
    for cslug in ("news", "sports"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{MT2_BASE}/{cslug}/article-{p}-{e}"
                rows.append(
                    f'<div class="td-module-meta-info">'
                    f'<a href="{aurl}">t</a><span class="td-post-date">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="tdb-title-text">MT {cslug} {p}-{e}'
                    f"</h1>"
                    f'<span class="tdb-entry-category">Metro</span>'
                    f'<span class="tdb-entry-category">{cslug.title()}'
                    f"</span>"
                    f'<div id="fb-root"></div>'
                    f"<p>mt lead {cslug} {p}-{e}</p><p>mt more</p>"
                    f'<figure><img data-src="{MT2_BASE}/f/{cslug}{p}{e}'
                    f'.jpg"></figure></html>',
                    host,
                )
            nxt = (f'<div class="page-nav td-pb-padding-side">'
                   f'<i class="td-icon-menu-right"></i>'
                   f'<a href="{MT2_BASE}/{cslug}/page/{p + 1}">»</a>'
                   "</div>")
            lurl = (f"{MT2_BASE}/{cslug}" if p == 1
                    else f"{MT2_BASE}/{cslug}/page/{p}")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# abante — [:8] menu slice, category1 from the LIST URL's path segment,
# last-entry time page gate, styled continue-reading bodies
# (已部署/abante.py)
# ---------------------------------------------------------------------------

ABANTE_BASE = "https://tonite.abante.com.ph"

ABANTE_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    # category1 = the list URL's 5th path token (abante.py:35-36)
    "cat1_url_re": r"^https?://[^/]+/[^/]+/([^/]+)",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#main-navigation > li > a",
                     "slice": [0, 8]},
        "entry": {"sel": "article .title > a"},
        "page_time": {"sel": "article time", "index": -1},
        "next": {"sel": ".older > a", "attr": "href"},
        "title": {"sel": ".post-title"},
        "pub": {"sel": ".time > time > b"},
        "block": {"para_sel": 'div[class="continue-reading-content'
                              ' close"] > p',
                  "img_sel": ".single-container .single-featured > img",
                  "img_attr": "data-src"},
    },
}


def _build_abante(g: _G) -> None:
    host = "tonite.abante.com.ph"
    wid = 486
    g.registry[wid] = dict(ABANTE_RULES)
    g.seeds.append({"url": ABANTE_BASE + "/", "website_id": wid,
                    "language_id": 1880})
    menu = ('<ul id="main-navigation">'
            + "".join(f'<li><a href="{ABANTE_BASE}/category/{c}/">'
                      f"{c.title()}</a></li>"
                      for c in ("showbiz", "balita"))
            + "</ul>")
    g.page(ABANTE_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 13.0), (26.0, 39.0)]
    for cslug in ("showbiz", "balita"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{ABANTE_BASE}/{cslug}-kwento-{p}-{e}/"
                rows.append(
                    f'<article><div class="title"><a href="{aurl}">t</a>'
                    f"</div><time>{_MON_FULL[dt.month - 1]} {dt.day}, "
                    f"{dt.year}</time></article>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="post-title">Abante {cslug} {p}-{e}'
                    f'</h1><div class="time"><time><b>'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</b></time></div>"
                    f'<div class="single-container">'
                    f'<div class="single-featured">'
                    f'<img data-src="{ABANTE_BASE}/i/{cslug}{p}{e}.jpg">'
                    f"</div></div>"
                    f'<div class="continue-reading-content close">'
                    f"<p>abante una {cslug} {p}-{e}</p><p>pangalawa</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<div class="older">'
                   f'<a href="{ABANTE_BASE}/category/{cslug}/page/{p + 1}/'
                   f'">Older</a></div>')
            lurl = (f"{ABANTE_BASE}/category/{cslug}/" if p == 1
                    else f"{ABANTE_BASE}/category/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# janadesh — http-filtered [:-4] menu slice, DATELESS lists (pub falls
# back to crawl time), fake pagination never followed, constant
# category2, list-scraped lead image (已部署/janadesh.py)
# ---------------------------------------------------------------------------

JD_BASE = "http://www.janadesh.in"

JANADESH_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "cat2_const": "News Details",  # janadesh.py:47
    "title_priority": "page",
    "extract": {
        "category": {"sel": ".menu-list ul li a", "slice": [0, -4],
                     "href_re": r"^http"},  # py:26-28
        "entry": {"sel": ".page-title ~ div.row > div",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "img": {"sel": "img", "attr": "src"}}},
        "title": {"sel": ".read-content h5"},
        "block": {"para_sel": ".read-content p"},
    },
}


def _build_janadesh(g: _G) -> None:
    host = "www.janadesh.in"
    wid = 1067
    g.registry[wid] = dict(JANADESH_RULES)
    g.seeds.append({"url": JD_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<div class="menu-list"><ul>'
            f'<li><a href="{JD_BASE}/desh">देश</a></li>'
            f'<li><a href="/relative">सापेक्ष</a></li>'  # filtered: not ^http
            f'<li><a href="{JD_BASE}/videsh">विदेश</a></li>'
            + "".join(f'<li><a href="{JD_BASE}/tail{k}">t{k}</a></li>'
                      for k in range(4))  # [:-4] drops these
            + "</ul></div>")
    g.page(JD_BASE + "/", "menu", f"<html>{menu}</html>", host)
    for cslug in ("desh", "videsh"):
        rows = []
        for e in range(3):
            aurl = f"{JD_BASE}/{cslug}/samachar-{e}"
            rows.append(
                f'<div><a href="{aurl}">t</a>'
                f'<img src="{JD_BASE}/th/{cslug}{e}.jpg"></div>'
            )
            g.page(
                aurl, "article",
                f'<html><div class="read-content"><h5>JD {cslug} {e}'
                f"</h5><p>jd पहला {cslug} {e}</p><p>jd दूसरा</p></div>"
                f"</html>",
                host,
            )
        g.page(f"{JD_BASE}/{cslug}", "list",
               f'<html><h2 class="page-title">{cslug}</h2>'
               f'<div class="row">' + "".join(rows) + "</div></html>",
               host)


# ---------------------------------------------------------------------------
# kickerdaily — five list seeds with title-derived categories, li-join
# abstracts, last-entry meta date page gate (已部署/kickerdaily.py)
# ---------------------------------------------------------------------------

KD_BASE = "https://kickerdaily.com"

KICKERDAILY_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "extract": {
        "cat1_self": {"sel": "h1.page-title"},  # py:36
        "entry": {"sel": "#main-content > article",
                  "fields": {"href": {"sel": ".entry-title a",
                                      "attr": "href"}}},
        "page_time": {"sel": "#main-content > article "
                             ".mh-meta-date.updated", "index": -1},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "span.entry-meta-date.updated a"},
        # abstract: EVERY list-item text concatenated, else first para
        # (py:63-67)
        "abstract": {"sel": "div.entry-content.clearfix li",
                     "join": True},
        "block": {"para_sel": "div.entry-content.clearfix p",
                  "img_sel": "div.entry-content.clearfix img"},
    },
}


def _build_kickerdaily(g: _G) -> None:
    host = "kickerdaily.com"
    wid = 496
    g.registry[wid] = dict(KICKERDAILY_RULES)
    for cslug in ("tagalog", "philippines", "world", "entertainment-world",
                  "social-news"):
        g.seeds.append({"url": f"{KD_BASE}/posts/category/{cslug}/",
                        "website_id": wid, "language_id": 1880})
    pages = [(0.0, 16.0), (32.0, 48.0)]
    for cslug in ("tagalog", "philippines", "world", "entertainment-world",
                  "social-news"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{KD_BASE}/{cslug}-post-{p}-{e}/"
                rows.append(
                    f"<article>"
                    f'<h2 class="entry-title mh-posts-list-title">'
                    f'<a href="{aurl}">t</a></h2>'
                    f'<span class="mh-meta-date updated">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></article>"
                )
                lis = ('<ul><li>KD point one. </li><li>KD point two.</li>'
                       "</ul>") if e == 0 else ""
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry-title">KD {cslug} {p}-{e}'
                    f'</h1><span class="entry-meta-date updated">'
                    f'<a href="#">{_MON_FULL[dt.month - 1]} {dt.day}, '
                    f"{dt.year}</a></span>"
                    f'<div class="entry-content clearfix">{lis}'
                    f"<p>kd body {cslug} {p}-{e}</p><p>kd two</p>"
                    f'<img src="{KD_BASE}/i/{cslug}{p}{e}.jpg"></div>'
                    f"</html>",
                    host,
                )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{KD_BASE}/posts/category/{cslug}/page/{p + 1}/"'
                   f">»</a>")
            lurl = (f"{KD_BASE}/posts/category/{cslug}/" if p == 1
                    else f"{KD_BASE}/posts/category/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   f'<html><h1 class="page-title">{cslug.title()} Posts'
                   f'</h1><div id="main-content">' + "".join(rows)
                   + f"</div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# yugatech — homepage IS the list, category1 from the article URL,
# first-non-empty abstract, byline page gate (已部署/yugatech.py)
# ---------------------------------------------------------------------------

YT_BASE = "https://www.yugatech.com"

YUGATECH_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "entry_gate": False,
    "cat1_from_url_re": r"^https?://[^/]+/([^/]+)/",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "entry": {"sel": 'div[class="pad group"] > article'
                         " .tab-item-title > a"},
        "page_time": {"sel": "article .post-byline", "index": -1},
        "next": {"sel": "ul.group li.next.right a", "index": -1,
                 "attr": "href"},
        "title": {"sel": ".post-title"},
        "pub": {"sel": ".post-byline"},
        "block": {"para_sel": ".entry-inner > p",
                  "img_sel": ".entry-inner > p img"},
    },
}


def _build_yugatech(g: _G) -> None:
    host = "www.yugatech.com"
    wid = 444
    g.registry[wid] = dict(YUGATECH_RULES)
    g.seeds.append({"url": YT_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    pages = [(0.0, 15.0), (30.0, 45.0)]
    for p, ages in enumerate(pages, 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{YT_BASE}/mobile/yt-review-{p}-{e}/"
            rows.append(
                f'<div class="pad group"><article>'
                f'<div class="tab-item-title"><a href="{aurl}">t</a>'
                f'</div><div class="post-byline">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</div>"
                f"</article></div>"
            )
            g.page(
                aurl, "article",
                f'<html><h1 class="post-title">YT review {p}-{e}</h1>'
                f'<div class="post-byline">{_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</div>"
                f'<div class="entry-inner"><p>yt body {p}-{e}</p>'
                f'<p><img src="{YT_BASE}/sh/{p}{e}.png"></p></div>'
                f"</html>",
                host,
            )
        nxt = (f'<ul class="group"><li class="next right">'
               f'<a href="{YT_BASE}/page/{p + 1}/">»</a></li></ul>')
        lurl = YT_BASE + "/" if p == 1 else f"{YT_BASE}/page/{p}/"
        g.page(lurl, "list",
               "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# politics — breadcrumb-span title/category, style-attribute background
# image, body skipping its first paragraph, ISO datetimes
# (已部署/politics.py)
# ---------------------------------------------------------------------------

POL_BASE = "https://politics.com.ph"

POLITICS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "isoT",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "nav > div.wrapper a", "slice": [0, 6]},
        "entry": {"sel": "header.entry-header",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": "time.entry-date.published", "index": -1,
                      "attr": "datetime"},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        # the breadcrumb spans: [1] = category, [2] = title (py:70-73)
        "title": {"sel": "span[itemprop=name]", "index": 2},
        "cat1": {"sel": "span[itemprop=name]", "index": 1},
        "pub": {"sel": "time.entry-date.published", "attr": "datetime"},
        "block": {"para_sel": "div.entry-content > p",
                  # body_list[1:] — the first paragraph is a teaser the
                  # reference drops (py:82)
                  "para_skip": 1,
                  # the lead image is a background-image STYLE value; the
                  # URL is the last quoted string (py:66-67)
                  "img_sel": "div.relative", "img_attr": "style",
                  "img_attr_re": r"'([^']*)'[^']*$"},
    },
}


def _build_politics(g: _G) -> None:
    host = "politics.com.ph"
    wid = 1206
    g.registry[wid] = dict(POLITICS_RULES)
    g.seeds.append({"url": POL_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = ('<nav><div class="wrapper">'
            + "".join(f'<a href="{POL_BASE}/{c}/">{c.title()}</a>'
                      for c in ("national", "local"))
            + "</div></nav>")
    g.page(POL_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 14.0), (28.0, 42.0)]
    for cslug in ("national", "local"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                iso = dt.strftime("%Y-%m-%dT%H:%M:%S+08:00")
                aurl = f"{POL_BASE}/{cslug}-balita-{p}-{e}/"
                rows.append(
                    f'<header class="entry-header"><a href="{aurl}">t</a>'
                    f'<time class="entry-date published" datetime="{iso}">'
                    f"d</time></header>"
                )
                g.page(
                    aurl, "article",
                    f'<html><span itemprop="name">Home</span>'
                    f'<span itemprop="name">{cslug.title()}</span>'
                    f'<span itemprop="name">POL {cslug} {p}-{e}</span>'
                    f'<time class="entry-date published" '
                    f'datetime="{iso}">d</time>'
                    f'<div class="relative" style="background-image:'
                    f"url('{POL_BASE}/bg/{cslug}{p}{e}.jpg')\"></div>"
                    f'<div class="entry-content">'
                    f"<p>teaser — dropped</p>"
                    f"<p>pol body {cslug} {p}-{e}</p><p>pol two</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{POL_BASE}/{cslug}/page/{p + 1}/">»</a>')
            lurl = (f"{POL_BASE}/{cslug}/" if p == 1
                    else f"{POL_BASE}/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# sunstar — THREE menu hops (menu → section page → one more hop → list),
# URL-segment categories with a digits guard, single-paragraph bodies
# (已部署/sunstar.py)
# ---------------------------------------------------------------------------

SS_BASE = "https://www.sunstar.com.ph"

SUNSTAR_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "menu_child_kind": "menu2",
    "entry_gate": False,
    "cat1_from_url_re": r"^https?://[^/]+/(?:[^/]+/){2}([^/]+)/",
    # the digits guard: a numeric 6th segment leaves category2 unset
    # (sunstar.py:57-58) — and the menu lineage never feeds it
    "cat2_from_url_re": r"^https?://[^/]+/(?:[^/]+/){3}([^/\d]+)/",
    "cat2_meta_off": True,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": ".menu li > a"},
        # hop 2: the section page's tablecenter links [1:8] lead to one
        # MORE menu page (py:30-33)
        "category2": {"sel": ".tablecenter > a", "slice": [1, 8],
                      "child_kind": "menu2"},
        "entry": {"sel": ".search-inner > div .title > a"},
        "page_time": {"sel": ".search-inner > div .author span",
                      "index": -1},
        "next": {"sel": "a.paginationBtn.nextBtn", "attr": "href"},
        "title": {"sel": ".titleArticle > h1"},
        "pub": {"sel": ".articleDate"},
        "block": {"para_sel": ".col-sm-11 p",
                  # ONLY the first paragraph is body AND abstract
                  # (py:59-60)
                  "para_slice": [0, 1],
                  "img_sel": ".imgArticle > img"},
        "variants": [
            {   # hop 3: the sub page's single row link IS the list
                "match": r"/sub/",
                "category2": {"sel": ".row.content > a", "slice": [0, 1],
                              "child_kind": "list"},
            },
        ],
    },
}


def _build_sunstar(g: _G) -> None:
    host = "www.sunstar.com.ph"
    wid = 443
    g.registry[wid] = dict(SUNSTAR_RULES)
    g.seeds.append({"url": SS_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(SS_BASE + "/", "menu",
           f'<html><div class="menu"><li>'
           f'<a href="{SS_BASE}/sect/cebu">Cebu</a></li></div></html>',
           host)
    # hop 2: tablecenter page — [1:8] drops the first link
    g.page(
        SS_BASE + "/sect/cebu", "menu2",
        f'<html><div class="tablecenter">'
        f'<a href="{SS_BASE}/skip/me">skipped</a>'
        f'<a href="{SS_BASE}/sub/cebu-news">News</a>'
        f'<a href="{SS_BASE}/sub/cebu-biz">Business</a></div></html>',
        host,
    )
    # hop 3: each sub page's first row link is the real list
    for sub in ("cebu-news", "cebu-biz"):
        g.page(
            f"{SS_BASE}/sub/{sub}", "menu2",
            f'<html><div class="row content">'
            f'<a href="{SS_BASE}/list/{sub}/1">latest</a></div></html>',
            host,
        )
    pages = [(0.0, 13.0), (26.0, 39.0)]
    for sub, c2 in (("cebu-news", "local-news"), ("cebu-biz", "trade")):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                seg2 = c2 if e % 2 == 0 else "88"  # digits guard probe
                aurl = f"{SS_BASE}/article/{sub}/cebu/{seg2}/{p}{e}01/story/"
                rows.append(
                    f'<div><div class="title"><a href="{aurl}">t</a>'
                    f'</div><div class="author"><span>'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></div></div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><div class="titleArticle"><h1>SunStar {sub} '
                    f"{p}-{e}</h1></div>"
                    f'<div class="articleDate">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</div>"
                    f'<div class="imgArticle">'
                    f'<img src="{SS_BASE}/i/{sub}{p}{e}.jpg"></div>'
                    f'<div class="col-sm-11"><p>ss only para {sub} {p}-{e}'
                    f"</p><p>never stored</p></div></html>",
                    host,
                )
            nxt = (f'<a class="paginationBtn nextBtn" '
                   f'href="{SS_BASE}/list/{sub}/{p + 1}">next</a>')
            g.page(f"{SS_BASE}/list/{sub}/{p}", "list",
                   f'<html><div class="search-inner">' + "".join(rows)
                   + f"</div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# techpinas — blogger older-link pagination gated on the FIRST teaser
# date, slash dates with verbatim time-of-day, div/i/h3 bodies
# (已部署/techpinas.py)
# ---------------------------------------------------------------------------

TP_BASE = "https://www.techpinas.com"

TECHPINAS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "date_style": "mdy_slash_hms",  # timeformat (techpinas.py:52-56)
    "entry_gate": False,
    "cat1_const": None,  # the reference never sets categories
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "entry": {"sel": ".section .post-outer a.read-more"},
        # the gate reads the FIRST teaser's published stamp (py:30)
        "page_time": {"sel": ".section .post-outer .published",
                      "index": 0},
        "next": {"sel": ".section a.blog-pager-older-link",
                 "attr": "href"},
        "title": {"sel": ".post-header > h1"},
        "pub": {"sel": "abbr.published"},
        "block": {"para_sel": [".post-body.entry-content > div",
                               ".post-body.entry-content i",
                               ".post-body.entry-content > h3"],
                  "img_sel": ".post-body.entry-content img"},
    },
}


def _tp_date(dt: datetime) -> str:
    return (f"{dt.month}/{dt.day}/{dt.year} "
            f"{dt.hour:02d}:{dt.minute:02d}:00 AM")


def _build_techpinas(g: _G) -> None:
    host = "www.techpinas.com"
    wid = 492
    g.registry[wid] = dict(TECHPINAS_RULES)
    g.seeds.append({"url": TP_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    pages = [(0.0, 18.0), (40.0, 50.0)]
    for p, ages in enumerate(pages, 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{TP_BASE}/tp-gadget-{p}-{e}.html"
            rows.append(
                f'<div class="post-outer">'
                f'<span class="published">{_tp_date(dt)}</span>'
                f'<a class="read-more" href="{aurl}">Read</a></div>'
            )
            g.page(
                aurl, "article",
                f'<html><div class="post-header"><h1>TP gadget {p}-{e}'
                f'</h1></div><abbr class="published">{_tp_date(dt)}'
                f"</abbr>"
                f'<div class="post-body entry-content">'
                f"<div>tp intro {p}-{e}</div><h3>Specs</h3>"
                f'<i>tp verdict</i><img src="{TP_BASE}/g/{p}{e}.png">'
                f"</div></html>",
                host,
            )
        nxt = (f'<a class="blog-pager-older-link" '
               f'href="{TP_BASE}/search?page={p + 1}">Older</a>')
        lurl = TP_BASE + "/" if p == 1 else f"{TP_BASE}/search?page={p}"
        g.page(lurl, "list",
               f'<html><div class="section">' + "".join(rows) + nxt
               + "</div></html>", host)


# ---------------------------------------------------------------------------
# emalwa — seed menu PLUS a side-fetched second page harvesting two more
# link groups (labels from text), no-break entry gates over unsorted
# grids, list-scraped title/abstract/date (已部署/emalwa.py)
# ---------------------------------------------------------------------------

EM_BASE = "https://emalwa.com"

EMALWA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # the gate skips old entries WITHOUT breaking — the grid is unsorted
    # and later entries may still be fresh (emalwa.py:50-59)
    "entry_gate_no_break": True,
    # start_requests side-fetches a second page and mines two more link
    # groups off it, labels from the link text (py:35-41)
    "menu_side_expand": {
        "url": EM_BASE + "/category/ratlam-and-other-cities/",
        "sels": ["ul.td-pulldown-filter-list a", "#td-category > li a"],
        "label_from_text": True,
    },
    "extract": {
        "category": {"sel": "#menu-final-main-menu-1 li > a",
                     "slice": [1, -1]},
        "entry": {"sel": ".td_module_10.td_module_wrap"
                         ".td-animation-stack",
                  "fields": {
                      "href": {"sel": "h3 > a", "attr": "href"},
                      "title": {"sel": "h3 > a"},
                      "abstract": {"sel": "div.td-excerpt"},
                      "time": {"sel": ".td-post-date"},
                  }},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "block": {"para_sel": ".td-post-content p",
                  "img_sel": ".td-post-content img"},
    },
}


def _build_emalwa(g: _G) -> None:
    host = "emalwa.com"
    wid = 1050
    g.registry[wid] = dict(EMALWA_RULES)
    g.seeds.append({"url": EM_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<ul id="menu-final-main-menu-1">'
            f'<li><a href="{EM_BASE}/">Home</a></li>'
            f'<li><a href="{EM_BASE}/category/malwa">मालवा</a></li>'
            f'<li><a href="{EM_BASE}/contact">Contact</a></li></ul>')
    g.page(EM_BASE + "/", "menu", f"<html>{menu}</html>", host)
    # the side-fetched second page: two harvested link groups
    g.page(
        EM_BASE + "/category/ratlam-and-other-cities/", "list",
        f'<html><ul class="td-pulldown-filter-list">'
        f'<li><a href="{EM_BASE}/category/ratlam">रतलाम</a></li></ul>'
        f'<ul id="td-category"><li>'
        f'<a href="{EM_BASE}/category/ujjain">उज्जैन</a></li></ul></html>',
        host,
    )
    # the grid is deliberately UNSORTED: entry 0 is old, entry 1 fresh —
    # the no-break gate keeps scanning and still stores entry 1
    pages = {"malwa": [(40.0, 6.0)],
             "ratlam": [(0.0, 12.0), (24.0, 44.0)],
             "ujjain": [(2.0, 10.0)]}
    for cslug, page_ages in pages.items():
        for p, ages in enumerate(page_ages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{EM_BASE}/{cslug}-khabar-{p}-{e}/"
                rows.append(
                    f'<div class="td_module_10 td_module_wrap '
                    f'td-animation-stack"><h3>'
                    f'<a href="{aurl}">EM {cslug} {p}-{e}</a></h3>'
                    f'<div class="td-excerpt">em सार {cslug} {p}-{e}'
                    f'</div><span class="td-post-date">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><div class="td-post-content">'
                    f"<p>em body {cslug} {p}-{e}</p>"
                    f'<img src="{EM_BASE}/i/{cslug}{p}{e}.jpg"></div>'
                    f"</html>",
                    host,
                )
            last = p == len(page_ages)
            nxt = ("" if last else
                   f'<div class="page-nav td-pb-padding-side">'
                   f'<a href="{EM_BASE}/category/{cslug}/page/{p + 1}/">'
                   f"»</a></div>")
            lurl = (f"{EM_BASE}/category/{cslug}" if p == 1
                    else f"{EM_BASE}/category/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# navsancharsamachar — pre-fetched menu, list-scraped title/abstract/
# date riding into imageless articles (已部署/navsancharsamachar.py)
# ---------------------------------------------------------------------------

NSS_BASE = "http://navsancharsamachar.com"

NAVSANCHARSAMACHAR_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "extract": {
        "category": {"sel": "#menu-primary li", "link_sel": "a"},
        "entry": {"sel": ".post",
                  "fields": {
                      "href": {"sel": "a", "attr": "href"},
                      "title": {"sel": "h2 > a"},
                      "abstract": {"sel": "div.exceprt"},
                      "time": {"sel": ".date"},
                  }},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "block": {"para_sel": ".post-entry p"},
    },
}


def _build_navsancharsamachar(g: _G) -> None:
    host = "navsancharsamachar.com"
    wid = 1048
    g.registry[wid] = dict(NAVSANCHARSAMACHAR_RULES)
    g.seeds.append({"url": NSS_BASE + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<ul id="menu-primary">'
            f'<li><a href="{NSS_BASE}/desh">देश</a></li>'
            f'<li><a href="{NSS_BASE}/khel">खेल</a></li></ul>')
    g.page(NSS_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 12.0), (24.0, 40.0)]
    for cslug in ("desh", "khel"):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{NSS_BASE}/{cslug}-khabar-{p}-{e}"
                rows.append(
                    f'<div class="post"><h2><a href="{aurl}">NSS '
                    f'{cslug} {p}-{e}</a></h2><div class="exceprt">'
                    f'nss सार {cslug} {p}-{e}</div><span class="date">'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</span></div>"
                )
                g.page(
                    aurl, "article",
                    f'<html><div class="post-entry"><p>nss body {cslug} '
                    f"{p}-{e}</p><p>nss दूसरा</p></div></html>",
                    host,
                )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{NSS_BASE}/{cslug}?page={p + 1}">»</a>')
            lurl = (f"{NSS_BASE}/{cslug}" if p == 1
                    else f"{NSS_BASE}/{cslug}?page={p}")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# ptvnews — sliced sub-menu plus two hardcoded category lists, both
# categories from the LIST URL with a 'page' segment guard; the JS
# cookie challenge (execjs + proxy) is out of scope — the crawl
# dataflow is what's ported (已部署/ptvnews.py)
# ---------------------------------------------------------------------------

PTV_BASE = "https://ptvnews.ph"

PTVNEWS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "cat1_url_re": r"^https?://[^/]+/category/([^/]+)/",
    # list[5] != 'page' guard (ptvnews.py:64-66)
    "cat2_url_re": r"^https?://[^/]+/category/[^/]+/(?!page)([^/]+)/",
    # the hardcoded sports/business lists yielded beside the menu
    # (py:51-52)
    "extra_lists": [
        {"url": PTV_BASE + "/category/sports/", "category1": None,
         "category2": None},
        {"url": PTV_BASE + "/category/business/", "category1": None,
         "category2": None},
    ],
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": ".sub-menu > li > a", "slice": [0, 12]},
        "entry": {"sel": ".td-ss-main-content .td-block-span6 h3 > a"},
        "page_time": {"sel": ".td-ss-main-content time", "index": -1},
        "next": {"sel": ".page-nav.td-pb-padding-side > a", "index": -1,
                 "attr": "href"},
        "title": {"sel": ".entry-title"},
        "pub": {"sel": 'time[class="entry-date updated td-module-date"]'},
        "block": {"para_sel": ".td-post-content > p",
                  "img_sel": ".td-post-featured-image img"},
    },
}


def _build_ptvnews(g: _G) -> None:
    host = "ptvnews.ph"
    wid = 445
    g.registry[wid] = dict(PTVNEWS_RULES)
    g.seeds.append({"url": PTV_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = ('<ul class="sub-menu">'
            f'<li><a href="{PTV_BASE}/category/news/national/">National'
            "</a></li></ul>")
    g.page(PTV_BASE + "/", "menu", f"<html>{menu}</html>", host)
    pages = [(0.0, 12.0), (24.0, 40.0)]
    for cpath, flat in (("news/national", "national"),
                        ("sports", "sports"), ("business", "business")):
        for p, ages in enumerate(pages, 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{PTV_BASE}/{flat}-ulat-{p}-{e}/"
                rows.append(
                    f'<div class="td-block-span6"><h3>'
                    f'<a href="{aurl}">t</a></h3></div>'
                    f"<time>{_MON_FULL[dt.month - 1]} {dt.day}, "
                    f"{dt.year}</time>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry-title">PTV {flat} {p}-{e}'
                    f'</h1><time class="entry-date updated '
                    f'td-module-date">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</time>"
                    f'<div class="td-post-featured-image">'
                    f'<img src="{PTV_BASE}/f/{flat}{p}{e}.jpg"></div>'
                    f'<div class="td-post-content">'
                    f"<p>ptv ulat {flat} {p}-{e}</p><p>ptv dalawa</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<div class="page-nav td-pb-padding-side">'
                   f'<a href="{PTV_BASE}/category/{cpath}/page/{p + 1}/">'
                   f"»</a></div>")
            lurl = (f"{PTV_BASE}/category/{cpath}/" if p == 1
                    else f"{PTV_BASE}/category/{cpath}/page/{p}/")
            g.page(lurl, "list",
                   f'<html><div class="td-ss-main-content">'
                   + "".join(rows) + f"</div>{nxt}</html>", host)


# ---------------------------------------------------------------------------
# Tranche D: ten next-link/WordPress-family spiders. Shared fixture
# helper: one category chain of standard list pages whose page-2 gate
# value is stale, entries ungated unless noted (已部署/<site>.py each).
# ---------------------------------------------------------------------------

AGNIBAN_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "abstract_split": {"sep": "।"},  # agniban.py:79's body danda split
    "extract": {
        # only li's WITHOUT a sub-<ul> are sections (agniban.py:36-40)
        "category": {"sel": "ul.menu > li", "slice": [0, -1],
                     "link_sel": "a", "exclude_if_sel": "ul"},
        "entry": {"sel": "div.twp-row a.post-thumbnail"},
        # both categories read off the LIST's breadcrumb trail (py:49-51);
        # a 'Page N' third crumb means a one-level category → no cat2
        "cat1_self": {"sel": "li.trail-item", "index": 1},
        "cat2_self": {"sel": "li.trail-item", "index": 2,
                      "re": r"^(?!Page\b)(.+)$"},
        "page_time": {"sel": "div.twp-row span.item-metadata.posts-date",
                      "index": -1},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.entry-title.twp-secondary-title"},
        "pub": {"sel": "article span.item-metadata.posts-date"},
        "block": {"para_sel": "article p", "img_sel": "article p > img"},
    },
}

COOLBUSTER_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # the gate date is EMBEDDED in the blogger older-link URL
    # (coolbuster.py:52-59's updated-max=ISO parameter)
    "next_url_gate_re": r"updated-max=([\d-]+)T([\d:]+)%",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#nav-ceebee > ul > li > a"},
        "entry": {"sel": "div.post.hentry",
                  "fields": {
                      "href": {"sel": "h2.post-title.entry-title a",
                               "attr": "href"},
                      "abstract": {"sel": "div.post-snippet"},
                  }},
        "next": {"sel": "a.blog-pager-older-link", "attr": "href"},
        "title": {"sel": "h1.post-title.entry-title"},
        "pub": {"sel": "span.updated"},
        # body: the THIRD direct div of the post body (py:74); images are
        # the separator's anchor HREFS, not img srcs (py:77-82)
        "block": {"para_sel": ".post-body.entry-content"
                              " > div:nth-of-type(3)",
                  "img_sel": "div.separator a", "img_attr": "href"},
    },
}

YASHBHARAT_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "abstract_split": {"sep": "।"},
    "extract": {
        # [1:-1], ई-पेपर excluded; tops with a sub-<ul> contribute only
        # their children (yashbharat.py:36-57)
        "category": {"sel": "div.menu-primary-container ul > li",
                     "slice": [1, -1], "link_sel": "a",
                     "children_sel": "ul > li > a",
                     "children_suppress_parent": True},
        "excluded_labels": ["ई-पेपर"],
        "entry": {"sel": "div.article-container article",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".article-container > article time",
                      "index": -1},
        "next": {"sel": "li.previous a", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "time.entry-date.published.updated"},
        "block": {"para_sel": ".entry-content.clearfix p",
                  "img_sel": "img.attachment-colormag-featured-image"},
    },
}

PURIDUNIA_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#main-nav-menu li > a"},
        "entry": {"sel": ".main-content .post-title > a"},
        # the gate reads the FIRST .date on the page (puridunia.py:47-51)
        "page_time": {"sel": ".date", "index": 0},
        "next": {"sel": "li.the-next-page a", "attr": "href"},
        "title": {"sel": "h1.post-title.entry-title"},
        "pub": {"sel": "span.date.meta-item.tie-icon"},
        # p AND h3 bodies, images from paragraphs and the featured box
        # (py:70-83)
        "block": {"para_sel": [".entry-content p", ".entry-content h3"],
                  "img_sel": [".entry-content p > img",
                              ".single-featured-image > img"]},
    },
}

STARMOMETER_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#menu-main-menu-1 a"},
        "entry": {"sel": ".loop-data > .loop-title > a"},
        # FIRST loop meta, date before the '//' separator
        # (starmometer.py:45-51)
        "page_time": {"sel": ".loop-data > .meta", "index": 0,
                      "re": r"^\s*(.*?)\s*//"},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "span.updated"},
        "block": {"para_sel": ".entry.clearfix p",
                  "img_sel": ".entry.clearfix p > img"},
    },
}

TECHNOBABOY_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul.menu li > a"},
        "entry": {"sel": ".col-12 .content h2 a"},
        "page_time": {"sel": ".posts-wrap time", "index": -1},
        "next": {"sel": "span.page-numbers.label-next a", "attr": "href"},
        "title": {"sel": "h1.post-title"},
        "pub": {"sel": "time.post-date"},
        # featured anchor HREFS first, then content img SRCS — one walk,
        # the secondary attribute covers the <a> nodes
        # (technobaboy.py:72-86)
        "block": {"para_sel": ".post-content.entry-content p",
                  "img_sel": [".featured > a",
                              ".post-content.entry-content img"],
                  "img_attr": "src", "img_attr2": "href"},
    },
}

PINOYPARAZZI_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "menu_child_kind": "menu2",  # two menu hops (pinoyparazzi.py:40-46)
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#menu-header-1 > li > a"},
        "category2": {"sel": "a.td-pulldown-category-filter-link"},
        "entry": {"sel": ".td-ss-main-content .entry-title > a"},
        "page_time": {"sel": ".td-ss-main-content time", "index": 0},
        "next": {"sel": ".page-nav > a", "index": -1, "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "time.entry-date.updated.td-module-date"},
        "block": {"para_sel": ".td-post-content.tagdiv-type p",
                  "img_sel": ".wp-caption > img"},
    },
}

TEHELKAHINDI_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "abstract_split": {"sep": "।"},
    "extract": {
        "category": {"sel": "#menu-main-menu-1 > li.menu-item",
                     "slice": [1, -2], "link_sel": "a",
                     "children_sel": "ul.sub-menu a",
                     "children_suppress_parent": True},
        "entry": {"sel": "a.td-image-wrap"},
        "page_time": {"sel": "time.entry-date.updated.td-module-date",
                      "index": -1},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "time.entry-date.updated.td-module-date"},
        "block": {"para_sel": ".td-post-content p",
                  "img_sel": "img.entry-thumb.td-modal-image"},
    },
}

MATTSCRADLE_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    # pagination decided by side-fetching the FIRST headline's article
    # date (mattscradle.py:50-54's requests.get)
    "page_gate_fetch_last": {"sel": "span.post_date.date_modified"},
    "page_gate_fetch_index": 0,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#menu-home li > a"},
        "entry": {"sel": "h2.headline",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "next": {"sel": "span.previous_posts a", "attr": "href"},
        "title": {"sel": "h1.headline"},
        "pub": {"sel": "span.post_date.date_modified"},
        # whole-container body with a first-paragraph abstract
        # (py:75-80)
        "abstract": {"sel": ".post_content > p"},
        "body_fallback": {"sel": ".post_content"},
        "block": {"img_sel": ".post_content img"},
    },
}

AWESOME_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # link text minus its first character — awesome.py:33-36's
        # re.findall('.(.*)?') drops the leading '#'
        "category": {"sel": "ul.sub-menu li a", "label_re": r".(.*)"},
        "entry": {"sel": "main#main article",
                  "fields": {
                      "href": {"sel": "header.entry-header h2 a",
                               "attr": "href"},
                      "abstract": {"sel": "div.entry-content p"},
                  }},
        # FIRST entry-date datetime attribute, isoT (py:49-53)
        "page_time": {"sel": "time.entry-date.published", "index": 0,
                      "attr": "datetime"},
        "next": {"sel": "div.nav-links div.nav-previous a",
                 "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "div.posted-on time"},
        # the reference's image selector is broken ('size-large' parsed
        # as a TAG name) and never matches — bug-faithful: no images
        # (awesome.py:81-85)
        "block": {"para_sel": "div.entry-content p"},
    },
    "page_time_style": "isoT",
}


def _wp_chain(g, wid, lang, host, base, rules, cats, *, menu_html,
              list_url, list_html, art_html, date_fn,
              page_ages=((0.0, 12.0), (24.0, 44.0)), scheme="https"):
    """One standard two-page next-link chain per category: page 1 fresh,
    page 2's gate value stale — closing every tranche-D fixture the same
    way the 36 h cursor closes the real sites."""
    g.registry[wid] = dict(rules)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": lang})
    g.page(base + "/", "menu", menu_html, host)
    for cslug in cats:
        for p, ages in enumerate(page_ages, 1):
            arts = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-story-{p}-{e}/"
                g.page(aurl, "article", art_html(cslug, p, e, dt), host)
                arts.append((aurl, dt))
            nxt_url = f"{base}/{cslug}/page/{p + 1}/"
            lurl = (f"{base}/{cslug}/" if p == 1
                    else f"{base}/{cslug}/page/{p}/")
            g.page(list_url(cslug, p, lurl), "list",
                   list_html(cslug, p, arts, nxt_url), host)


def _build_agniban(g: _G) -> None:
    host, base = "news.agniban.com", "https://news.agniban.com"

    def menu():
        return ('<html><ul class="menu">'
                f'<li><a href="{base}/desh/">देश</a></li>'
                f'<li><a href="{base}/tv/">TV</a><ul><li>sub</li></ul></li>'
                f'<li><a href="{base}/videsh/">विदेश</a></li>'
                f'<li><a href="{base}/last/">Last</a></li></ul></html>')

    def art(c, p, e, dt):
        return (f'<html><article><h1 class="entry-title '
                f'twp-secondary-title">AG {c} {p}-{e}</h1>'
                f'<span class="item-metadata posts-date">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                f"<p>ag पहला {c} {p}-{e}। ag दूसरा।</p>"
                f'<p><img src="{base}/i/{c}{p}{e}.jpg"></p>'
                f"</article></html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<a class="post-thumbnail" href="{u}">t</a>'
            f'<span class="item-metadata posts-date">'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
            for u, dt in arts
        )
        crumbs = (f'<li class="trail-item">होम</li>'
                  f'<li class="trail-item">{c.title()}</li>'
                  + (f'<li class="trail-item">Page {p}</li>' if p > 1
                     else f'<li class="trail-item">उप</li>'))
        return (f'<html>{crumbs}<div class="twp-row">{rows}</div>'
                f'<a class="next page-numbers" href="{nxt}">»</a></html>')

    _wp_chain(g, 1108, 1930, host, base, AGNIBAN_RULES,
              ("desh", "videsh"), menu_html=menu(),
              list_url=lambda c, p, lurl: lurl,
              list_html=lst, art_html=art, date_fn=None)


def _build_coolbuster(g: _G) -> None:
    host, base = "www.coolbuster.net", "https://www.coolbuster.net"
    wid = 1238
    g.registry[wid] = dict(COOLBUSTER_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><div id="nav-ceebee"><ul><li>'
           f'<a href="{base}/search/label/news">News</a></li></ul></div>'
           "</html>", host)
    ages = [(0.0, 12.0), (24.0, 44.0)]
    for p, pair in enumerate(ages, 1):
        rows = []
        for e, age in enumerate(pair):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/cb-{p}-{e}.html"
            rows.append(
                f'<div class="post hentry">'
                f'<h2 class="post-title entry-title"><a href="{aurl}">t'
                f'</a></h2><div class="post-snippet">cb snip {p}-{e}'
                f"</div></div>"
            )
            g.page(
                aurl, "article",
                f'<html><h1 class="post-title entry-title">CB {p}-{e}'
                f'</h1><span class="updated">{_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</span>"
                f'<div class="separator"><a href="{base}/big/{p}{e}.jpg">'
                f'<img src="{base}/th/{p}{e}.jpg"></a></div>'
                f'<div class="post-body entry-content"><div>ad</div>'
                f"<div>share</div><div>cb body {p}-{e} text</div></div>"
                f"</html>",
                host,
            )
        # the older-link embeds the NEXT page's gate date: page 1's link
        # carries a fresh stamp, page 2's a stale one
        gate_dt = BASE_DT - timedelta(hours=ages[p][0] if p < 2 else 60.0)
        iso = gate_dt.strftime("%Y-%m-%dT%H:%M:%S")
        nxt = (f'<a class="blog-pager-older-link" href="{base}/search/'
               f'label/news?updated-max={iso}%2B08:00&start={p * 20}">'
               "Older</a>")
        lurl = (f"{base}/search/label/news" if p == 1
                else f"{base}/search/label/news?updated-max="
                     f"{(BASE_DT - timedelta(hours=24.0)).strftime('%Y-%m-%dT%H:%M:%S')}"
                     f"%2B08:00&start=20")
        g.page(lurl, "list",
               "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_yashbharat(g: _G) -> None:
    host, base = "yashbharat.com", "https://yashbharat.com"

    menu = ('<html><div class="menu-primary-container"><ul>'
            f'<li><a href="{base}/">Home</a></li>'
            f'<li><a href="{base}/katni/">कटनी</a></li>'
            f'<li><a href="{base}/mp/">मप्र</a><ul>'
            f'<li><a href="{base}/mp/jabalpur/">जबलपुर</a></li></ul></li>'
            f'<li><a href="{base}/epaper/">ई-पेपर</a></li>'
            f'<li><a href="{base}/about/">About</a></li></ul></div></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="entry-title">YB {c} {p}-{e}</h1>'
                f'<time class="entry-date published updated">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
                f'<img class="attachment-colormag-featured-image '
                f'size-colormag-featured-image wp-post-image" '
                f'src="{base}/f/{c}{p}{e}.jpg">'
                f'<div class="entry-content clearfix">'
                f"<p>yb पहला {c} {p}-{e}। yb दूसरा।</p></div></html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<article><a href="{u}">t</a>'
            f"<time>{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
            f"</article>"
            for u, dt in arts
        )
        return (f'<html><div class="article-container">{rows}</div>'
                f'<li class="previous"><a href="{nxt}">पिछला</a></li>'
                f"</html>")

    _wp_chain(g, 1073, 1930, host, base, YASHBHARAT_RULES,
              ("katni", "mp/jabalpur"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl,
              list_html=lst, art_html=art, date_fn=None)


def _build_puridunia(g: _G) -> None:
    host, base = "puridunia.com", "https://puridunia.com"

    menu = ('<html><ul id="main-nav-menu">'
            f'<li><a href="{base}/lucknow/">लखनऊ</a></li>'
            f'<li><a href="{base}/up/">यूपी</a></li></ul></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="post-title entry-title">PD {c} {p}-{e}'
                f'</h1><span class="date meta-item tie-icon">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                f'<div class="single-featured-image">'
                f'<img src="{base}/f/{c}{p}{e}.jpg"></div>'
                f'<div class="entry-content"><p>pd पहला {c} {p}-{e}</p>'
                f"<h3>उपशीर्षक</h3>"
                f'<p><img src="{base}/in/{c}{p}{e}.jpg"></p></div></html>')

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<div class="main-content"><h2 class="post-title">'
            f'<a href="{u}">t</a></h2></div>'
            for u, _dt in arts
        )
        dates = "".join(
            f'<span class="date">{_MON_FULL[dt.month - 1]} {dt.day}, '
            f"{dt.year}</span>"
            for _u, dt in arts
        )
        return (f"<html>{rows}{dates}"
                f'<li class="the-next-page"><a href="{nxt}">»</a></li>'
                f"</html>")

    # puridunia gates on the FIRST date — make page 2's first entry stale
    _wp_chain(g, 1142, 1740, host, base, PURIDUNIA_RULES,
              ("lucknow", "up"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl, list_html=lst,
              art_html=art, date_fn=None,
              page_ages=((0.0, 12.0), (44.0, 24.0)))


def _build_starmometer(g: _G) -> None:
    host, base = "starmometer.com", "https://starmometer.com"

    menu = ('<html><div id="menu-main-menu-1">'
            f'<a href="{base}/showbiz/">Showbiz</a>'
            f'<a href="{base}/music/">Music</a></div></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="entry-title">SM {c} {p}-{e}</h1>'
                f'<span class="updated">{_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</span>"
                f'<div class="entry clearfix"><p>sm body {c} {p}-{e}</p>'
                f'<p><img src="{base}/i/{c}{p}{e}.jpg"></p></div></html>')

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<div class="loop-data"><div class="loop-title">'
            f'<a href="{u}">t</a></div><div class="meta">'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year} // by Staff"
            f"</div></div>"
            for u, dt in arts
        )
        return (f"<html>{rows}"
                f'<a class="next page-numbers" href="{nxt}">»</a></html>')

    # gate reads the FIRST meta — page 2 leads with the stale entry
    _wp_chain(g, 1239, 1866, host, base, STARMOMETER_RULES,
              ("showbiz", "music"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl, list_html=lst,
              art_html=art, date_fn=None,
              page_ages=((0.0, 12.0), (44.0, 24.0)))


def _build_technobaboy(g: _G) -> None:
    host, base = "technobaboy.com", "https://technobaboy.com"

    menu = ('<html><ul class="menu">'
            f'<li><a href="{base}/phones/">Phones</a></li>'
            f'<li><a href="{base}/apps/">Apps</a></li></ul></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="post-title">TB {c} {p}-{e}</h1>'
                f'<time class="post-date">{_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</time>"
                f'<div class="featured"><a href="{base}/hero/{c}{p}{e}'
                f'.jpg"><img src="{base}/th/{c}{p}{e}.jpg"></a></div>'
                f'<div class="post-content description cf entry-content '
                f'content-spacious"><p>tb body {c} {p}-{e}</p>'
                f'<img src="{base}/in/{c}{p}{e}.png"><p>tb more</p></div>'
                f"</html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<div class="col-12"><div class="content"><h2>'
            f'<a href="{u}">t</a></h2></div></div>'
            for u, _dt in arts
        )
        times = "".join(
            f'<div class="posts-wrap"><time>{_MON_FULL[dt.month - 1]} '
            f"{dt.day}, {dt.year}</time></div>"
            for _u, dt in arts
        )
        return (f"<html>{rows}{times}"
                f'<span class="page-numbers label-next">'
                f'<a href="{nxt}">Next</a></span></html>')

    _wp_chain(g, 1246, 1866, host, base, TECHNOBABOY_RULES,
              ("phones", "apps"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl,
              list_html=lst, art_html=art, date_fn=None)


def _build_pinoyparazzi(g: _G) -> None:
    host, base = "www.pinoyparazzi.com", "https://www.pinoyparazzi.com"
    wid = 1241
    g.registry[wid] = dict(PINOYPARAZZI_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1880})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-header-1"><li>'
           f'<a href="{base}/showbiz/">Showbiz</a></li></ul></html>', host)
    # the second menu hop: pulldown filter links
    g.page(
        base + "/showbiz/", "menu2",
        f'<html><a class="td-pulldown-category-filter-link" '
        f'href="{base}/showbiz/chika/">Chika</a>'
        f'<a class="td-pulldown-category-filter-link" '
        f'href="{base}/showbiz/balita/">Balita</a></html>',
        host,
    )
    for cslug in ("chika", "balita"):
        for p, ages in enumerate([(0.0, 12.0), (44.0, 24.0)], 1):
            rows, times = [], []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-tsismis-{p}-{e}/"
                rows.append(f'<div class="td-ss-main-content">'
                            f'<h3 class="entry-title"><a href="{aurl}">t'
                            f"</a></h3>"
                            f"<time>{_MON_FULL[dt.month - 1]} {dt.day}, "
                            f"{dt.year}</time></div>")
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry-title">PP {cslug} {p}-{e}'
                    f'</h1><time class="entry-date updated '
                    f'td-module-date">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</time>"
                    f'<div class="wp-caption">'
                    f'<img src="{base}/c/{cslug}{p}{e}.jpg"></div>'
                    f'<div class="td-post-content tagdiv-type">'
                    f"<p>pp chika {cslug} {p}-{e}</p><p>pp pa more</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<div class="page-nav">'
                   f'<a href="{base}/showbiz/{cslug}/page/{p + 1}/">»</a>'
                   "</div>")
            lurl = (f"{base}/showbiz/{cslug}/" if p == 1
                    else f"{base}/showbiz/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_tehelkahindi(g: _G) -> None:
    host, base = "tehelkahindi.com", "http://tehelkahindi.com"

    menu = ('<html><ul id="menu-main-menu-1">'
            f'<li class="menu-item"><a href="{base}/">Home</a></li>'
            f'<li class="menu-item"><a href="{base}/rajya/">राज्य</a>'
            f'<ul class="sub-menu"><li><a href="{base}/rajya/up/">यूपी'
            f"</a></li></ul></li>"
            f'<li class="menu-item"><a href="{base}/desh/">देश</a></li>'
            f'<li class="menu-item"><a href="{base}/video/">Video</a></li>'
            f'<li class="menu-item"><a href="{base}/epaper/">E-Paper</a>'
            "</li></ul></html>")

    def art(c, p, e, dt):
        return (f'<html><h1 class="entry-title">TH {c} {p}-{e}</h1>'
                f'<time class="entry-date updated td-module-date">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
                f'<img class="entry-thumb td-modal-image" '
                f'src="{base}/t/{c}{p}{e}.jpg">'
                f'<div class="td-post-content"><p>th पहला {c} {p}-{e}। '
                f"th दूसरा।</p></div></html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<a class="td-image-wrap" href="{u}">t</a>'
            f'<time class="entry-date updated td-module-date">'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
            for u, dt in arts
        )
        return (f"<html>{rows}"
                f'<div class="page-nav td-pb-padding-side">'
                f'<a href="{nxt}">»</a></div></html>')

    _wp_chain(g, 1099, 1930, host, base, TEHELKAHINDI_RULES,
              ("rajya/up", "desh"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl,
              list_html=lst, art_html=art, date_fn=None)


def _build_mattscradle(g: _G) -> None:
    host, base = "mattscradle.com", "https://mattscradle.com"

    menu = ('<html><ul id="menu-home">'
            f'<li><a href="{base}/promos/">Promos</a></li>'
            f'<li><a href="{base}/guides/">Guides</a></li></ul></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="headline">MC {c} {p}-{e}</h1>'
                f'<span class="post_date date_modified">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                f'<div class="post_content"><p>mc body {c} {p}-{e}</p>'
                f'<img src="{base}/s/{c}{p}{e}.png"><p>mc extra</p></div>'
                f"</html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<h2 class="headline"><a href="{u}">t</a></h2>'
            for u, _dt in arts
        )
        return (f"<html>{rows}"
                f'<span class="previous_posts"><a href="{nxt}">Older'
                f"</a></span></html>")

    # the gate side-fetches the FIRST headline — page 2 leads stale
    _wp_chain(g, 1232, 1866, host, base, MATTSCRADLE_RULES,
              ("promos", "guides"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl, list_html=lst,
              art_html=art, date_fn=None,
              page_ages=((0.0, 12.0), (44.0, 24.0)))


def _build_awesome(g: _G) -> None:
    host, base = "awesome.com.ph", "https://awesome.com.ph"

    menu = ('<html><ul class="sub-menu">'
            f'<li><a href="{base}/restaurants/">#Restaurants</a></li>'
            f'<li><a href="{base}/travel/">#Travel</a></li></ul></html>')

    def art(c, p, e, dt):
        return (f'<html><h1 class="entry-title">AW {c} {p}-{e}</h1>'
                f'<div class="posted-on"><time>'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
                f"</div>"
                f'<div class="entry-content"><p>aw body {c} {p}-{e}</p>'
                f"<p>aw second</p></div></html>")

    def lst(c, p, arts, nxt):
        rows = "".join(
            f'<main id="main"><article><header class="entry-header">'
            f'<h2><a href="{u}">t</a></h2></header>'
            f'<div class="entry-content"><p>aw teaser {c}-{du.day}</p>'
            f"</div>"
            f'<time class="entry-date published" datetime='
            f'"{du.strftime("%Y-%m-%dT%H:%M:%S")}+08:00">d</time>'
            f"</article></main>"
            for u, du in arts
        )
        return (f"<html>{rows}"
                f'<div class="nav-links"><div class="nav-previous">'
                f'<a href="{nxt}">Older</a></div></div></html>')

    # gate reads the FIRST datetime — page 2 leads stale
    _wp_chain(g, 1243, 1866, host, base, AWESOME_RULES,
              ("restaurants", "travel"), menu_html=menu,
              list_url=lambda c, p, lurl: lurl, list_html=lst,
              art_html=art, date_fn=None,
              page_ages=((0.0, 12.0), (44.0, 24.0)))


# ---------------------------------------------------------------------------
# Tranche E — hindi (Devanagari-digit dates), dailyhindinews (zipped
# label/link menu selectors, ISO-date-only article stamps), journal
# (page-title-labeled submenu), remate (h4-body fallback, conditional
# breadcrumb category2).
# ---------------------------------------------------------------------------

HINDI_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    # ०-९ translated to ASCII before the fuzzy cascade (hindi.py:18-48)
    "date_style": "fuzzy_devanagari",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "div.col-xs-12 li > a", "slice": [0, -1]},
        "entry": {"sel": "a.img"},
        # the page's single date block, FIRST (hindi.py:94)
        "page_time": {"sel": "div.date", "index": 0},
        "next": {"sel": "a.btn.btn-default", "attr": "href"},
        "title": {"sel": "h2.item-title"},
        # item-date minus its trailing token (py:109's rsplit(' ', 1)[0])
        "pub": {"sel": "div.item-date", "re": r"^(.*) \S+$"},
        "abstract": {"sel": "p.introtext"},
        # body skips the FIRST item-text paragraph (py:122's [1:])
        "block": {"para_sel": ".item-text > p", "para_skip": 1,
                  "img_sel": ["li.photo figure > img",
                              ".item-text > figure > img"]},
    },
}

DAILYHINDINEWS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "isoT",  # entry gates on the datetime attribute
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # links and their labels come from two PARALLEL selectors zipped
        # by position (dailyhindinews.py:35-41)
        "category": {"sel": "a.hm-viewall", "skip": 1,
                     "labels_from": {"sel": "h4.widget-title",
                                     "skip": 1}},
        "entry": {"sel": "article",
                  "fields": {
                      "href": {"sel": "a", "attr": "href"},
                      "abstract": {"sel": ".entry-summary p"},
                      "time": {"sel": "time.updated",
                               "attr": "datetime"},
                  }},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        # the article stores only the DATE part at midnight (py:68)
        "pub": {"sel": "time.entry-date.published.updated",
                "attr": "datetime"},
        # body drops the trailing share paragraph (py:71's [:-1])
        "block": {"para_sel": "div.entry-content > p",
                  "para_slice": [0, -1],
                  "img_sel": "div.entry-content img"},
    },
    # the stored time keeps only the ISO date at midnight (py:68)
    "article_pub_style": "iso_date",
}

JOURNAL_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # the submenu of the li whose label equals the page's own archive
        # title; category1 = that title, category2 = sub-link text
        # (journal.py:33-40)
        "category": {"sel": "#site-navigation ul li ul > li a",
                     "label_from": {"sel": ".page-title.mt-archive-title"}},
        "entry": {"sel": "h2.entry-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".posted-on > a > time", "index": -1},
        "next": {"sel": ".nav-links > a", "index": -1, "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": ".posted-on > a > time"},
        "abstract": {"sel": ".entry-content h2"},
        "block": {"para_sel": ".entry-content p",
                  "img_sel": [".single-post-image img",
                              ".entry-content img"]},
    },
}

REMATE_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "div.vc_btn3-container.vc_btn3-center",
                     "link_sel": "a"},
        # both categories from the LIST page's breadcrumb; one-level
        # sections simply have no third crumb (remate.py:46-51)
        "cat1_self": {"sel": ".breadcrumb > li", "index": 1},
        "cat2_self": {"sel": ".breadcrumb > li", "index": 2},
        "entry": {"sel": "h2.entry-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": "article .meta-date", "index": -1},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "#content > article > h1"},
        "pub": {"sel": "article .meta-date", "index": 0},
        # h4-bodied articles (abstract = first h4); paragraph fallback
        # when an article carries no h4s (remate.py:75-83)
        "block": {"para_sel": "#content > article h4",
                  "para_sel_fallback": "#content > article p",
                  "img_sel": "#content > article img"},
    },
}


def _build_hindi(g: _G) -> None:
    # the reference runs TWO spiders against parstoday.com ('parstoday'
    # and 'hindi' — separate Scrapy processes, so no cross-spider dedup);
    # this combined single-crawl fixture disambiguates the host so both
    # rule-sets stay exercised side by side.
    host, base = "hi.parstoday.com", "https://hi.parstoday.com"
    wid = 1071
    g.registry[wid] = dict(HINDI_RULES)
    g.seeds.append({"url": base + "/hi", "website_id": wid,
                    "language_id": 1930})
    _DEV = str.maketrans("0123456789", "०१२३४५६७८९")
    menu = ('<div class="col-xs-12"><ul>'
            f'<li><a href="{base}/hi/india">भारत</a></li>'
            f'<li><a href="{base}/hi/world">विश्व</a></li>'
            f'<li><a href="{base}/hi/about">परिचय</a></li></ul></div>')
    g.page(base + "/hi", "menu", f"<html>{menu}</html>", host)
    for cslug in ("india", "world"):
        for p, ages in enumerate([(0.0, 12.0), (44.0, 24.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/hi/{cslug}/samachar-{p}-{e}"
                rows.append(f'<a class="img" href="{aurl}">t</a>')
                raw = (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                       .translate(_DEV))
                g.page(
                    aurl, "article",
                    f'<html><h2 class="item-title">HI {cslug} {p}-{e}'
                    f'</h2><div class="item-date">{raw} IST</div>'
                    f'<li class="photo"><figure>'
                    f'<img src="{base}/ph/{cslug}{p}{e}.jpg"></figure>'
                    f"</li>"
                    f'<div class="item-text">'
                    f'<p class="introtext">सार {cslug} {p}-{e}</p>'
                    f"<p>hi मुख्य {cslug} {p}-{e}</p>"
                    f'<figure><img src="{base}/in/{cslug}{p}{e}.jpg">'
                    f"</figure></div></html>",
                    host,
                )
            gate = (f"{_MON_FULL[dt.month - 1]} {dt.day}, "
                    f"{dt.year}").translate(_DEV)
            dt0 = BASE_DT - timedelta(hours=ages[0])
            gate = (f"{_MON_FULL[dt0.month - 1]} {dt0.day}, "
                    f"{dt0.year}").translate(_DEV)
            nxt = (f'<a class="btn btn-default" '
                   f'href="{base}/hi/{cslug}?p={p + 1}">और</a>')
            lurl = (f"{base}/hi/{cslug}" if p == 1
                    else f"{base}/hi/{cslug}?p={p}")
            g.page(lurl, "list",
                   f'<html><div class="date">{gate}</div>'
                   + "".join(rows) + nxt + "</html>", host)


def _build_dailyhindinews(g: _G) -> None:
    host, base = "www.dailyhindinews.com", "https://www.dailyhindinews.com"
    wid = 1130
    g.registry[wid] = dict(DAILYHINDINEWS_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    menu = ('<h4 class="widget-title">विज्ञापन</h4>'
            '<h4 class="widget-title">देश</h4>'
            '<h4 class="widget-title">खेल</h4>'
            f'<a class="hm-viewall" href="{base}/promo">View</a>'
            f'<a class="hm-viewall" href="{base}/desh">View</a>'
            f'<a class="hm-viewall" href="{base}/khel">View</a>')
    g.page(base + "/", "menu", f"<html>{menu}</html>", host)
    for cslug in ("desh", "khel"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                iso = dt.strftime("%Y-%m-%dT%H:%M:%S") + "+05:30"
                aurl = f"{base}/{cslug}-khabar-{p}-{e}"
                rows.append(
                    f'<article><a href="{aurl}">t</a>'
                    f'<div class="entry-summary"><p>dhn सार {cslug} '
                    f"{p}-{e}</p></div>"
                    f'<time class="updated" datetime="{iso}">d</time>'
                    f"</article>"
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry-title">DHN {cslug} {p}-{e}'
                    f'</h1><time class="entry-date published updated" '
                    f'datetime="{iso}">d</time>'
                    f'<div class="entry-content">'
                    f"<p>dhn body {cslug} {p}-{e}</p>"
                    f'<img src="{base}/i/{cslug}{p}{e}.jpg">'
                    f"<p>share buttons — dropped</p></div></html>",
                    host,
                )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{base}/{cslug}?page={p + 1}">»</a>')
            lurl = (f"{base}/{cslug}" if p == 1
                    else f"{base}/{cslug}?page={p}")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_journal(g: _G) -> None:
    host, base = "journal.com.ph", "https://journal.com.ph"
    wid = 196
    g.registry[wid] = dict(JOURNAL_RULES)
    g.seeds.append({"url": base + "/news/", "website_id": wid,
                    "language_id": 1866})
    g.page(
        base + "/news/", "menu",
        f'<html><h1 class="page-title mt-archive-title">News</h1>'
        f'<nav id="site-navigation"><div><ul>'
        f'<li><a href="{base}/news/">News</a><ul>'
        f'<li><a href="{base}/news/national/">National</a></li>'
        f'<li><a href="{base}/news/metro/">Metro</a></li>'
        f"</ul></li></ul></div></nav></html>",
        host,
    )
    for cslug in ("national", "metro"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/news/{cslug}/story-{p}-{e}/"
                rows.append(
                    f'<h2 class="entry-title"><a href="{aurl}">t</a></h2>'
                    f'<span class="posted-on"><a href="#"><time>'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</time></a></span>"
                )
                h2 = ("<h2>Journal deck {0}-{1}</h2>".format(p, e)
                      if e == 0 else "")
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry-title">JN {cslug} {p}-{e}'
                    f'</h1><span class="posted-on"><a href="#"><time>'
                    f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                    f"</time></a></span>"
                    f'<div class="single-post-image">'
                    f'<img src="{base}/f/{cslug}{p}{e}.jpg"></div>'
                    f'<div class="entry-content">{h2}'
                    f"<p>jn body {cslug} {p}-{e}</p><p>jn two</p></div>"
                    f"</html>",
                    host,
                )
            nxt = (f'<div class="nav-links">'
                   f'<a href="{base}/news/{cslug}/page/{p + 1}/">»</a>'
                   "</div>")
            lurl = (f"{base}/news/{cslug}/" if p == 1
                    else f"{base}/news/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_remate(g: _G) -> None:
    host, base = "www.remate.ph", "https://www.remate.ph"
    wid = 533
    g.registry[wid] = dict(REMATE_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1880})
    menu = "".join(
        f'<div class="vc_btn3-container vc_btn3-center">'
        f'<a href="/{c}/">{c.title()}</a></div>'
        for c in ("balita", "sports")
    )
    g.page(base + "/", "menu", f"<html>{menu}</html>", host)
    crumbs = {
        "balita": ('<ul class="breadcrumb"><li>Home</li><li>BALITA</li>'
                   "<li>Metro</li></ul>"),
        # SPORTS is a one-level section: no third crumb (remate.py:46-48)
        "sports": ('<ul class="breadcrumb"><li>Home</li><li>SPORTS</li>'
                   "</ul>"),
    }
    for cslug in ("balita", "sports"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-ulat-{p}-{e}/"
                rows.append(
                    f'<article><h2 class="entry-title">'
                    f'<a href="{aurl}">t</a></h2>'
                    f'<span class="meta-date">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</span></article>"
                )
                # sports articles are h4-bodied; balita ones plain p's
                body = (
                    f"<h4>rm h4 lead {cslug} {p}-{e}</h4>"
                    f"<h4>rm h4 two</h4>" if cslug == "sports" else
                    f"<p>rm p lead {cslug} {p}-{e}</p><p>rm p two</p>"
                )
                g.page(
                    aurl, "article",
                    f'<html><div id="content"><article>'
                    f"<h1>RM {cslug} {p}-{e}</h1>"
                    f'<span class="meta-date">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</span>"
                    f'<img src="{base}/i/{cslug}{p}{e}.jpg">'
                    f"{body}</article></div></html>",
                    host,
                )
            nxt = (f'<a class="next page-numbers" '
                   f'href="{base}/{cslug}/page/{p + 1}/">»</a>')
            lurl = (f"{base}/{cslug}/" if p == 1
                    else f"{base}/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   f"<html>{crumbs[cslug]}" + "".join(rows) + nxt
                   + "</html>", host)


# ---------------------------------------------------------------------------
# cnnphilippines — sliced nav, TWO ungated entry groups, categories from
# the article URL with a digits guard, fixed-id body container
# (已部署/cnnphilippines.py)
# ---------------------------------------------------------------------------

CNN_BASE = "https://www.cnnphilippines.com"

CNNPHILIPPINES_RULES = {
    "rule": NEXT_LINK,  # no pagination at all (single list pages)
    "format": "html",
    "cat1_from_url_re": r"^https?://[^/]+/([^/]+)/",
    # numeric second segment leaves category2 unset (py:42-43)
    "cat2_from_url_re": r"^https?://[^/]+/[^/]+/([^/\d]+)/",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "#topNavbar > ul > li > a", "slice": [1, 7]},
        # grid links AND carousel headers, spec order (py:31-35)
        "entry": [
            {"sel": "section.row.container-padding-10 a"},
            {"sel": ".row.carousel-body .cpmedium-header a"},
        ],
        "title": {"sel": ".title"},
        # the reference falls back .dateLine > p → .dateString; the
        # fixture pins the primary form
        "pub": {"sel": ".dateLine > p"},
        "block": {"para_sel": "#content-body-244757-498257 > p",
                  "img_sel": ".margin-bottom-15 img"},
    },
}


def _build_cnnphilippines(g: _G) -> None:
    host = "www.cnnphilippines.com"
    wid = 449
    g.registry[wid] = dict(CNNPHILIPPINES_RULES)
    g.seeds.append({"url": CNN_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = ('<div id="topNavbar"><ul>'
            + "".join(f'<li><a href="/{c}/">{c.title()}</a></li>'
                      for c in ("home", "national", "world", "x1", "x2",
                                "x3", "x4", "beyond"))
            + "</ul></div>")
    g.page(CNN_BASE + "/", "menu", f"<html>{menu}</html>", host)
    step = [0]
    for cslug in ("national", "world"):
        rows = []
        for e in range(3):
            dt = _t(step[0], 5.0)
            step[0] += 1
            seg2 = "metro" if e % 2 == 0 else "2021"  # digits guard probe
            aurl = f"{CNN_BASE}/{cslug}/{seg2}/story-{e}/"
            grp = ('<section class="row container-padding-10">'
                   f'<a href="/{cslug}/{seg2}/story-{e}/">t</a></section>'
                   if e < 2 else
                   f'<div class="row carousel-body">'
                   f'<div class="cpmedium-header">'
                   f'<a href="/{cslug}/{seg2}/story-{e}/">t</a></div></div>')
            rows.append(grp)
            g.page(
                aurl, "article",
                f'<html><h1 class="title">CNN {cslug} {e}</h1>'
                f'<div class="dateLine"><p>{_MON_FULL[dt.month - 1]} '
                f"{dt.day}, {dt.year}</p></div>"
                f'<div class="margin-bottom-15">'
                f'<img src="/i/{cslug}{e}.jpg"></div>'
                f'<div id="content-body-244757-498257">'
                f"<p>cnn body {cslug} {e}</p><p>cnn two</p></div></html>",
                host,
            )
        g.page(f"{CNN_BASE}/{cslug}/", "list",
               "<html>" + "".join(rows) + "</html>", host)


# ---------------------------------------------------------------------------
# philnews — href-prefix + two-segment regex menu filter, URL categories
# with the 'page' guard, optional h2 abstract, previous_posts pagination
# (已部署/philnews.py)
# ---------------------------------------------------------------------------

PHILNEWS_BASE = "https://philnews.ph"

PHILNEWS_RULES = {
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "cat1_url_re": r"^https?://[^/]+/category/([^/]+)",
    "cat2_url_re": r"^https?://[^/]+/category/[^/]+/(?!page)([^/]+)",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        # only two-segment /category/x/y links are sections (py:27-29)
        "category": {"sel": '#ubermenu-nav-main-89265 '
                            f'a[href^="{PHILNEWS_BASE}/category/"]',
                     "href_re": r"https://philnews\.ph/category/"
                                r"\S+?/\S+?$"},
        "entry": {"sel": 'div[class="default-post-category-content'
                         ' post_box"] .default-category-image > a'},
        "page_time": {"sel": 'div[class="default-post-category-content'
                             ' post_box"] .post_date', "index": -1},
        "next": {"sel": ".previous_posts > a", "attr": "href"},
        "title": {"sel": "h1.headline"},
        "pub": {"sel": ".post_date_intro > .published"},
        "abstract": {"sel": ".post_content > h2"},
        "block": {"para_sel": ".post_content > p",
                  "img_sel": ".post_content > figure img"},
    },
}


def _build_philnews(g: _G) -> None:
    host = "philnews.ph"
    wid = 488
    g.registry[wid] = dict(PHILNEWS_RULES)
    g.seeds.append({"url": PHILNEWS_BASE + "/", "website_id": wid,
                    "language_id": 1866})
    menu = ('<nav id="ubermenu-nav-main-89265">'
            f'<a href="{PHILNEWS_BASE}/category/news/">One-segment</a>'
            f'<a href="{PHILNEWS_BASE}/category/news/peso">Peso</a>'
            f'<a href="{PHILNEWS_BASE}/category/news/viral">Viral</a>'
            "</nav>")
    g.page(PHILNEWS_BASE + "/", "menu", f"<html>{menu}</html>", host)
    for cslug in ("peso", "viral"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{PHILNEWS_BASE}/{cslug}-balita-{p}-{e}/"
                rows.append(
                    f'<div class="default-post-category-content post_box">'
                    f'<div class="default-category-image">'
                    f'<a href="{aurl}">t</a></div>'
                    f'<span class="post_date">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</span></div>"
                )
                h2 = "<h2>PN deck</h2>" if e == 0 else ""
                g.page(
                    aurl, "article",
                    f'<html><h1 class="headline">PHN {cslug} {p}-{e}</h1>'
                    f'<div class="post_date_intro">'
                    f'<span class="published">{_MON_FULL[dt.month - 1]} '
                    f"{dt.day}, {dt.year}</span></div>"
                    f'<div class="post_content">{h2}'
                    f"<p>phn body {cslug} {p}-{e}</p>"
                    f'<figure><img src="{PHILNEWS_BASE}/f/{cslug}{p}{e}'
                    f'.jpg"></figure></div></html>',
                    host,
                )
            nxt = (f'<div class="previous_posts">'
                   f'<a href="{PHILNEWS_BASE}/category/news/{cslug}/page/'
                   f'{p + 1}/">Older</a></div>')
            lurl = (f"{PHILNEWS_BASE}/category/news/{cslug}" if p == 1
                    else f"{PHILNEWS_BASE}/category/news/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


# ---------------------------------------------------------------------------
# tranche G — aajka, abs-cbn, agrasamachar, apnlive, balita, balita1
# (已部署/{aajka,abs-cbn,agrasamachar,apnlive,balita,balita1}.py)
# ---------------------------------------------------------------------------

def _mdy_hm(dt: datetime) -> str:
    """'May 30, 2021, 11:00' — the Month-D-Y-H-M branch of format_time2."""
    return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year},"
            f" {dt.hour:02d}:{dt.minute:02d}")


AAJKA_RULES = {
    # aajka.py: one-level #categories-6 menu; the list's .jeg_meta_date
    # anchor IS the entry (href = article, text = fuzzy date, py:36-41);
    # entry-gated next-link pagination (.page_nav.next, py:44-48); article
    # categories from the breadcrumb's last two links (py:55-57); the
    # list-scraped date rides down in meta and the article never re-reads
    # it (py:41,63 — meta priority, the zeenews shape).
    "rule": NEXT_LINK,
    "format": "html",
    "extract": {
        "category": {"sel": "#categories-6 a"},
        "entry": {"sel": ".jeg_inner_content article .jeg_meta_date",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": "a"}}},
        "next": {"sel": ".page_nav.next", "attr": "href"},
        "title": {"sel": ".jeg_post_title"},
        # categorylist[-2]/[-1] (aajka.py:55-57)
        "cat1": {"sel": "#breadcrumbs > span a", "index": -2},
        "cat2": {"sel": "#breadcrumbs > span a", "index": -1},
        # lead image = the featured anchor's HREF (py:64-65); body
        # paragraphs .content-inner > p with the first as abstract
        # (py:58-62)
        "block": {"para_sel": ".content-inner > p",
                  "img_sel": ".jeg_featured.featured_image a",
                  "img_attr": "href"},
    },
}

ABSCBN_BASE = "https://news.abs-cbn.com"

ABSCBN_RULES = {
    # abs-cbn.py: menu = sibling-combinator nav sliced [1:9] (py:28-29)
    # plus one hardcoded tag list (py:31); entries are NEVER individually
    # gated — pagination alone is gated on the LAST .datetime through the
    # spider's own current-year 'Month D, H:MM' time_format (py:58-63);
    # article categories come off the URL path: segment 3 always, segment
    # 4 only when it carries no digit (py:37-40).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "page_time_style": "md_hm_nowyear",
    "cat1_from_url_re": r"^https?://[^/]+/([^/]+)/",
    "cat2_from_url_re": r"^https?://[^/]+/[^/]+/([^/0-9]+)(?:/|$)",
    "extra_lists": ({"url": ABSCBN_BASE + "/list/tag/tv-patrol"},),
    "extract": {
        "category": {"sel": ".search-container ~ ul > li > a",
                     "slice": [1, 9]},
        "entry": {"sel": ".articles > article > a"},
        "page_time": {"sel": ".articles > article .datetime",
                      "index": -1},
        "next": {"sel": '.easyPaginateNav > a[title=Next]',
                 "attr": "href"},
        "title": {"sel": ".news-title"},
        # fuzzy byline, fallback-now when absent (py:46-50)
        "pub": {"sel": ".timestamp-entry > .date-posted"},
        # only the FIRST embed-wrap image is stored (py:51-52)
        "block": {"para_sel": ".article-content > p",
                  "img_sel": ".article-content > .embed-wrap img",
                  "img_slice": [0, 1]},
    },
}

AGRA_BASE = "https://www.agrasamachar.com"

AGRASAMACHAR_RULES = {
    # agrasamachar.py: the start URL IS the Blogger list (no menu,
    # py:29-33); entries ungated, pagination gated on the LAST
    # .date-header span through the spider's OWN Hindi month table
    # (py:34-41 — note 'अक्तूबर', a different October spelling than
    # zeenews'/aajtak's); the article body is the whole post-body
    # container's text with '\xa0' as the line separator and the first
    # line as abstract (py:54-56); categories are always None (py:57-58).
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "hindi_dmy_agra",
    "page_time_style": "hindi_dmy_agra",
    "extract": {
        "entry": {"sel": ".post-title.entry-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "next": {"sel": "a.blog-pager-older-link", "attr": "href"},
        "page_time": {"sel": ".date-header span", "index": -1},
        "title": {"sel": ".post-title.entry-title"},
        "pub": {"sel": ".date-header span", "index": 0},
        # ALL caption images (py:50); body = raw container text split on
        # '\xa0' into lines (py:54-56)
        "body_fallback": {"sel": ".post-body.entry-content",
                          "raw": True, "split": " "},
        "block": {"img_sel": ".tr-caption-container img"},
    },
}

APNLIVE_BASE = "https://hindi.apnlive.com"

APNLIVE_RULES = {
    # apnlive.py: two-level tdb menu sliced [1:] — items WITH a sub-menu
    # yield only their children (py:33-48); entries come from the LAST
    # td_block_inner block only (py:55-56's find_all(...)[-1]) with the
    # title scraped off the list anchor's @title (py:59 — the article page
    # never carries one); /page/N pagination bounded by span.pages' total
    # AND gated on the last entry's isoT datetime (py:62-72); article pub
    # re-read off the page's own time@datetime (py:79-82).
    "rule": PAGE_PATH,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "date_style": "isoT",
    "page_time_style": "isoT",
    "extract": {
        "category": {"sel": "ul#menu-menu-1 > li", "skip": 1,
                     "link_sel": "a",
                     "children_sel": "ul.sub-menu > li > a",
                     "children_suppress_parent": True},
        "entry": {"scope": {"sel": "div.td_block_inner.tdb-block-inner"
                                   ".td-fix-index", "index": -1},
                  "sel": "div.td-module-meta-info",
                  "fields": {"href": {"sel": "h3 > a", "attr": "href"},
                             "title": {"sel": "h3 > a",
                                       "attr": "title"}}},
        "page_time": {"sel": "div.td-module-meta-info time", "index": -1,
                      "attr": "datetime"},
        # 'Page 1 of N' (py:59-61)
        "page_max": {"sel": "span.pages", "re": r"(\d+)$"},
        "pub": {"sel": "time.entry-date.updated.td-module-date",
                "attr": "datetime"},
        # featured anchor href (py:88-92); body falls back to the
        # td-ss-main-content paragraphs when td-fix-index has none
        # (py:95-101)
        "block": {"para_sel": "div.td-fix-index > p",
                  "para_sel_fallback": "div.td-ss-main-content p",
                  "img_sel": "div.td-post-featured-image a",
                  "img_attr": "href"},
    },
}

BALITA_BASE = "http://balita.net.ph"

BALITA_RULES = {
    # balita.py: one callback URL-dispatched on ^…/$ (menu) vs
    # ^…/category/ (list, py:30-38); entry-gated fuzzy .meta_date dates
    # with the span.current~a next link (py:39-50); article categories
    # from span.post_cat's first link split on '/' (py:55-61 — the
    # len==1 branch assigns the raw LIST, a reference bug this fixture
    # never exercises: every post_cat here carries two segments);
    # images always None (py:65); abstract = the page's FIRST <p>, body =
    # every <p> (py:66-69, joined with a literal backslash-n — a body-
    # string artifact the span model does not store).
    "rule": NEXT_LINK,
    "format": "html",
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "ul.sub-menu > li > a"},
        "entry": {"sel": "div.tablediv ~ div",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": ".meta_date"}}},
        "next": {"sel": "span.current ~ a", "attr": "href"},
        "title": {"sel": "h1.entry_title"},
        "pub": {"sel": "span.post_date"},
        "cat1": {"sel": "span.post_cat > a", "re": r"^([^/]+)/"},
        "cat2": {"sel": "span.post_cat > a", "re": r"^[^/]+/([^/]*)"},
        "block": {"para_sel": "p"},
    },
}

BALITA1_BASE = "https://balita.ph"

BALITA1_RULES = {
    # balita1.py: the 8 start_urls are category pages mined ONLY for their
    # pulldown-filter sub-links (py:35-41 — the seed page's own articles
    # are never parsed); each sub-list re-reads category1 off its own h1
    # and category2 off the pulldown display option (py:47-52); entries
    # ungated, pagination gated on the LAST fuzzy entry-date with the
    # page-nav's LAST link as next (py:55-63 — the reference's
    # current==last stop compares a string to a Tag and is never true,
    # so only the gate or a missing nav ends the chain, bug-faithful);
    # a missing article time falls back to '0000-00-00 00:00:00' through
    # format_time2 (py:70 — the fallback-now path here).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "li.td-pulldown-filter-item a"},
        "entry": {"sel": "h3.entry-title.td-module-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "cat1_self": {"sel": "#td-outer-wrap > div > div > div > div"
                             " > h1"},
        "cat2_self": {"sel": "div.td-pulldown-filter-display-option div"},
        "page_time": {"sel": ".entry-date.updated.td-module-date",
                      "index": -1},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "time.entry-date.updated.td-module-date"},
        # all content images + p body with first-p abstract (py:74-78;
        # the empty-first-p h4 fallback branch, py:79-82, is not
        # exercised: these fixtures always carry real paragraphs)
        "block": {"para_sel": "div.td-post-content p",
                  "img_sel": "div.td-post-content img"},
    },
}


def _build_aajka(g: _G) -> None:
    host, base = "aajka-samachar.in", "https://aajka-samachar.in"
    wid = 966
    g.registry[wid] = dict(AAJKA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div id="categories-6"><ul>'
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/videsh/">विदेश</a></li>'
           f"</ul></div></html>", host)
    for cslug in ("desh", "videsh"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-khabar-{p}-{e}/"
                rows.append(
                    f'<article><div class="jeg_meta_date">'
                    f'<a href="{aurl}">{_mdy_hm(dt)}</a></div></article>'
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="jeg_post_title">AJK {cslug} {p}-{e}'
                    f'</h1><div id="breadcrumbs">'
                    f'<span><a href="{base}/">होम</a></span>'
                    f'<span><a href="{base}/{cslug}/">{cslug.title()}'
                    f"</a></span>"
                    f'<span><a href="{base}/{cslug}/zila/">ज़िला</a></span>'
                    f'</div><div class="jeg_featured featured_image">'
                    f'<a href="{base}/img/{cslug}{p}{e}.jpg">'
                    f'<img src="{base}/th/{cslug}{p}{e}.jpg"></a></div>'
                    f'<div class="content-inner">'
                    f"<p>ajk पहला {cslug} {p}-{e}।</p><p>ajk दूसरा।</p>"
                    f"</div></html>",
                    host,
                )
            nxt = (f'<a class="page_nav next" '
                   f'href="{base}/{cslug}/page/{p + 1}/">अगला</a>')
            lurl = (f"{base}/{cslug}/" if p == 1
                    else f"{base}/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   f'<html><div class="jeg_inner_content">'
                   + "".join(rows) + f"</div>{nxt}</html>", host)


def _build_abscbn(g: _G) -> None:
    host, base = "news.abs-cbn.com", ABSCBN_BASE
    wid = 378
    g.registry[wid] = dict(ABSCBN_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><div class="search-container"></div><ul>'
           f'<li><a href="/">Home</a></li>'
           f'<li><a href="/news">News</a></li>'
           f'<li><a href="/entertainment">Entertainment</a></li>'
           f"</ul></html>", host)

    def art(path: str, tag: str, dt: datetime | None,
            n_embeds: int = 1) -> str:
        ts = ('<div class="timestamp-entry"><span class="date-posted">'
              f"{_mdy_hm(dt)}</span></div>" if dt is not None else "")
        embeds = "".join(
            f'<div class="embed-wrap"><img src="{base}/i/{tag}-{k}.jpg">'
            "</div>" for k in range(n_embeds)
        )
        return (f'<html><h1 class="news-title">ABS {tag}</h1>{ts}'
                f'<div class="article-content"><p>abs lead {tag}</p>'
                f"{embeds}<p>abs tail {tag}</p></div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        arts = "".join(
            f'<article><a href="{u}">t</a>'
            f'<span class="datetime">{_MON_FULL[dt.month - 1]} {dt.day},'
            f" {dt.hour:02d}:{dt.minute:02d}</span></article>"
            for u, dt in rows
        )
        nav = (f'<div class="easyPaginateNav">'
               f'<a title="Next" href="{nxt}">Next</a></div>' if nxt
               else "")
        return f'<html><div class="articles">{arts}</div>{nav}</html>'

    # /news: two-page chain, page-gated on the LAST .datetime; article
    # URLs carry date segments so the digit guard blanks category2
    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"/news/{dt.month:02d}/{dt.day:02d}/21/abs-{p}-{e}"
            # one article exercises the first-embed-only slice; another
            # the missing-byline fallback-now path (abs-cbn.py:46-50)
            g.page(base + aurl, "article",
                   art(aurl, f"n{p}{e}",
                       None if (p, e) == (1, 1) else dt,
                       n_embeds=2 if (p, e) == (1, 0) else 1),
                   host)
            rows.append((aurl, dt))
        nxt = f"/news/p{p + 1}"
        lurl = base + ("/news" if p == 1 else f"/news/p{p}")
        g.page(lurl, "list", lst(rows, nxt), host)
    # /entertainment: one page, two-segment article paths → category2
    dt = BASE_DT
    g.page(base + "/entertainment/life/abs-ent-0", "article",
           art("/entertainment/life/abs-ent-0", "ent0", dt), host)
    g.page(base + "/entertainment", "list",
           lst([("/entertainment/life/abs-ent-0", dt)], None), host)
    # the hardcoded tag list (abs-cbn.py:31)
    g.page(base + "/news/05/30/21/abs-tvp-0", "article",
           art("/news/05/30/21/abs-tvp-0", "tvp0", dt), host)
    g.page(base + "/list/tag/tv-patrol", "list",
           lst([("/news/05/30/21/abs-tvp-0", dt)], None), host)


def _build_agrasamachar(g: _G) -> None:
    host, base = "www.agrasamachar.com", AGRA_BASE
    wid = 1150
    g.registry[wid] = dict(AGRASAMACHAR_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    hin = ["मई"]  # fixture dates all sit in May

    def dstr(dt: datetime) -> str:
        return f"{dt.day} {hin[0]} {dt.year}"

    days = [(30, 29), (28, 25)]  # page 1 fresh, page 2's last stale
    for p, (d1, d2) in enumerate(days, 1):
        rows = []
        for e, day in enumerate((d1, d2)):
            dt = datetime(2021, 5, day)
            aurl = f"{base}/2021/05/agra-{p}-{e}.html"
            rows.append(
                f'<h3 class="post-title entry-title">'
                f'<a href="{aurl}">शीर्षक {p}-{e}</a></h3>'
                f'<h2 class="date-header"><span>{dstr(dt)}</span></h2>'
            )
            g.page(
                aurl, "article",
                f'<html><h3 class="post-title entry-title">आगरा {p}-{e}'
                f'</h3><h2 class="date-header"><span>{dstr(dt)}</span>'
                f'</h2><div class="post-body entry-content">'
                f'<div class="tr-caption-container">'
                f'<img src="{base}/i/{p}{e}.jpg"></div>'
                f"पहली पंक्ति {p}-{e}। दूसरी पंक्ति।</div></html>",
                host,
            )
        nxt = (f'<a class="blog-pager-older-link" '
               f'href="{base}/search?updated-max=p{p + 1}">पुराने</a>')
        lurl = (base + "/" if p == 1
                else f"{base}/search?updated-max=p{p}")
        g.page(lurl, "list",
               "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_apnlive(g: _G) -> None:
    host, base = "hindi.apnlive.com", APNLIVE_BASE
    wid = 1140
    g.registry[wid] = dict(APNLIVE_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-menu-1">'
           f'<li><a href="{base}/"><div class="tdb-menu-item-text">होम'
           f"</div></a></li>"
           f'<li><a href="{base}/state/"><div class="tdb-menu-item-text">'
           f'राज्य</div></a><ul class="sub-menu">'
           f'<li><a href="{base}/state/up/">'
           f'<div class="tdb-menu-item-text">यूपी</div></a></li>'
           f'<li><a href="{base}/state/bihar/">'
           f'<div class="tdb-menu-item-text">बिहार</div></a></li>'
           f"</ul></li>"
           f'<li><a href="{base}/national/">'
           f'<div class="tdb-menu-item-text">देश</div></a></li>'
           f"</ul></html>", host)

    def iso(dt: datetime) -> str:
        return dt.strftime("%Y-%m-%dT%H:%M:%S") + "+05:30"

    def art(tag: str, dt: datetime, fallback_body: bool = False) -> str:
        body = ('<div class="td-fix-index"></div>'
                f'<div class="td-ss-main-content"><p>apn fallback {tag}'
                "</p></div>" if fallback_body else
                f'<div class="td-fix-index"><p>apn पहला {tag}।</p>'
                f"<p>apn दूसरा।</p></div>")
        return (f'<html><time class="entry-date updated td-module-date" '
                f'datetime="{iso(dt)}">d</time>'
                f'<div class="td-post-featured-image">'
                f'<a href="{base}/f/{tag}.jpg"><img src="{base}/t/{tag}'
                f'.jpg"></a></div>{body}</html>')

    def lst(slug: str, p: int, rows: list[tuple[str, str, datetime]],
            total: int) -> str:
        block = "".join(
            f'<div class="td-module-meta-info"><h3>'
            f'<a href="{u}" title="{t}">x</a></h3>'
            f'<time datetime="{iso(dt)}">d</time></div>'
            for u, t, dt in rows
        )
        decoy = (f'<div class="td_block_inner tdb-block-inner '
                 f'td-fix-index"><div class="td-module-meta-info"><h3>'
                 f'<a href="{base}/decoy-{slug}-{p}/" title="DECOY">x'
                 f'</a></h3><time datetime="{iso(BASE_DT)}">d</time>'
                 f"</div></div>")
        return (f"<html>{decoy}"
                f'<div class="td_block_inner tdb-block-inner '
                f'td-fix-index">{block}</div>'
                f'<span class="pages">Page {p} of {total}</span></html>')

    # /state/up/: bound allows page 3 but page 2's last isoT is stale —
    # the GATE stops the chain (apnlive.py:62-70)
    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/up-khabar-{p}-{e}/"
            g.page(aurl, "article",
                   art(f"up{p}{e}", dt,
                       fallback_body=(p, e) == (1, 1)), host)
            rows.append((aurl, f"UP {p}-{e}", dt))
        lurl = f"{base}/state/up/" if p == 1 else f"{base}/state/up/page/{p}"
        g.page(lurl, "list", lst("up", p, rows, total=3), host)
    # /national/: every date fresh but 'Page 2 of 2' — the BOUND stops
    # the chain (apnlive.py:59-61)
    for p in (1, 2):
        rows = []
        for e in range(2):
            dt = BASE_DT - timedelta(hours=(p - 1) * 6 + e * 3)
            aurl = f"{base}/desh-khabar-{p}-{e}/"
            g.page(aurl, "article", art(f"ds{p}{e}", dt), host)
            rows.append((aurl, f"Desh {p}-{e}", dt))
        lurl = (f"{base}/national/" if p == 1
                else f"{base}/national/page/{p}")
        g.page(lurl, "list", lst("ds", p, rows, total=2), host)
    # /state/bihar/: single page, 'Page 1 of 1'
    dt = BASE_DT
    aurl = f"{base}/bihar-khabar-1-0/"
    g.page(aurl, "article", art("bh10", dt), host)
    g.page(f"{base}/state/bihar/", "list",
           lst("bh", 1, [(aurl, "Bihar 1-0", dt)], total=1), host)


def _build_balita(g: _G) -> None:
    host, base = "balita.net.ph", BALITA_BASE
    wid = 195
    g.registry[wid] = dict(BALITA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 2117})
    g.page(base + "/", "menu",
           f'<html><ul class="sub-menu">'
           f'<li><a href="{base}/category/news/">News</a></li>'
           f'<li><a href="{base}/category/sports/">Sports</a></li>'
           f"</ul></html>", host)
    cats = {"news": "Luzon/Metro Manila", "sports": "Palaro/Boxing"}
    for cslug, pcat in cats.items():
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-balita-{p}-{e}/"
                rows.append(
                    f'<div><a href="{aurl}">t</a>'
                    f'<span class="meta_date">{_mdy_hm(dt)}</span></div>'
                )
                g.page(
                    aurl, "article",
                    f'<html><h1 class="entry_title">BLT {cslug} {p}-{e}'
                    f'</h1><span class="post_date">{_mdy_hm(dt)}</span>'
                    f'<span class="post_cat"><a href="{base}/c/">{pcat}'
                    f"</a></span><p>blt una {cslug} {p}-{e}.</p>"
                    f"<p>blt pangalawa.</p></html>",
                    host,
                )
            nxt = (f'<span class="current">{p}</span>'
                   f'<a href="{base}/category/{cslug}/page/{p + 1}/">'
                   f"{p + 1}</a>")
            lurl = (f"{base}/category/{cslug}/" if p == 1
                    else f"{base}/category/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   f'<html><div class="tablediv">h</div>'
                   + "".join(rows) + nxt + "</html>", host)


def _build_balita1(g: _G) -> None:
    host, base = "balita.ph", BALITA1_BASE
    wid = 498
    g.registry[wid] = dict(BALITA1_RULES)
    top = ["news", "world", "economy", "entertainment", "sports",
           "lifestyle", "technology", "opinion"]
    for t in top:
        g.seeds.append({"url": f"{base}/category/{t}/", "website_id": wid,
                        "language_id": 1866})

    def lst(cat1: str, cat2: str, rows: list[tuple[str, datetime]],
            nxt: str | None, p: int) -> str:
        arts = "".join(
            f'<h3 class="entry-title td-module-title"><a href="{u}">t'
            f"</a></h3>"
            f'<time class="entry-date updated td-module-date">'
            f"{_mdy_hm(dt)}</time>"
            for u, dt in rows
        )
        nav = (f'<div class="page-nav td-pb-padding-side">'
               f'<span class="current">{p}</span>'
               f'<a href="{nxt}">{p + 1}</a>'
               f'<a class="last" href="{nxt}">{p + 1}</a></div>'
               if nxt else "")
        return (f'<html><div id="td-outer-wrap"><div><div><div><div>'
                f"<h1>{cat1}</h1></div></div></div></div></div>"
                f'<div class="td-pulldown-filter-display-option">'
                f"<div>{cat2}</div></div>{arts}{nav}</html>")

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="entry-title">B1 {tag}</h1>'
                f'<time class="entry-date updated td-module-date">'
                f"{_mdy_hm(dt)}</time>"
                f'<div class="td-post-content tagdiv-type">'
                f"<p>b1 una {tag}.</p>"
                f'<img src="{base}/i/{tag}.jpg"><p>b1 dalawa.</p>'
                f"</div></html>")

    # news: two sub-lists — national runs the two-page gated chain,
    # metro a single page; the other seven categories one sub-list each
    g.page(f"{base}/category/news/", "menu",
           f'<html><ul><li class="td-pulldown-filter-item">'
           f'<a href="{base}/category/news/national/">National</a></li>'
           f'<li class="td-pulldown-filter-item">'
           f'<a href="{base}/category/news/metro/">Metro</a></li>'
           f"</ul></html>", host)
    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/b1-national-{p}-{e}/"
            g.page(aurl, "article", art(f"nat{p}{e}", dt), host)
            rows.append((aurl, dt))
        nxt = f"{base}/category/news/national/page/{p + 1}/"
        lurl = (f"{base}/category/news/national/" if p == 1
                else f"{base}/category/news/national/page/{p}/")
        g.page(lurl, "list", lst("News", "National", rows, nxt, p), host)
    dt = BASE_DT
    aurl = f"{base}/b1-metro-1-0/"
    g.page(aurl, "article", art("met10", dt), host)
    g.page(f"{base}/category/news/metro/", "list",
           lst("News", "Metro", [(aurl, dt)], None, 1), host)
    for t in top[1:]:
        g.page(f"{base}/category/{t}/", "menu",
               f'<html><ul><li class="td-pulldown-filter-item">'
               f'<a href="{base}/category/{t}/top/">Top</a></li></ul>'
               f"</html>", host)
        aurl = f"{base}/b1-{t}-1-0/"
        g.page(aurl, "article", art(f"{t}10", dt), host)
        g.page(f"{base}/category/{t}/top/", "list",
               lst(t.title(), "Top", [(aurl, dt)], None, 1), host)


# ---------------------------------------------------------------------------
# tranche H — bhadas4media, bharatkhabar, bhopalsamachar, bicolstandard,
# businessmirror, cebudailynews
# ---------------------------------------------------------------------------

BHADAS_RULES = {
    # bhadas4media.py: entries = the grid's [:-1] links PLUS the
    # latest-100 widget (py:41-48); the grid's LAST link becomes a
    # dont_filter pagination probe carrying the scraped next URL — no
    # next link, no probe, and that member is dropped entirely
    # (py:53-58); the probe gates on the ARTICLE's own fuzzy date then
    # re-yields itself normally (py:60-71).
    "rule": NEXT_LINK,
    "format": "html",
    "probe_next_url": True,
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": ".collapse a.menu-item"},
        "entry": [{"sel": ".row .col-md-9 > a", "probe_last_member": True},
                  {"sel": ".widget_recent_entries li > a"}],
        "next": {"sel": ".wp-pagenavi a.nextpostslink", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "time.entry-date.published"},
        "block": {"para_sel": ".entry-content p",
                  "img_sel": ".entry-content .wp-block-image > figure"
                             " > img"},
    },
}

BHARAT_RULES = {
    # bharatkhabar.py: main_menu minus its LAST link (py:38 del
    # categories[-1]); ungated entries; pagination gated on the LAST
    # 'Posted On …' stamp through time_adjustment (py:55-60 — the
    # posted_on style); category1 re-read off the article breadcrumb's
    # last link (py:89); pages with no <p> store the h1 as abstract and
    # the LAST h2 as body (py:86-88); data:image/gif lazy stubs dropped
    # (py:71-74).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "posted_on",
    "page_time_style": "posted_on",
    "extract": {
        "category": {"sel": "ul#main_menu li a", "slice": [0, -1]},
        "entry": {"sel": "div.post_header_title h5 a"},
        "page_time": {"sel": "span.post_info_date", "index": -1},
        "next": {"sel": "a.prev_button", "attr": "href"},
        "title": {"sel": "div.post_header_title h1"},
        "pub": {"sel": "span.post_info_date"},
        "cat1": {"sel": "div.breadcrumb a", "index": -1},
        "abstract_fallback": {"sel": "div.post_header.single h1"},
        "body_fallback": {"sel": "div.post_header.single h2",
                          "index": -1},
        "block": {"para_sel": "div.post_header.single p",
                  "img_sel": "div.post_img.static img",
                  "img_skip_re": r"data:image/gif"},
    },
}

BHOPAL_RULES = {
    # bhopalsamachar.py: menu keeps only 'label' hrefs, their slug rides
    # down for the templated Blogger chain (py:31-35); the page gate (the
    # LAST .post-author~span isoT datetime) runs BEFORE the entry loop,
    # so a stale page stores nothing (py:44-49 — and a page missing the
    # span dies on NameError there: dropped here too); every entry is
    # stamped with the page's FIRST datetime + the single .post-snippet
    # (py:52-55, select_one on the soup, bug-faithful); pagination
    # re-formats the class-level api_url with the slug + the escaped
    # last datetime (py:62-64); the article reads only the justify-
    # styled blocks (py:73-76).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "page_gate_drops_entries": True,
    "menu_carry_slug": True,
    "date_style": "isoT",
    "page_time_style": "isoT",
    "next_value_tpl": "https://www.bhopalsamachar.com/search/label/"
                      "{slug}?updated-max={value}",
    "extract": {
        "category": {"sel": "#main-menu-nav a", "href_re": r".*label"},
        "entry": {"sel": ".blog-post.hentry.index-post",
                  "fields": {"href": {"sel": ".post-title > a",
                                      "attr": "href"},
                             "title": {"sel": ".post-title"},
                             "img": {"sel": "img", "attr": "src"}}},
        "page_time": {"sel": ".post-author ~ span", "index": -1,
                      "attr": "datetime"},
        "page_entry_time": {"sel": ".post-author ~ span", "index": 0,
                            "attr": "datetime"},
        "next_value": {"sel": ".post-author ~ span", "index": -1,
                       "attr": "datetime"},
        "page_abstract": {"sel": ".post-snippet"},
        "block": {"para_sel": '[style="text-align: justify;"]'},
    },
}

BICOL_RULES = {
    # bicolstandard.py: menu li links minus 'Advertise' (py:31-36); a
    # list page without .post-outer yields nothing (py:40); ungated
    # entries; pagination = meta url + '?updated-max=' + quote(the LAST
    # timeago's @title) + a meta page counter, gated on that element's
    # fuzzy TEXT (py:44-53); body = the content's dir=ltr blocks, whole
    # container text when none (py:66-71), abstract = the first line.
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "menu_carry_list_url": True,
    "next_value_tpl": "{base}?updated-max={value}&max-results=8"
                      "#PageNo={page}",
    "extract": {
        "category": {"sel": "#menu-main-nav > li", "link_sel": "a"},
        "excluded_labels": ["Advertise"],
        "require_marker": {"sel": ".post-outer"},
        "entry": {"sel": ".post-title.entry-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".published.timeago", "index": -1},
        "next_value": {"sel": ".published.timeago", "index": -1,
                       "attr": "title"},
        "title": {"sel": ".post-title.entry-title"},
        "pub": {"sel": ".published.timeago"},
        "body_fallback": {"sel": ".post-body.entry-content"},
        "block": {"para_sel": ".post-body.entry-content [dir=ltr]",
                  "img_sel": ".post-body.entry-content img"},
    },
}

BMIRROR_RULES = {
    # businessmirror.py: 9 category start_urls ARE lists; category1 is
    # each list page's own .tdb-title-text (py:38-39); category2 is
    # scraped PER ROW and collapsed to None when it repeats category1
    # (py:44-47); pagination gated on the last fuzzy module date with
    # the page-nav's LAST link (py:50-54); the article re-reads title +
    # date off its own page, prepends the featured caption to the body,
    # and keeps the featured img + every wp-block image (py:60-77 — a
    # missing featured block would crash the append there; these
    # fixtures always carry it).
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "entry_gate": False,
    "entry_cat2_from_list": True,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "cat1_self": {"sel": ".tdb-title-text"},
        "entry": {"sel": ".td-module-container.td-category-pos-above",
                  "fields": {"href": {"sel": ".entry-title"
                                             ".td-module-title a",
                                      "attr": "href"},
                             "cat2": {"sel": ".td-module-meta-info a"}}},
        "page_time": {"sel": ".entry-date.updated.td-module-date",
                      "index": -1},
        "next": {"sel": "div.page-nav.td-pb-padding-side a",
                 "index": -1, "attr": "href"},
        "title": {"sel": ".tdb-title-text"},
        "pub": {"sel": ".entry-date.updated.td-module-date"},
        "abstract": {"sel": "div.wpb_wrapper > div > div > p"},
        "block": {"para_sel": ["div.tdb-caption-text",
                               "div.wpb_wrapper > div > div > p"],
                  "img_sel": ["div.tdb-block-inner.td-fix-index img",
                              "div.wp-block-image img"]},
    },
}

CDN_BASE = "https://cebudailynews.inquirer.net"

CDN_RULES = {
    # cebudailynews.py: 8 category start_urls; category1 = the list
    # URL's /category/ segment (py:38); TWO list layouts — the landing
    # (#cdn-cat-list) advances through #list-readmore UNGATED while
    # paginated pages (#cdn-pages-left) gate on the last
    # span:nth-of-type(2) through the M/D/YYYY time_format (py:36-46;
    # the reference dispatches on page content, these fixtures put the
    # paginated layout under /page/ so the URL variant is equivalent);
    # 'life' articles render a different template, dispatched on
    # meta['category1'] (py:53,68 — the match_cat1 variant).
    "rule": NEXT_LINK,
    "format": "html",
    "seed_kind": "list",
    "entry_gate": False,
    "cat1_url_re": r"/category/([^/?#]+)",
    "article_pub_priority": "page",
    "title_priority": "page",
    "page_time_style": "mdy_slash",
    "extract": {
        "entry": {"sel": "#cdn-cat-list > div > a"},
        "next": {"sel": "#list-readmore > a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "#landing-headline > h1"},
        "pub": {"sel": "#m-pd2 > span", "index": -1},
        "block": {"para_sel": "#article-content > p",
                  "img_sel": "#article-content img"},
        "variants": [
            {"match": r"/page/",
             "entry": {"sel": "#cdn-pages-left div#pages-box > a"},
             "next": {"sel": "#pages-nav > a", "attr": "href"},
             "page_time": {"sel": "#cdn-pages-left div "
                                  "#postdate-byline > span:nth-of-type(2)",
                           "index": -1}},
            {"match_cat1": r"^life$",
             "title": {"sel": "#art-hgroup > h1"},
             "pub": {"sel": ".art-byline > span", "index": -1}},
        ],
    },
}


def _build_bhadas4media(g: _G) -> None:
    host, base = "bhadas4media.com", "http://bhadas4media.com"
    wid = 1061
    g.registry[wid] = dict(BHADAS_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div class="collapse">'
           f'<a class="menu-item" href="{base}/media/">मीडिया</a>'
           f'<a class="menu-item">ख़बर</a>'  # href-less: skipped (py:38-41)
           f'<a class="menu-item" href="{base}/blog/">ब्लॉग</a>'
           f"</div></html>", host)

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="entry-title">B4M {tag}</h1>'
                f'<time class="entry-date published">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time>"
                f'<div class="entry-content"><p>b4m पहला {tag}।</p>'
                f'<div class="wp-block-image"><figure>'
                f'<img src="{base}/i/{tag}.jpg"></figure></div>'
                f"<p>b4m दूसरा।</p></div></html>")

    def lst(slug: str, cols: list[str], latest: list[str],
            nxt: str | None) -> str:
        grid = "".join(f'<div class="col-md-9"><a href="{u}">t</a></div>'
                       for u in cols)
        rec = "".join(f'<li><a href="{u}">r</a></li>' for u in latest)
        nav = (f'<div class="wp-pagenavi">'
               f'<a class="nextpostslink" href="{nxt}">»</a></div>'
               if nxt else "")
        return (f'<html><div class="row">{grid}</div>'
                f'<div class="widget_recent_entries"><ul>{rec}</ul></div>'
                f"{nav}</html>")

    # media: two pages; page 1's probe is fresh (→ page 2), page 2's
    # probe is stale (→ no page 3, but the probe article itself stores)
    m = f"{base}/media"
    for aurl, age in ((f"{m}-a0/", 0.0), (f"{m}-a1/", 6.0),
                      (f"{m}-ap/", 12.0), (f"{m}-l0/", 3.0),
                      (f"{m}-b0/", 24.0), (f"{m}-bp/", 44.0)):
        g.page(aurl, "article",
               art(aurl.rsplit("-", 1)[-1].rstrip("/"),
                   BASE_DT - timedelta(hours=age)), host)
    g.page(f"{base}/media/", "list",
           lst("media", [f"{m}-a0/", f"{m}-a1/", f"{m}-ap/"],
               [f"{m}-l0/"], f"{base}/media/page/2/"), host)
    g.page(f"{base}/media/page/2/", "list",
           lst("media", [f"{m}-b0/", f"{m}-bp/"], [],
               f"{base}/media/page/3/"), host)
    # blog: single page, NO next link — the grid's last member is
    # neither probed nor stored (bhadas4media.py:53-58)
    b = f"{base}/blog"
    for aurl in (f"{b}-a0/", f"{b}-l0/"):
        g.page(aurl, "article",
               art(aurl.rsplit("-", 1)[-1].rstrip("/"), BASE_DT), host)
    g.page(f"{b}-dropped/", "article", art("dropped", BASE_DT), host)
    g.page(f"{base}/blog/", "list",
           lst("blog", [f"{b}-a0/", f"{b}-dropped/"], [f"{b}-l0/"],
               None), host)


def _bharat_date(dt: datetime) -> str:
    ampm = "am" if dt.hour < 12 else "pm"
    h12 = dt.hour % 12 or 12
    return (f"Posted On {_MON_FULL[dt.month - 1]} {dt.day}, {dt.year} at "
            f"{h12}:{dt.minute:02d} {ampm}")


def _build_bharatkhabar(g: _G) -> None:
    host, base = "www.bharatkhabar.com", "http://www.bharatkhabar.com"
    wid = 1011
    g.registry[wid] = dict(BHARAT_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="main_menu">'
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/duniya/">दुनिया</a></li>'
           f'<li><a href="{base}/epaper/">ई-पेपर</a></li>'  # del [-1]
           f"</ul></html>", host)

    def art(c: str, tag: str, dt: datetime, no_p: bool = False) -> str:
        body = (f'<div class="post_header single"><h1>bk fb-abs {tag}'
                f"</h1><h2>bk skipped</h2><h2>bk fb-body {tag}</h2></div>"
                if no_p else
                f'<div class="post_header single"><h1>unused</h1>'
                f"<p>bk पहला {tag}।</p><p>bk दूसरा।</p></div>")
        return (f'<html><div class="post_header_title"><h1>BK {tag}</h1>'
                f"</div>"
                f'<span class="post_info_date">{_bharat_date(dt)}</span>'
                f'<div class="post_img static">'
                f'<img src="data:image/gif;base64,x">'
                f'<img src="{base}/i/{tag}.jpg"></div>'
                f"{body}"
                f'<div class="breadcrumb"><a href="{base}/">होम</a>'
                f'<a href="{base}/{c}/">{c.title()}</a></div></html>')

    for cslug in ("desh", "duniya"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/{cslug}-khabar-{p}-{e}/"
                rows.append(
                    f'<div class="post_header_title"><h5>'
                    f'<a href="{aurl}">t</a></h5></div>'
                    f'<span class="post_info_date">{_bharat_date(dt)}'
                    f"</span>"
                )
                g.page(aurl, "article",
                       art(cslug, f"{cslug[0]}{p}{e}", dt,
                           no_p=(cslug, p, e) == ("desh", 1, 1)), host)
            nxt = (f'<a class="prev_button" '
                   f'href="{base}/{cslug}/page/{p + 1}/">पुराने</a>')
            lurl = (f"{base}/{cslug}/" if p == 1
                    else f"{base}/{cslug}/page/{p}/")
            g.page(lurl, "list",
                   "<html>" + "".join(rows) + nxt + "</html>", host)


def _build_bhopalsamachar(g: _G) -> None:
    host, base = "www.bhopalsamachar.com", "https://www.bhopalsamachar.com"
    wid = 1054
    g.registry[wid] = dict(BHOPAL_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div id="main-menu-nav">'
           f'<a href="{base}/search/label/bhopal">भोपाल</a>'
           f'<a href="{base}/p/about.html">About</a>'  # no 'label': skipped
           f'<a href="{base}/search/label/vidisha">विदिशा</a>'
           f"</div></html>", host)

    def iso(dt: datetime) -> str:
        return dt.strftime("%Y-%m-%dT%H:%M:%S") + "+05:30"

    def art(tag: str) -> str:
        return (f'<html><div style="text-align: justify;">bs न्याय {tag}।'
                f'</div><div>bs ignored</div>'
                f'<div style="text-align: justify;">bs दूसरा।</div></html>')

    def lst(slug: str, rows: list[tuple[str, datetime]]) -> str:
        posts = "".join(
            f'<div class="blog-post hentry index-post">'
            f'<img src="{base}/th/{u.rsplit("/", 1)[-1]}.jpg">'
            f'<h3 class="post-title"><a href="{u}">शीर्षक {u[-8:]}</a>'
            f"</h3></div>"
            for u, _dt in rows
        )
        spans = "".join(
            f'<span class="post-author">A</span>'
            f'<span datetime="{iso(dt)}">d</span>'
            for _u, dt in rows
        )
        return (f"<html>{posts}{spans}"
                f'<div class="post-snippet">bs सार {slug}</div></html>')

    for slug in ("bhopal", "vidisha"):
        for p, ages in enumerate([(0.0, 12.0), (40.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{base}/2021/05/{slug}-{p}-{e}.html"
                g.page(aurl, "article", art(f"{slug}{p}{e}"), host)
                rows.append((aurl, dt))
            if p == 1:
                lurl = f"{base}/search/label/{slug}"
            else:
                from urllib.parse import quote as _q
                prev_last = BASE_DT - timedelta(hours=12.0)
                lurl = (f"{base}/search/label/{slug}?updated-max="
                        f"{_q(iso(prev_last))}")
            g.page(lurl, "list", lst(slug, rows), host)


def _build_bicolstandard(g: _G) -> None:
    host, base = "www.bicolstandard.com", "http://www.bicolstandard.com"
    wid = 491
    g.registry[wid] = dict(BICOL_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-main-nav">'
           f'<li><a href="{base}/news/">News</a></li>'
           f'<li><a href="{base}/ads/">Advertise</a></li>'
           f'<li><a href="{base}/empty/">Opinion</a></li>'
           f"</ul></html>", host)

    def iso8(dt: datetime) -> str:
        return dt.strftime("%Y-%m-%dT%H:%M:%S") + "+08:00"

    def art(tag: str, dt: datetime, ltr: bool = True) -> str:
        body = (f'<div dir="ltr">bcs first {tag}.</div>'
                f'<div dir="ltr">bcs second.</div>' if ltr
                else "bcs fallback body text")
        return (f'<html><h3 class="post-title entry-title">BCS {tag}'
                f"</h3>"
                f'<span class="published timeago" title="{iso8(dt)}">'
                f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span>"
                f'<div class="post-body entry-content">{body}'
                f'<img src="{base}/i/{tag}.jpg"></div></html>')

    def lst(rows: list[tuple[str, datetime]]) -> str:
        posts = "".join(
            f'<div class="post-outer">'
            f'<h3 class="post-title entry-title"><a href="{u}">t</a>'
            f"</h3>"
            f'<span class="published timeago" title="{iso8(dt)}">'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span></div>"
            for u, dt in rows
        )
        return f"<html>{posts}</html>"

    # news: page 1 fresh → templated updated-max page (PageNo=2); its
    # last timeago is stale → no third page
    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/2021/05/news-{p}-{e}.html"
            g.page(aurl, "article",
                   art(f"n{p}{e}", dt, ltr=(p, e) != (1, 1)), host)
            rows.append((aurl, dt))
        if p == 1:
            lurl = f"{base}/news/"
        else:
            from urllib.parse import quote as _q
            prev = iso8(BASE_DT - timedelta(hours=12.0))
            lurl = (f"{base}/news/?updated-max={_q(prev)}"
                    f"&max-results=8#PageNo=2")
        g.page(lurl, "list", lst(rows), host)
    # Opinion: a page WITHOUT .post-outer yields nothing (py:40)
    g.page(f"{base}/empty/", "list", "<html><div>no posts</div></html>",
           host)


def _build_businessmirror(g: _G) -> None:
    host = "businessmirror.com.ph"
    base = "https://businessmirror.com.ph"
    wid = 188
    g.registry[wid] = dict(BMIRROR_RULES)
    cats = ["news", "business", "sports", "opinion", "life", "features",
            "bmplus", "covid-19", "the-broader-look"]
    for c in cats:
        g.seeds.append({"url": f"{base}/category/{c}/", "website_id": wid,
                        "language_id": 1866})

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="tdb-title-text">BM {tag}</h1>'
                f'<time class="entry-date updated td-module-date">'
                f"{_mdy_hm(dt)}</time>"
                f'<div class="tdb-block-inner td-fix-index">'
                f'<img src="{base}/f/{tag}.jpg"></div>'
                f'<div class="tdb-caption-text">BM caption {tag}</div>'
                f'<div class="wpb_wrapper"><div><div>'
                f"<p>bm lead {tag}.</p><p>bm tail.</p></div></div></div>"
                f'<div class="wp-block-image"><img src="{base}/b/{tag}'
                f'.jpg"></div></html>')

    def lst(cat1: str, rows: list[tuple[str, str, datetime]],
            nxt: str | None, p: int) -> str:
        mods = "".join(
            f'<div class="td-module-container td-category-pos-above">'
            f'<div class="td-module-meta-info">'
            f'<a href="{base}/category/x/">{c2}</a></div>'
            f'<h3 class="entry-title td-module-title"><a href="{u}">t'
            f"</a></h3>"
            f'<time class="entry-date updated td-module-date">'
            f"{_mdy_hm(dt)}</time></div>"
            for u, c2, dt in rows
        )
        nav = (f'<div class="page-nav td-pb-padding-side">'
               f'<a href="{nxt}">2</a><a class="last" href="{nxt}">'
               f"Last</a></div>" if nxt else "")
        return (f'<html><h1 class="tdb-title-text">{cat1}</h1>'
                f"{mods}{nav}</html>")

    # News: two pages; one row's category2 repeats category1 → None
    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/2021/05/30/news-{p}-{e}/"
            g.page(aurl, "article", art(f"n{p}{e}", dt), host)
            rows.append((aurl, "News" if e == 0 else "Economy", dt))
        nxt = f"{base}/category/news/page/{p + 1}/"
        lurl = (f"{base}/category/news/" if p == 1
                else f"{base}/category/news/page/{p}/")
        g.page(lurl, "list", lst("News", rows, nxt, p), host)
    # the other eight categories: single page each, no nav
    for c in cats[1:]:
        dt = BASE_DT
        aurl = f"{base}/2021/05/30/{c}-1-0/"
        g.page(aurl, "article", art(f"{c}10", dt), host)
        g.page(f"{base}/category/{c}/", "list",
               lst(c.title(), [(aurl, "Sub" + c.title(), dt)], None, 1),
               host)


def _build_cebudailynews(g: _G) -> None:
    host, base = "cebudailynews.inquirer.net", CDN_BASE
    wid = 446
    g.registry[wid] = dict(CDN_RULES)
    cats = ["breaking", "enterprise", "nation", "world", "opinion",
            "sports", "life", "siloy"]
    for c in cats:
        g.seeds.append({"url": f"{base}/category/{c}", "website_id": wid,
                        "language_id": 1866})

    def mdy(dt: datetime) -> str:
        return f"{dt.month}/{dt.day}/{dt.year}"

    def art(tag: str, dt: datetime, life: bool = False) -> str:
        if life:
            head = (f'<div id="art-hgroup"><h1>CDN {tag}</h1></div>'
                    f'<div class="art-byline"><span>By X</span>'
                    f"<span>{_mdy_hm(dt)}</span></div>")
        else:
            head = (f'<div id="landing-headline"><h1>CDN {tag}</h1>'
                    f"</div>"
                    f'<div id="m-pd2"><span>By X</span>'
                    f"<span>{_mdy_hm(dt)}</span></div>")
        return (f"<html>{head}"
                f'<div id="article-content"><p>cdn lead {tag}.</p>'
                f'<img src="{base}/i/{tag}.jpg"><p>cdn tail.</p></div>'
                f"</html>")

    def landing(rows: list[str], more: str | None) -> str:
        arts = "".join(f'<div><a href="{u}">t</a></div>' for u in rows)
        rm = (f'<div id="list-readmore"><a href="{more}">More</a></div>'
              if more else "")
        return f'<html><div id="cdn-cat-list">{arts}</div>{rm}</html>'

    def paged(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        arts = "".join(
            f'<div id="pages-box"><a href="{u}">t</a></div>'
            f'<div><div id="postdate-byline"><span>By X</span>'
            f"<span>{mdy(dt)}</span></div></div>"
            for u, dt in rows
        )
        nav = (f'<div id="pages-nav"><a href="{nxt}">Next</a></div>'
               if nxt else "")
        return (f'<html><div id="cdn-pages-left">{arts}{nav}</div>'
                f"</html>")

    # breaking: landing (ungated readmore) → /page/2 (gated, stale →
    # no /page/3)
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        g.page(f"{base}/40{e}/brk-1-{e}", "article",
               art(f"brk1{e}", dt), host)
    g.page(f"{base}/category/breaking", "list",
           landing([f"{base}/400/brk-1-0", f"{base}/401/brk-1-1"],
                   f"{base}/category/breaking/page/2"), host)
    rows2 = []
    for e, age in enumerate((24.0, 44.0)):
        dt = BASE_DT - timedelta(hours=age)
        g.page(f"{base}/41{e}/brk-2-{e}", "article",
               art(f"brk2{e}", dt), host)
        rows2.append((f"{base}/41{e}/brk-2-{e}", dt))
    g.page(f"{base}/category/breaking/page/2", "list",
           paged(rows2, f"{base}/category/breaking/page/3"), host)
    # life: its articles use the art-hgroup template (match_cat1)
    g.page(f"{base}/420/life-1-0", "article",
           art("lif10", BASE_DT, life=True), host)
    g.page(f"{base}/category/life", "list",
           landing([f"{base}/420/life-1-0"], None), host)
    # the remaining six: single landing, no readmore
    for i, c in enumerate(c for c in cats if c not in
                          ("breaking", "life")):
        aurl = f"{base}/43{i}/{c}-1-0"
        g.page(aurl, "article", art(f"{c}10", BASE_DT), host)
        g.page(f"{base}/category/{c}", "list", landing([aurl], None),
               host)


# ---------------------------------------------------------------------------
# tranche I — dainiknavajyoti, dekhobhopal, devbhoomimedia,
# diariutimorpost, dunvalleymail, emsindia, emstv
# ---------------------------------------------------------------------------

DNJ_NET = "https://www.dainiknavajyoti.net"

DNJ_RULES = {
    # dainiknavajyoti.py: topbar menu pruned by a SEQUENTIAL del cascade
    # (py:37) with every href re-homed onto the .net domain (py:39);
    # one hardcoded editorial URL skipped in the entry loop (py:46-49);
    # pagination decided by SIDE-FETCHING the last entry's article (raw
    # requests.get, py:66-69) and reading its div.pubdate through the
    # 'Weekday, Month D, YYYY HH:MM' adjuster; the next link is the
    # pagination li whose text is 'Next»' (py:71-74); article images are
    # prefix-homed (py:81-84), category1 is a style-keyed div (py:93).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "wdmy_hm_dnj",
    "entry_gate_style": "wdmy_hm_dnj",
    "page_gate_fetch_last": {"sel": "div.pubdate"},
    "page_gate_fetch_index": -1,
    "extract": {
        "category": {"sel": "ul#topbar li a",
                     "drop_seq": [0, -1, -3, -1],
                     "href_prefix": DNJ_NET},
        "entry": {"sel": "div.section_news h3 a",
                  "exclude_hrefs": [DNJ_NET + "/editorial/Know-what-is-"
                                    "special-in-the-government.html"]},
        "next": r'<li><a href="([^"]+)">Next»</a></li>',
        "title": {"sel": "div.col-xs-12.col-md-8 div h3"},
        "pub": {"sel": "div.pubdate"},
        "cat1": {"sel": '[style="font-size:28px;padding-bottom:0px;"]'},
        "block": {"para_sel": "div#contentsec p",
                  "img_sel": "img.adjimage1",
                  "img_prefix": DNJ_NET + "/"},
    },
}

DEKHO_RULES = {
    # dekhobhopal.py: menu links [2:] (py:38); TWO entry groups (the
    # big-grid thumbs then the span6 blocks, py:50-55); NO pagination at
    # all — the gate only decides whether THIS page's entries are
    # yielded: the last visible td-post-date when present, else a
    # side-fetch of the last entry's article header date (py:57-66);
    # 'DDth Month YYYY' dates with the ordinal sliced off (py:104-121).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "page_gate_drops_entries": True,
    "page_gate_fetch_fallback": {"sel": "header.td-post-title "
                                        "span.td-post-date"},
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "dmy_ord",
    "page_time_style": "dmy_ord",
    "extract": {
        "category": {"sel": "ul#menu-td-demo-header-menu-1 li a",
                     "skip": 2},
        "entry": [{"sel": "div.td-big-grid-wrapper div.td-module-thumb a"},
                  {"sel": "div.td-block-span6 h3 a"}],
        "page_time": {"sel": "div.td-ss-main-content span.td-post-date",
                      "index": -1},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "header.td-post-title span.td-post-date"},
        "cat1": {"sel": "ul.td-category li"},
        "block": {"para_sel": "div.td-post-content.tagdiv-type p",
                  "img_sel": "div.td-post-featured-image img"},
    },
}

DEVB_RULES = {
    # devbhoomimedia.py: menu keeps ONLY one-segment /category/X/ hrefs
    # (py:52-56 — the two-segment regex skips subcategories); ungated
    # entries; pagination = the page-nav's .page link, gated on the last
    # span6 time@datetime isoT (py:66-76); article categories from
    # breadcrumb positions [1]/[2] (py:82-84), abstract from the content
    # h3 spans and body from its h5 spans (py:93-103).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "isoT",
    "page_time_style": "isoT",
    "extract": {
        "category": {"sel": "#menu-main-menu-1 li a",
                     "href_re": r"https://www\.devbhoomimedia\.com/"
                                r"category/[^/]+/$"},
        "entry": {"sel": ".td-ss-main-content .td-block-row h3 a"},
        "next": {"sel": ".page-nav.td-pb-padding-side .page",
                 "attr": "href"},
        "page_time": {"sel": ".td-block-row .td-block-span6 "
                             "span.td-post-date time",
                      "index": -1, "attr": "datetime"},
        "title": {"sel": ".td-post-header header h1"},
        "pub": {"sel": ".td-post-header .td-post-date time",
                "attr": "datetime"},
        "cat1": {"sel": ".td-crumb-container div span a", "index": 1},
        "cat2": {"sel": ".td-crumb-container div span a", "index": 2},
        # the reference '\n'-joins ALL h3 spans (py:93-98); these
        # fixtures carry one, so the first-match scalar is equivalent
        "abstract": {"sel": ".td-post-content.tagdiv-type h3 span"},
        "block": {"para_sel": ".td-post-content.tagdiv-type h5 span",
                  "img_sel": ".td-post-featured-image a img"},
    },
}

TIMORPOST_RULES = {
    # diariutimorpost.py: menu minus its first link (py:36); NO
    # pagination; the page gate (last post--info li, fuzzy) must pass
    # before ANY entry is yielded (py:49-58); category1 is regexed out
    # of the list page's own 'Category: X' header (py:51-53); article
    # body is the h4,p union in document order (py:71-77).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "page_gate_drops_entries": True,
    "article_pub_priority": "page",
    "title_priority": "page",
    "extract": {
        "category": {"sel": "div#headerNav ul#menu-main-menu li a",
                     "skip": 1},
        "entry": {"sel": "div.title h3.h4 a"},
        "cat1_self": {"sel": "div.post--items-title h2.h4",
                      "re": r"Category: (\S+)"},
        "page_time": {"sel": "div.post--info ul li", "index": -1},
        "title": {"sel": "div.title h2.titlePostDetail"},
        "pub": {"sel": ".post--info li span", "index": 0},
        "block": {"para_sel": ["div.post--content h4",
                               "div.post--content p"],
                  "img_sel": "div.post--img a img"},
    },
}

DUNVALLEY_RULES = {
    # dunvalleymail.py: menu = one pinned li + every mega-menu child +
    # another pinned li (py:35-44); list pages read BOTH categories off
    # their own breadcrumb, branching on how many <i> separators the
    # trail shows — one-level pages store a literal ' ' as category2
    # (py:49-51); two entry groups (big grid + the main-content module
    # titles under a select_one scope, py:52-59); gate = the last span6
    # time, fuzzy (a page without span6 blocks gates on 'January 1,
    # 1970' — always stale, so it never paginates, py:60-62: the missing
    # page_time here stops the chain the same way); next = the page-nav's
    # LAST link only while it still wraps an <i> chevron (py:63-66);
    # article abstract = the body's first danda segment (py:88).
    # The reference threads ONE shared DemoItem object through meta, so
    # its categories are scheduling-order-dependent; here each entry
    # carries its own list page's breadcrumb lineage (the intended
    # semantics, noted as a deliberate divergence).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "abstract_split": {"sep": "।"},
    "extract": {
        "category": [{"sel": "li.menu-item-1078 > a"},
                     {"sel": "div.block-mega-child-cats a"},
                     {"sel": "li.menu-item-1619 > a"}],
        "cat1_self": {"if_count": {"sel": "div.entry-crumbs i", "eq": 1},
                      "then": {"sel": "div.entry-crumbs "
                                      "span.td-bred-no-url-last"},
                      "else": {"sel": "div.entry-crumbs span",
                               "index": -2}},
        "cat2_self": {"if_count": {"sel": "div.entry-crumbs i", "eq": 1},
                      "then": {"const": " "},
                      "else": {"sel": "div.entry-crumbs "
                                      "span.td-bred-no-url-last"}},
        "entry": [{"sel": "div.td-big-grid-wrapper h3",
                   "fields": {"href": {"sel": "a", "attr": "href"}}},
                  {"scope": {"sel": ".td-pb-span8.td-main-content > div",
                             "index": 0},
                   "sel": "h3.entry-title.td-module-title",
                   "fields": {"href": {"sel": "a", "attr": "href"}}}],
        "page_time": {"sel": "div.td-block-span6 time", "index": -1},
        "next": {"sel": "div.page-nav.td-pb-padding-side a",
                 "index": -1, "attr": "href", "require_child": "i"},
        "title": {"sel": "header.td-post-title h1"},
        "pub": {"sel": "header.td-post-title time"},
        "block": {"para_sel": "div.td-post-content p",
                  "para_sel_fallback": "div.td-post-content div",
                  "img_sel": "div.td-post-featured-image a img"},
    },
}

EMSINDIA_RULES = {
    # emsindia.py: start_requests side-fetches the home page and mines
    # .dropdown>a[:8] as category seeds (py:30-34 — modeled as the seed
    # menu fetch, the shangbao convention); each list yields the LAST
    # .inner block's link back into parse itself (py:37-39 — the
    # featured article is re-parsed as a LIST and stores nothing,
    # bug-faithful) plus the .borderT grid minus its last member with
    # each row's own lead image (py:40-42); NO pagination and no list
    # gate — the ARTICLE gates itself on the d/m/Y stamp in its
    # style-keyed header and drops silently when stale (py:47-50);
    # abstract = the single h2 body's text before the first '|'
    # (py:58-59). The reference's category2 is a literal '' (py:31);
    # stored as NULL here like every other port.
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_drop_old": True,
    "date_style": "dmy_slash",
    "title_priority": "page",
    "abstract_split": {"sep": "|"},
    "extract": {
        "category": {"sel": ".dropdown > a", "slice": [0, 8]},
        "entry": [{"scope": {"sel": "div.inner", "index": -1},
                   "sel": "a", "kind": "list"},
                  {"sel": ".borderT", "slice": [0, -1],
                   "fields": {"href": {"sel": "a", "attr": "href"},
                              "img": {"sel": "a img", "attr": "src"}}}],
        "title": {"sel": ".inner > h2", "index": 0},
        "pub": {"sel": '[style="font-size: 16px; font-weight:normal;"]'},
        "body_fallback": {"sel": ".inner > h2", "index": 2},
        "block": {"para_sel": ".inner > p"},
    },
}

EMSTV_RULES = {
    # emstv.py: ./-relative menu and entry links re-homed onto the site
    # root (py:40,49 — urljoin lands on the same URL); TWO entry groups
    # (.col-md-8 h5>a , .read-more — py:46's comma select); NO time gate
    # anywhere: every article is stored regardless of the cutoff; body =
    # the LAST #ccr-article paragraph only (py:65), abstract hardcoded
    # '' (py:63 — the const rule), images always [] (py:68), d/m/Y time
    # tag (py:70-73).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "article_pub_priority": "page",
    "title_priority": "page",
    "date_style": "dmy_slash",
    "extract": {
        "category": {"sel": ".nav > li > a"},
        "entry": [{"sel": ".col-md-8 h5 > a"}, {"sel": ".read-more"}],
        "title": {"sel": "#ccr-article > h1 > a"},
        "pub": {"sel": "time"},
        "abstract": {"const": ""},
        "body_fallback": {"sel": "#ccr-article p", "index": -1},
        "block": {},
    },
}


def _build_dainiknavajyoti(g: _G) -> None:
    host = "www.dainiknavajyoti.net"
    wid = 1002
    g.registry[wid] = dict(DNJ_RULES)
    g.seeds.append({"url": "http://www.dainiknavajyoti.com/",
                    "website_id": wid, "language_id": 1930})
    # topbar: del 0, -1, -3, -1 over 8 links keeps indices 1,2,3,5
    links = ["/home", "/rajasthan", "/editorial", "/desh", "/kept-x",
             "/videsh", "/dropped-y", "/epaper"]
    g.page("http://www.dainiknavajyoti.com/", "menu",
           "<html><ul id=\"topbar\">" + "".join(
               f'<li><a href="{u}">L{i}</a></li>'
               for i, u in enumerate(links)) + "</ul></html>",
           "www.dainiknavajyoti.com")

    def dnj(dt: datetime) -> str:
        return (f"Wednesday, {_MON_FULL[dt.month - 1]} {dt.day}, "
                f"{dt.year} {dt.hour:02d}:{dt.minute:02d}")

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="col-xs-12 col-md-8"><div><h3>DNJ '
                f"{tag}</h3></div></div>"
                f'<div class="pubdate">{dnj(dt)}</div>'
                f'<div style="font-size:28px;padding-bottom:0px;">'
                f"राजस्थान</div>"
                f'<img class="adjimage1" src="images/{tag}.jpg">'
                f'<div id="contentsec"><p>dnj पहला {tag}।</p>'
                f"<p>dnj दूसरा।</p></div></html>")

    skip_url = (DNJ_NET + "/editorial/Know-what-is-special-in-the-"
                "government.html")
    g.page(skip_url, "article", art("skipped", BASE_DT), host)
    for cslug in ("rajasthan", "editorial", "desh", "videsh"):
        for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
            rows = []
            for e, age in enumerate(ages):
                dt = BASE_DT - timedelta(hours=age)
                aurl = f"{DNJ_NET}/{cslug}/story-{p}-{e}.html"
                g.page(aurl, "article", art(f"{cslug[0]}{p}{e}", dt),
                       host)
                rows.append(aurl)
            if cslug == "editorial" and p == 1:
                # the carved-out URL appears mid-list and is skipped
                rows.insert(1, skip_url)
            arts = "".join(
                f'<div class="section_news"><h3><a href="{u}">t</a>'
                "</h3></div>" for u in rows
            )
            nxt = (f'<ul id="pagination"><li><a href="{DNJ_NET}/'
                   f'{cslug}?page={p + 1}">Next»</a></li>'
                   f"<li><a href=\"{DNJ_NET}/{cslug}?page=0\">«Prev</a>"
                   f"</li></ul>")
            lurl = (f"{DNJ_NET}/{cslug}" if p == 1
                    else f"{DNJ_NET}/{cslug}?page={p}")
            g.page(lurl, "list", f"<html>{arts}{nxt}</html>", host)


def _build_dekhobhopal(g: _G) -> None:
    host, base = "dekhobhopal.com", "http://dekhobhopal.com"
    wid = 1003
    g.registry[wid] = dict(DEKHO_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-td-demo-header-menu-1">'
           f'<li><a href="{base}/">Home</a></li>'
           f'<li><a href="{base}/video/">Video</a></li>'
           f'<li><a href="{base}/bhopal/">भोपाल</a></li>'
           f'<li><a href="{base}/mp/">मप्र</a></li>'
           f'<li><a href="{base}/stale/">पुराना</a></li>'
           f"</ul></html>", host)

    def ord_date(dt: datetime) -> str:
        return f"{dt.day}th {_MON_FULL[dt.month - 1]} {dt.year}"

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><header class="td-post-title">'
                f'<h1 class="entry-title">DKB {tag}</h1>'
                f'<span class="td-post-date">{ord_date(dt)}</span>'
                f"</header>"
                f'<ul class="td-category"><li>भोपाल समाचार</li></ul>'
                f'<div class="td-post-featured-image">'
                f'<img src="{base}/f/{tag}.jpg"></div>'
                f'<div class="td-post-content tagdiv-type">'
                f"<p>dkb पहला {tag}।</p><p>dkb दूसरा।</p></div></html>")

    def lst(slug: str, rows: list[str], dates: list[datetime] | None) \
            -> str:
        grid = (f'<div class="td-big-grid-wrapper">'
                f'<div class="td-module-thumb"><a href="{rows[0]}">t</a>'
                f"</div></div>")
        span6 = "".join(
            f'<div class="td-block-span6"><h3><a href="{u}">t</a></h3>'
            "</div>" for u in rows[1:]
        )
        vis = ("".join(
            f'<div class="td-ss-main-content-x"></div>') if dates is None
            else "".join(
                f'<div class="td-ss-main-content">'
                f'<span class="td-post-date">{ord_date(d)}</span></div>'
                for d in dates))
        return f"<html>{grid}{span6}{vis}</html>"

    # bhopal: visible dates, fresh → entries stored
    arts = []
    for e in range(3):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/bhopal-khabar-{e}/"
        g.page(aurl, "article", art(f"bh{e}", dt), host)
        arts.append(aurl)
    g.page(f"{base}/bhopal/", "list",
           lst("bhopal", arts, [BASE_DT, BASE_DT - timedelta(hours=12)]),
           host)
    # mp: NO visible dates → side-fetch gate on the last entry (fresh)
    arts = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/mp-khabar-{e}/"
        g.page(aurl, "article", art(f"mp{e}", dt), host)
        arts.append(aurl)
    g.page(f"{base}/mp/", "list", lst("mp", arts, None), host)
    # stale: visible dates all old → page dropped entirely
    aurl = f"{base}/stale-khabar-0/"
    g.page(aurl, "article",
           art("st0", BASE_DT - timedelta(hours=60)), host)
    g.page(f"{base}/stale/", "list",
           lst("stale", [aurl, aurl],
               [BASE_DT - timedelta(hours=60)]), host)


def _build_devbhoomimedia(g: _G) -> None:
    host = "www.devbhoomimedia.com"
    base = "https://www.devbhoomimedia.com"
    wid = 935
    g.registry[wid] = dict(DEVB_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div class="tdc-header-wrap"><div id="td-header-menu">'
           f'<ul id="menu-main-menu-1">'
           f'<li><a href="#">उत्तराखंड</a></li>'
           f'<li><a href="{base}/category/uttarakhand/">उत्तराखंड</a>'
           f"</li>"
           f'<li><a href="{base}/category/uttarakhand/dehradun/">देहरादून'
           f"</a></li>"
           f'<li><a href="{base}/category/desh/">देश</a></li>'
           f"</ul></div></div></html>", host)

    def iso(dt: datetime) -> str:
        return dt.strftime("%Y-%m-%dT%H:%M:%S") + "+05:30"

    def art(tag: str, dt: datetime, crumbs: int = 3) -> str:
        spans = ('<span a="1"><a href="#">Home</a></span>'
                 f'<span a="2"><a href="#">उत्तराखंड</a></span>')
        if crumbs > 2:
            spans += '<span a="3"><a href="#">देहरादून</a></span>'
        return (f'<html><div class="td-crumb-container"><div>{spans}'
                f"</div></div>"
                f'<div class="td-post-header"><header><h1>DBM {tag}</h1>'
                f'</header><span class="td-post-date">'
                f'<time datetime="{iso(dt)}">d</time></span></div>'
                f'<div class="td-post-featured-image">'
                f'<a href="#"><img src="{base}/f/{tag}.jpg"></a></div>'
                f'<div class="td-post-content tagdiv-type">'
                f"<h3><span>dbm सार {tag}</span></h3>"
                f"<h5><span>dbm पहला {tag}।</span></h5>"
                f"<h5><span>dbm दूसरा।</span></h5></div></html>")

    def lst(slug: str, rows: list[tuple[str, datetime]],
            nxt: str | None) -> str:
        mods = "".join(
            f'<div class="td-block-row"><div class="td-block-span6">'
            f'<h3><a href="{u}">t</a></h3>'
            f'<span class="td-post-date"><time datetime="{iso(dt)}">d'
            f"</time></span></div></div>"
            for u, dt in rows
        )
        nav = (f'<div class="page-nav td-pb-padding-side">'
               f'<a class="page" href="{nxt}">2</a></div>' if nxt else "")
        return (f'<html><div id="td-outer-wrap"><div class="td-container">'
                f'<div class="td-pb-span8 td-main-content">'
                f'<div class="td-ss-main-content">{mods}{nav}</div>'
                f"</div></div></div></html>")

    for p, ages in enumerate([(0.0, 12.0), (24.0, 44.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/uttarakhand-khabar-{p}-{e}/"
            g.page(aurl, "article",
                   art(f"uk{p}{e}", dt, crumbs=3 if e == 0 else 2), host)
            rows.append((aurl, dt))
        nxt = f"{base}/category/uttarakhand/page/{p + 1}/"
        lurl = (f"{base}/category/uttarakhand/" if p == 1
                else f"{base}/category/uttarakhand/page/{p}/")
        g.page(lurl, "list", lst("uk", rows, nxt), host)
    dt = BASE_DT
    aurl = f"{base}/desh-khabar-1-0/"
    g.page(aurl, "article", art("ds10", dt), host)
    g.page(f"{base}/category/desh/", "list", lst("ds", [(aurl, dt)], None),
           host)


def _build_diariutimorpost(g: _G) -> None:
    host, base = "diariutimorpost.com", "http://diariutimorpost.com"
    wid = 690
    g.registry[wid] = dict(TIMORPOST_RULES)
    g.seeds.append({"url": base + "/pt/", "website_id": wid,
                    "language_id": 2122})
    g.page(base + "/pt/", "menu",
           f'<html><div id="headerNav"><ul id="menu-main-menu">'
           f'<li><a href="{base}/pt/">Home</a></li>'
           f'<li><a href="{base}/pt/nacional/">Nacional</a></li>'
           f'<li><a href="{base}/pt/mundo/">Mundo</a></li>'
           f"</ul></div></html>", host)

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="title"><h2 class="titlePostDetail">'
                f"DTP {tag}</h2></div>"
                f'<div class="post--info"><ul><li><span>{_mdy_hm(dt)}'
                f"</span></li></ul></div>"
                f'<div class="post--img"><a href="#">'
                f'<img src="{base}/i/{tag}.jpg"></a></div>'
                f'<div class="post--content"><h4>dtp lede {tag}</h4>'
                f"<p>dtp primeiro.</p><p>dtp segundo.</p></div></html>")

    def lst(cat: str, rows: list[str], dates: list[datetime]) -> str:
        arts = "".join(
            f'<div class="title"><h3 class="h4"><a href="{u}">t</a>'
            "</h3></div>" for u in rows
        )
        info = "".join(f"<li>{_mdy_hm(d)}</li>" for d in dates)
        return (f'<html><div class="post--items-title">'
                f'<h2 class="h4">Category: {cat}</h2></div>'
                f"{arts}"
                f'<div class="post--info"><ul>{info}</ul></div></html>')

    # nacional: fresh gate → stored; mundo: stale last date → dropped
    arts = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/pt/nacional-noticia-{e}/"
        g.page(aurl, "article", art(f"na{e}", dt), host)
        arts.append(aurl)
    g.page(f"{base}/pt/nacional/", "list",
           lst("Nacional", arts,
               [BASE_DT, BASE_DT - timedelta(hours=12)]), host)
    aurl = f"{base}/pt/mundo-noticia-0/"
    g.page(aurl, "article", art("mu0", BASE_DT), host)
    g.page(f"{base}/pt/mundo/", "list",
           lst("Mundo", [aurl], [BASE_DT - timedelta(hours=60)]), host)


def _build_dunvalleymail(g: _G) -> None:
    host, base = "dunvalleymail.com", "http://dunvalleymail.com"
    wid = 1126
    g.registry[wid] = dict(DUNVALLEY_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-td-demo-header-menu-1">'
           f'<li class="menu-item menu-item-1078">'
           f'<a href="{base}/world/">World</a></li>'
           f'<li class="menu-item td-mega-menu">'
           f'<div class="block-mega-child-cats">'
           f'<a href="{base}/dehradun/">देहरादून</a>'
           f'<a href="{base}/uttarakhand/haridwar/">हरिद्वार</a></div>'
           f"</li>"
           f'<li class="menu-item menu-item-1619">'
           f'<a href="{base}/gadgets/">Gadgets</a></li>'
           f"</ul></html>", host)

    def art(tag: str, dt: datetime, fb: bool = False) -> str:
        body = ('<div class="td-post-content"><div>dvm पहला '
                f"{tag}। dvm दूसरा।</div></div>" if fb else
                f'<div class="td-post-content"><p>dvm पहला {tag}। '
                f"dvm दूसरा।</p><p>dvm तीसरा।</p></div>")
        return (f'<html><header class="td-post-title"><h1>DVM {tag}</h1>'
                f"<time>{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"
                f"</time></header>"
                f'<div class="td-post-featured-image">'
                f'<a href="#"><img src="{base}/f/{tag}.jpg"></a></div>'
                f"{body}</html>")

    def lst(crumb_levels: int, cat1: str, cat2: str | None,
            rows: list[tuple[str, datetime]], nxt: str | None,
            last_page: bool = False) -> str:
        if crumb_levels == 1:
            crumbs = ('<div class="entry-crumbs"><i>/</i>'
                      f'<span class="td-bred-no-url-last">{cat1}</span>'
                      "</div>")
        else:
            crumbs = ('<div class="entry-crumbs"><i>/</i><i>/</i>'
                      f"<span>होम</span><span>{cat1}</span>"
                      f'<span class="td-bred-no-url-last">{cat2}</span>'
                      "</div>")
        grid = (f'<div class="td-big-grid-wrapper"><h3>'
                f'<a href="{rows[0][0]}">t</a></h3></div>')
        mods = "".join(
            f'<h3 class="entry-title td-module-title"><a href="{u}">t'
            "</a></h3>" for u, _dt in rows[1:]
        )
        span6 = "".join(
            f'<div class="td-block-span6"><time>'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</time></div>"
            for _u, dt in rows
        )
        decoy = ('<h3 class="entry-title td-module-title">'
                 f'<a href="{base}/decoy/">x</a></h3>')
        nav = ""
        if nxt:
            nav = (f'<div class="page-nav td-pb-padding-side">'
                   f'<a href="{base}/p1/">1</a>'
                   + (f'<a href="{nxt}">next</a>' if last_page else
                      f'<a href="{nxt}"><i class="next-i"></i></a>')
                   + "</div>")
        return (f"<html>{crumbs}{grid}"
                f'<div id="td-outer-wrap"><div class="td-main-content-'
                f'wrap"><div><div><div class="td-pb-span8 '
                f'td-main-content"><div>{mods}</div>'
                f"<div>{decoy}</div></div></div></div></div></div>"
                f"{span6}{nav}</html>")

    # world: one-level crumbs (cat2 = ' '), two pages; page 2's last-a
    # has no <i> → chain ends there even though dates are fresh
    for p, ages in enumerate([(0.0, 12.0), (18.0, 24.0)], 1):
        rows = []
        for e, age in enumerate(ages):
            dt = BASE_DT - timedelta(hours=age)
            aurl = f"{base}/world-story-{p}-{e}/"
            g.page(aurl, "article",
                   art(f"w{p}{e}", dt, fb=(p, e) == (1, 1)), host)
            rows.append((aurl, dt))
        nxt = f"{base}/world/page/{p + 1}/"
        lurl = f"{base}/world/" if p == 1 else f"{base}/world/page/{p}/"
        g.page(lurl, "list",
               lst(1, "World", None, rows, nxt, last_page=(p == 2)),
               host)
    # dehradun: two-level crumbs; stale gate stops pagination
    rows = []
    for e, age in enumerate((0.0, 44.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"{base}/dehradun-story-{e}/"
        g.page(aurl, "article", art(f"d{e}", dt), host)
        rows.append((aurl, dt))
    g.page(f"{base}/dehradun/", "list",
           lst(2, "उत्तराखंड", "देहरादून", rows,
               f"{base}/dehradun/page/2/"), host)
    # haridwar + gadgets: single pages, no nav
    for slug, lvl in (("uttarakhand/haridwar", 2), ("gadgets", 1)):
        dt = BASE_DT
        tag = slug.split("/")[-1][:4]
        aurl = f"{base}/{tag}-story-0/"
        g.page(aurl, "article", art(tag, dt), host)
        g.page(f"{base}/{slug}/", "list",
               lst(lvl, slug.split("/")[-1].title(),
                   "Sub" if lvl == 2 else None, [(aurl, dt)], None),
               host)


def _build_emsindia(g: _G) -> None:
    host, base = "emsindia.com", "https://emsindia.com"
    wid = 1046
    g.registry[wid] = dict(EMSINDIA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           "<html>" + "".join(
               f'<div class="dropdown"><a href="./cat{i}.php">वर्ग {i}'
               "</a></div>" for i in range(10)
           ) + "</html>", host)

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="inner">'
                f"<h2>EMS {tag}</h2>"
                f"<h2>संवाद {dt.day:02d}/{dt.month:02d}/{dt.year}</h2>"
                f"<h2>ems पहला {tag}। | ems दूसरा। शेष।</h2>"
                f'<div style="font-size: 16px; font-weight:normal;">'
                f"जारी {dt.day:02d}/{dt.month:02d}/{dt.year} समय</div>"
                f"</div></html>")

    def featured(tag: str) -> str:
        # the featured page is re-parsed as a LIST (parse): no .borderT,
        # no anchor inside .inner → nothing stored, bug-faithful
        return (f'<html><div class="inner"><h2>EMS {tag}</h2>'
                f"<h2>no anchor here</h2></div></html>")

    for i in range(2):  # only cat0/cat1 get content; others empty lists
        rows = []
        for e in range(3):  # borderT [:-1] → last one never fetched
            dt = BASE_DT - timedelta(hours=e * 48)  # e=1 stale → dropped
            aurl = f"./c{i}a{e}.php"
            g.page(f"{base}/c{i}a{e}.php", "article",
                   art(f"c{i}a{e}", dt), host)
            rows.append(aurl)
        g.page(f"{base}/c{i}feat.php", "list", featured(f"c{i}feat"),
               host)
        body = (f'<div class="inner"><a href="./c{i}feat.php">f</a>'
                f'<img src="{base}/ft/{i}.jpg"></div>'
                + "".join(
                    f'<div class="borderT"><a href="{u}">'
                    f'<img src="{base}/th/{u[2:-4]}.jpg">t</a></div>'
                    for u in rows))
        g.page(f"{base}/cat{i}.php", "list", f"<html>{body}</html>",
               host)
    for i in range(2, 10):
        g.page(f"{base}/cat{i}.php", "list",
               '<html><div class="inner">empty</div></html>', host)


def _build_emstv(g: _G) -> None:
    host, base = "www.emstv.in", "http://www.emstv.in"
    wid = 1072
    g.registry[wid] = dict(EMSTV_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul class="nav">'
           f'<li><a href="./desh.php">देश</a></li>'
           f'<li><a href="./khel.php">खेल</a></li>'
           f"</ul></html>", host)

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div id="ccr-article"><h1><a href="#">ETV {tag}'
                f"</a></h1>"
                f"<p>etv पहला {tag}।</p><p>etv अंतिम {tag}।</p></div>"
                f"<time>{dt.day:02d}/{dt.month:02d}/{dt.year}</time>"
                f"</html>")

    for cslug in ("desh", "khel"):
        rows = []
        for e in range(2):
            # one article is OLDER than the cutoff and still stored —
            # emstv has no time gate at all
            dt = BASE_DT - timedelta(hours=e * 60)
            aurl = f"./{cslug}{e}.php"
            g.page(f"{base}/{cslug}{e}.php", "article",
                   art(f"{cslug}{e}", dt), host)
            rows.append(aurl)
        body = (f'<div class="col-md-8"><h5><a href="{rows[0]}">t</a>'
                f"</h5></div>"
                f'<a class="read-more" href="{rows[1]}">Read more</a>')
        g.page(f"{base}/{cslug}.php", "list", f"<html>{body}</html>",
               host)


PANCHJANYA_RULES = {
    # panchjanya.py: menu ul.parent_link li with del[0] del[0]
    # del[13:17] (py:31-33 — drop_seq with the slice form); list entries
    # are .col-md-6 rows whose select_one('a') may land on the
    # 'Nation.html' sentinel, in which case the row's LAST link is taken
    # (py:45-48 — href_alt_if); category1 re-read off each list page's
    # own box-shadow header (py:41); NO time gate and NO pagination
    # anywhere; title/date each fall back to a second selector
    # (py:55,73-76); body div.newscontent p else div[align=justify]
    # (py:57-60); centre-div images (py:68); the byline's SECOND space
    # token is 'D-<Hindi month>-YYYY' through the bug-faithful month
    # table (py:74-76,82-111: दिसंबर → 11, नवंबर unmapped → fallback-now).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "hindi_dmy_dash",
    "extract": {
        "category": {"sel": "ul.parent_link li", "link_sel": "a",
                     "drop_seq": [0, 0, [13, 17]]},
        "cat1_self": {"sel": ".box-shadow-block.box-shadow-1.text-center"},
        "entry": {
            "sel": ".col-md-6.col-sm-6.col-xs-12",
            "fields": {"href": {"sel": "a", "attr": "href"}},
            "href_alt_if": {"eq": "Nation.html",
                            "use": {"sel": "a", "index": -1,
                                    "attr": "href"}},
        },
        "title": {"if_count": {"sel": ".heading_container", "ge": 1},
                  "then": {"sel": ".heading_container"},
                  "else": {"sel": ".heading.clsNewsTitleHeading1"}},
        "pub": {"if_count": {"sel": ".date_and_author_container span",
                             "ge": 1},
                "then": {"sel": ".date_and_author_container span"},
                "else": {"sel": "td.miscinfo"}},
        "block": {"para_sel": "div.newscontent p",
                  "para_sel_fallback": 'div[align="justify"]',
                  "img_sel": 'div[align="center"] img'},
    },
}


def _build_panchjanya(g: _G) -> None:
    host, base = "www.panchjanya.com", "https://www.panchjanya.com"
    wid = 1007
    g.registry[wid] = dict(PANCHJANYA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    lis = [f'<li><a href="{base}/">होम</a></li>',
           f'<li><a href="{base}/epaper.html">ई-पेपर</a></li>',
           f'<li><a href="{base}/Bharat.html">भारत</a></li>',
           f'<li><a href="{base}/Vishwa.html">विश्व</a></li>']
    # eleven interior items all pointing at ONE page (the dupefilter
    # keeps a single fetch) so the del[13:17] tail positions line up
    lis += [f'<li><a href="{base}/Misc.html">विविध</a></li>'] * 11
    lis += [f'<li><a href="{base}/never{i}.html">x</a></li>'
            for i in range(3)]  # post-del indices 13,14,15 — deleted
    g.page(base + "/", "menu",
           f'<html><ul class="parent_link">{"".join(lis)}</ul></html>',
           host)

    def art(tag: str, byline: str, title_fb: bool = False,
            date_fb: bool = False, body_fb: bool = False) -> str:
        title = (f'<div class="heading clsNewsTitleHeading1">PJ {tag}'
                 "</div>" if title_fb else
                 f'<div class="heading_container">PJ {tag}</div>')
        date = (f'<table><tr><td class="miscinfo">अंक {byline} विशेष'
                "</td></tr></table>" if date_fb else
                f'<div class="date_and_author_container"><span>प्रकाशित '
                f"{byline} को</span></div>")
        body = (f'<div align="justify">pj पहला {tag}।</div>'
                f'<div align="justify">pj दूसरा।</div>' if body_fb else
                f'<div class="newscontent"><p>pj पहला {tag}।</p>'
                f"<p>pj दूसरा।</p></div>")
        img = f'<div align="center"><img src="{base}/i/{tag}.jpg"></div>'
        return f"<html>{title}{date}{img}{body}</html>"

    def row(href: str) -> str:
        return (f'<div class="col-md-6 col-sm-6 col-xs-12">'
                f'<a href="{href}">t</a></div>')

    # Bharat: the Nation.html sentinel row (last link wins) + a
    # fallback-title/fallback-date article carrying the दिसंबर→11 bug
    g.page(f"{base}/bharat-story-0.html", "article",
           art("b0", "30-मई-2021"), host)
    g.page(f"{base}/bharat-story-1.html", "article",
           art("b1", "28-दिसंबर-2020", title_fb=True, date_fb=True),
           host)
    g.page(base + "/Bharat.html", "list",
           f'<html><div class="box-shadow-block box-shadow-1 text-center">'
           f"भारत</div>"
           + (f'<div class="col-md-6 col-sm-6 col-xs-12">'
              f'<a href="Nation.html">x</a>'
              f'<a href="{base}/bharat-story-0.html">y</a></div>')
           + row(f"{base}/bharat-story-1.html") + "</html>", host)
    # Vishwa: justify-div fallback body + unmapped नवंबर month
    # (KeyError → fallback-now = as_of)
    g.page(f"{base}/vishwa-story-0.html", "article",
           art("v0", "29-नवंबर-2020", body_fb=True), host)
    g.page(base + "/Vishwa.html", "list",
           f'<html><div class="box-shadow-block box-shadow-1 text-center">'
           f"विश्व</div>" + row(f"{base}/vishwa-story-0.html") + "</html>",
           host)
    g.page(f"{base}/misc-story-0.html", "article",
           art("m0", "15-जुलूस-2021"), host)  # जुलूस = the March mistranslation
    g.page(base + "/Misc.html", "list",
           f'<html><div class="box-shadow-block box-shadow-1 text-center">'
           f"विविध</div>" + row(f"{base}/misc-story-0.html") + "</html>",
           host)


LOKTEJ_RULES = {
    # loktej.py: menu ul#menu-below-header-menu li minus the popped last
    # item (py:35-39); entries h2.entry-title a yielded UNGATED (py:46-52);
    # the page gate is the list's LAST span.auth-posted-on time through
    # the '<n> <unit> ago' table (py:55 — ago_en anchored to as_of);
    # pagination only when span.right exists, taking the page-nav anchor
    # whose text reads 'Next »' (py:57-61 — text_eq); article pub off
    # div.post-time (py:69), body div.txt p else div.txt div (py:77-89),
    # images from the article container (py:71-75), category1 from the
    # article's own cat-links (py:92), title = first h3 (py:94).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "ago_en",
    "extract": {
        "category": {"sel": "ul#menu-below-header-menu li",
                     "link_sel": "a", "slice": [0, -1]},
        "entry": {"sel": "h2.entry-title a"},
        "page_time": {"sel": "span.auth-posted-on time", "index": -1},
        "next": {"if_count": {"sel": ".left-right-links a span.right",
                              "ge": 1},
                 "then": {"sel": ".left-right-links a",
                          "text_eq": "Next »", "attr": "href"},
                 "else": {"const": None}},
        "title": {"sel": "h3"},
        "pub": {"sel": "div.post-time"},
        "cat1": {"sel": "li.sinlge-cat-links a"},
        "block": {"para_sel": "div.txt p",
                  "para_sel_fallback": "div.txt div",
                  "img_sel": "article.entry img"},
    },
}


def _build_loktej(g: _G) -> None:
    host, base = "loktej.com", "http://loktej.com"
    wid = 970
    g.registry[wid] = dict(LOKTEJ_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-below-header-menu">'
           f'<li><a href="{base}/news/">News</a></li>'
           f'<li><a href="{base}/business/">Business</a></li>'
           f'<li><a href="{base}/contact/">Contact</a></li>'
           f"</ul></html>", host)

    def art(tag: str, ago: str, cat: str, body_fb: bool = False) -> str:
        body = (f'<div class="txt"><div>lt પહેલું {tag}.</div>'
                f"<div>lt બીજું.</div></div>" if body_fb else
                f'<div class="txt"><p>lt પહેલું {tag}.</p>'
                f"<p>lt બીજું.</p></div>")
        return (f"<html><h3>LT {tag}</h3>"
                f'<div class="post-time">{ago}</div>'
                f'<article class="post category-single-ebook type-post '
                f'status-publish format-standard category-news entry">'
                f'<img src="{base}/i/{tag}.jpg">{body}</article>'
                f'<ul><li class="sinlge-cat-links"><a href="#">{cat}</a>'
                f"</li></ul></html>")

    def lst(rows: list[str], times: list[str], nxt: str | None,
            right: bool = True) -> str:
        arts = "".join(f'<h2 class="entry-title"><a href="{u}">t</a></h2>'
                       for u in rows)
        stamps = "".join(
            f'<span class="auth-posted-on"><time>{t}</time></span>'
            for t in times
        )
        nav = ""
        if nxt:
            # the arrow span WRAPS the Next label (so a.text reads
            # 'Next »' and 'a span.right' matches); the no-right page
            # renders a bare-text anchor instead
            link = (f'<a href="{nxt}"><span class="right">Next »</span>'
                    f"</a>" if right else f'<a href="{nxt}">Next »</a>')
            nav = (f'<div class="left-right-links">'
                   f'<a href="{base}/p0/">« Prev</a>{link}</div>')
        return f"<html>{arts}{stamps}{nav}</html>"

    # news: page 1 fresh (last stamp 3 hours ago) → page 2; page 2's
    # last stamp is 5 days old → its Next » link is never followed
    g.page(f"{base}/news-story-10.html", "article",
           art("n10", "2 hours ago", "News"), host)
    g.page(f"{base}/news-story-11.html", "article",
           art("n11", "3 weeks ago", "News"), host)  # stored — no article gate
    g.page(f"{base}/news/", "list",
           lst([f"{base}/news-story-10.html", f"{base}/news-story-11.html"],
               ["50 mins ago", "3 hours ago"], f"{base}/news/page/2/"),
           host)
    g.page(f"{base}/news-story-20.html", "article",
           art("n20", "2 months ago", "News", body_fb=True), host)
    g.page(f"{base}/news/page/2/", "list",
           lst([f"{base}/news-story-20.html"], ["5 days ago"],
               f"{base}/news/page/3/"), host)
    # business: nav present but NO span.right → pagination never fires
    g.page(f"{base}/biz-story-0.html", "article",
           art("b0", "1 day ago", "Business"), host)
    g.page(f"{base}/business/", "list",
           lst([f"{base}/biz-story-0.html"], ["1 day ago"],
               f"{base}/business/page/2/", right=False), host)
    # contact was popped off the menu — never fetched (no page needed)


INEXTLIVE_RULES = {
    # inextlive.py: #mainNav a [2:14] menu slice (py:33); ONE callback
    # for every non-article page, dispatched by presence — a page with
    # .topicList is a list, otherwise its .MainHd links recurse into the
    # SAME callback (py:39-53 — list_if/submenu); entries yielded
    # ungated (py:40-41); the page gate SIDE-FETCHES the last entry's
    # article with raw requests.get and regexes its '| Updated Date:'
    # banner (py:42-44); pagination prefers .last a and otherwise
    # schedules EVERY page-nav anchor (py:45-49 — next_alt_all);
    # category2 only when the breadcrumb has ≥ 4 spans (py:60 — if_count
    # ge); pub re-regexed off the article page (py:66-67); first
    # .bodySummery data-src image only (py:68-69).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "dmy_hms_sp",
    "page_gate_fetch_last":
        r"\| Updated Date: \S+, (\d+ \S+ \d+ \d+:\d+:\d+)",
    "extract": {
        "category": {"sel": "#mainNav a", "slice": [2, 14]},
        "list_if": {"sel": ".topicList"},
        "submenu": {"sel": ".MainHd a"},
        "entry": {"sel": ".topicList a"},
        "next": {"sel": ".pagination.border0 .last a", "attr": "href"},
        "next_alt_all": {"sel": ".pagination.border0 a"},
        "title": {"sel": ".topHeading h1"},
        "cat1": {"sel": ".breadcrum .first span"},
        "cat2": {"if_count": {"sel": ".breadcrum span", "ge": 4},
                 "then": {"sel": ".breadcrum span", "index": -2},
                 "else": {"const": None}},
        "pub": r"\| Updated Date: \S+, (\d+ \S+ \d+ \d+:\d+:\d+)",
        "block": {"para_sel": ".articleBody p",
                  "img_sel": ".bodySummery img", "img_attr": "data-src",
                  "img_slice": [0, 1]},
    },
}


def _build_inextlive(g: _G) -> None:
    host, base = "www.inextlive.com", "https://www.inextlive.com"
    wid = 1127
    g.registry[wid] = dict(INEXTLIVE_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><div id="mainNav">'
           f'<a href="{base}/">Home</a>'
           f'<a href="{base}/epaper">E-paper</a>'
           f'<a href="{base}/news">News</a>'
           f'<a href="{base}/cricket">Cricket</a>'
           f"</div></html>", host)
    # the News hub has no .topicList — its .MainHd links recurse
    g.page(base + "/news", "list",
           f'<html><div class="MainHd">'
           f'<a href="{base}/national">National</a>'
           f'<a href="{base}/world">World</a>'
           f"</div></html>", host)

    def _dt_banner(dt: datetime) -> str:
        return (f"| Updated Date: Sun, {dt.day} {_MON_ABBR[dt.month - 1]}"
                f" {dt.year} {dt:%H:%M:%S}")

    def art(tag: str, dt: datetime, crumbs: int = 4) -> str:
        spans = ("<span>Home</span><span>News</span>"
                 "<span>National</span><span>x</span>" if crumbs >= 4
                 else "<span>x</span>")
        return (f'<html><div class="topHeading"><h1>INX {tag}</h1></div>'
                f'<div class="breadcrum"><span class="first">'
                f"<span>देश</span></span>{spans}</div>"
                f"<div>{_dt_banner(dt)}</div>"
                f'<div class="bodySummery">'
                f'<img data-src="{base}/i/{tag}.jpg">'
                f'<img data-src="{base}/i/{tag}b.jpg"></div>'
                f'<div class="articleBody"><p>inx पहला {tag}।</p>'
                f"<p>inx दूसरा।</p></div></html>")

    def lst(rows: list[str], nav: str) -> str:
        arts = "".join(f'<a href="{u}">t</a>' for u in rows)
        return (f'<html><div class="topicList">{arts}</div>{nav}</html>')

    # national: .last a chain; page 2's side-fetched last entry is stale
    n_rows1 = [f"{base}/national-story-1{e}" for e in range(3)]
    for e, u in enumerate(n_rows1):
        g.page(u, "article",
               art(f"n1{e}", BASE_DT - timedelta(hours=e * 3),
                   crumbs=4 if e else 2), host)
    g.page(base + "/national", "list",
           lst(n_rows1,
               f'<div class="pagination border0"><a href="{base}/national'
               f'">1</a><span class="last"><a href="{base}/national/2">'
               f"Last</a></span></div>"), host)
    n_rows2 = [f"{base}/national-story-20"]
    g.page(n_rows2[0], "article",
           art("n20", BASE_DT - timedelta(hours=90)), host)  # stale
    g.page(base + "/national/2", "list",
           lst(n_rows2,
               f'<div class="pagination border0"><span class="last">'
               f'<a href="{base}/national/3">Last</a></span></div>'),
           host)
    # world: NO .last — every page-nav anchor is scheduled (one a dupe)
    w_rows1 = [f"{base}/world-story-1{e}" for e in range(2)]
    for e, u in enumerate(w_rows1):
        g.page(u, "article",
               art(f"w1{e}", BASE_DT - timedelta(hours=e * 2)), host)
    g.page(base + "/world", "list",
           lst(w_rows1,
               f'<div class="pagination border0"><a href="{base}/world">1'
               f'</a><a href="{base}/world/2">2</a></div>'), host)
    w_rows2 = [f"{base}/world-story-20"]
    g.page(w_rows2[0], "article",
           art("w20", BASE_DT - timedelta(hours=80)), host)  # stale
    g.page(base + "/world/2", "list", lst(w_rows2, ""), host)
    # cricket: direct menu list, fresh, no pagination markup at all
    c_rows = [f"{base}/cricket-story-0"]
    g.page(c_rows[0], "article", art("c0", BASE_DT), host)
    g.page(base + "/cricket", "list", lst(c_rows, ""), host)


WORLD_RULES = {
    # world.py: menu #menu-main-menu>li>a [1:-1] whose category1 is the
    # link's TITLE ATTRIBUTE (py:30-33 — label_attr); per-entry gate on
    # the row's <time> date-only text + ' 00:00:00' with break (py:38-45);
    # pagination takes the LAST page-nav anchor unconditionally while the
    # gate holds (py:46-50, try/except → absent nav just ends the chain);
    # article re-reads title/pub off the page (py:63-64), body/abstract
    # from the article>div>div>div>p chain (py:66-70), images always None
    # (py:65), category2 always None (py:62).
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "iso_date",
    "cat2_meta_off": True,
    "extract": {
        "category": {"sel": "#menu-main-menu > li > a", "slice": [1, -1],
                     "label_attr": "title"},
        "entry": {"sel": "article > div.content",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": "time"}}},
        "next": {"sel": ".pagination > li a", "index": -1,
                 "attr": "href"},
        "title": {"sel": "h1.post-title.item.fn"},
        "pub": {"sel": "time.value-title"},
        "block": {"para_sel": "article > div > div > div > p"},
    },
}


def _build_world(g: _G) -> None:
    host, base = "worldnews.net.ph", "https://worldnews.net.ph"
    wid = 183
    g.registry[wid] = dict(WORLD_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 2266})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-main-menu">'
           f'<li><a href="{base}/" title="Home">Home</a></li>'
           f'<li><a href="{base}/nation/" title="National News">Nation'
           f"</a></li>"
           f'<li><a href="{base}/metro/" title="Metro Manila">Metro'
           f"</a></li>"
           f'<li><a href="{base}/about/" title="About">About</a></li>'
           f"</ul></html>", host)

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="post-title item fn">WN {tag}</h1>'
                f'<time class="value-title">{dt:%Y-%m-%d}</time>'
                f"<article><div><div><div>"
                f"<p>wn first {tag}.</p><p>wn second.</p>"
                f"</div></div></div></article></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        arts = "".join(
            f'<article><div class="content"><a href="{u}">t</a>'
            f"<time>{dt:%Y-%m-%d}</time></div></article>"
            for u, dt in rows
        )
        nav = (f'<ul class="pagination"><li><a href="{base}/p1/">1</a>'
               f'</li><li><a href="{nxt}">»</a></li></ul>' if nxt else "")
        return f"<html>{arts}{nav}</html>"

    # nation: page 1 all fresh → last nav anchor; page 2's second row is
    # stale → break, no page 3
    rows1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/nation-story-1{e}/"
        g.page(aurl, "article", art(f"n1{e}", dt), host)
        rows1.append((aurl, dt))
    g.page(base + "/nation/", "list",
           lst(rows1, f"{base}/nation/page/2/"), host)
    rows2 = []
    for e, age in enumerate((20.0, 80.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"{base}/nation-story-2{e}/"
        g.page(aurl, "article", art(f"n2{e}", dt), host)
        rows2.append((aurl, dt))
    g.page(base + "/nation/page/2/", "list",
           lst(rows2, f"{base}/nation/page/3/"), host)
    # metro: single page, fresh, no pagination markup (the reference's
    # bare except swallows the missing nav)
    dt = BASE_DT - timedelta(hours=3)
    aurl = f"{base}/metro-story-0/"
    g.page(aurl, "article", art("m0", dt), host)
    g.page(base + "/metro/", "list", lst([(aurl, dt)], None), host)


MB_RULES = {
    # mb.py: ONE callback dispatching on response.url's shape (py:28-41):
    # the root is the primary menu [0:-1], '/\w+/$' pages are the topics
    # submenu, '/category/...' pages are lists — menu_child_kind_re as
    # rule data; list rows gate per-entry on time.time-ago's data-time
    # attribute with break (py:44-56), a row MISSING the stamp inheriting
    # the previous one (py:47-50's try/except pass — entry_time_carry);
    # .nextpostslink pagination (py:58-59); the article reads BOTH
    # categories AND the title off its breadcrumb spans (py:64-66), body
    # from section.article-content>p (py:72-74); the figure-image rule
    # reads attribute ' data-cfsrc' with a LEADING SPACE (py:69) — every
    # get returns None, so no image ever lands; not carried.
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",
    "date_style": "ymd",
    "entry_time_carry": True,
    "menu_child_kind_re": [
        {"match": r"^https://mb\.com\.ph/\w+/$", "kind": "menu2"},
        {"match": r"^https://mb\.com\.ph/category/", "kind": "list"},
    ],
    "extract": {
        "category": {"sel": "#primary-menu > div > ul > li > a",
                     "slice": [0, -1]},
        "category2": {"sel": "#topics-menu > div > ul > li > a"},
        "entry": {"sel": "li.article",
                  "fields": {"href": {"sel": ".title a", "attr": "href"},
                             "time": {"sel": "time.time-ago",
                                      "attr": "data-time"}}},
        "next": {"sel": ".nextpostslink", "attr": "href"},
        "title": {"sel": "div.breadcrumbs > span", "index": -1},
        "cat1": {"sel": "div.breadcrumbs > span", "index": 0},
        "cat2": {"sel": "div.breadcrumbs > span", "index": 1},
        "block": {"para_sel": "section.article-content > p"},
    },
}


def _build_mb(g: _G) -> None:
    host, base = "mb.com.ph", "https://mb.com.ph"
    wid = 189
    g.registry[wid] = dict(MB_RULES)
    g.seeds.append({"url": base, "website_id": wid,
                    "language_id": 1866})
    g.page(base, "menu",
           f'<html><nav id="primary-menu"><div><ul>'
           f'<li><a href="{base}/news/">News</a></li>'
           f'<li><a href="{base}/sports/">Sports</a></li>'
           f'<li><a href="{base}/trailer/">Trailer</a></li>'
           f"</ul></div></nav></html>", host)
    # the two '/\w+/$' pages are topics submenus
    g.page(base + "/news/", "menu2",
           f'<html><nav id="topics-menu"><div><ul>'
           f'<li><a href="{base}/category/news/national/">National</a>'
           f"</li>"
           f'<li><a href="{base}/category/news/world/">World</a></li>'
           f"</ul></div></nav></html>", host)
    g.page(base + "/sports/", "menu2",
           f'<html><nav id="topics-menu"><div><ul>'
           f'<li><a href="{base}/category/sports/basketball/">Basketball'
           f"</a></li>"
           f"</ul></div></nav></html>", host)

    def art(tag: str, cat1: str, cat2: str) -> str:
        return (f'<html><div class="breadcrumbs"><span>{cat1}</span>'
                f"<span>{cat2}</span><span>MB {tag}</span></div>"
                f'<section class="article-content">'
                f"<p>mb first {tag}.</p><p>mb second.</p>"
                f'<figure><img data-cfsrc="{base}/i/{tag}.jpg"></figure>'
                f"</section></html>")

    def lst(rows: list[tuple[str, datetime | None]],
            nxt: str | None) -> str:
        arts = "".join(
            f'<li class="article"><div class="title"><a href="{u}">t</a>'
            "</div>"
            + (f'<time class="time-ago" data-time="'
               f'{dt:%Y-%m-%d %H:%M:%S}">x</time>' if dt else "")
            + "</li>"
            for u, dt in rows
        )
        nav = (f'<a class="nextpostslink" href="{nxt}">»</a>'
               if nxt else "")
        return f"<html><ul>{arts}</ul>{nav}</html>"

    # national: page 1's second row has NO stamp (inherits the first);
    # page 2 gates stale on its first row → chain ends
    rows1 = [(f"{base}/national-story-10/", BASE_DT),
             (f"{base}/national-story-11/", None)]
    for u, _dt in rows1:
        tag = u.rsplit("-", 1)[-1].rstrip("/")
        g.page(u, "article", art(f"n{tag}", "News", "National"), host)
    g.page(base + "/category/news/national/", "list",
           lst(rows1, f"{base}/category/news/national/page/2/"), host)
    rows2 = [(f"{base}/national-story-20/",
              BASE_DT - timedelta(hours=70))]
    g.page(rows2[0][0], "article", art("n20", "News", "National"), host)
    g.page(base + "/category/news/national/page/2/", "list",
           lst(rows2, f"{base}/category/news/national/page/3/"), host)
    # world: single fresh row, no nextpostslink (the reference's
    # select_one(None).get would die AFTER yielding — net: chain ends)
    wu = f"{base}/world-story-0/"
    g.page(wu, "article", art("w0", "News", "World"), host)
    g.page(base + "/category/news/world/", "list",
           lst([(wu, BASE_DT - timedelta(hours=5))], None), host)
    # basketball: single fresh row
    bu = f"{base}/basket-story-0/"
    g.page(bu, "article", art("b0", "Sports", "Basketball"), host)
    g.page(base + "/category/sports/basketball/", "list",
           lst([(bu, BASE_DT - timedelta(hours=8))], None), host)


LEGENDNEWS_RULES = {
    # legendnews.py: two-level header menu built around ONE shared meta
    # dict per top item — the parent is yielded first, then each child
    # mutates meta['category2'], so by parse time the parent AND every
    # child read the LAST child's label (py:28-35 — children_shared_meta);
    # list rows carry title (a@title), abstract (p), image (img@src) and
    # an ISO+TZ .updated@datetime stamp down in meta (py:40-48), gated
    # per-entry with break; pagination hands the next page to parse —
    # the MENU callback (py:53-55 — next_kind), so its menu links die in
    # the dupefilter and its articles are never collected, bug-faithful;
    # the article page only contributes the whole-container body
    # (py:57-67).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "isoT",
    "next_kind": "menu",
    "extract": {
        "category": {"sel": "#menu-primary-menu > li > a",
                     "children_sel": "ul > li > a",
                     "children_shared_meta": True},
        "entry": {"sel": "article",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "title": {"sel": "a", "attr": "title"},
                             "abstract": {"sel": "p"},
                             "img": {"sel": "img", "attr": "src"},
                             "time": {"sel": ".updated",
                                      "attr": "datetime"}}},
        "next": {"sel": ".previous a", "attr": "href"},
        "block": {},
        "body_fallback": {"sel": ".entry-content.clearfix"},
    },
}


def _build_legendnews(g: _G) -> None:
    host, base = "legendnews.in", "http://legendnews.in"
    wid = 1051
    g.registry[wid] = dict(LEGENDNEWS_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})

    # nested ul INSIDE the top anchor — html.parser keeps the literal
    # nesting the spider's i.select('ul > li > a') depends on
    menu = (f'<ul id="menu-primary-menu">'
            f'<li><a href="{base}/india/">India'
            f'<ul><li><a href="{base}/delhi/">Delhi</a></li>'
            f'<li><a href="{base}/politics/">Politics</a></li></ul>'
            f"</a></li>"
            f'<li><a href="{base}/sports/">Sports</a></li>'
            f"</ul>")
    g.page(base + "/", "menu", f"<html>{menu}</html>", host)

    def art(tag: str) -> str:
        return (f'<html><div class="entry-content clearfix">ln पूरा लेख '
                f"{tag}। ln शेष।</div></html>")

    def lst(cat: str, rows: list[tuple[str, datetime]],
            nxt: str | None) -> str:
        arts = "".join(
            f'<article><a href="{u}" title="LN {cat}{e}">t</a>'
            f'<p>ln सार {cat}{e}।</p><img src="{base}/i/{cat}{e}.jpg">'
            f'<time class="updated" datetime="{_iso_tz(dt)}">x</time>'
            "</article>"
            for e, (u, dt) in enumerate(rows)
        )
        nav = (f'<div class="previous"><a href="{nxt}">Older</a></div>'
               if nxt else "")
        return f"<html>{arts}{nav}</html>"

    # india: page 1 fresh → .previous chain hands page 2 to the MENU
    # callback — page 2 renders the same header menu (all dupes) plus an
    # article row that is never collected
    rows = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 4)
        aurl = f"{base}/india-story-1{e}/"
        g.page(aurl, "article", art(f"i1{e}"), host)
        rows.append((aurl, dt))
    g.page(base + "/india/", "list",
           lst("in", rows, f"{base}/india/page/2/"), host)
    g.page(base + "/india/page/2/", "menu",
           f"<html>{menu}"
           f'<article><a href="{base}/india-story-20/" title="LN lost">t'
           f'</a><p>ln lost</p><img src="{base}/i/lost.jpg">'
           f'<time class="updated" datetime="{_iso_tz(BASE_DT)}">x</time>'
           f"</article></html>", host)
    # delhi/politics/sports: single pages; sports' second row is stale →
    # break (its .previous link is never followed)
    for cslug, tag in (("delhi", "dl"), ("politics", "po")):
        dt = BASE_DT - timedelta(hours=6)
        aurl = f"{base}/{cslug}-story-0/"
        g.page(aurl, "article", art(f"{tag}0"), host)
        g.page(f"{base}/{cslug}/", "list",
               lst(tag, [(aurl, dt)], None), host)
    s_rows = []
    for e, age in enumerate((2.0, 90.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"{base}/sports-story-{e}/"
        g.page(aurl, "article", art(f"sp{e}"), host)
        s_rows.append((aurl, dt))
    g.page(base + "/sports/", "list",
           lst("sp", s_rows, f"{base}/sports/page/2/"), host)


ENTREPRENEUR_RULES = {
    # entrepreneur.py: the seed is a SITEMAP INDEX of year blocks holding
    # month links (py:29-37) — the year gate breaks the whole walk below
    # the cutoff's year, a month link below the cutoff's MONTH ORDINAL
    # breaks its block (tm_mon comparison only, py:30-32); month pages
    # are ungated lists of .nobullet.col3 links (py:41-42); the article
    # takes its abstract from the first NON-EMPTY paragraph (py:52-56),
    # category1 from the last .valign-wrapper link when present (py:48-49)
    # and a fuzzy byline time (py:57).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "abstract_skip_empty": True,
    "cat1_meta_off": True,
    "extract": {
        "category": {
            "sel": ".container > div > div > div:nth-of-type(2) > div",
            "year_sel": "h2", "children_sel": "ul a",
            "href_prefix": "https://www.entrepreneur.com",
        },
        "entry": {"sel": ".nobullet.col3 a"},
        "title": {"sel": ".headline"},
        "cat1": {"sel": ".valign-wrapper > a", "index": -1},
        "pub": {"sel": ".art-v2-body > div > div > time"},
        "block": {"para_sel": ".art-v2-body > div:nth-of-type(1) > p",
                  "img_sel": ".art-v2-body > div:nth-of-type(1) img"},
    },
}


def _build_entrepreneur(g: _G) -> None:
    host, base = "www.entrepreneur.com", "https://www.entrepreneur.com"
    wid = 489
    g.registry[wid] = dict(ENTREPRENEUR_RULES)
    g.seeds.append({"url": base + "/sitemaps/main", "website_id": wid,
                    "language_id": 1866})

    def yblock(year: int, months: list[str]) -> str:
        links = "".join(
            f'<li><a href="/sitemaps/{year}/{m.lower().split()[0]}">'
            f"{m}</a></li>" for m in months
        )
        return f"<div><h2>{year}</h2><ul>{links}</ul></div>"

    # cutoff = 2021-05: May passes, April breaks the 2021 block, the
    # 2020 block breaks the whole walk (its June is never read)
    g.page(base + "/sitemaps/main", "menu",
           f'<html><div class="container"><div><div>'
           f"<div>sidebar</div>"
           f"<div>{yblock(2021, ['May 2021', 'April 2021'])}"
           f"{yblock(2020, ['June 2020'])}</div>"
           f"</div></div></div></html>", host)

    def art(tag: str, dt: datetime, cat: bool = True) -> str:
        crumbs = (f'<div class="valign-wrapper"><a href="#">Home</a>'
                  f'<a href="#">Growth</a></div>' if cat else "")
        return (f'<html><h1 class="headline">EN {tag}</h1>{crumbs}'
                f'<div class="art-v2-body"><div>'
                f"<p></p><p>en lede {tag}.</p><p>en second.</p>"
                f'<img src="{base}/i/{tag}.jpg">'
                f"</div><div><div><time>{_MON_FULL[dt.month - 1]} "
                f"{dt.day}, {dt.year}</time></div></div></div></html>")

    arts = []
    for e in range(2):
        aurl = f"/article/may-{e}"
        g.page(base + aurl, "article",
               art(f"m{e}", BASE_DT - timedelta(hours=e * 50),
                   cat=(e == 0)), host)
        arts.append(aurl)
    g.page(base + "/sitemaps/2021/may", "list",
           '<html><ul class="nobullet col3">'
           + "".join(f'<li><a href="{u}">t</a></li>' for u in arts)
           + "</ul></html>", host)


FILI_RULES = {
    # fili.py: sibling-combinator menu [:5] with a fixed host prefix
    # (py:30-31); each list block carries TWO index-paired article/date
    # pairs (py:37-41 — modeled as one wrapper per pair, the reference's
    # [:-2] widget slice realized by anchor-less trailing blocks); the
    # '<Weekday>, D Mon YYYY' stamps re-ordered 'Mon D Y' (py:41);
    # per-entry gate WITHOUT break (py:42-46 sets flag and keeps
    # scanning); .pagination-next chains (py:47-48); breadcrumb
    # categories collapse to one level when only one link (py:53-59),
    # title from the breadcrumb's last span (py:61), the dd.published
    # byline rebuilt 'Y-M-D HH:MM:00' from fixed tokens (py:62-64).
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "fili_list",
    "article_pub_style": "fili_article",
    "entry_gate_no_break": True,
    "extract": {
        "category": {
            "sel": "#s5_nav > li.active ~ li > span > span > a",
            "slice": [0, 5],
            "href_prefix": "http://www.filipinoexpress.com",
        },
        "entry": {"sel": "div.blog > div div.fe-item",
                  "fields": {"href": {"sel": "h2 > a", "attr": "href"},
                             "time": {"sel": ".published"}}},
        "next": {"sel": ".pagination .pagination-next a", "attr": "href"},
        "title": {"sel": "div.breadcrumbs > span", "index": -1},
        "cat1": {"sel": "div.breadcrumbs > a", "index": 0},
        "cat2": {"if_count": {"sel": "div.breadcrumbs > a", "ge": 2},
                 "then": {"sel": "div.breadcrumbs > a", "index": 1},
                 "else": {"const": None}},
        "pub": {"sel": "dd.published"},
        "block": {"para_sel": "div.item-page > p"},
    },
}


def _build_fili(g: _G) -> None:
    host = "www.filipinoexpress.com"
    base = "http://www.filipinoexpress.com"
    wid = 182
    g.registry[wid] = dict(FILI_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 2266})
    sections = ["news", "opinion", "sports", "life", "biz", "extra"]
    items = "".join(
        f'<li><span><span><a href="/{s}/">{s.title()}</a></span></span>'
        "</li>" for s in sections  # [:5] drops 'extra'
    )
    g.page(base + "/", "menu",
           f'<html><ul id="s5_nav"><li class="active"><span><span>'
           f'<a href="/">Home</a></span></span></li>{items}</ul></html>',
           host)

    def _fd(dt: datetime) -> str:
        return f"Sunday, {dt.day} {_MON_ABBR[dt.month - 1]} {dt.year}"

    def art(tag: str, dt: datetime, two_crumbs: bool) -> str:
        crumbs = (f'<a href="#">News</a><a href="#">Local</a>'
                  if two_crumbs else f'<a href="#">News</a>')
        return (f'<html><div class="breadcrumbs">{crumbs}'
                f"<span>FE {tag}</span></div>"
                f"<dl><dd class=\"published\">Sunday, {dt.day} "
                f"{_MON_ABBR[dt.month - 1]} {dt.year} {dt:%H:%M}"
                f"</dd></dl>"
                f'<div class="item-page"><p>fe first {tag}.</p>'
                f"<p>fe second.</p></div></html>")

    def lst(pairs: list[list[tuple[str, datetime]]],
            nxt: str | None) -> str:
        blocks = "".join(
            '<div class="items-row">' + "".join(
                f'<div class="fe-item"><h2><a href="{u}">t</a></h2>'
                f'<dl><dd class="published">{_fd(dt)}</dd></dl></div>'
                for u, dt in blk
            ) + "</div>"
            for blk in pairs
        )
        # the trailing widget blocks the reference slices off with [:-2]
        blocks += "<div>widget</div><div>footer</div>"
        nav = (f'<ul class="pagination"><li class="pagination-next">'
               f'<a href="{nxt}">Next</a></li></ul>' if nxt else "")
        return f'<html><div class="blog">{blocks}{nav}</div></html>'

    # page 1: 2 blocks × 2 pairs, one mid-list STALE pair skipped with
    # NO break (the fresh pair after it still fetched) but pagination
    # dead; news/2 never scheduled
    p1: list[list[tuple[str, datetime]]] = [[], []]
    ages = [(0.0, 80.0), (6.0, 12.0)]  # block 0 pair 1 is stale
    for b in range(2):
        for j in range(2):
            dt = BASE_DT - timedelta(hours=ages[b][j])
            aurl = f"/news-story-{b}{j}/"
            g.page(base + aurl, "article",
                   art(f"n{b}{j}", dt, two_crumbs=(b == 0)), host)
            p1[b].append((aurl, dt))
    g.page(base + "/news/", "list", lst(p1, "/news/2/"), host)
    # the other four sections: one block, fresh, no next
    for s in ("opinion", "sports", "life", "biz"):
        dt = BASE_DT - timedelta(hours=3)
        aurl = f"/{s}-story-0/"
        g.page(base + aurl, "article", art(s[:2] + "0", dt, False), host)
        g.page(f"{base}/{s}/", "list", lst([[(aurl, dt)]], None), host)


HASTAKSHEP_RULES = {
    # hastakshep.py: menu links kept only when the href contains
    # 'category' (py:38-44); list blocks carry title/abstract/image and a
    # '<n> <हिंदी unit> ago' stamp translated through hindi_time_ago into
    # format_time2 (py:23-30,50-55), an unmapped unit falling back to
    # now via the bare except (py:53-54); per-entry gate with break;
    # #pagination chains (py:65-67); the article only contributes its
    # .the_content paragraphs (py:77-80).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "ago_hi",
    "extract": {
        "category": {"sel": "#menu-header > li > a",
                     "href_re": r".*category"},
        "entry": {"sel": ".amp-wp-content.amp-loop-list",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": ".featured_time"},
                             "title": {"sel": "h2"},
                             "abstract":
                                 {"sel": ".large-screen-excerpt-design-3"},
                             "img": {"sel": "amp-img", "attr": "src"}}},
        "next": {"sel": "#pagination a", "attr": "href"},
        "block": {"para_sel": ".amp-wp-content.the_content p"},
    },
}


def _build_hastakshep(g: _G) -> None:
    host, base = "www.hastakshep.com", "https://www.hastakshep.com"
    wid = 1055
    g.registry[wid] = dict(HASTAKSHEP_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-header">'
           f'<li><a href="{base}/">होम</a></li>'  # no 'category' → skipped
           f'<li><a href="{base}/category/desh/">देश</a></li>'
           f'<li><a href="{base}/category/vichar/">विचार</a></li>'
           f"</ul></html>", host)

    def art(tag: str) -> str:
        return (f'<html><div class="amp-wp-content the_content">'
                f"<p>hk पहला {tag}।</p><p>hk दूसरा।</p></div></html>")

    def blk(u: str, tag: str, ago: str) -> str:
        return (f'<div class="amp-wp-content amp-loop-list">'
                f'<a href="{u}"><h2>HK {tag}</h2></a>'
                f'<div class="featured_time">{ago}</div>'
                f'<div class="large-screen-excerpt-design-3">hk सार {tag}'
                f"</div>"
                f'<amp-img src="{base}/i/{tag}.jpg"></amp-img></div>')

    def lst(blocks: list[str], nxt: str | None) -> str:
        nav = (f'<div id="pagination"><a href="{nxt}">»</a></div>'
               if nxt else "")
        return f"<html>{''.join(blocks)}{nav}</html>"

    # desh: page 1 fresh ('2 दिन ago' + an UNMAPPED unit → fallback-now,
    # both stored) → page 2 whose first stamp is '1 सप्ताह ago' (stale,
    # break — its article never fetched, no page 3)
    a10 = f"{base}/desh-story-10/"
    g.page(a10, "article", art("d10"), host)
    a11 = f"{base}/desh-story-11/"
    g.page(a11, "article", art("d11"), host)
    g.page(f"{base}/category/desh/", "list",
           lst([blk(a10, "d10", "2 दिन ago"),
                blk(a11, "d11", "5 पल ago")],
               f"{base}/category/desh/page/2/"), host)
    a20 = f"{base}/desh-story-20/"
    g.page(a20, "article", art("d20"), host)
    g.page(f"{base}/category/desh/page/2/", "list",
           lst([blk(a20, "d20", "1 सप्ताह ago")], None), host)
    # vichar: one fresh block in hours, no pagination div
    av = f"{base}/vichar-story-0/"
    g.page(av, "article", art("v0"), host)
    g.page(f"{base}/category/vichar/", "list",
           lst([blk(av, "v0", "30 घंटे ago")], None), host)


HEADLINEHINDI_RULES = {
    # headlinehindi.py: deep-path menu selector (py:43-47); entries
    # yielded UNGATED off module blocks (py:53-58); the page gate is the
    # LAST block's ISO+TZ datetime attribute (py:59-61), pagination
    # taking the page-nav's last anchor (py:59,62); the article re-reads
    # title/time off the page (py:72-73), takes the single modal image's
    # data-src when present (py:74-75), and stores the WHOLE joined body
    # as its abstract (py:76-81); category1 is the breadcrumb's second
    # span link (py:82), category2 hardcoded None (py:83).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "isoT",
    "cat2_meta_off": True,
    "abstract_split": {"sep": "\x00", "take": 1, "suffix": "\n"},
    "extract": {
        "category": {"sel": "#menu-td-demo-header-menu li a"},
        "entry": {"sel": ".tdb_module_loop.td_module_wrap",
                  "fields": {"href": {"sel": ".td-module-meta-info h3 a",
                                      "attr": "href"}}},
        "page_time": {"sel": ".tdb_module_loop.td_module_wrap"
                             " .td-editor-date span time",
                      "index": -1, "attr": "datetime"},
        "next": {"sel": ".page-nav.td-pb-padding-side a", "index": -1,
                 "attr": "href"},
        "title": {"sel": ".wpb_wrapper h1"},
        "pub": {"sel": ".wpb_wrapper time", "attr": "datetime"},
        "cat1": {"sel": "div.tdb-block-inner.td-fix-index span a",
                 "index": 1},
        "block": {"para_sel": "div.tdb-block-inner.td-fix-index p",
                  "img_sel": ".td-modal-image", "img_attr": "data-src",
                  "img_slice": [0, 1]},
    },
}


def _build_headlinehindi(g: _G) -> None:
    host, base = "www.headlinehindi.com", "https://www.headlinehindi.com"
    wid = 932
    g.registry[wid] = dict(HEADLINEHINDI_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-td-demo-header-menu">'
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/khel/">खेल</a></li>'
           f"</ul></html>", host)

    def art(tag: str, dt: datetime, img: bool = True) -> str:
        modal = (f'<img class="td-modal-image" '
                 f'data-src="{base}/i/{tag}.jpg">' if img else "")
        return (f'<html><div class="wpb_wrapper"><div><div>'
                f"<h1>HH {tag}</h1>"
                f'<time datetime="{_iso_tz(dt)}">x</time></div></div>'
                f"{modal}"
                f'<div class="tdb-block-inner td-fix-index">'
                f"<span><a href=\"#\">होम</a><a href=\"#\">देश</a></span>"
                f"<p>hh पहला {tag}।</p><p>hh दूसरा।</p></div>"
                f"</div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        mods = "".join(
            f'<div class="tdb_module_loop td_module_wrap '
            f'td-animation-stack"><div class="td-module-meta-info">'
            f'<h3><a href="{u}">t</a></h3></div>'
            f'<div class="td-editor-date"><span>'
            f'<time datetime="{_iso_tz(dt)}">x</time></span></div></div>'
            for u, dt in rows
        )
        nav = (f'<div class="page-nav td-pb-padding-side">'
               f'<a href="{base}/p1/">1</a><a href="{nxt}">»</a></div>'
               if nxt else "")
        return (f'<html><div id="td-outer-wrap">'
                f'<div class="tdc-content-wrap">{mods}</div>{nav}'
                f"</div></html>")

    # desh: page 1 fresh tail → page 2; page 2's tail is stale (its own
    # fresh FIRST row still stored — entries are ungated)
    rows1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 5)
        aurl = f"{base}/desh-khabar-1{e}/"
        g.page(aurl, "article", art(f"d1{e}", dt, img=(e == 0)), host)
        rows1.append((aurl, dt))
    g.page(base + "/desh/", "list",
           lst(rows1, f"{base}/desh/page/2/"), host)
    rows2 = []
    for e, age in enumerate((10.0, 70.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"{base}/desh-khabar-2{e}/"
        g.page(aurl, "article", art(f"d2{e}", dt), host)
        rows2.append((aurl, dt))
    g.page(base + "/desh/page/2/", "list",
           lst(rows2, f"{base}/desh/page/3/"), host)
    # khel: single fresh page, no nav
    dt = BASE_DT - timedelta(hours=2)
    aurl = f"{base}/khel-khabar-0/"
    g.page(aurl, "article", art("k0", dt), host)
    g.page(base + "/khel/", "list", lst([(aurl, dt)], None), host)


HNF_RULES = {
    # hindinewsfresh10.py: Blogger menu with '%20'-escaped hrefs (py:38);
    # page 1 yields its entries ungated, stamps ONE .post-snippet teaser
    # into meta for every later article (py:51-56), and schedules the
    # older-link unconditionally (py:57-59); updated-max tail pages (the
    # variant) REQUIRE post rows (py:86,109-110), gate on the LAST
    # abbr.published through the clean Hindi month table (py:99-100,
    # 112-144), and SIDE-CHECK the next page's emptiness with raw
    # requests.get before scheduling it (py:101-106); the article reads
    # categories off its label head (py:77-80), images off .post-article
    # (py:70-74), and a whole-container body (py:76).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "hindi_mdy_comma",
    "page_abstract_carry": True,
    "extract": {
        "category": {"sel": "ul#nav2 li a"},
        "href_sub": [[" ", "%20"]],
        "entry": {"sel": "h2.post-title.entry-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_abstract": {"sel": "div.post-snippet p"},
        "next": {"sel": "a.blog-pager-older-link", "attr": "href"},
        "title": {"sel": "h1.post-title.entry-title"},
        "pub": {"sel": "abbr.published"},
        "cat1": {"sel": "div.label-head.Label a", "index": 0},
        "cat2": {"if_count": {"sel": "div.label-head.Label a", "ge": 2},
                 "then": {"sel": "div.label-head.Label a", "index": 1},
                 "else": {"const": None}},
        "block": {"img_sel": ".post-article img"},
        "body_fallback": {"sel": "div.post-body.entry-content"},
        "variants": [
            {"match": r"updated-max",
             "page_time": {"sel": "abbr.published", "index": -1},
             "require_marker": {"sel": "div.post-outer"},
             "next_side_check": {"sel": "div.widget"
                                        " .blog-posts div.post-outer"}},
        ],
    },
}


def _build_hindinewsfresh10(g: _G) -> None:
    host = "hindinewsfresh10.blogspot.com"
    base = "https://hindinewsfresh10.blogspot.com"
    wid = 967
    g.registry[wid] = dict(HNF_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="nav2">'
           f'<li><a href="{base}/search/label/ताज़ा खबर">ताज़ा</a></li>'
           f"</ul></html>", host)

    def _hd(dt: datetime) -> str:
        hi = {5: "मई", 4: "अप्रैल"}[dt.month]
        return f"{hi} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime, n_cats: int = 2) -> str:
        cats = "".join(f'<a href="#">c{i}</a>' for i in range(n_cats))
        return (f'<html><h1 class="post-title entry-title">HNF {tag}'
                f"</h1>"
                f'<abbr class="published">{_hd(dt)}</abbr>'
                f'<div class="post-article">'
                f'<img src="{base}/i/{tag}.jpg"><img alt="no-src"></div>'
                f'<div class="post-body entry-content">hnf पूरा {tag}। '
                f"hnf शेष।</div>"
                f'<div class="label-head Label">{cats}</div></html>')

    def lst(rows: list[tuple[str, datetime]], nxt: str | None,
            snippet: bool, outer: bool = True) -> str:
        posts = "".join(
            f'<div class="post-outer">'
            f'<h2 class="post-title entry-title"><a href="{u}">t</a></h2>'
            f'<abbr class="published">{_hd(dt)}</abbr></div>'
            for u, dt in rows
        ) if outer else ""
        snip = ('<div class="post-snippet"><p>hnf page-one teaser</p>'
                "</div>" if snippet else "")
        nav = (f'<a class="blog-pager-older-link" href="{nxt}">पुराना</a>'
               if nxt else "")
        return (f'<html><div class="widget Blog">'
                f'<div class="blog-posts hfeed">{posts}</div></div>'
                f"{snip}{nav}</html>")

    # page 1 (no gate, teaser stamped) → updated-max page 2 (fresh tail,
    # side-check passes) → page 3 (fresh tail but the side-checked page 4
    # is EMPTY → chain ends without page 4 in the log)
    p2 = f"{base}/search/label/x?updated-max=2021-05-29T00:00:00"
    p3 = f"{base}/search/label/x?updated-max=2021-05-28T00:00:00"
    p4 = f"{base}/search/label/x?updated-max=2021-05-27T00:00:00"
    r1, r2, r3 = [], [], []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 4)
        aurl = f"{base}/2021/05/katha-1{e}.html"
        g.page(aurl, "article",
               art(f"k1{e}", dt, n_cats=2 if e == 0 else 1), host)
        r1.append((aurl, dt))
    g.page(base + "/search/label/ताज़ा%20खबर", "list",
           lst(r1, p2, snippet=True), host)
    for e in range(1):
        dt = BASE_DT - timedelta(hours=20)
        aurl = f"{base}/2021/05/katha-20.html"
        g.page(aurl, "article", art("k20", dt), host)
        r2.append((aurl, dt))
    g.page(p2, "list", lst(r2, p3, snippet=False), host)
    dt = BASE_DT - timedelta(hours=30)
    aurl = f"{base}/2021/05/katha-30.html"
    g.page(aurl, "article", art("k30", dt), host)
    r3.append((aurl, dt))
    g.page(p3, "list", lst(r3, p4, snippet=False), host)
    # page 4 exists but renders NO post rows — only ever side-fetched
    g.page(p4, "list", lst([], None, snippet=False, outer=False), host)


JANODUNIYA_RULES = {
    # janoduniya.py: programmatic seed — start_requests mines
    # #primary-menu[:-1] off the homepage with the link text as category1
    # (py:24-29; the home fetch is scheduled here as the batch-0 menu,
    # the shangbao simplification); every list entry inherits the PAGE's
    # FIRST title and .updated stamp (py:39-41's select_one over soup —
    # page_entry_title/page_entry_time, bug-faithful); per-entry gate
    # with break; .nav-previous chains, a missing nav swallowed by the
    # bare except (py:47-52); the article contributes abstract/body
    # paragraphs and thumb images (py:59-64), category2 None (py:65).
    "rule": NEXT_LINK,
    "format": "html",
    "extract": {
        "category": {"sel": "#primary-menu a", "slice": [0, -1]},
        "entry": {"sel": "article",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_entry_time": {"sel": ".updated"},
        "page_entry_title": {"sel": "h2.entry-title a"},
        "next": {"sel": ".nav-previous a", "attr": "href"},
        "abstract": {"sel": ".entry-content p"},
        "block": {"para_sel": ".entry-content p",
                  "img_sel": ".np-article-thumb img"},
    },
}


def _build_janoduniya(g: _G) -> None:
    host, base = "janoduniya.tv", "http://janoduniya.tv"
    wid = 1057
    g.registry[wid] = dict(JANODUNIYA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><nav id="primary-menu">'
           f'<a href="{base}/desh/">देश</a>'
           f'<a href="{base}/videsh/">विदेश</a>'
           f'<a href="{base}/login/">लॉगिन</a>'  # [:-1] drops it
           f"</nav></html>", host)

    def art(tag: str) -> str:
        return (f'<html><div class="np-article-thumb">'
                f'<img src="{base}/i/{tag}.jpg"></div>'
                f'<div class="entry-content"><p>jd पहला {tag}।</p>'
                f"<p>jd दूसरा।</p></div></html>")

    def lst(rows: list[str], stamp: datetime, nxt: str | None) -> str:
        arts = "".join(
            f'<article><h2 class="entry-title"><a href="{u}">शीर्षक '
            f"{u.rsplit('/', 2)[-2]}</a></h2></article>" for u in rows
        )
        nav = (f'<div class="nav-previous"><a href="{nxt}">पुराने</a>'
               "</div>" if nxt else "")
        return (f'<html><span class="updated">'
                f"{_MON_FULL[stamp.month - 1]} {stamp.day}, {stamp.year}"
                f"</span>{arts}{nav}</html>")

    # desh: page 1 fresh stamp (BOTH entries share the first title and
    # the one page stamp) → page 2 stale stamp → break, no page 3
    r1 = [f"{base}/desh-story-1{e}/" for e in range(2)]
    for u in r1:
        g.page(u, "article", art(u.rsplit("/", 2)[-2]), host)
    g.page(base + "/desh/", "list",
           lst(r1, BASE_DT, f"{base}/desh/page/2/"), host)
    r2 = [f"{base}/desh-story-20/"]
    g.page(r2[0], "article", art("desh-story-20"), host)
    g.page(base + "/desh/page/2/", "list",
           lst(r2, BASE_DT - timedelta(hours=80),
               f"{base}/desh/page/3/"), host)
    # videsh: single fresh page without nav (the bare except path)
    rv = [f"{base}/videsh-story-0/"]
    g.page(rv[0], "article", art("videsh-story-0"), host)
    g.page(base + "/videsh/", "list", lst(rv, BASE_DT, None), host)


KHULASAA_RULES = {
    # khulasaa.py: navbar menu [1:] (py:40-42); entries yielded ungated
    # off the allBox list (py:50-54); the page gate SIDE-FETCHES the last
    # entry's article with raw requests.get and reads its byline span
    # (py:56) in 'MonthFull D, YYYY, H:MM am/pm' (py:13-16); .pagination
    # chains (py:55-59); the article joins its h3 bullet heads into the
    # abstract (py:74-78), reads the deep breadcrumb span chain as
    # category1 (py:83), featured-box images (py:70-73).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "mdy_hm_ampm_c",
    "cat2_meta_off": True,
    "page_gate_fetch_last": {"sel": ".author-disc .date .author span"},
    "extract": {
        "category": {"sel": "#fixedMenu .g-header__inner #navbar li",
                     "link_sel": "a", "skip": 1},
        "entry": {"sel": ".o-article .k-list-sec .allBox ul li",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "next": {"sel": ".o-listing .pagination a", "attr": "href"},
        "title": {"sel": ".o-article .entry-content h1"},
        "pub": {"sel": ".author-disc .date .author span"},
        "cat1": {"sel": ".breadcrumb span span span a"},
        "abstract": {"sel": ".post-content ul li h3", "join": "\n"},
        "block": {"para_sel": ".post-content p",
                  "img_sel": ".content-section .featured-box img"},
    },
}


def _build_khulasaa(g: _G) -> None:
    host, base = "www.khulasaa.in", "https://www.khulasaa.in"
    wid = 926
    g.registry[wid] = dict(KHULASAA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div id="fixedMenu"><div class="g-header__inner">'
           f'<ul id="navbar">'
           f'<li><a href="{base}/">होम</a></li>'  # [1:] slices it off
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/rajya/">राज्य</a></li>'
           f"</ul></div></div></html>", host)

    def _kd(dt: datetime) -> str:
        h12 = dt.hour % 12 or 12
        ap = "pm" if dt.hour >= 12 else "am"
        return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}, "
                f"{h12}:{dt.minute:02d} {ap}")

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="o-article">'
                f'<div class="entry-content"><h1>KH {tag}</h1></div></div>'
                f'<div class="author-disc"><div class="date">'
                f'<div class="author"><span>{_kd(dt)}</span></div></div>'
                f"</div>"
                f'<div class="content-section"><div class="featured-box">'
                f'<img src="{base}/i/{tag}.jpg"></div></div>'
                f'<div class="post-content"><ul><li><h3>kh शीर्ष {tag}'
                f"</h3></li></ul>"
                f"<p>kh पहला {tag}।</p><p>kh दूसरा।</p></div>"
                f'<div class="breadcrumb"><span><span><span>'
                f'<a href="#">देश</a></span></span></span></div></html>')

    def lst(rows: list[str], nxt: str | None) -> str:
        items = "".join(f'<li><a href="{u}">t</a></li>' for u in rows)
        nav = (f'<div class="o-listing"><div class="pagination">'
               f'<a href="{nxt}">»</a></div></div>' if nxt else "")
        return (f'<html><div class="o-article"><div class="k-list-sec">'
                f'<div class="allBox"><ul>{items}</ul></div></div></div>'
                f"{nav}</html>")

    # desh: page 1's side-fetched last byline fresh → page 2, whose last
    # byline is stale → no page 3 (its own rows still stored — ungated)
    r1 = [f"{base}/desh-story-1{e}/" for e in range(2)]
    for e, u in enumerate(r1):
        g.page(u, "article",
               art(f"d1{e}", BASE_DT - timedelta(hours=e * 8)), host)
    g.page(f"{base}/desh/", "list", lst(r1, f"{base}/desh/page/2/"),
           host)
    r2 = [f"{base}/desh-story-20/"]
    g.page(r2[0], "article",
           art("d20", BASE_DT - timedelta(hours=75)), host)
    g.page(f"{base}/desh/page/2/", "list",
           lst(r2, f"{base}/desh/page/3/"), host)
    # rajya: one fresh row, no pagination block
    rr = [f"{base}/rajya-story-0/"]
    g.page(rr[0], "article", art("r0", BASE_DT), host)
    g.page(f"{base}/rajya/", "list", lst(rr, None), host)


KRISHAKJAGAT_RULES = {
    # krishakjagat.py: ONE menu item whose anchor text is category1 and
    # whose sub-links are the sections, the parent never scheduled
    # (py:35-42); category2 is the LIST URL's second path segment
    # (py:46's response.url.split('/')[4] — cat2_url_re over the list
    # URL); featured-image rows (py:48-51); fuzzy page gate on the last
    # entry-date (py:53); li.previous chains (py:54-56); the article
    # takes its abstract from an h4 else the body's first danda segment
    # (py:79), bullet-list paragraphs before <p> runs (py:73-77),
    # per-featured-image lasts (py:71-72).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "cat2_url_re": r"^https://www\.krishakjagat\.org/category/([^/]+)/",
    "abstract_split": {"sep": "।", "take": 1},
    "extract": {
        "category": {"sel": "#menu-item-865", "link_sel": "a",
                     "children_sel": "ul > li > a",
                     "children_suppress_parent": True},
        "entry": {"sel": ".article-container .featured-image",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".article-container"
                             " time.entry-date.published", "index": -1},
        "next": {"sel": "li.previous a", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "article time.entry-date.published"},
        "abstract": {"sel": ".entry-content.clearfix h4"},
        "block": {"para_sel": [".entry-content.clearfix ul > li",
                               ".entry-content.clearfix p"],
                  "img_sel": "article .featured-image img"},
    },
}


def _build_krishakjagat(g: _G) -> None:
    host, base = "www.krishakjagat.org", "https://www.krishakjagat.org"
    wid = 1111
    g.registry[wid] = dict(KRISHAKJAGAT_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><li id="menu-item-865"><a href="{base}/kheti/">'
           f"कृषि समाचार"
           f'<ul><li><a href="{base}/category/madhya-pradesh/">मप्र</a></li>'
           f'<li><a href="{base}/category/rashtriya/">राष्ट्रीय</a></li></ul>'
           f"</a></li></html>", host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime, h4: bool) -> str:
        head = f"<h4>kj सार {tag}</h4>" if h4 else ""
        return (f'<html><h1 class="entry-title">KJ {tag}</h1>'
                f"<article>"
                f'<time class="entry-date published">{_fz(dt)}</time>'
                f'<div class="featured-image">'
                f'<img src="{base}/i/{tag}.jpg"></div></article>'
                f'<div class="entry-content clearfix">{head}'
                f"<ul><li>kj बिंदु {tag}।</li></ul>"
                f"<p>kj पहला {tag}। शेष।</p></div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        divs = "".join(
            f'<div class="featured-image"><a href="{u}">t</a></div>'
            f'<time class="entry-date published">{_fz(dt)}</time>'
            for u, dt in rows
        )
        nav = (f'<li class="previous"><a href="{nxt}">पिछला</a></li>'
               if nxt else '<li class="previous"></li>')
        return (f'<html><div class="article-container">{divs}</div>'
                f"<ul>{nav}</ul></html>")

    # madhya-pradesh: fresh page 1 → page 2 stale tail (rows stored —
    # entries ungated; no page 3)
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/category/madhya-pradesh/kisan-khabar-1{e}/"
        g.page(aurl, "article", art(f"m1{e}", dt, h4=(e == 0)), host)
        r1.append((aurl, dt))
    g.page(f"{base}/category/madhya-pradesh/", "list",
           lst(r1, f"{base}/category/madhya-pradesh/page/2/"), host)
    dt = BASE_DT - timedelta(hours=80)
    aurl = f"{base}/category/madhya-pradesh/kisan-khabar-20/"
    g.page(aurl, "article", art("m20", dt, h4=False), host)
    g.page(f"{base}/category/madhya-pradesh/page/2/", "list",
           lst([(aurl, dt)], f"{base}/category/madhya-pradesh/page/3/"), host)
    # rashtriya: single fresh page, empty previous li (reference's
    # select_one None guard → no next)
    dt = BASE_DT - timedelta(hours=2)
    aurl = f"{base}/category/rashtriya/desh-khabar-0/"
    g.page(aurl, "article", art("r0", dt, h4=True), host)
    g.page(f"{base}/category/rashtriya/", "list", lst([(aurl, dt)], None), host)


MEDIAKHABAR_RULES = {
    # mediakhabar.py: three-level header menu over ONE shared meta dict
    # per top item (py:30-45) — category2 mutated per child, so parent,
    # children AND grandchildren all read the LAST child's label
    # (children_shared_meta; the nested 'ul>li>a' child combinators match
    # the grandchildren too, in document order); list rows carry
    # title/image/ISO-stamp meta with a per-entry break gate (py:50-61);
    # '.current ~ a' sibling pagination behind try/except (py:62-67);
    # the article contributes abstract/body paragraphs only (py:74-78).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "isoT",
    "extract": {
        "category": {"sel": "#td-header-menu ul > li", "link_sel": "a",
                     "skip": 1, "children_sel": "ul > li > a",
                     "children_shared_meta": True},
        "entry": {"sel": ".td-block-span6",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "title": {"sel": "a", "attr": "title"},
                             "img": {"sel": "a img", "attr": "src"},
                             "time": {"sel": ".td-post-date time",
                                      "attr": "datetime"}}},
        "next": {"sel": ".current ~ a", "attr": "href"},
        "abstract": {"sel": ".td-post-content > p"},
        "block": {"para_sel": ".td-post-content > p"},
    },
}


def _build_mediakhabar(g: _G) -> None:
    host, base = "mediakhabar.com", "http://mediakhabar.com"
    wid = 1062
    g.registry[wid] = dict(MEDIAKHABAR_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    # nested ul INSIDE the anchors (html.parser literal nesting, the
    # legendnews shape); the media top item has two children, the last
    # childless so the shared label is a CHILD, not a grandchild
    g.page(base + "/", "menu",
           f'<html><div id="td-header-menu"><ul>'
           f'<li><a href="{base}/home/">होम</a></li>'  # [1:] skips it
           f'<li><a href="{base}/media/">मीडिया'
           f'<ul><li><a href="{base}/tv/">टीवी'
           f'<ul><li><a href="{base}/tv/anchor/">एंकर</a></li></ul>'
           f'</a></li>'
           f'<li><a href="{base}/print/">प्रिंट</a></li></ul>'
           f"</a></li>"
           f'<li><a href="{base}/vichar/">विचार</a></li>'
           f"</ul></div></html>", host)

    def art(tag: str) -> str:
        return (f'<html><div class="td-post-content">'
                f"<p>mk पहला {tag}।</p><p>mk दूसरा।</p></div></html>")

    def lst(tag: str, rows: list[tuple[str, datetime]],
            nxt: str | None) -> str:
        blocks = "".join(
            f'<div class="td-block-span6">'
            f'<a href="{u}" title="MK {tag}{e}">'
            f'<img src="{base}/i/{tag}{e}.jpg"></a>'
            f'<div class="td-post-date">'
            f'<time datetime="{_iso_tz(dt)}">x</time></div></div>'
            for e, (u, dt) in enumerate(rows)
        )
        nav = (f'<div><span class="current">1</span>'
               f'<a href="{nxt}">2</a></div>' if nxt else "")
        return f"<html>{blocks}{nav}</html>"

    # media: page 1 fresh → page 2 first-row stale → break, no page 3
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 7)
        aurl = f"{base}/media-khabar-1{e}/"
        g.page(aurl, "article", art(f"md1{e}"), host)
        r1.append((aurl, dt))
    g.page(base + "/media/", "list",
           lst("md", r1, f"{base}/media/page/2/"), host)
    dt = BASE_DT - timedelta(hours=85)
    aurl = f"{base}/media-khabar-20/"
    g.page(aurl, "article", art("md20"), host)
    g.page(base + "/media/page/2/", "list",
           lst("md2", [(aurl, dt)], None), host)
    # the three sub-sections + the childless top item: one page each
    for cslug, tag in (("tv", "tv"), ("tv/anchor", "an"),
                       ("print", "pr"), ("vichar", "vc")):
        dt = BASE_DT - timedelta(hours=3)
        aurl = f"{base}/{tag}-khabar-0/"
        g.page(aurl, "article", art(f"{tag}0"), host)
        g.page(f"{base}/{cslug}/", "list",
               lst(tag, [(aurl, dt)], None), host)


NAYALOOK_RULES = {
    # nayalook.py: menu links filtered by a SKIP regex (two-segment
    # /category/x/y/ dropped, py:59-60), '#' hrefs and the
    # e-paper/studio slugs excluded (py:62); entries ungated off
    # #posts-container (py:70-74); the page gate reads the last
    # .post-meta date in 'D/M/YYYY' OR fuzzy-ago through the try/except
    # pair (py:12-32,77-82); .pages-nav chains (py:75-76); breadcrumb
    # categories with the two-level case only at exactly three links
    # (py:94-95), dual-format byline (py:97-102), figure images
    # (py:103-107).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "dmy_slash_fuzzy",
    "cat2_meta_off": True,
    "extract": {
        "category": {
            "sel": ".container #main-nav-menu ul li a",
            "href_skip_re":
                r"https://www\.nayalook\.com/category/+\S+/+\S+/",
            "exclude_hrefs": ["#"],
        },
        "excluded_slugs": ["e-paper", "studio"],
        "entry": {"sel": ".container-wrapper ul#posts-container li",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".post-details .post-meta.clearfix"
                             " .date.meta-item.tie-icon", "index": -1},
        "next": {"sel": ".pages-nav div span a", "attr": "href"},
        "title": {"sel": ".entry-header h1"},
        "pub": {"sel": ".entry-header #single-post-meta"
                       " .date.meta-item.tie-icon"},
        "cat1": {"sel": "nav#breadcrumb a", "index": 1},
        "cat2": {"if_count": {"sel": "nav#breadcrumb a", "eq": 3},
                 "then": {"sel": "nav#breadcrumb a", "index": 2},
                 "else": {"const": None}},
        "block": {"para_sel": ".entry-content.entry.clearfix p",
                  "img_sel": ".featured-area figure img"},
    },
}


def _build_nayalook(g: _G) -> None:
    host, base = "www.nayalook.com", "https://www.nayalook.com"
    wid = 934
    g.registry[wid] = dict(NAYALOOK_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div class="container"><nav id="main-nav-menu"><ul>'
           f'<li><a href="#">मेनू</a></li>'
           f'<li><a href="{base}/category/desh/">देश</a></li>'
           f'<li><a href="{base}/category/desh/mp/">मप्र</a></li>'
           f'<li><a href="{base}/e-paper/">ई-पेपर</a></li>'
           f'<li><a href="{base}/category/khel/">खेल</a></li>'
           f"</ul></nav></div></html>", host)

    def art(tag: str, byline: str, crumbs: int) -> str:
        links = "".join(f'<a href="#">c{i}</a>' for i in range(crumbs))
        return (f'<html><nav id="breadcrumb">{links}</nav>'
                f'<div class="entry-header"><h1>NL {tag}</h1>'
                f'<div id="single-post-meta">'
                f'<span class="date meta-item tie-icon">{byline}</span>'
                f"</div></div>"
                f'<div class="featured-area"><figure>'
                f'<img src="{base}/i/{tag}.jpg"></figure></div>'
                f'<div class="entry-content entry clearfix">'
                f"<p>nl पहला {tag}।</p><p>nl दूसरा।</p></div></html>")

    def lst(rows: list[str], stamps: list[str],
            nxt: str | None) -> str:
        items = "".join(f'<li><a href="{u}">t</a></li>' for u in rows)
        metas = "".join(
            f'<div class="post-details">'
            f'<div class="post-meta clearfix">'
            f'<span class="date meta-item tie-icon">{s}</span>'
            f"</div></div>" for s in stamps
        )
        nav = (f'<div class="pages-nav"><div><span>'
               f'<a href="{nxt}">»</a></span></div></div>' if nxt else "")
        return (f'<html><div class="container-wrapper">'
                f'<ul id="posts-container">{items}</ul></div>'
                f"{metas}{nav}</html>")

    # desh: page 1's last stamp is RELATIVE ('2 days ago', the fuzzy
    # fallback branch) and fresh → page 2 in D/M/YYYY, stale → stop
    r1 = [f"{base}/desh-khabar-1{e}/" for e in range(2)]
    g.page(r1[0], "article",
           art("d10", f"{BASE_DT.day:02d}/{BASE_DT.month:02d}"
               f"/{BASE_DT.year}", crumbs=3), host)
    g.page(r1[1], "article", art("d11", "2 days ago", crumbs=2), host)
    g.page(f"{base}/category/desh/", "list",
           lst(r1, ["30/05/2021", "2 days ago"],
               f"{base}/category/desh/page/2/"), host)
    r2 = [f"{base}/desh-khabar-20/"]
    g.page(r2[0], "article", art("d20", "25/05/2021", crumbs=3), host)
    g.page(f"{base}/category/desh/page/2/", "list",
           lst(r2, ["25/05/2021"], f"{base}/category/desh/page/3/"),
           host)
    # khel: single fresh page without nav
    rk = [f"{base}/khel-khabar-0/"]
    g.page(rk[0], "article", art("k0", "29/05/2021", crumbs=3), host)
    g.page(f"{base}/category/khel/", "list",
           lst(rk, ["29/05/2021"], None), host)


NEWSWING_RULES = {
    # newswing.py: programmatic seed — start_requests mines the header
    # menu off a raw requests.get homepage, keeping only /category/
    # links, with category2 hardcoded to the EMPTY STRING (py:28-34 —
    # label2_const; the home fetch is the batch-0 menu, the shangbao
    # simplification); list rows gate per-entry on a 'D/M/YYYY' stamp
    # with break, the stamp riding into meta BEFORE the gate decides
    # (py:39-48); .pages-nav chains behind try/except (py:49-55); the
    # article takes body/abstract from the featured-area's sibling div
    # (py:66-71) and single-featured images (py:65).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "dmy_slash",
    "extract": {
        "category": {"sel": "#menu-main-navigation > li a",
                     "href_re": r"^https://newswing\.com/category/",
                     "label2_const": ""},
        "entry": {"sel": ".post-details",
                  "fields": {"href": {"sel": ".post-title a",
                                      "attr": "href"},
                             "time": {"sel": ".date.meta-item.tie-icon"}}},
        "next": {"sel": "div.pages-nav a", "attr": "href"},
        "title": {"sel": "div.entry-header > h1"},
        "block": {"para_sel": "div.featured-area ~ div p",
                  "img_sel": "figure.single-featured-image img"},
    },
}


def _build_newswing(g: _G) -> None:
    host, base = "newswing.com", "https://newswing.com"
    wid = 1047
    g.registry[wid] = dict(NEWSWING_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-main-navigation">'
           f'<li><a href="{base}/">होम</a></li>'  # not /category/ → dropped
           f'<li><a href="{base}/category/jharkhand/">झारखंड</a></li>'
           f'<li><a href="{base}/category/desh/">देश</a></li>'
           f"</ul></html>", host)

    def art(tag: str) -> str:
        return (f'<html><div class="entry-header"><h1>NW {tag}</h1></div>'
                f'<figure class="single-featured-image">'
                f'<img src="{base}/i/{tag}.jpg"></figure>'
                f'<div class="featured-area">x</div>'
                f"<div><p>nw पहला {tag}।</p><p>nw दूसरा।</p></div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        blocks = "".join(
            f'<div class="post-details">'
            f'<span class="date meta-item tie-icon">'
            f"{dt.day:02d}/{dt.month:02d}/{dt.year}</span>"
            f'<div class="post-title"><a href="{u}">t</a></div></div>'
            for u, dt in rows
        )
        nav = (f'<div class="pages-nav"><a href="{nxt}">अगला</a></div>'
               if nxt else "")
        return f"<html>{blocks}{nav}</html>"

    # jharkhand: page 1 fresh → page 2 stale first row → break
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 10)
        aurl = f"{base}/jharkhand-khabar-1{e}/"
        g.page(aurl, "article", art(f"j1{e}"), host)
        r1.append((aurl, dt))
    g.page(base + "/category/jharkhand/", "list",
           lst(r1, f"{base}/category/jharkhand/page/2/"), host)
    dt = BASE_DT - timedelta(hours=90)
    aurl = f"{base}/jharkhand-khabar-20/"
    g.page(aurl, "article", art("j20"), host)
    g.page(base + "/category/jharkhand/page/2/", "list",
           lst([(aurl, dt)], None), host)
    # desh: single fresh page, no nav (the bare except path)
    dt = BASE_DT - timedelta(hours=4)
    aurl = f"{base}/desh-khabar-0/"
    g.page(aurl, "article", art("d0"), host)
    g.page(base + "/category/desh/", "list", lst([(aurl, dt)], None),
           host)


NHANDAN_RULES = {
    # nhandan.py: topnav menu with '#' links skipped and a fixed host
    # prefix (py:44-47); TWO entry groups per list page (py:51-53);
    # the page gate reads the last text-muted stamp in CJK
    # 'YYYY年MM月DD日 weekday' (py:11-15,55); ul.pager li.next chains
    # (py:54); the article reads a 'date, HH:MM:SS' byline (py:17-21,69),
    # takes the FIRST .ndcontent as abstract and ALL of them as body
    # (py:68,70-73), the breadcrumb's LAST li as category1 (py:74), and
    # host-prefixed .nd_img images (py:76-78).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "cjk_ymd",
    "article_pub_style": "cjk_ymd_hms",
    "page_time_style": "cjk_ymd",
    "cat2_meta_off": True,
    "extract": {
        "category": {"sel": ".nd_header_menu #topnav .nav.navbar-nav"
                            " li a",
                     "exclude_hrefs": ["#"],
                     "href_prefix": "https://cn.nhandan.com.vn"},
        "entry": [
            {"sel": ".row .col-sm-8.col-xs-12 div.media h4 .pull-left"},
            {"sel": ".row .col-sm-12.col-xs-12 .col-sm-12.col-xs-12"
                    " .media-body h3 a"},
        ],
        "page_time": {"sel": ".row .col-sm-12.col-xs-12"
                             " .col-sm-12.col-xs-12 h5 .text-muted",
                      "index": -1},
        "next": {"sel": "ul.pager li.next a", "attr": "href"},
        "title": {"sel": ".row .media .fontM.ndtitle h3"},
        "pub": {"sel": ".icon_date_top .pull-left"},
        "cat1": {"sel": ".row ul.breadcrumb li", "index": -1},
        "abstract": {"sel": ".row .media .ndcontent"},
        "block": {"para_sel": ".row .media .ndcontent",
                  "img_sel": ".media .nd_img",
                  "img_prefix": "https://cn.nhandan.com.vn/"},
    },
}


def _build_nhandan(g: _G) -> None:
    host, base = "cn.nhandan.com.vn", "https://cn.nhandan.com.vn"
    wid = 1249
    g.registry[wid] = dict(NHANDAN_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1813})
    g.page(base + "/", "menu",
           f'<html><div class="nd_header_menu"><nav id="topnav">'
           f'<ul class="nav navbar-nav">'
           f'<li><a href="#">首页</a></li>'
           f'<li><a href="/politics/">政治</a></li>'
           f'<li><a href="/economy/">经济</a></li>'
           f"</ul></nav></div></html>", host)

    def _cd(dt: datetime) -> str:
        return f"{dt.year}年{dt.month:02d}月{dt.day:02d}日 星期日"

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="row"><div class="media">'
                f'<div class="fontM ndtitle"><h3>ND {tag}</h3></div>'
                f'<div class="icon_date_top"><span class="pull-left">'
                f"{_cd(dt)}, {dt:%H:%M:%S}</span></div>"
                f'<img class="nd_img" src="i/{tag}.jpg">'
                f'<div class="ndcontent">nd 第一段 {tag}。</div>'
                f'<div class="ndcontent">nd 第二段。</div>'
                f"</div>"
                f'<ul class="breadcrumb"><li>首页</li><li>政治</li></ul>'
                f"</div></html>")

    def lst(rows: list[str], extra: str | None,
            stamps: list[datetime], nxt: str | None) -> str:
        grp1 = "".join(
            f'<div class="col-sm-8 col-xs-12"><div class="media"><h4>'
            f'<a class="pull-left" href="{u}">t</a></h4></div></div>'
            for u in rows
        )
        grp2 = (f'<div class="col-sm-12 col-xs-12">'
                f'<div class="col-sm-12 col-xs-12">'
                f'<div class="media-body"><h3><a href="{extra}">t</a>'
                f"</h3></div>"
                + "".join(f'<h5><span class="text-muted">{_cd(s)}</span>'
                          "</h5>" for s in stamps)
                + "</div></div>") if extra else (
            '<div class="col-sm-12 col-xs-12">'
            '<div class="col-sm-12 col-xs-12">'
            + "".join(f'<h5><span class="text-muted">{_cd(s)}</span>'
                      "</h5>" for s in stamps)
            + "</div></div>")
        nav = (f'<ul class="pager"><li class="next"><a href="{nxt}">'
               f"下一页</a></li></ul>" if nxt else "")
        return f'<html><div class="row">{grp1}{grp2}{nav}</div></html>'

    # politics: both entry groups on page 1, fresh tail → page 2 stale →
    # stop (page 2's rows still stored — entries ungated)
    r1 = [f"/politics-story-1{e}" for e in range(2)]
    for e, u in enumerate(r1):
        g.page(base + u, "article",
               art(f"p1{e}", BASE_DT - timedelta(hours=e * 5)), host)
    g.page(base + "/politics-extra-0", "article",
           art("px0", BASE_DT - timedelta(hours=1)), host)
    g.page(base + "/politics/", "list",
           lst(r1, "/politics-extra-0",
               [BASE_DT, BASE_DT - timedelta(hours=12)],
               "/politics/page/2/"), host)
    r2 = ["/politics-story-20"]
    g.page(base + r2[0], "article",
           art("p20", BASE_DT - timedelta(hours=70)), host)
    g.page(base + "/politics/page/2/", "list",
           lst(r2, None, [BASE_DT - timedelta(hours=70)],
               "/politics/page/3/"), host)
    # economy: one fresh row, missing pager (reference crash → chain end)
    g.page(base + "/economy-story-0", "article", art("e0", BASE_DT),
           host)
    g.page(base + "/economy/", "list",
           lst(["/economy-story-0"], None, [BASE_DT], None), host)


PINOYTECH_RULES = {
    # pinoytechblog.py: flat menu with category2 hardcoded '' (py:31-38);
    # grid entries yielded ungated (py:42-45); the page gate is the
    # page's FIRST entry-date through format_time2 (py:48-50), pagination
    # only while a.next.page-numbers exists (py:53-58); the article
    # re-reads title/pub and takes body/abstract/images from one
    # container (py:65-92).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "extract": {
        "category": {"sel": "#menu-main-1 > li > a", "label2_const": ""},
        "entry": {"sel": "h2.entry-title.grid-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": "time.entry-date.published"},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.post-title.single-post-title.entry-title"},
        "pub": {"sel": "time.entry-date.published"},
        "block": {"para_sel": ".inner-post-entry.entry-content p",
                  "img_sel": ".inner-post-entry.entry-content img"},
    },
}


def _build_pinoytechblog(g: _G) -> None:
    host, base = "www.pinoytechblog.com", "https://www.pinoytechblog.com"
    wid = 1245
    g.registry[wid] = dict(PINOYTECH_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><ul id="menu-main-1">'
           f'<li><a href="{base}/gadgets/">Gadgets</a></li>'
           f'<li><a href="{base}/telcos/">Telcos</a></li>'
           f"</ul></html>", host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="post-title single-post-title '
                f'entry-title">PT {tag}</h1>'
                f'<time class="entry-date published">{_fz(dt)}</time>'
                f'<div class="inner-post-entry entry-content">'
                f"<p>pt first {tag}.</p><p>pt second.</p>"
                f'<img src="{base}/i/{tag}.jpg"></div></html>')

    def lst(rows: list[str], page_dt: datetime,
            nxt: str | None) -> str:
        grid = "".join(
            f'<h2 class="entry-title grid-title"><a href="{u}">t</a></h2>'
            for u in rows
        )
        nav = (f'<a class="next page-numbers" href="{nxt}">»</a>'
               if nxt else "")
        return (f'<html><time class="entry-date published">'
                f"{_fz(page_dt)}</time>{grid}{nav}</html>")

    # gadgets: page 1's first stamp fresh → page 2 stale-stamped with a
    # next link present but never followed (rows still stored — ungated)
    r1 = [f"{base}/gadgets-post-1{e}/" for e in range(2)]
    for e, u in enumerate(r1):
        g.page(u, "article",
               art(f"g1{e}", BASE_DT - timedelta(hours=e * 9)), host)
    g.page(base + "/gadgets/", "list",
           lst(r1, BASE_DT, f"{base}/gadgets/page/2/"), host)
    r2 = [f"{base}/gadgets-post-20/"]
    g.page(r2[0], "article",
           art("g20", BASE_DT - timedelta(hours=80)), host)
    g.page(base + "/gadgets/page/2/", "list",
           lst(r2, BASE_DT - timedelta(hours=80),
               f"{base}/gadgets/page/3/"), host)
    # telcos: fresh single page, no next anchor
    rt = [f"{base}/telcos-post-0/"]
    g.page(rt[0], "article", art("t0", BASE_DT), host)
    g.page(base + "/telcos/", "list", lst(rt, BASE_DT, None), host)


PNA_RULES = {
    # pna.py: sibling menu [4:] with the category LABEL taken from the
    # href's last path segment (py:29-33); media-body rows gate
    # per-entry on a fuzzy .date with break (py:45-53); pagination takes
    # the page-nav's SECOND-TO-LAST anchor (py:55); the article byline
    # 'Published MonthFull D, YYYY, H:MM AM/PM' is rebuilt from fixed
    # tokens with PM adding 12 unconditionally (py:66-78); page-content
    # images and paragraphs (py:80-89); category2 None (py:61).
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",
    "article_pub_priority": "page",
    "article_pub_style": "pna_pub",
    "cat2_meta_off": True,
    "extract": {
        "category": {"sel": "li.active ~ li a", "skip": 4,
                     "label_from_href": "last_segment",
                     "href_prefix": "https://www.pna.gov.ph"},
        "entry": {"sel": ".media-body",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": ".date"}}},
        "next": {"sel": ".pagination a", "index": -2, "attr": "href"},
        "title": {"sel": "div.page-header h1"},
        "pub": {"sel": "span.date"},
        "block": {"para_sel": "div.page-content > p",
                  "img_sel": "div.page-content img"},
    },
}


def _build_pna(g: _G) -> None:
    host, base = "www.pna.gov.ph", "https://www.pna.gov.ph"
    wid = 179
    g.registry[wid] = dict(PNA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    links = "".join(
        f'<li><a href="/categories/{s}">{s.title()}</a></li>'
        for s in ("about", "contact", "ads", "help",  # [4:] slices these
                  "national", "provincial")
    )
    g.page(base + "/", "menu",
           f'<html><ul><li class="active"><a href="/">Home</a></li>'
           f"{links}</ul></html>", host)

    def _fz(dt: datetime) -> str:
        return (f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}, "
                f"{dt.hour % 12 or 12}:{dt.minute:02d} "
                f"{'PM' if dt.hour >= 12 else 'AM'}")

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="page-header"><h1>PNA {tag}</h1>'
                f"</div>"
                f'<span class="date">Published {_fz(dt)}</span>'
                f'<div class="page-content">'
                f'<img src="{base}/i/{tag}.jpg">'
                f"<p>pna first {tag}.</p><p>pna second.</p></div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str,
            back: str) -> str:
        media = "".join(
            f'<div class="media-body"><a href="{u}">t</a>'
            f'<span class="date">{_fz(dt)}</span></div>'
            for u, dt in rows
        )
        # on a last page the [-2] anchor points BACK at an already-seen
        # page — the reference's fetch dies in the dupefilter
        nav = (f'<ul class="pagination"><li><a href="{back}">1</a></li>'
               f'<li><a href="{nxt}">2</a></li>'
               f'<li><a href="{back}">»»</a></li></ul>')
        return f"<html>{media}{nav}</html>"

    # national: page 1 fresh → [-2] anchor → page 2's second row stale →
    # break (page 2's own [-2] points back at page 1 — the dupefilter
    # would end the chain even without the gate)
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 4)
        aurl = f"/national-story-1{e}"
        g.page(base + aurl, "article", art(f"n1{e}", dt), host)
        r1.append((aurl, dt))
    g.page(base + "/categories/national", "list",
           lst(r1, "/categories/national?p=2", "/categories/national"),
           host)
    r2 = []
    for e, age in enumerate((20.0, 85.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"/national-story-2{e}"
        g.page(base + aurl, "article", art(f"n2{e}", dt), host)
        r2.append((aurl, dt))
    g.page(base + "/categories/national?p=2", "list",
           lst(r2, "/categories/national?p=3", "/categories/national"),
           host)
    # provincial: single fresh page; its [-2] anchor points back at page
    # 1 (the already-seen page 2 slot) — dupefilter ends the chain
    dt = BASE_DT - timedelta(hours=2)
    g.page(base + "/provincial-story-0", "article", art("p0", dt), host)
    g.page(base + "/categories/provincial", "list",
           lst([("/provincial-story-0", dt)], "/categories/provincial",
               "/categories/provincial"), host)


PRAVAKTA_RULES = {
    # pravakta.py: sub-menu links scheduled BEFORE category1 exists
    # (py:37-46 — an explicit label:None group; the shared-item race
    # collapsed to per-request lineage, the divyahimachal convention)
    # with category2 = the link text's comma prefix (py:44) and the LAST
    # sub-menu (about-us) skipped (py:40-41); top links [1:-1] minus '#'
    # (py:50-58), the /news/ hub routed to a category-menu hop whose
    # links[2:-1] stamp category2 (py:59-66); lists gate page-level on
    # the last article stamp (py:77-82); article body appends a
    # wp-block-code tail and the abstract is the first danda segment
    # (py:95-101); single lazy-load figure image (py:94).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "abstract_split": {"sep": "।", "take": 1},
    "menu_child_kind_re": [
        {"match": r"https://www\.pravakta\.com/news/$", "kind": "menu2"},
    ],
    "extract": {
        "category": [
            # the about-us sub-menu renders LAST; its single link is the
            # [0,-1] slice's tail (the reference keys on sub_ul[-1])
            {"sel": "ul.sub-menu li > a", "slice": [0, -1],
             "label": None, "label_re": r"([^,]*)"},
            {"sel": "ul.menu > li > a", "slice": [1, -1],
             "exclude_hrefs": ["#"]},
        ],
        "category2": {"sel": "ul.menu li > a", "slice": [2, -1]},
        "entry": {"sel": ".data-bg-hover.data-bg.data-bg-categorised",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": "article span.item-metadata.posts-date",
                      "index": -1},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "span.item-metadata.posts-date"},
        "block": {"para_sel": [".entry-content p",
                               ".entry-content pre.wp-block-code"],
                  "img_sel": ".entry-content figure.wp-block-image"
                             ".size-large img",
                  "img_attr": "data-src"},
    },
}


def _build_pravakta(g: _G) -> None:
    host, base = "www.pravakta.com", "https://www.pravakta.com"
    wid = 1076
    g.registry[wid] = dict(PRAVAKTA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f"<html>"
           f'<ul class="menu">'
           f'<li><a href="{base}/">होम</a></li>'
           f'<li><a href="{base}/news/">समाचार</a></li>'
           f'<li><a href="#">ड्रॉपडाउन</a></li>'
           f'<li><a href="{base}/vichar/">विचार</a></li>'
           f'<li><a href="{base}/video/">वीडियो</a></li>'  # [1:-1] tail
           f"</ul>"
           f'<ul class="sub-menu">'
           f'<li><a href="{base}/dharm/">धर्म, संस्कृति</a></li></ul>'
           f'<ul class="sub-menu">'
           f'<li><a href="{base}/about/">हमारे बारे में</a></li></ul>'
           f"</html>", host)
    # the /news/ hub re-renders the top menu; [2:-1] are its sections
    g.page(base + "/news/", "menu2",
           f'<html><ul class="menu">'
           f'<li><a href="{base}/">होम</a></li>'
           f'<li><a href="{base}/news/">समाचार</a></li>'
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/videsh/">विदेश</a></li>'
           f'<li><a href="{base}/video/">वीडियो</a></li>'
           f"</ul></html>", host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime, code: bool = False) -> str:
        tail = ('<pre class="wp-block-code">pv कोड अंश</pre>'
                if code else "")
        return (f'<html><h1 class="entry-title">PV {tag}</h1>'
                f'<span class="item-metadata posts-date">{_fz(dt)}'
                f"</span>"
                f'<div class="entry-content">'
                f'<figure class="wp-block-image size-large">'
                f'<img data-src="{base}/i/{tag}.jpg"></figure>'
                f"<p>pv पहला {tag}। pv शेष।</p>{tail}</div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        divs = "".join(
            f'<div class="data-bg-hover data-bg data-bg-categorised">'
            f'<a href="{u}">t</a></div>'
            f'<article><span class="item-metadata posts-date">{_fz(dt)}'
            f"</span></article>"
            for u, dt in rows
        )
        nav = (f'<a class="next page-numbers" href="{nxt}">»</a>'
               if nxt else "")
        return f"<html>{divs}{nav}</html>"

    # dharm (sub-menu lineage, category1 None): fresh single page
    dt = BASE_DT - timedelta(hours=1)
    g.page(f"{base}/dharm-katha-0/", "article",
           art("dh0", dt, code=True), host)
    g.page(f"{base}/dharm/", "list",
           lst([(f"{base}/dharm-katha-0/", dt)], None), host)
    # desh (news section): page 1 fresh → page 2 stale tail → stop
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        aurl = f"{base}/desh-khabar-1{e}/"
        g.page(aurl, "article", art(f"de1{e}", dt), host)
        r1.append((aurl, dt))
    g.page(f"{base}/desh/", "list",
           lst(r1, f"{base}/desh/page/2/"), host)
    dt = BASE_DT - timedelta(hours=82)
    aurl = f"{base}/desh-khabar-20/"
    g.page(aurl, "article", art("de20", dt), host)
    g.page(f"{base}/desh/page/2/", "list", lst([(aurl, dt)], None),
           host)
    # videsh (news section) + vichar (top link): single fresh pages
    for cslug, tag in (("videsh", "vi"), ("vichar", "vc")):
        dt = BASE_DT - timedelta(hours=3)
        aurl = f"{base}/{cslug}-khabar-0/"
        g.page(aurl, "article", art(f"{tag}0", dt), host)
        g.page(f"{base}/{cslug}/", "list", lst([(aurl, dt)], None),
               host)


PRESSNOTE_RULES = {
    # pressnote.py: #mainmenu categories (py:30-35); EVERY entry of a
    # page inherits the page's ONE .post-info stamp (re-ordered
    # 'Mon D Y', py:41-42) and its .post-content text as the title
    # (py:43 — page_entry_title); per-entry break gate; the next URL is
    # mined out of the last NavigationButton's onclick and bolted onto a
    # FIXED host when relative (py:53-61); #DivContents body/abstract/
    # images (py:70-75).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "dmy_sp",
    "extract": {
        "category": {"sel": "#mainmenu a"},
        "entry": {"sel": ".fbt-col-lg-12.col-md-4.col-xs-6"
                         ".padding-reset",
                  "fields": {"href": {"sel": ".post-content a",
                                      "attr": "href"}}},
        "page_entry_time": {"sel": ".post-info"},
        "page_entry_title": {"sel": ".post-content"},
        "next": {"if_count": {"sel": '.NavigationButton[value="Next"]',
                              "ge": 1},
                 "then": {"sel": '.NavigationButton[value="Next"]',
                          "index": -1, "attr": "onclick",
                          "re": r"window\.location='(.*)'"},
                 "else": {"const": None}},
        "next_rel_prefix": "https://www.pressnote.in/",
        "abstract": {"sel": "#DivContents p"},
        "block": {"para_sel": "#DivContents p",
                  "img_sel": "#DivContents img"},
    },
}


def _build_pressnote(g: _G) -> None:
    host, base = "pressnote.in", "http://pressnote.in"
    wid = 1045
    g.registry[wid] = dict(PRESSNOTE_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div id="mainmenu">'
           f'<a href="{base}/rajasthan.php">राजस्थान</a>'
           f'<a href="{base}/desh.php">देश</a>'
           f"</div></html>", host)

    def _pd(dt: datetime) -> str:
        return f"{dt.day} {_MON_ABBR[dt.month - 1]} {dt.year}"

    def art(tag: str) -> str:
        return (f'<html><div id="DivContents">'
                f"<p>pn पहला {tag}।</p><p>pn दूसरा।</p>"
                f'<img src="{base}/i/{tag}.jpg"></div></html>')

    def lst(rows: list[str], stamp: datetime, nxt: str | None,
            nxt_abs: bool = False) -> str:
        blocks = "".join(
            f'<div class="fbt-col-lg-12 col-md-4 col-xs-6 '
            f'padding-reset"><div class="post-content">'
            f'<a href="{u}">t</a></div></div>' for u in rows
        )
        first = (f'<div class="post-info">{_pd(stamp)}</div>'
                 f'<div class="post-content">शीर्षक '
                 f"{rows[0].rsplit('/', 1)[-1]}</div>")
        if nxt:
            loc = nxt if nxt_abs else nxt.lstrip("/")
            nav = (f'<input class="NavigationButton" value="Next" '
                   f"onclick=\"window.location='{loc}';\">")
        else:
            nav = ('<input class="NavigationButton" value="First" '
                   "onclick=\"window.location='x.php';\">")
        return f"<html>{first}{blocks}{nav}</html>"

    # rajasthan: RELATIVE onclick → the fixed-www prefix (page 2 lives on
    # the www host); page 2 ABSOLUTE onclick back… but stale → stop
    r1 = [f"{base}/rajasthan-khabar-1{e}.php" for e in range(2)]
    for u in r1:
        g.page(u, "article", art(u.rsplit("/", 1)[-1][:-4]), host)
    g.page(base + "/rajasthan.php", "list",
           lst(r1, BASE_DT, "rajasthan-p2.php"), host)
    r2 = [f"{base}/rajasthan-khabar-20.php"]
    g.page(r2[0], "article", art("rajasthan-khabar-20"), host)
    g.page("https://www.pressnote.in/rajasthan-p2.php", "list",
           lst(r2, BASE_DT - timedelta(hours=80),
               f"{base}/rajasthan-p3.php", nxt_abs=True),
           "www.pressnote.in")
    # desh: fresh single page whose last button reads 'First' → no next
    rd = [f"{base}/desh-khabar-0.php"]
    g.page(rd[0], "article", art("desh-khabar-0"), host)
    g.page(base + "/desh.php", "list", lst(rd, BASE_DT, None), host)


SACHKAUJALA_RULES = {
    # sachkaujala.py: menu a[1:-1] with category2 hardcoded '' (py:32-37);
    # TWO entry groups — herald-section thumbnails and herald-posts h2
    # links (py:43-53); the page gate reads the posts grid's LAST
    # .updated fuzzily, a missing grid defaulting to the epoch (py:55);
    # pagination follows the anchor READING 'Older Entries' (py:60);
    # article body = entry-content p/h3 runs else its div walk sliced
    # [1:-1] (py:82-87), abstract = first danda segment (py:88),
    # data:-URI thumbnails skipped (py:77-80).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "abstract_split": {"sep": "।", "take": 1},
    "extract": {
        "category": {"sel": "ul.menu a", "slice": [1, -1],
                     "label2_const": ""},
        "entry": [
            {"sel": ".herald-section.container.herald-no-sid"
                    " a.fa-post-thumbnail"},
            {"sel": ".row.row-eq-height.herald-posts h2",
             "fields": {"href": {"sel": "a", "attr": "href"}}},
        ],
        "page_time": {"sel": ".row.row-eq-height.herald-posts"
                             " span.updated", "index": -1},
        "next": {"sel": "a", "text_eq": "Older Entries", "attr": "href"},
        "title": {"sel": "h1.entry-title.h1"},
        "pub": {"sel": "header.entry-header span.updated"},
        "block": {"para_sel": [".entry-content.herald-entry-content p",
                               ".entry-content.herald-entry-content h3"],
                  "para_sel_fallback":
                      ".entry-content.herald-entry-content div",
                  "para_fallback_slice": [1, -1],
                  "img_sel": ".herald-post-thumbnail"
                             ".herald-post-thumbnail-single img",
                  "img_skip_re": r"^data:"},
    },
}


def _build_sachkaujala(g: _G) -> None:
    host, base = "sachkaujala.com", "https://sachkaujala.com"
    wid = 1124
    g.registry[wid] = dict(SACHKAUJALA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul class="menu">'
           f'<li><a href="{base}/">होम</a></li>'
           f'<li><a href="{base}/punjab/">पंजाब</a></li>'
           f'<li><a href="{base}/desh/">देश</a></li>'
           f'<li><a href="{base}/epaper/">ई-पेपर</a></li>'  # [1:-1] tail
           f"</ul></html>", host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime, div_fb: bool = False) -> str:
        body = (('<div class="entry-content herald-entry-content">'
                 "<div>wrapper</div><div>sk घोषणा {t}। sk विवरण।</div>"
                 "<div></div></div>").format(t=tag) if div_fb else
                (f'<div class="entry-content herald-entry-content">'
                 f"<p>sk पहला {tag}। sk शेष।</p><h3>sk उपशीर्षक।</h3>"
                 f"</div>"))
        return (f'<html><header class="entry-header">'
                f'<h1 class="entry-title h1">SK {tag}</h1>'
                f'<span class="updated">{_fz(dt)}</span></header>'
                f'<div class="herald-post-thumbnail '
                f'herald-post-thumbnail-single">'
                f'<img src="data:image/gif;base64,x">'
                f'<img src="{base}/i/{tag}.jpg"></div>'
                f"{body}</html>")

    def lst(top: list[str], rows: list[tuple[str, datetime]],
            nxt: str | None) -> str:
        thumbs = "".join(
            f'<a class="fa-post-thumbnail" href="{u}">t</a>' for u in top
        )
        posts = "".join(
            f'<h2><a href="{u}">t</a></h2>'
            f'<span class="updated">{_fz(dt)}</span>'
            for u, dt in rows
        )
        nav = f'<a href="{nxt}">Older Entries</a>' if nxt else ""
        return (f'<html><div class="herald-section container '
                f'herald-no-sid">{thumbs}</div>'
                f'<div class="row row-eq-height herald-posts">{posts}'
                f"</div>{nav}</html>")

    # punjab: thumb group + grid group on page 1, fresh tail → page 2
    # stale tail → stop (rows stored — ungated)
    t1 = [f"{base}/punjab-top-0/"]
    g.page(t1[0], "article",
           art("pt0", BASE_DT, div_fb=True), host)
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 5)
        aurl = f"{base}/punjab-khabar-1{e}/"
        g.page(aurl, "article", art(f"pk1{e}", dt), host)
        r1.append((aurl, dt))
    g.page(f"{base}/punjab/", "list",
           lst(t1, r1, f"{base}/punjab/page/2/"), host)
    dt = BASE_DT - timedelta(hours=78)
    aurl = f"{base}/punjab-khabar-20/"
    g.page(aurl, "article", art("pk20", dt), host)
    g.page(f"{base}/punjab/page/2/", "list",
           lst([], [(aurl, dt)], f"{base}/punjab/page/3/"), host)
    # desh: fresh single page without the Older Entries anchor
    dt = BASE_DT - timedelta(hours=2)
    aurl = f"{base}/desh-khabar-0/"
    g.page(aurl, "article", art("dk0", dt), host)
    g.page(f"{base}/desh/", "list", lst([], [(aurl, dt)], None), host)


SANDHYAPRAVAKTA_RULES = {
    # sandhyapravakta.py: header menu [1:] where items WITH a sub-menu
    # schedule only their second-level 'ul>li>ul>li>a' links as
    # category2 (py:37-47, parent suppressed, dupes dropped) and
    # childless items are excluded by label ('कोरोना अपडेट', 'e-paper',
    # py:49-51); lists gate page-level on the grid's LAST module date
    # (py:63); the page-nav's LAST anchor advances only while it wraps
    # an <i> (py:64); article body = every <p> under <article>, abstract
    # its first danda segment (py:81-84), featured images (py:89).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "abstract_split": {"sep": "।", "take": 1},
    "extract": {
        "category": {"sel": "#menu-td-demo-header-menu-1 > li.menu-item",
                     "link_sel": "a", "skip": 1,
                     "children_sel": "ul > li > ul > li > a",
                     "children_suppress_parent": True},
        "excluded_labels": ["कोरोना अपडेट", "e-paper"],
        "entry": {"sel": ".td-ss-main-content"
                         " h3.entry-title.td-module-title",
                  "fields": {"href": {"sel": "a", "attr": "href"}}},
        "page_time": {"sel": ".td-ss-main-content"
                             " time.entry-date.updated.td-module-date",
                      "index": -1},
        "next": {"sel": "div.page-nav.td-pb-padding-side a",
                 "index": -1, "attr": "href", "require_child": "i"},
        "title": {"sel": "h1.entry-title"},
        "pub": {"sel": "article time.entry-date.updated.td-module-date"},
        "block": {"para_sel": "article p",
                  "img_sel": ".td-post-featured-image img"},
    },
}


def _build_sandhyapravakta(g: _G) -> None:
    host, base = "sandhyapravakta.com", "https://sandhyapravakta.com"
    wid = 1102
    g.registry[wid] = dict(SANDHYAPRAVAKTA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    # nested second-level ul (the reference's li.select('ul>li>ul>li>a'))
    g.page(base + "/", "menu",
           f'<html><ul id="menu-td-demo-header-menu-1">'
           f'<li class="menu-item"><a href="{base}/">होम</a></li>'
           f'<li class="menu-item"><a href="{base}/desh/">देश'
           f'<ul class="sub-menu"><li><a href="{base}/x/">x</a>'
           f'<ul><li><a href="{base}/up/">यूपी</a></li>'
           f'<li><a href="{base}/bihar/">बिहार</a></li></ul>'
           f"</li></ul></a></li>"
           f'<li class="menu-item"><a href="{base}/corona/">कोरोना अपडेट'
           f"</a></li>"
           f'<li class="menu-item"><a href="{base}/vichar/">विचार</a>'
           f"</li>"
           f"</ul></html>", host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime) -> str:
        return (f'<html><h1 class="entry-title">SP {tag}</h1>'
                f'<div class="td-post-featured-image">'
                f'<img src="{base}/i/{tag}.jpg"></div>'
                f"<article>"
                f'<time class="entry-date updated td-module-date">'
                f"{_fz(dt)}</time>"
                f"<p>sp पहला {tag}। sp शेष।</p><p>sp दूसरा।</p>"
                f"</article></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None,
            chevron: bool = True) -> str:
        mods = "".join(
            f'<h3 class="entry-title td-module-title"><a href="{u}">t'
            f"</a></h3>"
            f'<time class="entry-date updated td-module-date">{_fz(dt)}'
            f"</time>"
            for u, dt in rows
        )
        nav = ""
        if nxt:
            tail = (f'<a href="{nxt}"><i class="next-i"></i></a>'
                    if chevron else f'<a href="{nxt}">last</a>')
            nav = (f'<div class="page-nav td-pb-padding-side">'
                   f'<a href="{base}/p1/">1</a>{tail}</div>')
        return (f'<html><div class="td-ss-main-content">{mods}</div>'
                f"{nav}</html>")

    # up: page 1 fresh chevron → page 2 whose last-a has NO <i> → stop
    # even though its dates are fresh
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 4)
        aurl = f"{base}/up-khabar-1{e}/"
        g.page(aurl, "article", art(f"u1{e}", dt), host)
        r1.append((aurl, dt))
    g.page(f"{base}/up/", "list",
           lst(r1, f"{base}/up/page/2/"), host)
    r2 = []
    dt = BASE_DT - timedelta(hours=8)
    aurl = f"{base}/up-khabar-20/"
    g.page(aurl, "article", art("u20", dt), host)
    r2.append((aurl, dt))
    g.page(f"{base}/up/page/2/", "list",
           lst(r2, f"{base}/up/page/3/", chevron=False), host)
    # bihar: stale tail on page 1 → gate stops its chain
    r3 = []
    for e, age in enumerate((10.0, 80.0)):
        dt = BASE_DT - timedelta(hours=age)
        aurl = f"{base}/bihar-khabar-{e}/"
        g.page(aurl, "article", art(f"b{e}", dt), host)
        r3.append((aurl, dt))
    g.page(f"{base}/bihar/", "list",
           lst(r3, f"{base}/bihar/page/2/"), host)
    # vichar (childless, not excluded): single fresh page
    dt = BASE_DT - timedelta(hours=1)
    aurl = f"{base}/vichar-khabar-0/"
    g.page(aurl, "article", art("v0", dt), host)
    g.page(f"{base}/vichar/", "list", lst([(aurl, dt)], None), host)


SINCEINDEP_RULES = {
    # sinceindependence.py: taxonomy menu items [0:11] regexed out of the
    # header nav (py:74-82 — a class selector here); thumb entries
    # yielded ungated (py:87-93); the page gate reads the LAST article's
    # Hindi 'Month D, YYYY' meta date (py:12-26,96-98) and follows
    # a.page_nav.next (py:99-105); the article byline 'M/D/YY H:MM
    # <Hindi am/pm>' never shifts the 12-hour clock (py:29-38,
    # bug-faithful); the body stops at the Like-and-Follow ad block
    # (py:40-51); lazy-load featured images (py:119-123); category1 from
    # the breadcrumb's last link (py:132-133).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "si_hindi_mdy",
    "article_pub_style": "si_mdy_slash",
    "cat2_meta_off": True,
    "extract": {
        "category": {"sel": ".jeg_header.normal"
                            " li.menu-item-type-taxonomy",
                     "link_sel": "a", "slice": [0, 11]},
        "entry": {"sel": ".jnews_category_content_wrapper"
                         " .jeg_block_container article",
                  "fields": {"href": {"sel": ".jeg_thumb a",
                                      "attr": "href"}}},
        "page_time": {"sel": ".jnews_category_content_wrapper"
                             " .jeg_block_container article"
                             " .jeg_meta_date", "index": -1},
        "next": {"sel": ".jeg_block_navigation a.page_nav.next",
                 "attr": "href"},
        "title": {"sel": ".entry-header .jeg_post_title"},
        "abstract": {"sel": ".entry-header .jeg_post_subtitle"},
        "pub": {"sel": ".jeg_meta_container .jeg_meta_date"},
        "cat1": {"sel": "#breadcrumbs .breadcrumb_last_link"},
        "block": {"para_sel": ".content-inner p",
                  "para_stop_re": r"^(Like and Follow us on :|Twitter)",
                  "img_sel": ".jeg_featured.featured_image"
                             " .thumbnail-container img",
                  "img_attr": "data-src"},
    },
}

_SI_HI = ["जनवरी", "फ़रवरी", "मार्च", "अप्रैल", "मई", "जून", "जुलाई",
          "अगस्त", "सितंबर", "अक्टूबर", "नवंबर", "दिसंबर"]


def _build_sinceindependence(g: _G) -> None:
    host = "hindi.sinceindependence.com"
    base = "https://hindi.sinceindependence.com"
    wid = 925
    g.registry[wid] = dict(SINCEINDEP_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    lis = [f'<li class="menu-item menu-item-type-taxonomy">'
           f'<a href="{base}/desh/">देश</a></li>',
           f'<li class="menu-item menu-item-type-taxonomy">'
           f'<a href="{base}/khel/">खेल</a></li>']
    # a 12th taxonomy item falls off the [0:11] slice
    lis += [f'<li class="menu-item menu-item-type-taxonomy">'
            f'<a href="{base}/desh/">dup{i}</a></li>' for i in range(9)]
    lis += [f'<li class="menu-item menu-item-type-taxonomy">'
            f'<a href="{base}/never/">x</a></li>']
    g.page(base + "/", "menu",
           f'<html><div class="jeg_header normal"><ul>{"".join(lis)}'
           f"</ul></div></html>", host)

    def art(tag: str, dt: datetime, ad: bool = False) -> str:
        tail = "<p>Like and Follow us on :</p><p>Twitter</p>" if ad \
            else ""
        h12 = dt.hour % 12 or 12
        ap = "अपराह्न" if dt.hour >= 12 else "पूर्वाह्न"
        return (f'<html><div class="entry-header">'
                f'<h1 class="jeg_post_title">SI {tag}</h1>'
                f'<div class="jeg_post_subtitle">si उपशीर्षक {tag}</div>'
                f"</div>"
                f'<div class="jeg_meta_container"><div class="jeg_meta_'
                f'date">{dt.month:02d}/{dt.day}/{dt:%y} {h12}:'
                f"{dt.minute:02d} {ap}</div></div>"
                f'<div class="jeg_featured featured_image">'
                f'<div class="thumbnail-container animate-lazy">'
                f'<img data-src="{base}/i/{tag}.jpg"></div></div>'
                f'<div class="content-inner">'
                f"<p>si पहला {tag}।</p><p>si दूसरा।</p>{tail}</div>"
                f'<div id="breadcrumbs"><a class="breadcrumb_last_link"'
                f' href="#">देश</a></div></html>')

    def _sd(dt: datetime) -> str:
        return f"{_SI_HI[dt.month - 1]} {dt.day}, {dt.year}"

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        arts = "".join(
            f'<article><div class="jeg_thumb"><a href="{u}">t</a></div>'
            f'<div class="jeg_meta_date">{_sd(dt)}</div></article>'
            for u, dt in rows
        )
        nav = (f'<div class="jeg_block_navigation">'
               f'<a class="page_nav next" href="{nxt}">»</a></div>'
               if nxt else '<div class="jeg_block_navigation"></div>')
        return (f'<html><div class="jnews_category_content_wrapper">'
                f'<div class="jeg_block_container">{arts}</div></div>'
                f"{nav}</html>")

    # desh: page 1 fresh (one ad-trimmed body, one 12:20 अपराह्न byline
    # kept on the 12-hour clock) → page 2 stale tail → stop
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 3)
        aurl = f"{base}/desh-khabar-1{e}/"
        g.page(aurl, "article", art(f"d1{e}", dt, ad=(e == 0)), host)
        r1.append((aurl, dt))
    g.page(base + "/desh/", "list",
           lst(r1, f"{base}/desh/page/2/"), host)
    dt = BASE_DT - timedelta(hours=80)
    aurl = f"{base}/desh-khabar-20/"
    g.page(aurl, "article", art("d20", dt), host)
    g.page(base + "/desh/page/2/", "list", lst([(aurl, dt)], None),
           host)
    # khel: fresh single page with an EMPTY nav block
    dt = BASE_DT - timedelta(hours=2)
    aurl = f"{base}/khel-khabar-0/"
    g.page(aurl, "article", art("k0", dt), host)
    g.page(base + "/khel/", "list", lst([(aurl, dt)], None), host)


SWATANTRAAWAZ_RULES = {
    # swatantraawaz.py: THREE menu groups — two footer blocks filtered on
    # 'category' hrefs (py:26-41) plus the header's [1:-1] items with the
    # shared-meta child mutation (py:43-57); every list row but the last
    # rides title/abstract/image meta (py:75-82), the LAST row being the
    # dont_filter pagination PROBE when a next link exists (py:84-92 —
    # probe_fallback_entry: without one it degrades to a normal article);
    # the probe gates on the article page's OWN byline, dispatched by URL
    # shape (py:59-73): headline pages re-order a 'Weekday D Month YYYY
    # H:M:S AM/PM' stamp, watchvid pages store their normalized stamp
    # raw, photo pages fall back to now; bodies differ per shape
    # (py:103-120).
    "rule": NEXT_LINK,
    "format": "html",
    "article_pub_priority": "page",
    "date_style": "swat_colort",
    "probe_fallback_entry": True,
    "probe_next_url": True,  # pagination is probe-decided (py:69-70)
    "extract": {
        "category": [
            {"sel": ".cat a", "href_re": r".*category"},
            {"sel": ".cat_txt a", "href_re": r".*category"},
            {"sel": "#menu > ul > li", "link_sel": "a",
             "slice": [1, -1], "children_sel": "ul > li > a",
             "children_shared_meta": True},
        ],
        "entry": {"sel": ".news_sa",
                  "fields": {"href": {"sel": ".new_hed a",
                                      "attr": "href"},
                             "title": {"sel": ".new_hed a"},
                             "abstract": {"sel": "p"},
                             "img": {"sel": "img", "attr": "src"}},
                  "probe_last_member": True},
        "next": {"sel": ".numac ~ a", "attr": "href"},
        # photo pages are the base shape: byline absent → fallback-now
        "pub": {"const": None},
        "block": {"para_sel": ".news_saa > p"},
        "variants": [
            {"match": r"headline",
             "pub": {"sel": ".colort"},
             "block": {"para_sel": [".dit > p > b", ".dit > p > span"]}},
            {"match": r"watchvid",
             "pub": {"sel": ".colort"},
             "block": {"para_sel": ".dit > p"}},
        ],
    },
}


def _build_swatantraawaz(g: _G) -> None:
    host, base = "www.swatantraawaz.com", "https://www.swatantraawaz.com"
    wid = 1043
    g.registry[wid] = dict(SWATANTRAAWAZ_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f"<html>"
           f'<div class="cat"><a href="/category/desh.php">देश</a>'
           f'<a href="/epaper.php">ई-पेपर</a></div>'  # no 'category'
           f'<div class="cat_txt"><a href="/category/khel.php">खेल</a>'
           f"</div>"
           f'<div id="menu"><ul>'
           f"<li><a href=\"/\">होम</a></li>"
           f'<li><a href="/category/rajya.php">राज्य'
           f'<ul><li><a href="/category/up.php">यूपी</a></li>'
           f'<li><a href="/category/mp.php">मप्र</a></li></ul></a></li>'
           f'<li><a href="/video.php">वीडियो</a></li>'  # [1:-1] tail
           f"</ul></div></html>", host)

    def headline_art(tag: str, dt: datetime) -> str:
        h12 = dt.hour % 12 or 12
        ap = "PM" if dt.hour >= 12 else "AM"
        return (f'<html><div class="colort">Wednesday {dt.day} '
                f"{_MON_FULL[dt.month - 1]} {dt.year} "
                f"{h12:02d}:{dt.minute:02d}:00 {ap}</div>"
                f'<div class="dit"><p><b>sw मुख्य {tag}।</b>'
                f"<b>sw दूसरा।</b><span>sw पूँछ।</span></p></div></html>")

    def photo_art(tag: str) -> str:
        return (f'<html><div class="news_saa"><p>sw चित्र {tag}।</p>'
                f"</div></html>")

    def vid_art(tag: str, dt: datetime) -> str:
        return (f'<html><div class="colort">{dt:%Y-%m-%d %H:%M:%S}'
                f'</div><div class="dit"><p>sw वीडियो {tag}।</p></div>'
                f"</html>")

    def lst(rows: list[str], nxt: str | None) -> str:
        blocks = "".join(
            f'<div class="news_sa"><div class="new_hed">'
            f'<a href="{u}">SW {u.rsplit("/", 1)[-1][:-4]}</a></div>'
            f"<p>sw सार {u.rsplit('/', 1)[-1][:-4]}</p>"
            f'<img src="{base}/i/{u.rsplit("/", 1)[-1][:-4]}.jpg"></div>'
            for u in rows
        )
        nav = (f'<span class="numac">1</span><a href="{nxt}">2</a>'
               if nxt else "")
        return f"<html>{blocks}{nav}</html>"

    # desh: page 1's probe (a headline article, fresh) → page 2, whose
    # probe is STALE → no page 3; the probe article itself is re-fetched
    # normally after deciding (maharashtratimes semantics)
    r1 = [f"/headline-d1{e}.php" for e in range(3)]
    for e, u in enumerate(r1):
        g.page(base + u, "article",
               headline_art(f"d1{e}", BASE_DT - timedelta(hours=e * 2)),
               host)
    g.page(base + "/category/desh.php", "list",
           lst(r1, "/category/desh-p2.php"), host)
    r2 = [f"/headline-d2{e}.php" for e in range(2)]
    g.page(base + r2[0], "article",
           headline_art("d20", BASE_DT - timedelta(hours=5)), host)
    g.page(base + r2[1], "article",
           headline_art("d21", BASE_DT - timedelta(hours=90)), host)
    g.page(base + "/category/desh-p2.php", "list",
           lst(r2, "/category/desh-p3.php"), host)
    # khel: last row is a PHOTO page (fallback-now gate passes) but the
    # list has NO next link → the probe degrades to a normal article
    rk = ["/headline-k0.php", "/photonews-k1.php"]
    g.page(base + rk[0], "article",
           headline_art("k0", BASE_DT - timedelta(hours=1)), host)
    g.page(base + rk[1], "article", photo_art("k1"), host)
    g.page(base + "/category/khel.php", "list", lst(rk, None), host)
    # up: single watchvid row with a next link → probed, fresh, page 2
    # carries one stale headline whose probe stops the chain
    ru = ["/watchvid-u0.php"]
    g.page(base + ru[0], "article",
           vid_art("u0", BASE_DT - timedelta(hours=4)), host)
    g.page(base + "/category/up.php", "list",
           lst(ru, "/category/up-p2.php"), host)
    ru2 = ["/headline-u1.php"]
    g.page(base + ru2[0], "article",
           headline_art("u1", BASE_DT - timedelta(hours=85)), host)
    g.page(base + "/category/up-p2.php", "list", lst(ru2, None), host)
    # mp: plain single page, no nav
    rm = ["/headline-m0.php"]
    g.page(base + rm[0], "article",
           headline_art("m0", BASE_DT - timedelta(hours=2)), host)
    g.page(base + "/category/mp.php", "list", lst(rm, None), host)


TEMPO_RULES = {
    # tempo.py: sibling menu off the current-cat li (py:28-30);
    # #container children [1:-2] are the rows, a row MISSING its
    # .entryDate skipped outright by the try/except (py:42-47 —
    # require_field); per-entry fuzzy break gate; .pagi-next first, else
    # EVERY numbered-pagination anchor fans out (py:54-59 — the
    # inextlive shape); the article reads both categories off #bcrum
    # (py:64-66), its TITLE doubles as the abstract (py:67,70), and the
    # body walks sibling-div paragraphs AND ordered lists (py:71-76).
    "rule": NEXT_LINK,
    "format": "html",
    "title_priority": "page",
    "article_pub_priority": "page",
    "extract": {
        "category": {"sel": "li.current-cat ~ li a"},
        "entry": {"sel": "#container > div", "slice": [1, -2],
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "time": {"sel": ".entryDate"}},
                  "require_field": "time"},
        "next": {"sel": ".pagi-next", "attr": "href"},
        "next_alt_all": {"sel": ".numbered-pagination a"},
        "title": {"sel": "h1.entry_title"},
        "abstract": {"sel": "h1.entry_title"},
        "pub": {"sel": "span.postDate"},
        "cat1": {"sel": "#bcrum > a", "index": 1},
        "cat2": {"sel": "#bcrum > a", "index": 2},
        "block": {"para_sel": ["#bcrum ~ div > p", "#bcrum ~ div > ol"],
                  "img_sel": "#bcrum ~ div > p > a > img"},
    },
}


def _build_tempo(g: _G) -> None:
    host, base = "tempo.com.ph", "http://tempo.com.ph"
    wid = 197
    g.registry[wid] = dict(TEMPO_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1866})
    g.page(base + "/", "menu",
           f'<html><ul><li class="current-cat"><a href="{base}/">Home'
           f"</a></li>"
           f'<li><a href="{base}/news/">News</a></li>'
           f'<li><a href="{base}/sports/">Sports</a></li></ul></html>',
           host)

    def _fz(dt: datetime) -> str:
        return f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}"

    def art(tag: str, dt: datetime, cat2: str) -> str:
        return (f'<html><div id="bcrum"><a href="#">Home</a>'
                f'<a href="#">News</a><a href="#">{cat2}</a></div>'
                f"<h1 class=\"entry_title\">TM {tag}</h1>"
                f'<span class="postDate">{_fz(dt)}</span>'
                f"<div><p>tm first {tag}.</p>"
                f'<p><a href="#"><img src="{base}/i/{tag}.jpg"></a></p>'
                f"<ol>tm list item.</ol></div></html>")

    def lst(rows: list[tuple[str, datetime | None]], nxt: str | None,
            alts: list[str] | None = None) -> str:
        divs = "<div>header</div>" + "".join(
            f'<div><a href="{u}">t</a>'
            + (f'<span class="entryDate">{_fz(dt)}</span>' if dt else "")
            + "</div>"
            for u, dt in rows
        ) + "<div>widget</div><div>footer</div>"
        nav = ""
        if nxt:
            nav = f'<a class="pagi-next" href="{nxt}">»</a>'
        elif alts:
            nav = ('<div class="numbered-pagination">'
                   + "".join(f'<a href="{a}">n</a>' for a in alts)
                   + "</div>")
        return f'<html><div id="container">{divs}{nav}</div></html>'

    # news: page 1 (one undated row SKIPPED, fresh rows kept) →
    # .pagi-next → page 2: NO pagi-next, numbered fan-out (one dupe, one
    # new) → page 3 stale first row → break
    r1 = [(f"{base}/news-story-10/", BASE_DT),
          (f"{base}/news-undated/", None),
          (f"{base}/news-story-11/", BASE_DT - timedelta(hours=6))]
    for u, dt in r1:
        if dt:
            g.page(u, "article",
                   art(u.rsplit("/", 2)[-2], dt, "National"), host)
    g.page(base + "/news/", "list", lst(r1, f"{base}/news/page/2/"),
           host)
    r2 = [(f"{base}/news-story-20/", BASE_DT - timedelta(hours=12))]
    g.page(r2[0][0], "article", art("news-story-20", r2[0][1],
                                    "National"), host)
    g.page(base + "/news/page/2/", "list",
           lst(r2, None, alts=[f"{base}/news/", f"{base}/news/page/3/"]),
           host)
    r3 = [(f"{base}/news-story-30/", BASE_DT - timedelta(hours=90))]
    g.page(r3[0][0], "article", art("news-story-30", r3[0][1],
                                    "National"), host)
    g.page(base + "/news/page/3/", "list", lst(r3, None), host)
    # sports: fresh single page, no nav at all
    dt = BASE_DT - timedelta(hours=2)
    su = f"{base}/sports-story-0/"
    g.page(su, "article", art("sports-story-0", dt, "Sports"), host)
    g.page(base + "/sports/", "list", lst([(su, dt)], None), host)


TV9HINDI_RULES = {
    # tv9hindi.py: the topic menu re-ordered [2:] + [0] plus the trend
    # strip (py:42-50 — two sliced groups and a third, in that order);
    # page 1 lists mine the top component AND the last newsTop9's
    # ComListing while /page/N pages mine only the listing (py:59-72 —
    # URL variants + the [-1] scope); the gate reads the last listing
    # stamp fuzzily (py:75) and follows a.next.page-numbers (py:76-77;
    # the dead requests.get pingback probe, py:78-79, has no behavioral
    # effect and is not carried); the article byline goes through a
    # strptime whose %H ignores its am/pm marker (py:14-17,
    # bug-faithful), blue-span ad paragraphs are dropped (py:111-117),
    # the SECOND content paragraph is the abstract (py:107), and the
    # breadcrumb's last two links are the categories (py:118-120).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "article_pub_style": "tv9_pub",
    "extract": {
        "category": [
            {"sel": ".top9MenuBox.flex .top9MenuLink a",
             "slice": [2, None]},
            {"sel": ".top9MenuBox.flex .top9MenuLink a",
             "slice": [0, 1]},
            {"sel": ".TrendStrip.flex .TrendStripLink a"},
        ],
        "entry": [
            {"sel": ".newsTop9 .topNewscomp ul h3.h3",
             "fields": {"href": {"sel": "a", "attr": "href"}}},
            {"scope": {"sel": ".newsTop9", "index": -1},
             "sel": ".col2.ComListing li h3 a"},
        ],
        "page_time": {"sel": ".col2.ComListing .catTime.flex span",
                      "index": -1},
        "next": {"sel": "a.next.page-numbers", "attr": "href"},
        "title": {"sel": ".detailBody .LeftCont.content h1"},
        "abstract": {"sel": ".LeftCont.content p", "index": 1},
        "pub": {"sel": ".LeftCont.content ul.AuthorInfo li",
                "index": -1, "raw": True},
        "cat1": {"sel": "#breadcrumbs a", "index": -2},
        "cat2": {"sel": "#breadcrumbs a", "index": -1},
        "block": {"para_sel": ".ArticleBodyCont p",
                  "para_drop_re": "^ये भी पढ़ें",
                  "img_sel": ".ArticleBodyCont .articleImg img",
                  "img_attr": "data-src"},
        "variants": [
            {"match": r"/page/\d+$",
             "entry": {"scope": {"sel": ".newsTop9", "index": -1},
                       "sel": ".col2.ComListing li h3 a"}},
        ],
    },
}


def _build_tv9hindi(g: _G) -> None:
    host, base = "www.tv9hindi.com", "https://www.tv9hindi.com"
    wid = 923
    g.registry[wid] = dict(TV9HINDI_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><div class="top9MenuBox flex">'
           f'<div class="top9MenuLink">'
           f'<a href="/latest/">Latest</a>'  # [0] → re-appended LAST
           f'<a href="/live/">Live</a>'  # [1] dropped
           f'<a href="/india/">India</a>'
           f'<a href="/world/">World</a></div></div>'
           f'<div class="TrendStrip flex"><div class="TrendStripLink">'
           f'<a href="/trending/">Trend</a></div></div></html>', host)

    def art(tag: str, dt: datetime) -> str:
        ampm = "pm" if dt.hour >= 12 else "am"
        h12 = dt.hour % 12 or 12
        byline = (f"Publish Date -\n\t\t{h12}:{dt.minute:02d} {ampm}, "
                  f"{dt:%a}, {dt.day} {_MON_FULL[dt.month - 1]} "
                  f"{dt:%y}")
        return (f'<html><div class="detailBody">'
                f'<div class="LeftCont content"><h1>TV9 {tag}</h1>'
                f"<p>tv9 पहला {tag}।</p><p>tv9 सार {tag}।</p>"
                f'<ul class="AuthorInfo"><li>लेखक</li>'
                f"<li>{byline}</li></ul></div></div>"
                f'<div class="ArticleBodyCont">'
                f'<div class="articleImg">'
                f'<img data-src="{base}/i/{tag}.jpg"></div>'
                f"<p>tv9 मुख्य {tag}।</p><p>ये भी पढ़ें: विज्ञापन</p>"
                f"<p>tv9 दूसरा।</p></div>"
                f'<div class="breadcrum"><nav id="breadcrumbs">'
                f'<a href="#">होम</a><a href="#">देश</a>'
                f'<a href="#">राज्य</a></nav></div></html>')

    def lst(top: list[str], rows: list[tuple[str, datetime]],
            nxt: str | None) -> str:
        topc = ("".join(
            f'<div class="topNewscomp"><ul><h3 class="h3">'
            f'<a href="{u}">t</a></h3></ul></div>' for u in top
        ))
        mods = "".join(
            f'<li><h3><a href="{u}">t</a></h3></li>'
            f'<div class="catTime flex"><span>'
            f"{_MON_FULL[dt.month - 1]} {dt.day}, {dt.year}</span></div>"
            for u, dt in rows
        )
        nav = (f'<a class="next page-numbers" href="{nxt}">»</a>'
               if nxt else "")
        return (f'<html><div class="newsTop9">{topc}</div>'
                f'<div class="newsTop9"><div class="col2 ComListing">'
                f"<ul>{mods}</ul></div></div>{nav}</html>")

    # india: page 1 (top + listing) fresh → page 2 (listing ONLY — its
    # top component ignored by the /page/N variant) stale tail → stop
    top1 = [f"{base}/india-top-0"]
    g.page(top1[0], "article", art("it0", BASE_DT), host)
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 4 + 14)  # pm→am-clock bylines
        aurl = f"{base}/india-story-1{e}"
        g.page(aurl, "article", art(f"i1{e}", dt), host)
        r1.append((aurl, dt))
    g.page(base + "/india/", "list",
           lst(top1, r1, f"{base}/india/page/2"), host)
    top2 = [f"{base}/india-top-2"]  # never scheduled on /page/2
    r2 = [(f"{base}/india-story-20", BASE_DT - timedelta(hours=80))]
    g.page(r2[0][0], "article", art("i20", r2[0][1]), host)
    g.page(base + "/india/page/2", "list",
           lst(top2, r2, f"{base}/india/page/3"), host)
    # world + latest + trending: single fresh pages, no next
    for cslug, tag in (("world", "w"), ("latest", "l"),
                       ("trending", "t")):
        dt = BASE_DT - timedelta(hours=3)
        aurl = f"{base}/{cslug}-story-0"
        g.page(aurl, "article", art(f"{tag}0", dt), host)
        g.page(f"{base}/{cslug}/", "list", lst([], [(aurl, dt)], None),
               host)


UNIVARTA_RULES = {
    # univarta.py: two-level menu over ONE shared meta dict (py:45-56 —
    # children_shared_meta; the shared cate_url mutation is collapsed to
    # per-request list bases, the divyahimachal convention); list rows
    # carry title/image/abstract meta and gate per-entry on the
    # '|'-trailed Hindi byline's re-ordered first segment (py:61-77);
    # the next URL is the category base + the '.jp-current ~ a' href
    # fragment, concatenated verbatim (py:78-83); the article only
    # contributes its whole-container story body (py:94-97).
    "rule": NEXT_LINK,
    "format": "html",
    "date_style": "univarta_list",
    "menu_carry_list_url": True,
    "next_value_tpl": "{base}{value}",
    "next_value_raw": True,
    "extract": {
        "category": {"sel": "#ctl00_category1_sectionmenu > li",
                     "link_sel": "a", "children_sel": "ul > li > a",
                     "children_shared_meta": True},
        "entry": {"sel": ".CatNewsFirst_FirstNews",
                  "fields": {"href": {"sel": "a", "attr": "href"},
                             "title": {"sel": "a"},
                             "time": {"sel": "h1 ~ span"},
                             "abstract": {"sel": "h1 ~ p"},
                             "img": {"sel": "img", "attr": "src"}}},
        "next_value": {"sel": ".jp-current ~ a", "attr": "href"},
        "block": {},
        "body_fallback": {"sel": ".storydetails"},
    },
}

_UNI_HI = ["जनवरी", "फ़रवरी", "जुलूस", "अप्रैल", "मई", "जून", "जुलाई",
           "अगस्त", "सितंबर", "अक्टूबर", "नवंबर", "दिसंबर"]


def _build_univarta(g: _G) -> None:
    host, base = "www.univarta.com", "http://www.univarta.com"
    wid = 1041
    g.registry[wid] = dict(UNIVARTA_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    # nested ul inside the anchor (the shared-meta menu shape)
    g.page(base + "/", "menu",
           f'<html><ul id="ctl00_category1_sectionmenu">'
           f'<li><a href="/india">भारत'
           f'<ul><li><a href="/up">यूपी</a></li>'
           f'<li><a href="/bihar">बिहार</a></li></ul></a></li>'
           f'<li><a href="/sports">खेल</a></li>'
           f"</ul></html>", host)

    def _ud(dt: datetime) -> str:
        return (f"{dt.day} {_UNI_HI[dt.month - 1]} {dt.year} | "
                f"समय {dt:%H:%M}")

    def art(tag: str) -> str:
        return (f'<html><div class="storydetails">uv पूरी कथा {tag}। '
                f"uv शेष।</div></html>")

    def lst(rows: list[tuple[str, datetime]], nxt: str | None) -> str:
        blocks = "".join(
            f'<div class="CatNewsFirst_FirstNews">'
            f'<a href="/{u}">UV {u}</a><h1>h</h1>'
            f"<span>{_ud(dt)}</span><p>uv सार {u}</p>"
            f'<img src="{base}/i/{u}.jpg"></div>'
            for u, dt in rows
        )
        nav = (f'<span class="jp-current">1</span><a href="{nxt}">2</a>'
               if nxt else "")
        return f"<html>{blocks}{nav}</html>"

    # india: page 1 fresh → '?page=2' bolted onto the CATEGORY base →
    # page 2 stale first row → break
    r1 = [("india-khabar-10", BASE_DT),
          ("india-khabar-11", BASE_DT - timedelta(hours=7))]
    for u, _dt in r1:
        g.page(f"{base}/{u}", "article", art(u), host)
    g.page(base + "/india", "list", lst(r1, "?page=2"), host)
    r2 = [("india-khabar-20", BASE_DT - timedelta(hours=88))]
    g.page(f"{base}/{r2[0][0]}", "article", art(r2[0][0]), host)
    g.page(base + "/india?page=2", "list", lst(r2, "?page=3"), host)
    # up/bihar/sports: single fresh pages without navs
    for cslug, tag in (("up", "uk"), ("bihar", "bk"), ("sports", "sk")):
        dt = BASE_DT - timedelta(hours=2)
        u = f"{tag}-khabar-0"
        g.page(f"{base}/{u}", "article", art(u), host)
        g.page(f"{base}/{cslug}", "list", lst([(u, dt)], None), host)


VIRARJUN_RULES = {
    # virarjun.py: menu pop()+pop(0) (py:36-38 — drop_seq [-1, 0]);
    # entries yielded ungated (py:49-55); the page gate reads the LAST
    # convert-to-localtime stamp through the abbreviated-else-full month
    # strptime pair (py:58-63); pagination requires the pager's icon-text
    # span and follows the anchor reading 'Next' (py:65-69 — the
    # reference compares against 'Next  ' with trailing spaces that
    # whitespace normalization collapses); the article drops empty body
    # paragraphs (py:88-96), prefixes its h2 images onto the site host
    # (py:82-87), and appends three backspace characters to category1
    # (py:101, bug-faithful).
    "rule": NEXT_LINK,
    "format": "html",
    "entry_gate": False,
    "title_priority": "page",
    "article_pub_priority": "page",
    "date_style": "virarjun_dt",
    "cat2_meta_off": True,
    "extract": {
        "category": {"sel": "ul.main-menu li", "link_sel": "a",
                     "drop_seq": [-1, 0]},
        "entry": {"sel": "div.article-header h2 a"},
        "page_time": {"sel": "div.article-content"
                             " span.convert-to-localtime", "index": -1},
        "next": {"if_count": {"sel": "div.page-pager a span.icon-text",
                              "ge": 1},
                 "then": {"sel": "div.page-pager a", "text_eq": "Next",
                          "attr": "href"},
                 "else": {"const": None}},
        "title": {"sel": "h1.article-title"},
        "pub": {"sel": "span.convert-to-localtime"},
        "cat1": {"sel": "div.tag-block a", "index": 1,
                 "suffix": "\b\b\b"},
        "block": {"para_sel": ".details-content-story.shortcode-content"
                              " p",
                  "para_drop_re": r"^\s*$",
                  "img_sel": "h2 img",
                  "img_prefix": "http://www.virarjun.com/"},
    },
}


def _build_virarjun(g: _G) -> None:
    host, base = "www.virarjun.com", "http://www.virarjun.com"
    wid = 994
    g.registry[wid] = dict(VIRARJUN_RULES)
    g.seeds.append({"url": base + "/", "website_id": wid,
                    "language_id": 1930})
    g.page(base + "/", "menu",
           f'<html><ul class="main-menu">'
           f'<li><a href="/">होम</a></li>'  # pop(0)
           f'<li><a href="/desh">देश</a></li>'
           f'<li><a href="/khel">खेल</a></li>'
           f'<li><a href="/epaper">ई-पेपर</a></li>'  # pop()
           f"</ul></html>", host)

    def _vd(dt: datetime, full: bool) -> str:
        mon = (_MON_FULL if full else _MON_ABBR)[dt.month - 1]
        h12 = dt.hour % 12 or 12
        ap = "PM" if dt.hour >= 12 else "AM"
        return f"{dt.day:02d} {mon} {dt.year} {h12}:{dt.minute:02d} {ap} GMT"

    def art(tag: str, dt: datetime, full: bool = False) -> str:
        return (f'<html><h1 class="article-title">VA {tag}</h1>'
                f'<span class="convert-to-localtime">{_vd(dt, full)}'
                f"</span>"
                f'<h2><img src="i/{tag}.jpg"></h2>'
                f'<div class="details-content-story shortcode-content">'
                f"<p> </p><p>va पहला {tag}।</p><p>va दूसरा।</p></div>"
                f'<div class="tag-block"><a href="#">टैग</a>'
                f'<a href="#">देश</a></div></html>')

    def lst(rows: list[tuple[str, datetime]], nxt: str | None,
            icon: bool = True) -> str:
        arts = "".join(
            f'<div class="article-header"><h2><a href="/{u}">t</a></h2>'
            "</div>"
            f'<div class="article-content">'
            f'<span class="convert-to-localtime">{_vd(dt, False)}</span>'
            "</div>"
            for u, dt in rows
        )
        nav = ""
        if nxt:
            # the chevron span is an EMPTY icon element, so the anchor's
            # text stays 'Next  ' (normalized 'Next')
            mark = '<span class="icon-text"></span>' if icon else ""
            nav = (f'<div class="page-pager"><a href="{base}/p1">Prev'
                   f'</a><a href="{nxt}">Next  {mark}</a></div>')
        return f"<html>{arts}{nav}</html>"

    # desh: page 1 fresh (one FULL-month byline exercising the fallback
    # strptime) → page 2 stale tail with a pager missing its icon-text
    r1 = []
    for e in range(2):
        dt = BASE_DT - timedelta(hours=e * 6)
        u = f"desh-khabar-1{e}"
        g.page(f"{base}/{u}", "article", art(f"d1{e}", dt, full=(e == 1)),
               host)
        r1.append((u, dt))
    g.page(base + "/desh", "list",
           lst(r1, f"{base}/desh?page=2"), host)
    dt = BASE_DT - timedelta(hours=84)
    u = "desh-khabar-20"
    g.page(f"{base}/{u}", "article", art("d20", dt), host)
    g.page(base + "/desh?page=2", "list",
           lst([(u, dt)], f"{base}/desh?page=3", icon=False), host)
    # khel: fresh single page without a pager
    dt = BASE_DT - timedelta(hours=3)
    u = "khel-khabar-0"
    g.page(f"{base}/{u}", "article", art("k0", dt), host)
    g.page(base + "/khel", "list", lst([(u, dt)], None), host)


SITE_BUILDERS = {
    "zeenews": _build_zeenews,
    "aajtak": _build_aajtak,
    "philboxing": _build_philboxing,
    "manila": _build_manila,
    "yehey": _build_yehey,
    "maharashtratimes": _build_maharashtratimes,
    "shangbao": _build_shangbao,
    "interaksyon": _build_interaksyon,
    "boholchronicle": _build_boholchronicle,
    "latestnews1": _build_latestnews1,
    "hatawtabloid": _build_hatawtabloid,
    "clickthecity": _build_clickthecity,
    "coconuts": _build_coconuts,
    "parstoday": _build_parstoday,
    "bworldonline": _build_bworldonline,
    "raftaar": _build_raftaar,
    "malaya": _build_malaya,
    "piagov": _build_piagov,
    "apkaakhbar": _build_apkaakhbar,
    "udaybulletin": _build_udaybulletin,
    "spin": _build_spin,
    "spot": _build_spot,
    "topgear": _build_topgear,
    "unbox": _build_unbox,
    "ambala": _build_ambala,
    "dfa": _build_dfa,
    "doh": _build_doh,
    "jb": _build_jb,
    "poorvanchalmedia": _build_poorvanchalmedia,
    "newstracklive": _build_newstracklive,
    "divyahimachal": _build_divyahimachal,
    "philippinesnews": _build_philippinesnews,
    "tourism": _build_tourism,
    "haribhoomi": _build_haribhoomi,
    "samacharjagat": _build_samacharjagat,
    "tarunmitra": _build_tarunmitra,
    "dainiksandhyaprakash": _build_dainiksandhyaprakash,
    "aapkikhabar": _build_aapkikhabar,
    "bandera": _build_bandera,
    "centralindia": _build_centralindia,
    "manilatimes": _build_manilatimes,
    "abante": _build_abante,
    "janadesh": _build_janadesh,
    "kickerdaily": _build_kickerdaily,
    "yugatech": _build_yugatech,
    "politics": _build_politics,
    "sunstar": _build_sunstar,
    "techpinas": _build_techpinas,
    "emalwa": _build_emalwa,
    "navsancharsamachar": _build_navsancharsamachar,
    "ptvnews": _build_ptvnews,
    "agniban": _build_agniban,
    "coolbuster": _build_coolbuster,
    "yashbharat": _build_yashbharat,
    "puridunia": _build_puridunia,
    "starmometer": _build_starmometer,
    "technobaboy": _build_technobaboy,
    "pinoyparazzi": _build_pinoyparazzi,
    "tehelkahindi": _build_tehelkahindi,
    "mattscradle": _build_mattscradle,
    "awesome": _build_awesome,
    "hindi": _build_hindi,
    "dailyhindinews": _build_dailyhindinews,
    "journal": _build_journal,
    "remate": _build_remate,
    "cnnphilippines": _build_cnnphilippines,
    "philnews": _build_philnews,
    "aajka": _build_aajka,
    "abs-cbn": _build_abscbn,
    "agrasamachar": _build_agrasamachar,
    "apnlive": _build_apnlive,
    "balita": _build_balita,
    "balita1": _build_balita1,
    "bhadas4media": _build_bhadas4media,
    "bharatkhabar": _build_bharatkhabar,
    "bhopalsamachar": _build_bhopalsamachar,
    "bicolstandard": _build_bicolstandard,
    "businessmirror": _build_businessmirror,
    "cebudailynews": _build_cebudailynews,
    "dainiknavajyoti": _build_dainiknavajyoti,
    "dekhobhopal": _build_dekhobhopal,
    "devbhoomimedia": _build_devbhoomimedia,
    "diariutimorpost": _build_diariutimorpost,
    "dunvalleymail": _build_dunvalleymail,
    "emsindia": _build_emsindia,
    "emstv": _build_emstv,
    "panchjanya": _build_panchjanya,
    "loktej": _build_loktej,
    "inextlive": _build_inextlive,
    "world": _build_world,
    "mb": _build_mb,
    "legendnews": _build_legendnews,
    "entrepreneur": _build_entrepreneur,
    "fili": _build_fili,
    "hastakshep": _build_hastakshep,
    "headlinehindi": _build_headlinehindi,
    "hindinewsfresh10": _build_hindinewsfresh10,
    "janoduniya": _build_janoduniya,
    "khulasaa": _build_khulasaa,
    "krishakjagat": _build_krishakjagat,
    "mediakhabar": _build_mediakhabar,
    "nayalook": _build_nayalook,
    "newswing": _build_newswing,
    "nhandan": _build_nhandan,
    "pinoytechblog": _build_pinoytechblog,
    "pna": _build_pna,
    "pravakta": _build_pravakta,
    "pressnote": _build_pressnote,
    "sachkaujala": _build_sachkaujala,
    "sandhyapravakta": _build_sandhyapravakta,
    "sinceindependence": _build_sinceindependence,
    "swatantraawaz": _build_swatantraawaz,
    "tempo": _build_tempo,
    "tv9hindi": _build_tv9hindi,
    "univarta": _build_univarta,
    "virarjun": _build_virarjun,
}


def build_real_graph(sites: list[str] | None = None,
                     cutoff_hours: float = 36.0) -> dict:
    """The combined real-site fixture graph (same contract as
    mock_web.build_site_graph). ``cutoff_hours``: the incremental-crawl
    cursor sits this many hours before BASE_DT — deep enough that every
    per-entry, per-page, and per-probe time gate triggers mid-chain."""
    g = _G()
    for name in sites or list(SITE_BUILDERS):
        SITE_BUILDERS[name](g)
    cutoff_dt = BASE_DT - timedelta(hours=cutoff_hours)
    return {
        "pages": g.pages,
        "seeds": g.seeds,
        "registry": g.registry,
        "cutoff_epoch": cutoff_dt.replace(tzinfo=timezone.utc).timestamp(),
        "as_of": AS_OF,
    }


def real_graph_df(spark: SparkSession, graph: dict) -> DataFrame:
    rows = [
        (p["url"], p.get("method", "GET"), p.get("body", ""),
         p["response_url"], p["kind"], p["payload"],
         p["host"], p["bytes"], p.get("fail_times", 0),
         p.get("required_cookie"))
        for p in graph["pages"].values()
    ]
    return spark.createDataFrame(rows, SITE_GRAPH_SCHEMA)


def real_seeds_df(spark: SparkSession, graph: dict) -> DataFrame:
    rows = [(s["url"], s["website_id"], s["language_id"])
            for s in graph["seeds"]]
    return spark.createDataFrame(rows, SEEDS_SCHEMA)
