"""Pure-Python unit tests for the round-3 parser data surfaces (no Spark
session): nested menu children, positional slices, API field-path maps,
offset/total-count and form-URL pagination, epoch-ms and gate-style
dates, URL-segment categories. The real-site fixtures cover these
end-to-end; these tests localize a regression to the exact rule."""

from datetime import datetime

from crawler_spark.plans.parser import (
    API_OFFSET,
    FORM_URL_PAGE,
    _map_api_json,
    extract_payload,
    parse_page,
    parse_site_date,
)

AS_OF = datetime(2021, 6, 1)


def _reqs(kind, payload, site, url="https://s.example/x", meta=None,
          fmt=None, cutoff=None):
    doc, reqs = parse_page(
        url=url, response_url=url, kind=kind, payload_json=payload,
        meta=meta or {}, depth=0, seq="0", as_of=AS_OF,
        cutoff_epoch=cutoff, site=site, rule=site.get("rule", "next_link"),
        fmt=fmt or site.get("format", "json"),
        extract=site.get("extract"),
    )
    return doc, reqs


def test_menu_children_sel_and_link_sel():
    html = ('<div class="m"><ul>'
            '<li><a href="/top1">T1</a><ul>'
            '<li><a href="/sub1">S1</a></li>'
            '<li><a href="/sub2">S2</a></li></ul></li>'
            '<li><a href="/top2">T2</a></li>'
            "</ul></div>")
    out = extract_payload(
        "menu", html,
        {"category": {"sel": "div.m>ul>li", "link_sel": "a",
                      "children_sel": "ul a"}},
    )
    cats = [(c["href"], c["label"], c.get("label2"), c.get("parent_href"))
            for c in out["categories"]]
    assert cats == [
        ("/top1", "T1", None, None),
        ("/sub1", "T1", "S1", "/top1"),
        ("/sub2", "T1", "S2", "/top1"),
        ("/top2", "T2", None, None),
    ]


def test_menu_slice_and_dont_filter():
    html = "<ul>" + "".join(
        f'<li class="i"><a href="/c{i}">C{i}</a></li>' for i in range(7)
    ) + "</ul>"
    out = extract_payload(
        "menu", html,
        {"category": {"sel": "li.i a", "slice": [4, 7]},
         "menu_dont_filter": True},
    )
    assert [c["label"] for c in out["categories"]] == ["C4", "C5", "C6"]
    assert out["dont_filter"] is True


def test_api_map_paths_prefix_total_and_quirks():
    js = {"items": [
        {"item": {"headline": ["H1"]},
         "story": {"slug": "a/b", "last-published-at": 1622367600000}},
    ], "total-count": 65}
    amap = {"entries": "items", "href": ("story", "slug"),
            "href_prefix": "https://x/", "title": ("item", "headline", 0),
            "time": ("story", "last-published-at"), "total": "total-count"}
    out = _map_api_json(js, amap)
    assert out["entries"][0]["href"] == "https://x/a/b"
    assert out["entries"][0]["title"] == "H1"
    assert out["entries"][0]["pub_time_raw"] == 1622367600000
    assert out["total_count"] == 65
    # missing entries key tolerated
    assert _map_api_json({}, amap)["entries"] == []
    # min_entries: a single item drops the page entirely
    one = {"articles": [{"url": "u",
                         "headlineDate": {"timeStamp": {"iso": "x"}}}]}
    amap2 = {"entries": "articles", "href": ("url",), "min_entries": 2,
             "page_time_last": ("headlineDate", "timeStamp", "iso")}
    out2 = _map_api_json(one, amap2)
    assert out2["entries"] == [] and out2["page_time_raw"] is None
    # y0 patch on the last item's gate
    two = {"articles": [
        {"url": "u1", "headlineDate": {"timeStamp": {"iso": "z"}}},
        {"url": "u2",
         "headlineDate": {"timeStamp": {"iso": "0000-05-28 10:00:00"}}},
    ]}
    amap3 = dict(amap2, y0_patch="2020")
    assert _map_api_json(two, amap3)["page_time_raw"] == \
        "2020-05-28 10:00:00"


def test_epoch_ms_and_gate_style_dates():
    assert parse_site_date(1622367600000, "epoch_ms", AS_OF) == \
        datetime(2021, 5, 30, 9, 40, 0)
    # sub-second floor (gmtime semantics)
    assert parse_site_date(1622367600999, "epoch_ms", AS_OF) == \
        datetime(2021, 5, 30, 9, 40, 0)


def test_api_offset_bound_and_epoch_cutoff():
    site = {
        "rule": API_OFFSET, "api_format": "json",
        "date_style": "epoch_ms", "api_offset_step": 20,
        "menu_api_template": "https://x/api/{collection}?o={offset}",
        "api_map": {"entries": "items", "href": ("story", "slug"),
                    "time": ("story", "t"), "total": "total-count"},
    }
    fresh = int(datetime(2021, 5, 31).timestamp()) * 1000
    js = {"items": [{"story": {"slug": "s1", "t": fresh}}],
          "total-count": 65}
    import json as _j
    meta = {"collection": "c", "offset": "20"}
    _, reqs = _reqs("api", _j.dumps(js), site, meta=meta)
    assert [r["url"] for r in reqs][-1] == "https://x/api/c?o=40"
    # bumped offset at/over the bound: no next page
    js["total-count"] = 40
    _, reqs = _reqs("api", _j.dumps(js), site, meta=meta)
    assert all("o=40" not in r["url"] for r in reqs)


def test_form_url_page_advances_query_and_body():
    site = {
        "rule": FORM_URL_PAGE, "format": "html", "api_format": "json",
        "form_url_fmt": "{base}.json?p={page}", "form_bootstrap_page": 1,
        "page_time_style": "ymd",
        "api_map": {"entries": "articles", "href": ("url",),
                    "min_entries": 2,
                    "page_time_last": ("h", "iso")},
        "extract": {},
    }
    # bootstrap off the (empty) category list page
    _, reqs = _reqs("list", "<html></html>", site,
                    url="https://s.example/cat", fmt="html")
    assert [(r["url"], r["method"], r["body"]) for r in reqs] == [
        ("https://s.example/cat.json?p=1", "POST", "page=1")
    ]
    # the api page advances query AND body together when the gate is fresh
    import json as _j
    js = {"articles": [
        {"url": "https://s.example/cat/a1", "h": {"iso": "x"}},
        {"url": "https://s.example/cat/a2",
         "h": {"iso": "2021-05-31 10:00:00"}},
    ]}
    meta = {"list_url": "https://s.example/cat", "page": "1"}
    cutoff = datetime(2021, 5, 30).timestamp()
    _, reqs = _reqs("api", _j.dumps(js), site, meta=meta, cutoff=cutoff)
    assert ("https://s.example/cat.json?p=2", "POST", "page=2") in [
        (r["url"], r["method"], r["body"]) for r in reqs
    ]
    # a stale gate stops it
    js["articles"][-1]["h"]["iso"] = "2021-05-01 10:00:00"
    _, reqs = _reqs("api", _j.dumps(js), site, meta=meta, cutoff=cutoff)
    assert all("p=2" not in r["url"] for r in reqs)


def test_cat_from_url_segment_token_positions():
    site = {
        "format": "html",
        "cat_from_url_segment": {"index": -3, "sep": "_"},
        "extract": {"block": {"para_sel": "p"}},
    }
    doc, _ = _reqs("article", "<html><p>b</p></html>", site,
                   url="https://m/news_business/art/", fmt="html")
    assert (doc["category1"], doc["category2"]) == ("news", "business")
    doc, _ = _reqs("article", "<html><p>b</p></html>", site,
                   url="https://m/malaya_special_features/art/", fmt="html")
    assert (doc["category1"], doc["category2"]) == ("special", "features")
