"""The stdlib selector engine (functions/htmlsel.py) and the selector rule
forms in plans/parser.extract_payload — the markup-robustness surface that
regex rules cannot provide (VERDICT r2 'What's missing #4')."""

from __future__ import annotations

from crawler_spark.functions.htmlsel import parse_html, select
from crawler_spark.plans.parser import extract_payload

DOC = """
<html><body>
  <div class="td-ss-main-content" id="main">
    <div class="td-block-span6">
      <div class="td-module-thumb"><a href="/a1" rel="bookmark"></a></div>
      <time datetime="2021-05-30">May 30, 2021</time>
    </div>
    <div class="td-block-span6">
      <div class="td-module-thumb"><a href="/a2"></a></div>
      <time datetime="2021-05-29">May 29, 2021</time>
    </div>
    <p><time datetime="x">not a direct-child div's time? yes it is not</time></p>
  </div>
  <div class="page-nav td-pb-padding-side">
    <a href="/page/1">1</a><a href="/page/2">Next</a>
  </div>
</body></html>
"""


def test_class_and_descendant_and_child():
    t = parse_html(DOC)
    anchors = select(t, ".td-ss-main-content .td-module-thumb > a")
    assert [a.attr("href") for a in anchors] == ["/a1", "/a2"]
    # child combinator: the <time> inside <p> is NOT under a direct-child
    # div of main-content... it is under main-content > p, so the selector
    # '.td-ss-main-content > div time' must skip it
    times = select(t, ".td-ss-main-content > div time")
    assert [n.attr("datetime") for n in times] == ["2021-05-30", "2021-05-29"]


def test_compound_class_and_id_and_attr():
    t = parse_html(DOC)
    assert len(select(t, ".page-nav.td-pb-padding-side > a")) == 2
    assert select(t, "div#main")[0].attr("class") == "td-ss-main-content"
    assert [n.attr("href") for n in select(t, 'a[href=/page/2]')] == ["/page/2"]
    assert len(select(t, "time[datetime]")) == 3


def test_text_normalizes_whitespace():
    t = parse_html("<h1 class='t'>  A \n\t title  <b>bold</b>  end </h1>")
    assert select(t, "h1.t")[0].text() == "A title bold end"


def test_void_elements_do_not_swallow_siblings():
    t = parse_html('<div class="c"><img src="x.jpg"><p>after</p></div>')
    assert select(t, ".c > p")[0].text() == "after"
    assert select(t, ".c > img")[0].attr("src") == "x.jpg"


def _render(order_seed: int) -> str:
    """The same logical page in different bytes: attribute order, extra
    attributes, and spacing all vary with the seed."""
    def tag(name, attrs):
        attrs = list(attrs) + [("data-noise", f"n{order_seed}")]
        k = order_seed % len(attrs)
        attrs = attrs[k:] + attrs[:k]
        sep = [" ", "\n   ", "  "][order_seed % 3]
        return ("<" + name
                + "".join(f'{sep}{a}="{v}"' for a, v in attrs) + ">")

    return (
        "<html><body>"
        + tag("header", [("class", "hd"), ("role", "banner")])
        + tag("h1", [("class", "entry-title"), ("itemprop", "name")])
        + "Title here</h1>"
        + tag("div", [("class", "meta-info"), ("id", "mi")])
        + "May 30, 2021 11:00</div></header>"
        + tag("div", [("class", "feat")])
        + tag("img", [("src", "/f.jpg"), ("width", "900")])
        + "</div>"
        + tag("div", [("class", "content side")])
        + "<p>para one</p><p>para two</p></div>"
        "</body></html>"
    )


SEL_RULES = {
    "title": {"sel": ".entry-title"},
    "pub": {"sel": "header > .meta-info"},
    "block": {"para_sel": ".content.side p", "img_sel": ".feat img"},
}


def test_extract_payload_selector_rules_survive_markup_jumbling():
    """Three renderings of one DOM — shuffled attribute order, junk
    attributes, varied whitespace — extract identically through selector
    rules; a regex rule pinned to one byte form would match only one."""
    outs = [
        extract_payload("article", _render(s), SEL_RULES) for s in (0, 1, 2)
    ]
    assert outs[0] == outs[1] == outs[2]
    o = outs[0]
    assert o["title"] == "Title here"
    assert o["pub_time_raw"] == "May 30, 2021 11:00"
    assert o["paras"] == ["para one", "para two"]
    assert o["imgs"] == [{"after_para": -1, "src": "/f.jpg"}]


def test_extract_payload_selector_entries_and_scalars():
    t_rules = {
        "entry": {"sel": ".td-ss-main-content .td-module-thumb > a"},
        "page_time": {"sel": ".td-ss-main-content > div time", "index": -1},
        "next": {"sel": ".page-nav.td-pb-padding-side > a", "index": -1,
                 "attr": "href"},
    }
    out = extract_payload("list", DOC, t_rules)
    assert [e["href"] for e in out["entries"]] == ["/a1", "/a2"]
    # [-1] indexing: the LAST direct-child div's time gates pagination
    assert out["page_time_raw"] == "May 29, 2021"
    assert out["next"] == "/page/2"


def test_selector_entry_fields_form():
    html = (
        '<ul><li class="it"><a class="l" href="/x">X story</a>'
        '<span class="d">May 1, 2021</span></li>'
        '<li class="it"><a class="l" href="/y">Y story</a>'
        '<span class="d">May 2, 2021</span></li></ul>'
    )
    rules = {
        "entry": {
            "sel": "li.it",
            "fields": {
                "href": {"sel": "a.l", "attr": "href"},
                "title": {"sel": "a.l"},
                "time": {"sel": "span.d"},
            },
        }
    }
    out = extract_payload("list", html, rules)
    assert out["entries"][0] == {
        "href": "/x", "title": "X story", "pub_time_raw": "May 1, 2021",
        "img": None, "abstract": None, "cat2": None, "kind": None,
    }
    assert out["entries"][1]["href"] == "/y"


def test_sibling_combinators():
    """``~`` (general) and ``+`` (adjacent) sibling combinators — the
    boholchronicle.py:50-54 body selection shape."""
    html = (
        '<div id="c"><div class="heateorSssClear"></div>'
        "<p>first para</p><span>x</span><p>second para</p></div>"
        "<div><p>outside</p></div>"
    )
    root = parse_html(html)
    assert [n.text() for n in select(root, ".heateorSssClear ~ p")] == [
        "first para", "second para",
    ]
    assert [n.text() for n in select(root, ".heateorSssClear + p")] == [
        "first para",
    ]
    assert [n.text() for n in select(root, "span + p")] == ["second para"]
    # combinators compose with the rest of a path
    assert [n.text() for n in select(root, "#c .heateorSssClear ~ span")] \
        == ["x"]


def test_menu_group_specs_fixed_labels():
    """A LIST of category specs = menu groups with hardcoded labels
    (boholchronicle.py:28-34): sub-link text becomes label2; a group with
    label2=False emits none."""
    html = (
        '<ul><li id="menu-item-1"><a href="#">x</a>'
        '<ul class="sub-menu"><li><a href="/n/top/">Top</a></li>'
        '<li><a href="/n/local/">Local</a></li></ul></li>'
        '<li id="menu-item-2"><a href="/nation/">Nation</a></li></ul>'
    )
    rules = {
        "category": [
            {"sel": "#menu-item-1 .sub-menu li a", "label": "News"},
            {"sel": "#menu-item-2 a", "label": "Nation", "label2": False},
        ],
    }
    out = extract_payload("menu", html, rules)
    assert [
        (c["href"], c["label"], c.get("label2")) for c in out["categories"]
    ] == [
        ("/n/top/", "News", "Top"),
        ("/n/local/", "News", "Local"),
        ("/nation/", "Nation", None),
    ]


def test_menu_skip_slice():
    """``skip`` on a category spec drops the first n matched links —
    latestnews1.py:46's menu[1:] (Home is never requested)."""
    html = (
        '<ul id="m"><li><a href="/home/">Home</a></li>'
        '<li><a href="/c/india/">IN</a></li>'
        '<li><a href="/c/world/">WD</a></li></ul>'
    )
    out = extract_payload(
        "menu", html, {"category": {"sel": "#m li a", "skip": 1}}
    )
    assert [c["href"] for c in out["categories"]] == [
        "/c/india/", "/c/world/",
    ]


def test_cat1_self_scraped_off_list_page():
    """``cat1_self`` reads category1 off the LIST page's own header
    (latestnews1.py:55)."""
    html = (
        '<div id="content"><header class="page-header"><h1>'
        "<span>India News</span></h1></header>"
        '<div class="ac"><a href="/x/">t</a></div></div>'
    )
    out = extract_payload(
        "list", html,
        {"entry": {"sel": ".ac a"},
         "cat1_self": {"sel": "header.page-header h1 span"}},
    )
    assert out["cat1_self"] == "India News"
    assert out["entries"][0]["href"] == "/x/"


def test_skip_if_soft_404():
    """``skip_if`` marks a 200 page rendering an error template as a soft
    404 — no fields extracted (latestnews1.py:75-77)."""
    rules = {"skip_if": {"sel": ".error404"},
             "title": {"sel": "h1"}, "block": {"para_sel": "p"}}
    gone = extract_payload(
        "article", '<body class="error404"><h1>x</h1><p>y</p></body>', rules
    )
    assert gone == {"skipped": True}
    ok = extract_payload(
        "article", "<body><h1>x</h1><p>y</p></body>", rules
    )
    assert ok["title"] == "x" and ok["paras"] == ["y"]


def test_body_fallback_trim():
    """``body_fallback``: container text trimmed by the spec's ``re`` when
    no <p> survives ``block`` (latestnews1.py:90-96)."""
    rules = {
        "block": {"para_sel": ".ec p"},
        "body_fallback": {"sel": ".ec", "re": r"LinkedIn(.*?) Share"},
    }
    html = (
        '<div class="ec"><span>Share</span><span>n7</span>'
        "<span>LinkedIn</span>real body <span>Share</span></div>"
    )
    out = extract_payload("article", html, rules)
    assert out["paras"] == ["real body"]
    # structured paragraphs win when present
    out2 = extract_payload(
        "article", '<div class="ec"><p>para</p></div>', rules
    )
    assert out2["paras"] == ["para"]


def test_attr_prefix_match():
    """``[attr^=value]`` value-prefix matching, quoted or bare — the
    href-filtered menu selector of bworldonline.py:40."""
    tree = parse_html(
        "<ul id='m'>"
        "<li><a href='https://ex.com/category/econ/'>c</a></li>"
        "<li><a href='https://ex.com/about/'>a</a></li>"
        "<li><a>none</a></li></ul>"
    )
    hits = select(tree, '#m > li > a[href^="https://ex.com/category/"]')
    assert [n.attr("href") for n in hits] == ["https://ex.com/category/econ/"]
    # bare (unquoted) value and exact [attr=v] still work
    assert len(select(tree, "a[href^=https://ex.com/]")) == 2
    assert len(select(tree, "a[href=https://ex.com/about/]")) == 1
    assert len(select(tree, "a[href]")) == 2
