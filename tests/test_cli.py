"""The python -m crawler_spark CLI: crawl (start.bat parity) + report
(baogao.py parity) against the real-site fixture graph, in-process."""

from __future__ import annotations

import json

from crawler_spark.__main__ import main


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, out


def test_list_sites(spark, capsys):
    rc, out = _run(capsys, ["list-sites"])
    assert rc == 0
    assert "zeenews" in out and "shangbao" in out and len(out) >= 15


def test_crawl_then_report(spark, capsys, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    rc, out = _run(
        capsys, ["crawl", "shangbao", "--checkpoint", ckpt, "--cpus", "4"]
    )
    assert rc == 0
    summary = json.loads(out[-1])
    assert summary["sites"] == ["shangbao"]
    assert summary["docs"] > 0 and summary["fetched"] >= summary["docs"]
    assert summary["docs_per_site"] == {"184": summary["docs"]}

    xls = str(tmp_path / "report.xls")
    eml = str(tmp_path / "report.eml")
    rc, out = _run(capsys, ["report", "--checkpoint", ckpt,
                            "--xls", xls, "--eml", eml,
                            "--email-to", "ops@localhost"])
    assert rc == 0
    rep = json.loads(out[-1])
    assert rep["total"] == summary["docs"]
    assert rep["eml"] == eml
    import email
    import email.policy
    import os
    msg = email.message_from_string(
        open(eml, encoding="utf-8").read(), policy=email.policy.default
    )
    assert msg["Subject"] == "数据部每日报告 " + rep["date"]
    # the rendered message attaches every workbook file --xls produced
    names = [p.get_filename() for p in msg.iter_parts()
             if p.get_filename()]
    assert names == [os.path.basename(p) for p in rep["workbook"]]
    daily = {r["website_id"]: r for r in rep["daily"]}
    assert daily[184]["c_name"] == "shangbao"
    assert daily[184]["language"] == "Chinese"
    cum = {r["website_id"]: r for r in rep["cumulative"]}
    assert cum[184]["num"] == summary["docs"]


def test_crawl_rejects_unknown_site(spark, capsys, tmp_path):
    rc, _ = _run(
        capsys,
        ["crawl", "nosuchsite", "--checkpoint", str(tmp_path / "c")],
    )
    assert rc == 2


def test_time_argument_tightens_cutoff(spark, capsys, tmp_path):
    """start.bat semantics: a newer --time epoch cuts pagination earlier,
    so fewer documents are stored."""
    from crawler_spark.sources.real_sites import BASE_DT
    from datetime import timezone

    base = BASE_DT.replace(tzinfo=timezone.utc).timestamp()
    rc, out = _run(capsys, [
        "crawl", "shangbao", "--checkpoint", str(tmp_path / "a"),
        "--cpus", "4",
    ])
    assert rc == 0
    wide = json.loads(out[-1])["docs"]
    rc, out = _run(capsys, [
        "crawl", "shangbao", "--checkpoint", str(tmp_path / "b"),
        "--cpus", "4", "--time", str(base - 3 * 3600),
    ])
    assert rc == 0
    narrow = json.loads(out[-1])["docs"]
    assert 0 < narrow < wide
