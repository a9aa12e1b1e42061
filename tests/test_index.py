"""BM25 index construction (operators/index.py) vs a Python reference
computing the identical IEEE expression."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from crawler_spark.operators.index import BM25_B, BM25_K1, bm25_top_terms


def _py_bm25(docs, top_n):
    toks = {d: t.split(" ") for d, t in docs}
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter()
    for d, c in tf.items():
        for term in c:
            df[term] += 1
    n = len(docs)
    avgdl = float(sum(len(ts) for ts in toks.values())) / n
    out = {}
    for d, ts in toks.items():
        dl = len(ts)
        rows = []
        for term, f in tf[d].items():
            idf = math.log(((n - df[term] + 0.5) / (df[term] + 0.5)) + 1.0)
            score = (
                idf
                * (f * (BM25_K1 + 1.0))
                / (f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl)))
            )
            # Spark's round() is decimal HALF_UP on the double's repr.
            score = float(
                Decimal(repr(score)).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            rows.append((term, f, df[term], score))
        rows.sort(key=lambda r: (-r[3], r[0]))
        out[d] = [
            (term, f, dfr, score, i + 1)
            for i, (term, f, dfr, score) in enumerate(rows[:top_n])
        ]
    return out


def test_bm25_matches_python_reference(spark):
    docs = [
        (1, "spark window join join join agg"),
        (2, "spark filter scan scan value"),
        (3, "window window window rare unique token"),
        (4, "value value agg filter spark spark spark join"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in bm25_top_terms(df, top_n=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.df, r.score, r.rank)
        )
    for d in got:
        got[d].sort(key=lambda t: t[4])
    expected = _py_bm25(docs, top_n=3)
    assert got == expected


def test_bm25_rare_term_outranks_stopword(spark):
    """A corpus-rare term must outscore a corpus-ubiquitous one at equal
    tf — the idf property the index exists for."""
    docs = [
        (1, "common rare common filler pad"),
        (2, "common filler two pad pad"),
        (3, "common other pad filler words"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {
        r.term: r.rank
        for r in bm25_top_terms(df, top_n=5).collect()
        if r.doc_id == 1
    }
    assert rows["rare"] < rows["common"]


def test_bm25_search_matches_python_reference(spark):
    from crawler_spark.operators.index import bm25_search

    docs = [
        (1, "spark window join join join agg"),
        (2, "spark filter scan scan value"),
        (3, "window window window rare unique token"),
        (4, "value value agg filter spark spark spark join"),
        (5, "scan scan scan scan scan scan scan scan"),
    ]
    terms = ("window", "join")
    full = _py_bm25(docs, top_n=10**6)
    expected = []
    for d, rows in full.items():
        w = {t: s for t, _tf, _df, s, _r in rows if t in terms}
        if not w:
            continue
        total = 0.0
        for t in terms:  # fixed-order addition, as the operator does
            total = total + w.get(t, 0.0)
        total = float(
            Decimal(repr(total)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        expected.append((d, total))
    expected.sort(key=lambda r: (-r[1], r[0]))
    expected = [(d, s, i + 1) for i, (d, s) in enumerate(expected[:3])]
    got = [
        (r.doc_id, r.score, r.rank)
        for r in bm25_search(
            spark.createDataFrame(docs, "doc_id long, text string"),
            terms, top_n=3,
        ).collect()
    ]
    assert sorted(got, key=lambda r: r[2]) == expected
