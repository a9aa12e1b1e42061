"""Search-index construction over the crawled corpus: BM25 term
weighting (Robertson/Spärck Jones; the Okapi BM25 of Robertson et al.
TREC-3) — the indexing step a retrieval or data-curation pipeline runs
over crawl output (e.g. building the dedup/retrieval index the reference's
warehouse feeds downstream).

Spark-first shape, three shuffles, all JVM expressions:

1. tokenize once per doc (split), carry doc length, explode to terms,
   partial-agg groupBy (doc, term) -> tf                [shuffle on (doc,term)]
2. document frequency as a window count over the term key (no join —
   the tf relation already holds one row per (doc, term))  [shuffle on term]
   Hot stopword terms make a few partitions heavy at corpus scale; AQE
   skew handling splits them (the per-row work is a constant arithmetic
   expression, so a split partition has no cross-row dependency).
3. corpus stats (N, avgdl) as a one-row aggregate cross-joined in-plan
   (BroadcastNestedLoopJoin over a single row — the same pattern as the
   PageRank dangling-mass term), then the BM25 formula and a per-doc
   top-k window                                          [shuffle on doc]

Cross-engine exactness: every arithmetic step is IEEE +,-,*,/ in the
same order in the Spark expression and the DuckDB oracle; the one libm
call (ln) feeds a round(., 4) taken BEFORE the ordering so rank and
score are both stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_top_terms(
    docs: DataFrame,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``top_n`` terms by BM25 weight.

    Returns (doc_id, term, tf, df, score, rank); rank is 1-based by
    rounded score descending, term ascending (deterministic ties).
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("ts"),
    ).select("doc_id", F.size("ts").alias("dl"), F.explode("ts").alias("term"))
    tf = base.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    with_df = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    # avgdl needs one dl per doc — aggregate the per-doc lengths, not the
    # exploded rows (a doc's dl repeats once per distinct term).
    doc_lens = tf.select("doc_id", "dl").distinct()
    stats = doc_lens.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    scored = with_df.crossJoin(F.broadcast(stats)).withColumn(
        "score",
        F.round(
            F.log(
                (
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                + F.lit(1.0)
            )
            * (F.col("tf") * F.lit(BM25_K1 + 1.0))
            / (
                F.col("tf")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
                )
            ),
            4,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )
