"""Dedup operators.

1. URL-seen dedup (the crawl engine's defining stage) — replaces the
   reference's per-request MySQL probe (demo/middlewares.py:50-68) with:
   intra-batch dropDuplicates → bloom prefilter → exact left-anti join.
   The ``dont_filter`` bypass column mirrors meta['dont_filter']
   (middlewares.py:55; used by demo/已部署/maharashtratimes.py:44-45).

2. Corpus near-duplicate families for training-data pipelines: exact
   (hash-groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
   (signature → banded bucket join → exact verify), SimHash (bit-majority
   fingerprint + pigeonhole banding). All signature math is pure JVM
   higher-order expressions — no Python in any hot path.

Scale notes: the anti-join shuffles only bloom-positive candidates (the
rare case); LSH band joins shuffle (band_idx, band_hash) keys which are
uniform by construction, so no skew salting is needed there. Exact-verify
joins carry shingle arrays only for the candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions.text import word_shingles
from crawler_spark.operators.bloom import BloomFilter, bloom_probe_col, build_bloom


# ---------------------------------------------------------------------------
# URL-seen (crawl frontier) dedup
# ---------------------------------------------------------------------------

def intra_batch_dedup(candidates: DataFrame) -> DataFrame:
    """Keep exactly one row per URL within a batch — the lineage-smallest
    ``seq`` so the survivor is deterministic under any partitioning
    (Scrapy's engine-level dupefilter, SURVEY §2.2 D3).

    row_number window, not min_by hash-agg: with mostly-unique URLs the
    min_by struct buffer forces ObjectHashAggregate with a huge in-memory
    map (measured 4× slower on the 6M-URL microbench); the window's
    sort-based path pipelines with the shuffle and wins decisively."""
    w = Window.partitionBy("url").orderBy("seq")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_seen_filter(
    spark: SparkSession,
    candidates: DataFrame,
    url_seen: DataFrame,
    bloom: BloomFilter | None = None,
) -> DataFrame:
    """Drop candidates whose exact ``url`` is in the seen set, honoring the
    ``dont_filter`` bypass (middlewares.py:55).

    Two-tier: bloom-negative rows are *guaranteed* new (no false negatives)
    and skip the shuffle entirely; only bloom-positive rows reach the exact
    left-anti join, which resolves bloom false positives. Never drops on
    bloom evidence alone — parity with the reference's exact string match
    (middlewares.py:51) is preserved byte-for-byte.
    """
    bypass = candidates.filter(F.col("dont_filter"))
    subject = candidates.filter(~F.col("dont_filter"))

    if bloom is not None:
        maybe = subject.withColumn("_maybe", bloom_probe_col(spark, bloom, "url_hash"))
        definitely_new = maybe.filter(~F.col("_maybe")).drop("_maybe")
        suspects = maybe.filter(F.col("_maybe")).drop("_maybe")
    else:
        definitely_new = None
        suspects = subject

    survivors = suspects.join(
        url_seen.select("url").distinct(), on="url", how="left_anti"
    )
    if definitely_new is not None:
        survivors = survivors.unionByName(definitely_new)
    return survivors.unionByName(bypass)


def url_seen_bloom(spark: SparkSession, url_seen: DataFrame,
                   expected_items: int | None = None) -> BloomFilter:
    """Build the prefilter over the seen set's hashes."""
    return build_bloom(url_seen, "url_hash", expected_items=expected_items)


# ---------------------------------------------------------------------------
# Corpus near-duplicate operators (documents table: doc_id, text, ...)
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact-content dedup: md5 groupBy keeping the smallest id as the
    canonical representative. Map-side partial agg makes this one cheap
    shuffle of (hash → min_id, count)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard ≥ threshold.

    Plan: distinct (doc, shingle) → self-join on shingle (only co-shingled
    pairs materialize) → per-pair intersection count → |A|+|B|-∩ union.
    At 100 TB you'd cap per-shingle fanout (drop shingles with document
    frequency above a bound — stopword shingles contribute no signal and
    quadratic fanout); MinHash+LSH below is the true scale path.
    """
    sh = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), on="doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signature(docs: DataFrame, n: int = 3, num_hashes: int = 32,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """MinHash signature per document — array<long> of length ``num_hashes``.

    hash_i(s) = xxhash64(i || ':' || s); signature[i] = min over shingles.
    Pure higher-order built-ins (transform/array_min) — stays on the JVM,
    no shuffle at all (signatures are computed map-side).
    """
    shingles = word_shingles(F.col(text_col), n)
    sig = F.expr(
        "transform(sequence(0, {k}), i -> "
        "  array_min(transform(_sh, s -> xxhash64(concat(cast(i as string), ':', s)))))"
        .format(k=num_hashes - 1)
    )
    return (
        docs.select(F.col(id_col).alias("doc"), shingles.alias("_sh"))
        .filter(F.size("_sh") > 0)
        .select("doc", sig.alias("signature"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    est_margin: float = 0.2,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash LSH, exact-verified.

    bands × rows_per_band = num_hashes; a pair collides if any band of the
    signature matches exactly. Band collisions are first pruned by the
    signature-estimated Jaccard (matching components / num_hashes ≥
    threshold − est_margin) — a 32-long zip_with, orders of magnitude
    cheaper than shingle-set intersection — then survivors are verified
    against exact shingle Jaccard, so the output has no LSH false positives
    (false negatives bounded by the band S-curve 1-(1-s^r)^b and the
    estimate margin; both knobs widen for higher recall).

    Scale note: on low-entropy corpora band buckets are dense and raw
    collisions scale superlinearly; the estimate prefilter keeps the
    expensive verify join linear in the number of *plausible* pairs.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(docs, n, num_hashes, id_col, text_col)
    # Carry the full signature through the band explode: the signature is
    # then computed ONCE per doc and both sides of the band join already
    # hold it, so the estimate needs no extra joins (and no signature
    # recomputation — the dominant cost: |docs|·|shingles|·num_hashes
    # xxhash evaluations per scan). 32 longs × bands extra shuffle bytes
    # per doc is noise next to that.
    banded = sig.select(
        "doc",
        "signature",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"  struct(b as band_idx, "
                f"         xxhash64(concat_ws(',', slice(signature, b * {r} + 1, {r}))) as band_hash))"
            )
        ).alias("band"),
    ).select("doc", "signature", "band.band_idx", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    est = F.expr(
        f"size(filter(zip_with(a.signature, b.signature, (x, y) -> x = y),"
        f" v -> v)) / {num_hashes}"
    )
    cand = (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .filter(est >= threshold - est_margin)
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    # Exact verify: jaccard over shingle sets, only for plausible pairs.
    sh = (
        docs.select(F.col(id_col).alias("doc"),
                    word_shingles(F.col(text_col), n).alias("sh"))
        .select("doc", F.array_distinct("sh").alias("sh"))
    )
    return (
        cand.join(sh.withColumnRenamed("doc", "doc_a")
                  .withColumnRenamed("sh", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc", "doc_b")
              .withColumnRenamed("sh", "sh_b"), on="doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(text_col: str = "text", num_bits: int = 64):
    """64-bit SimHash as one JVM expression: per-token xxhash64, bit-majority
    vote across tokens, reassembled into a bigint. No shuffle, no Python."""
    return F.expr(
        "aggregate("
        "  transform(sequence(0, {nb}), b -> "
        "    if(aggregate(transform(split({t}, ' '), w -> xxhash64(w)),"
        "                 0L, (acc, h) -> acc + (shiftright(h, b) & 1)) * 2"
        "         >= size(split({t}, ' ')),"
        "       shiftleft(1L, b), 0L)),"
        "  0L, (a, x) -> a | x)".format(nb=num_bits - 1, t=text_col)
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of 64-bit SimHash.

    Pigeonhole banding: split 64 bits into max_hamming+1 chunks; any pair
    within distance d must agree exactly on ≥1 chunk, so an equi-join on
    (chunk_idx, chunk_value) finds all such pairs — a uniform-key shuffle,
    then exact bit_count verification."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sh = docs.select(F.col(id_col).alias("doc"),
                     simhash_col(text_col).alias("sh"))
    banded = sh.select(
        "doc", "sh",
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), c -> struct("
                f"  c as chunk_idx,"
                f"  (shiftright(sh, c * {width}) & {(1 << width) - 1}) as chunk_val))"
            )
        ).alias("ck"),
    ).select("doc", "sh", "ck.chunk_idx", "ck.chunk_val")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["chunk_idx", "chunk_val"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ threshold.

    Brute self-join baseline (exact). Normalizes once, computes the dot
    product with zip_with/aggregate built-ins — whole-stage codegen, no
    Python. For the sub-quadratic scale path see
    operators/similarity.lsh_topk (random-hyperplane bucketing)."""
    norm = F.expr(
        f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, v) -> acc + v))"
    )
    v = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        norm.alias("nrm"),
    )
    a = v.alias("a")
    b = v.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.vec, b.vec, (x, y) -> cast(x as double) * y),"
        " 0D, (acc, v) -> acc + v)"
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
