"""Worked example: a crawl directory in, packed training shards out —
every stage the production operator (the pipeline
tests/test_pipeline_e2e.py asserts value-by-value).

Run:  python examples/crawl_to_training_set.py <crawl_dir> <out_dir>

crawl_dir holds .warc.gz files (CommonCrawl layout; .cdx sidecars are
used for record-granular splits when present). out_dir receives Arrow
IPC shards of (doc_id, tokens, n_tokens).
"""

import sys

from pyspark.sql import functions as F

from accelerator_spark import get_spark
from accelerator_spark.operators.bpe import bpe_tokenize, bpe_train
from accelerator_spark.operators.charset import decode_payload
from accelerator_spark.operators.dedup import exact_dedup, text_near_dedup
from accelerator_spark.operators.html import html_extract
from accelerator_spark.operators.sketches import bloom_build, bloom_prefilter
from accelerator_spark.operators.text import quality_score
from accelerator_spark.sources.arrowipc import arrow_export
from accelerator_spark.sources.warc import warc_import


def main(crawl_dir: str, out_dir: str, holdout_texts=None) -> int:
    spark = get_spark()

    # 1. ingest: 200 HTML responses only (bounded Arrow batches;
    #    CDX sidecars fan single files into record ranges)
    pages = (warc_import(spark, crawl_dir)
             .filter((F.col("warc_type") == "response")
                     & (F.col("http_status") == 200))
             .withColumn("record_id", F.monotonically_increasing_id()))

    # 2. charset-aware decode (header param -> BOM -> meta prescan ->
    #    utf-8 -> cp1252), then real-parser HTML extraction
    texts = decode_payload(pages).select(
        F.col("record_id").alias("doc_id"), "text")
    docs = html_extract(texts).select("doc_id", "text")

    # 3. quality floor (JVM expressions, map-only): q_keep encodes the
    #    length / punctuation / repetition thresholds
    docs = (quality_score(docs)
            .filter(F.col("q_keep"))
            .select("doc_id", "text"))

    # 4. dedup, both tiers: exact (min-id per normalized fingerprint)
    #    collapses byte-identical mirrors cheaply, then the one-call
    #    NEAR-dedup composite (MinHash LSH candidates -> exact Jaccard
    #    verify -> components) catches the re-crawled/lightly-edited
    #    copies exact hashing misses — keeping the LONGEST member of
    #    each near-dup family, not the smallest id (keep=('max', ...))
    keep = exact_dedup(docs)
    docs = docs.join(keep.select(F.col("keep_doc_id").alias("doc_id")),
                     "doc_id")
    docs, _report, _edges = text_near_dedup(
        docs.withColumn("n_chars", F.length("text")),
        threshold=0.5, hash_family="xxhash64",
        keep=("max", "n_chars"))
    docs = docs.select("doc_id", "text")

    # 5. decontamination: Bloom-block anything matching the holdout
    #    set (map-only probe; exact anti-join on the survivor sliver)
    if holdout_texts:
        bench = spark.createDataFrame(
            [(t,) for t in holdout_texts], "text string")
        bench_fp = bench.select(F.md5("text").alias("fp"))
        bf = bloom_build(bench_fp, "fp", m_bits=1 << 16, n_hashes=3)
        flagged = bloom_prefilter(
            docs.withColumn("fp", F.md5("text")), bf, "fp")
        # the Bloom pass only PREFILTERS (~fp_rate clean docs land in
        # `flagged`); the exact semi-join on the sliver is what makes
        # removal exact (ADVICE r9)
        contaminated = flagged.join(bench_fp, "fp", "left_semi")
        docs = docs.join(contaminated.select("doc_id"), "doc_id",
                         "left_anti")

    # 6. corpus-trained BPE -> token arrays -> Arrow shards
    merges = bpe_train(docs, n_merges=4000, max_words=200_000)
    toks = bpe_tokenize(docs, merges)
    return arrow_export(toks.select("doc_id", "tokens", "n_tokens"),
                        out_dir)


if __name__ == "__main__":
    n = main(sys.argv[1], sys.argv[2])
    print(f"wrote {n} tokenized documents")
