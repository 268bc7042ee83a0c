"""Worked example: the reference's daily-import pipeline shape
(examples/build_tutorial05.py in /root/reference) re-expressed on this
engine, extended with the LLM-curation stages.

Run:  python -m accelerator_spark.cli run /tmp/example_wd examples/build_pipeline.py

Per "day" it imports a batch (memoized — re-running skips finished
days), types it, hash-partitions on the analysis key, links it into a
chain, and logs it in urd; then reports over the whole chain, and runs a
dedup pass over the documents corpus.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def import_day(spark, datasets, options):
    """csvimport-equivalent: here the 'raw feed' is a parquet slice; a
    real feed would use accelerator_spark.sources.csvimport."""
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return df.filter(F.col("o_orderkey") % 3 == options["day"])


def typed_orders(spark, datasets, options):
    """dataset_type stage: stringly input -> typed with bad capture."""
    from accelerator_spark.functions import dataset_type

    raw = datasets["orders"].df(spark).select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        F.col("o_totalprice").cast("string").alias("o_totalprice"),
    )
    typed, _bad = dataset_type(
        raw,
        {"o_orderkey": "int64_10", "o_custkey": "int64_10",
         "o_totalprice": "float64"},
        filter_bad=True,
        hashlabel="o_custkey",  # typed+rehash fused
    )
    return typed


def report(spark, datasets, options):
    """aggregate over the full chain (union of all days)."""
    chain = datasets["latest"].chain_df(spark)
    return {
        "default": chain.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("spend")),
        "totals": {"rows": chain.count()},
    }


def dedup_documents(spark, datasets, options):
    """The one-call near-dedup composite as a memoized build step:
    MinHash LSH proposes, exact Jaccard disposes, components + min-id
    survivor selection shrink the corpus — dropping the old raw
    candidates-only anti-join, which removed docs that merely COLLIDED
    in one LSH band (unverified false positives)."""
    from accelerator_spark.operators.dedup import text_near_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    kept, _report, _edges = text_near_dedup(docs, threshold=0.5,
                                            hash_family="xxhash64")
    return kept


def curate_documents(spark, datasets, options):
    """The full curation sweep over the deduped corpus, every stage a
    map-level op in ONE pass: line cleaning -> PII redaction -> quality
    score, then LM scoring (2 shuffles) and sequence packing."""
    from accelerator_spark.operators.text import (
        clean_lines, pack_sequences, quality_score, redact_pii,
        unigram_logprob,
    )

    docs = datasets["docs"].df(spark)
    cleaned = (
        clean_lines(docs, min_words=3)
        .withColumn("text", redact_pii(F.col("text_clean")))
        .drop("text_clean")
    )
    scored = quality_score(cleaned, min_tokens=5)
    kept = scored.filter(F.col("q_keep")).select(
        "doc_id", "text", "lang", "source")
    lm = unigram_logprob(kept)
    packed = pack_sequences(
        kept.join(lm.select("doc_id", "avg_logprob"), "doc_id"),
        budget=512)
    return {
        "default": packed,
        "stats": {
            "in": docs.count(),
            "kept": kept.count(),
            "sequences": packed.select("bucket", "seq_id").distinct().count(),
        },
    }


def select_and_chunk(spark, datasets, options):
    """Round-2 curation tail: classifier-score the curated docs, keep
    positive scores, rebalance the source mixture (uniform target
    weights), then chunk to 50-token/stride-40 training windows."""
    from accelerator_spark.operators.partition import mixture_sample
    from accelerator_spark.operators.text import chunk_tokens, hashed_bow_score

    docs = datasets["docs"].df(spark).select("doc_id", "text", "lang", "source")
    scored = hashed_bow_score(docs)
    good = scored.filter(F.col("score") > 0).drop("wsum", "n_toks", "score")
    sampled, quotas = mixture_sample(
        good, "source", "doc_id", frac=options.get("frac", 0.8))
    chunks = chunk_tokens(sampled, size=50, stride=40,
                          carry=["doc_id", "source"])
    return {
        "default": chunks.select(
            "doc_id", "source", "chunk_index",
            F.concat_ws(" ", "chunk_toks").alias("chunk_text")),
        "stats": {
            "scored": docs.count(),
            "kept_good": good.count(),
            "sampled": sampled.count(),
            "chunks": chunks.count(),
        },
    }


def fold_order_changes(spark, datasets, options):
    """CDC tail: a synthetic daily change feed folded into the typed
    orders chain head with apply_changes (MERGE INTO semantics)."""
    from accelerator_spark.operators.merge import apply_changes

    cur = datasets["orders"].df(spark)
    changes = (
        cur.filter(F.col("o_orderkey") % 5 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("op", F.lit("U"))
        .unionByName(
            cur.filter(F.col("o_orderkey") % 5 == 2).withColumn("op", F.lit("D")))
    )
    return apply_changes(cur, changes, "o_orderkey")


def quality_gate(spark, datasets, options):
    """Round-2b: profile + declarative constraints as a pipeline stage.
    The profile is the step's dataset output; violations ship as a JSON
    artifact a build script can assert on (fail the build, not the
    downstream consumer)."""
    from accelerator_spark.operators.profile import check_constraints, profile

    df = datasets["orders"].df(spark)
    rep = check_constraints(
        df, not_null=["o_orderkey"], unique=["o_orderkey"],
        ranges={"o_totalprice": (0.0, 1e9)})
    return {
        "default": profile(df),
        "violations": {r["rule"]: r["n_violations"] for r in rep.collect()},
    }


def reach_rollup(spark, datasets, options):
    """Round-2b: mergeable distinct state — exact customer reach per
    order status via OR-merged bitmaps (daily bitmaps at scale; here
    merged from per-status partials in one expression pipeline)."""
    from accelerator_spark.operators.sketches import bitmap_distinct

    df = datasets["orders"].df(spark).withColumn(
        "price_band", (F.col("o_totalprice") / 100000).cast("int"))
    return bitmap_distinct(df, key_col="o_custkey",
                           group_cols=["price_band"],
                           out_col="distinct_customers")


def export_zordered(spark, datasets, options):
    """Round-2b: multi-dimensional layout for the serving copy — rows
    clustered on a Morton curve over (o_custkey, o_totalprice) so range
    scans on either column skip most row groups."""
    from accelerator_spark.operators.partition import zorder_layout

    df = datasets["orders"].df(spark)
    return zorder_layout(df, ["o_custkey", "o_totalprice"], bits=6)


def main(urd):
    prev = None
    for day in range(3):
        imp = urd.build(import_day, options={"day": day})
        typed = urd.build(typed_orders, datasets={"orders": imp.dataset()},
                          previous=prev, hashlabel="o_custkey")
        prev = typed.dataset()
        urd.add("daily-orders", f"2024-01-0{day + 1}",
                {"job": typed.jobid, "dataset": prev.path})
        print(f"day {day}: {typed.jobid} cached={typed.cached} lines={prev.lines}")

    rep = urd.build(report, datasets={"latest": prev})
    print("report rows:", rep.dataset().lines, "totals:", rep.load("totals"))

    dd = urd.build(dedup_documents)
    print("documents after near-dup removal:", dd.dataset().lines)

    cur = urd.build(curate_documents, datasets={"docs": dd.dataset()})
    print("curation stats:", cur.load("stats"))

    sel = urd.build(select_and_chunk, datasets={"docs": dd.dataset()},
                    options={"frac": 0.8})
    print("select+chunk stats:", sel.load("stats"))

    folded = urd.build(fold_order_changes, datasets={"orders": prev})
    print("orders after CDC fold:", folded.dataset().lines)

    gate = urd.build(quality_gate, datasets={"orders": prev})
    viol = gate.load("violations")
    assert all(v == 0 for v in viol.values()), f"quality gate failed: {viol}"
    print("quality gate clean:", viol)

    reach = urd.build(reach_rollup, datasets={"orders": prev})
    print("reach rollup rows:", reach.dataset().lines)

    z = urd.build(export_zordered, datasets={"orders": prev})
    print("z-ordered export lines:", z.dataset().lines)
