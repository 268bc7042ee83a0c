"""End-to-end crawl-to-training-set integration: WARC bytes in, packed
Arrow shards out, every stage the production operator. This is the
pipeline a user of the engine actually runs — the test wires the r8
crawl front (WARC -> charset decode -> HTML extract) into the r9b
additions (Markdown, Bloom decontamination, BPE tokens, Arrow export)
and asserts values, not just counts, at each hop."""

import gzip

from pyspark.sql import functions as F


def _crawl_bytes():
    """A 7-page crawl: 2 hosts, one exact duplicate pair, one NEAR
    duplicate (same body plus a bonus line — invisible to exact
    hashing), one cp1252-encoded page, one boilerplate-only page."""
    from accelerator_spark.sources.warc import warc_build

    def page(title, body_html, charset="utf-8"):
        html = (f"<html><head><title>{title}</title></head>"
                f"<body><h1>{title}</h1>{body_html}"
                "<script>tracking();</script></body></html>")
        return html.encode(charset)

    recs = [
        {"warc_type": "response", "target_uri": "http://a.example/1",
         "payload": page("Alpha", "<p>The quick brown fox jumps.</p>"),
         "http": (200, "text/html; charset=utf-8")},
        {"warc_type": "response", "target_uri": "http://a.example/2",
         "payload": page("Beta", "<p>Caf\xe9 ole — smart.</p>",
                         "cp1252"),
         "http": (200, "text/html; charset=windows-1252")},
        {"warc_type": "response", "target_uri": "http://b.example/1",
         "payload": page("Alpha", "<p>The quick brown fox jumps.</p>"),
         "http": (200, "text/html; charset=utf-8")},   # exact dup of /1
        {"warc_type": "response", "target_uri": "http://b.example/3",
         "payload": page("Alpha", "<p>The quick brown fox jumps.</p>"
                                  "<p>Bonus line.</p>"),
         "http": (200, "text/html; charset=utf-8")},  # NEAR dup of /1
        {"warc_type": "response", "target_uri": "http://b.example/2",
         "payload": page("Gamma", "<p>Totally different words here "
                                  "for the corpus.</p>"),
         "http": (200, "text/html; charset=utf-8")},
        {"warc_type": "response", "target_uri": "http://b.example/404",
         "payload": b"<html><body>not found</body></html>",
         "http": (404, "text/html")},
        {"warc_type": "request", "target_uri": "http://b.example/1",
         "payload": b"GET / HTTP/1.1"},
    ]
    return warc_build(recs, gzip_members=True)


def test_crawl_to_training_set(spark, tmp_path):
    from accelerator_spark.operators.bpe import bpe_tokenize, bpe_train
    from accelerator_spark.operators.charset import decode_payload
    from accelerator_spark.operators.dedup import exact_dedup
    from accelerator_spark.operators.html import html_extract
    from accelerator_spark.operators.markdown import html_to_markdown
    from accelerator_spark.operators.sketches import (
        bloom_build, bloom_prefilter)
    from accelerator_spark.sources.arrowipc import arrow_export, arrow_import
    from accelerator_spark.sources.warc import warc_import

    crawl_dir = tmp_path / "crawl"
    crawl_dir.mkdir()
    (crawl_dir / "shard-0.warc.gz").write_bytes(_crawl_bytes())

    # 1. ingest: only 200 HTML responses move on
    recs = warc_import(spark, str(crawl_dir))
    pages = recs.filter((F.col("warc_type") == "response")
                        & (F.col("http_status") == 200))
    assert pages.count() == 5

    # 2. charset-aware decode: the cp1252 page must come out exact
    pages = pages.withColumn("record_id",
                             F.monotonically_increasing_id())
    texts = decode_payload(pages).join(
        pages.select("record_id", "target_uri"), "record_id")
    by_uri = {r.target_uri: r for r in texts.collect()}
    assert "Café ole — smart." in by_uri["http://a.example/2"].text
    assert by_uri["http://a.example/2"].charset_used in (
        "cp1252", "windows-1252")

    # 3. structure: html_extract for text, markdown for training form
    docs = texts.select(F.col("record_id").alias("doc_id"),
                        "target_uri", "text")
    ex = html_extract(docs).join(docs.select("doc_id", "target_uri"),
                                 "doc_id")
    md = html_to_markdown(docs).join(docs.select("doc_id", "target_uri"),
                                     "doc_id")
    md_by_uri = {r.target_uri: r.markdown for r in md.collect()}
    assert md_by_uri["http://a.example/1"].startswith(
        "# Alpha\n\nThe quick brown fox jumps.")
    assert "tracking()" not in md_by_uri["http://a.example/1"]

    # 4. exact dedup on extracted text: the cross-host dup collapses,
    # but the bonus-line near-copy sails through (distinct md5)
    body = ex.select("doc_id", "text")
    keep = exact_dedup(body, text_col="text")
    assert keep.count() == 4
    assert keep.agg(F.max("n_copies")).first()[0] == 2  # the dup pair
    kept = body.join(
        keep.select(F.col("keep_doc_id").alias("doc_id")), "doc_id")

    # 4b. NEAR dedup (the one-call composite: LSH candidates -> exact
    # Jaccard verify -> components), keeping the LONGEST member —
    # the near pair collapses to the bonus-line variant, not the
    # min-id original (the r12 survivor policy)
    from accelerator_spark.operators.dedup import text_near_dedup
    uris = ex.select("doc_id", "target_uri")
    kept, report, edges = text_near_dedup(
        kept.withColumn("n_chars", F.length("text")),
        threshold=0.5, keep=("max", "n_chars"))
    kept = kept.select("doc_id", "text")
    kept_uris = {r.target_uri
                 for r in kept.join(uris, "doc_id").collect()}
    assert "http://b.example/3" in kept_uris        # longest survives
    assert "http://a.example/1" not in kept_uris    # min-id dropped
    assert kept.count() == 3
    assert edges.count() == 1 and edges.first().jaccard >= 0.5

    # 5. decontamination: Bloom-block the page whose text matches the
    # "benchmark" set (map-only probe), then anti-join the maybes out
    bench = spark.createDataFrame(
        [("Gamma\nTotally different words here for the corpus.",)],
        "text string")
    bf = bloom_build(bench.select(F.md5("text").alias("fp")), "fp",
                     m_bits=1 << 12, n_hashes=3)
    with_fp = kept.withColumn("fp", F.md5(F.col("text")))
    contaminated = bloom_prefilter(with_fp, bf, "fp").select("doc_id")
    survivors = kept.join(contaminated, "doc_id", "left_anti")
    # 2 of the 3 unique docs survive (Gamma was contaminated)
    assert survivors.count() == 2

    # 6. tokenize with a corpus-trained BPE and export Arrow shards
    merges = bpe_train(survivors, text_col="text", n_merges=50,
                       max_words=1000)
    toks = bpe_tokenize(survivors, merges, text_col="text")
    out_dir = str(tmp_path / "shards")
    n = arrow_export(toks.select("doc_id", "tokens", "n_tokens"),
                     out_dir)
    assert n == 2
    back = arrow_import(spark, out_dir)
    got = {r.doc_id: r.n_tokens for r in back.collect()}
    assert set(got) == {r.doc_id for r in survivors.collect()}
    assert all(v > 0 for v in got.values())


def _wds_shards(tmp_path):
    """Three WebDataset shards of (png, txt) samples: an exact
    duplicate pair ACROSS shards, a one-pixel near-duplicate, a
    90-degree rotated copy (must NOT dedup), and distinct fillers."""
    import hashlib

    from accelerator_spark.functions.png import png_encode
    from accelerator_spark.sources.tar import tar_build

    def grid(seed):
        return list(b"".join(
            hashlib.md5(b"wds%d:%d" % (seed, k)).digest()
            for k in range(5))[:72])

    base = grid(1)
    near = base[:]
    near[30] = (near[30] + 77) % 256
    rot90 = [base[(7 - x) * 9 + y] for y in range(9) for x in range(8)]

    def png(px, w=9, h=8):
        return png_encode(px, w, h, color_type=0)

    samples = {                      # key -> (pixels, w, h, shard)
        "a/dup0": (png(base), 0), "b/dup1": (png(base), 1),
        "a/near": (png(near), 0),
        "c/rot": (png(rot90, 8, 9), 2),
        "b/solo1": (png(grid(2)), 1), "c/solo2": (png(grid(3)), 2),
    }
    shard_members = {0: [], 1: [], 2: []}
    for key, (img, shard) in sorted(samples.items()):
        shard_members[shard].append((f"{key}.png", img))
        shard_members[shard].append(
            (f"{key}.txt", f"caption of {key}".encode()))
    d = tmp_path / "shards_in"
    d.mkdir()
    for shard, members in shard_members.items():
        (d / f"shard-{shard}.tar.gz").write_bytes(
            tar_build(members, mtime=1600000000, gzip_compress=True))
    return d


def test_webdataset_image_dedup_loop(spark, tmp_path):
    """The multimodal curation loop end-to-end, every stage the
    production operator: WebDataset shards in (tar_import), perceptual
    near-dup candidates (image_dhash -> dhash_near_pairs), canonical
    groups (connected_components, keep min key), survivors re-exported
    as WebDataset shards (tar_export) and re-imported intact — the
    image twin of the crawl-to-training-set pipeline."""
    from accelerator_spark.operators.dedup import connected_components
    from accelerator_spark.operators.multimodal import (
        dhash_near_pairs, image_dhash)
    from accelerator_spark.sources.tar import tar_export, tar_import

    members = tar_import(spark, str(_wds_shards(tmp_path)))
    assert members.count() == 12

    images = members.filter(F.col("ext") == "png").select(
        F.col("sample_key").alias("media_id"),
        "payload", F.lit("image/png").alias("mime"))
    hashed = image_dhash(images)
    pairs = dhash_near_pairs(hashed, max_hamming=6)
    got_pairs = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert ("a/dup0", "b/dup1") in got_pairs          # exact dup
    assert any(a == "a/dup0" or b == "a/near"
               for a, b in got_pairs if "a/near" in (a, b))
    assert not any("c/rot" in p for p in got_pairs)    # rotation differs

    comp = connected_components(pairs)                 # (node, component)
    drop = comp.filter(F.col("node") != F.col("component")) \
               .select(F.col("node").alias("sample_key"))
    survivors = members.join(drop, "sample_key", "left_anti")

    out = tmp_path / "shards_out"
    n = tar_export(
        survivors.select("sample_key", "ext", "payload"), str(out),
        n_shards=2)
    back = tar_import(spark, str(out))
    keys = {r.sample_key for r in
            back.select("sample_key").distinct().collect()}
    assert keys == {"a/dup0", "c/rot", "b/solo1", "c/solo2"}
    assert n == back.count() == 8                      # png+txt each
    # payload identity for a surviving sample, both parts
    first = {r.ext: bytes(r.payload) for r in back.filter(
        F.col("sample_key") == "b/solo1").collect()}
    orig = {r.ext: bytes(r.payload) for r in members.filter(
        F.col("sample_key") == "b/solo1").collect()}
    assert first == orig and set(first) == {"png", "txt"}


def test_near_dedup_as_memoized_build_step(spark, tmp_path):
    """The r11/r12 near-dedup composites are reachable from the
    build(step) memoized pipeline (VERDICT r11 #6): a step whose body
    is text_near_dedup builds once, is served from cache on re-build,
    and re-builds when its dedup options change."""
    from pyspark.sql import functions as F  # noqa: F811

    from accelerator_spark.build import BuildContext
    from accelerator_spark.dataset import Dataset

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different content about spark engines"),
    ]
    src = Dataset.write(
        spark.createDataFrame(rows, "doc_id long, text string"),
        str(tmp_path / "src"))
    ctx = BuildContext(spark, str(tmp_path / "wd"))

    def step_near_dedup(spark, datasets, options):
        from accelerator_spark.operators.dedup import text_near_dedup

        docs = datasets["docs"].df(spark)
        kept, _report, _edges = text_near_dedup(
            docs, threshold=options["threshold"])
        return kept

    j1 = ctx.build(step_near_dedup, options={"threshold": 0.5},
                   datasets={"docs": src})
    assert not j1.cached
    got = sorted(r.doc_id for r in j1.df().collect())
    assert got == [1, 3]  # exact pair collapses to min id
    j2 = ctx.build(step_near_dedup, options={"threshold": 0.5},
                   datasets={"docs": src})
    assert j2.cached and j2.jobid == j1.jobid
    j3 = ctx.build(step_near_dedup, options={"threshold": 0.9},
                   datasets={"docs": src})
    assert not j3.cached and j3.jobid != j1.jobid
