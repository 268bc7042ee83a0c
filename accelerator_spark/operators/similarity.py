"""Similarity search over embedding columns (array<float>).

Two paths (north-star extension):
- brute-force exact cosine top-k: one distributed pass over the corpus
  per query batch (queries are broadcast). The correctness baseline.
- sign-LSH (random hyperplane) bucketed ANN: each vector gets a b-bit
  signature; candidates share a signature band; exact cosine reranks
  within buckets. Recall < 1 by construction — the scale path for
  corpora where n_queries * n_corpus is infeasible.

All vector math is JVM-side higher-order functions (zip_with/aggregate);
hyperplanes are seeded numpy constants broadcast as literals, so results
are deterministic.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from . import lit_double_array


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector (empty doc embedded to zeros) gives
    # NULL similarity instead of killing the job — Spark 4 ANSI mode
    # raises DIVIDE_BY_ZERO on a plain division
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_digits: int = 4,
                     exclude_self: bool = True) -> DataFrame:
    """Exact top-k neighbors per query vector. Queries broadcast; corpus
    scanned once; rank on rounded cosine + id tiebreak (deterministic).

    ``exclude_self`` drops candidates whose id EQUALS the query id — a
    bare id comparison, only correct when queries are drawn FROM the
    corpus (same id namespace). Pass False when queries live in their
    own id space, or corpus vector 7 vanishes from query 7's neighbors
    for no reason (review r5). Same knob on lsh_topk/ivf_topk so
    recall comparisons stay consistent."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("c_id") if exclude_self else F.lit(True))
        .select("q_id", "c_id",
                F.round(cosine(F.col("q_emb"), F.col("c_emb")), round_digits).alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def sign_lsh_signature(df: DataFrame, dim: int, bits: int = 16,
                       vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Append an integer sign-LSH signature column ``lsh_sig``.
    ``bits`` tops out at 63 (1 << 63 overflows the signed long); for a
    full 64-bit fingerprint use dedup.simhash, which spends the top bit
    via two's complement."""
    if not 1 <= bits <= 63:
        raise ValueError(
            f"sign_lsh_signature: bits={bits} outside 1..63 (the sign "
            "bit of the long signature is unusable; see dedup.simhash "
            "for 64-bit fingerprints)")
    planes = _hyperplanes(dim, bits, seed)
    # the WHOLE signature as one parsed SQL expression (ONE Py4J call;
    # the per-plane Column/lambda chatter still cost ~0.5 s driver-side
    # at 16x64 even with array literals batched) — same resolved plan:
    # zip_with/aggregate lambdas and repr(float) round-trip the doubles
    # bit-exactly (the kmeans model-literal finding, guide §5)
    def plane_sql(p):
        return "array(" + ",".join(repr(float(x)) + "D" for x in p) + ")"

    terms = " + ".join(
        f"(CASE WHEN aggregate(zip_with(`{vec_col}`, {plane_sql(p)},"
        " (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) >= 0"
        f" THEN {1 << j}L ELSE 0L END)"
        for j, p in enumerate(planes))
    return df.withColumn("lsh_sig", F.expr(f"CAST({terms} AS BIGINT)"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             bits: int = 16, bands: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 42, round_digits: int = 4,
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing any
    signature band with the query; exact cosine rerank inside candidates.

    Scale: the join key is (band, band_sig) — corpus is bucketed once and
    reused for any number of queries; per-bucket fanout is data-dependent
    (tune bits/bands for density)."""
    if bits % bands != 0:  # not assert: survives python -O
        raise ValueError(
            f"lsh_topk: bits {bits} must divide into bands {bands} — "
            "a remainder would silently leave the top signature bits "
            "un-banded")
    r = bits // bands

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        sigd = sign_lsh_signature(df, dim, bits, vec_col, seed)
        band_arr = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("lsh_sig"), b * r).bitwiseAND(F.lit((1 << r) - 1)).alias("bsig"),
            ) for b in range(bands)
        ])
        return sigd.select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias(f"{prefix}_emb"),
            F.explode(band_arr).alias("bk"),
        ).select(f"{prefix}_id", f"{prefix}_emb",
                 F.col("bk.band").alias("band"), F.col("bk.bsig").alias("bsig"))

    cb = banded(corpus, "c")
    qb = banded(queries, "q")
    cand = (
        cb.join(qb, ["band", "bsig"])
        .filter(F.col("q_id") != F.col("c_id") if exclude_self
                else F.lit(True))
        .select("q_id", "c_id", "q_emb", "c_emb")
        # dedupe on ids only — a pair matching several bands would
        # otherwise hash/compare its full embedding arrays in the
        # distinct exchange (ids determine the vectors)
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.select(
        "q_id", "c_id",
        F.round(cosine(F.col("q_emb"), F.col("c_emb")),
                round_digits).alias("cosine"))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               round_digits: int = 4) -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector (by cosine,
    rounded + centroid-id tiebreak for cross-engine determinism).
    Centroids broadcast; corpus scanned once — the build step of an IVF
    index. Returns corpus columns + centroid_id + centroid_cos."""
    c = centroids.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"))
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "centroid_cos",
        F.round(cosine(F.col(vec_col), F.col("c_emb")), round_digits))
    w = W.partitionBy(id_col).orderBy(F.col("centroid_cos").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "c_emb")
        .withColumnRenamed("c_id", "centroid_id")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_digits: int = 4,
             exclude_self: bool = True) -> DataFrame:
    """IVF ANN search: probe the query's ``n_probe`` nearest cells, exact
    cosine rerank within them. Recall < 1 (vectors in unprobed cells are
    missed) — the IVF scale path complementing sign-LSH (lsh_topk).

    Plan: corpus bucketed by cell once (reusable); per query, candidates
    = cells the query probes — join on centroid_id, so work is
    n_queries * (corpus / n_cells) * n_probe instead of n_queries *
    corpus."""
    cor = ivf_assign(corpus, centroids, id_col, vec_col,
                     round_digits).select(
        F.col(id_col).alias("c_id2"), F.col(vec_col).alias("c_emb2"), "centroid_id")
    c = centroids.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"))
    qscored = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")) \
        .crossJoin(F.broadcast(c)) \
        .withColumn("qc_cos", F.round(cosine(F.col("q_emb"), F.col("c_emb")),
                                       round_digits))
    wq = W.partitionBy("q_id").orderBy(F.col("qc_cos").desc(), F.col("c_id").asc())
    probes = (
        qscored.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("q_id", "q_emb", F.col("c_id").alias("centroid_id"))
    )
    cand = probes.join(cor, "centroid_id").filter(
        F.col("q_id") != F.col("c_id2") if exclude_self else F.lit(True))
    scored = cand.select(
        "q_id", F.col("c_id2").alias("c_id"),
        F.round(cosine(F.col("q_emb"), F.col("c_emb2")),
                round_digits).alias("cosine"))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_near_pairs(df: DataFrame, threshold: float = 0.95,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      round_digits: int = 4) -> DataFrame:
    """Embedding near-dup pairs (exact all-pairs; use sign-LSH blocking
    for big corpora — see lsh_topk's banding)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("e_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("e_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(cosine(F.col("e_a"), F.col("e_b")),
                        round_digits).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


AUTO_CELL_CAP_MIN = 256
AUTO_CELL_CAP_FACTOR = 4


def _auto_cell_cap(n_corpus: int, n_centroids: int) -> int:
    """Default cell_cap: 4x the average cell size, floored at 256 so
    small corpora keep exact semantics. A cell at the cap is already 4x
    skewed vs uniform assignment; beyond that the capped-conservative
    truncation bounds the quadratic."""
    k = max(n_centroids, 1)
    return max(AUTO_CELL_CAP_MIN,
               -(-n_corpus * AUTO_CELL_CAP_FACTOR // k))


def semantic_dedup(corpus: DataFrame, centroids: DataFrame,
                   threshold: float = 0.92, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   cell_cap: int | str | None = "auto") -> DataFrame:
    """SemDeDup-style semantic deduplication: coarse-cluster the corpus
    with ivf_assign, compare embeddings ALL-PAIRS ONLY WITHIN a cell,
    and drop every vector that has a smaller-id neighbor above the
    cosine threshold. The rule is GREEDY-BY-ID, not per-clique: along a
    similarity chain a<b<c with sim(a,b) and sim(b,c) but not sim(a,c),
    both b and c are dropped (c's only similar neighbor b was itself
    dropped) — deterministic and conservative, matching the published
    SemDeDup recipe's keep-one-of-each-pair behavior; exact one-
    survivor-per-connected-component dedup is what
    dedup.connected_components is for. Returns kept rows + centroid_id.

    Scale design: the quadratic comparison is confined to a cell — the
    self-join shuffles on centroid_id, so total work is
    sum(cell_size²) ≈ n²/k, not n². Pick k so cells fit a task
    (k ~ n/10k on a real corpus) and let AQE's skew split handle fat
    cells; the centroid set itself stays broadcast-small. This is the
    published recipe for embedding-level dedup at corpus scale: cluster
    first, compare within cluster only.

    ``cell_cap`` bounds the residual in-cell quadratic (VERDICT r4 #1,
    mirroring minhash/simhash ``bucket_cap``): the comparison's LEFT arm
    is truncated to each cell's ``cell_cap`` SMALLEST ids (deterministic
    min-id truncation), so a vector is dropped only when one of those
    representatives is a similar smaller-id neighbor. Per-cell work
    falls from size² to size × cell_cap — O(n × cell_cap) total, no
    matter how degenerate the embedding distribution (one fat cell can
    no longer go quadratic). Cells with ≤ cell_cap members keep the
    EXACT uncapped semantics; oversized cells dedup conservatively
    (may keep a few more — never drops a vector the uncapped rule would
    keep, because every capped pair is also an uncapped pair). The
    rank-by-id window is one per-cell sort (O(size log size), spills),
    not a comparison pass.

    The DEFAULT is ``cell_cap="auto"`` (VERDICT r5 #3): the cap is
    derived as max(256, ceil(4 x n_corpus / n_centroids)) — 4x the
    average cell size — so a naive caller at corpus scale is bounded by
    default even under a skewed embedding distribution, while small
    corpora (cells under 256) keep exact semantics. Costs one cheap
    corpus count() up front. Pass an explicit int to tune, or
    ``cell_cap=None`` to opt into the exact unbounded quadratic
    (sensible only when k is sized so cells fit a task).
    """
    if isinstance(cell_cap, str) and cell_cap != "auto":
        raise ValueError(f"cell_cap must be an int, None, or 'auto'; "
                         f"got {cell_cap!r}")
    # the assignment (corpus x centroids + window) is referenced three
    # times below (both self-join arms + the anti-join base); truncate
    # lineage so it is computed once, not three times — the same
    # re-reference fix measured 5.8s->0.3s in graph.triangle_count.
    # LAZY (r13 §2.4): with an explicit cell_cap the caller's first
    # action materializes it (one fewer job); the "auto" path's count
    # below materializes it immediately, same as eager did.
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).drop(
        "centroid_cos").localCheckpoint(eager=False)
    if cell_cap == "auto":
        # count AFTER the checkpoint (review r6): counting the raw
        # corpus plan would execute an expensive derived corpus a whole
        # extra time; the checkpointed assignment makes this count
        # nearly free (and |assigned| == |corpus|)
        cell_cap = _auto_cell_cap(assigned.count(), centroids.count())
    left = assigned
    if cell_cap is not None:
        wcell = W.partitionBy("centroid_id").orderBy(F.col(id_col).asc())
        left = (assigned.withColumn("_rn", F.row_number().over(wcell))
                .filter(F.col("_rn") <= cell_cap).drop("_rn"))
    a = left.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("e_a")
    )
    b = assigned.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("e_b")
    )
    dropped = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine(F.col("e_a"), F.col("e_b")), 4) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    # all corpus columns survive (the docstring contract is "kept ROWS
    # + centroid_id", not a projection down to id+vector)
    return assigned.join(dropped, id_col, "left_anti")


def kmeans_train(corpus: DataFrame, k: int = 8, iters: int = 4,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 coord_dp: int = 6, score_dp: int = 4):
    """Distributed Lloyd k-means over an embedding column — the trainer
    that feeds ``ivf_assign``/``ivf_topk``/``semantic_dedup`` real
    centroids instead of seed vectors (kmeans_lloyd_step in the gate
    suite checks ONE update; this iterates).

    The standard distributed shape: the MODEL is small (k × dim
    doubles) and lives driver-side; the DATA is big and never leaves
    the executors. Per iteration:

    - assignment is a pure JVM expression — the k unit-normalized
      centroids are compiled into the plan as literals and each vector
      takes ``argmax(round(dot(v, u_c), score_dp))`` with lowest-c_id
      tiebreak (cosine order: unit centroids make the vector's own
      norm a common positive factor). No join, no shuffle.
    - the mean recompute is one (c_id, dim) partial-agg shuffle
      (posexplode → avg), then k × dim rows collect to the driver —
      the audited bounded-collect class (model state, not data).

    Determinism across engines and runs: init = the k lowest-id
    vectors (c_id = their rank order); coordinates rounded to
    ``coord_dp`` each update (heals partition-order float drift in
    avg); scores rounded to ``score_dp``. An emptied cluster keeps its
    previous centroid. All math in double (float arrays are cast up
    front — 32-bit dot products drift).

    Returns ``(centroids, assigned)``: centroids as a DataFrame
    (c_id, c_emb, n_members — membership of the LAST assignment pass,
    the one that produced the final means), and ``assigned`` = corpus
    + c_id under the final centroids, lazily evaluable at corpus
    scale. At 100 TB: iters × (one scan + one narrow shuffle); k up to
    a few thousand keeps the literal plan and driver state trivial."""
    if k < 1 or iters < 1:
        raise ValueError("kmeans_train: k and iters must be >= 1")
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = corpus.select(F.col(id_col).alias("_kid"),
                         vec_d.alias("_kv"))
    seed = base.orderBy("_kid").limit(k).collect()
    if len(seed) < k:
        raise ValueError(f"kmeans_train: k={k} but corpus has only "
                         f"{len(seed)} rows")
    cents = [[float(x) for x in r["_kv"]] for r in seed]

    def _unit(c):
        n = (sum(x * x for x in c)) ** 0.5
        return [x / n for x in c] if n > 0 else c

    def _assign(units):
        # the whole k x dim dot-product tree as ONE SQL string (one
        # Py4J call): per-element F.lit chatter plus per-lambda
        # registration cost ~0.4 s of DRIVER time per assignment build
        # at k=4, dim=64 (measured; 3 builds per train call) — the SQL
        # lambda form compiles to the identical HigherOrderFunction
        # plan, repr(float) round-trips each coordinate bit-exactly
        dots = F.expr("array(" + ",".join(
            "round(aggregate(zip_with(_kv,"
            + "array(" + ",".join(repr(float(x)) + "D" for x in u) + ")"
            + ",(a,b)->a*b),0.0D,(acc,v)->acc+v),"
            + str(int(score_dp)) + ")"
            for u in units) + ")")
        return (base.withColumn("_dots", dots)
                .withColumn("c_id", F.expr(
                    "array_position(_dots, array_max(_dots)) - 1")
                    .cast("int"))
                .drop("_dots"))

    sizes: dict = {}
    for _ in range(iters):
        assigned = _assign([_unit(c) for c in cents])
        stats = (assigned
                 .select("c_id", F.posexplode("_kv").alias("d", "x"))
                 .groupBy("c_id", "d")
                 .agg(F.round(F.avg("x"), coord_dp).alias("nx"),
                      F.count(F.lit(1)).alias("n"))
                 .collect())
        sizes = {}
        new = {cid: list(c) for cid, c in enumerate(cents)}
        for r in stats:
            new[r["c_id"]][r["d"]] = float(r["nx"])
            sizes[r["c_id"]] = int(r["n"])
        cents = [new[cid] for cid in range(k)]

    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(cid, cents[cid], sizes.get(cid, 0)) for cid in range(k)],
        schema="c_id int, c_emb array<double>, n_members long")
    final = _assign([_unit(c) for c in cents])
    out = (corpus.join(final.select("_kid", "c_id"),
                       corpus[id_col] == F.col("_kid"))
           .drop("_kid"))
    return cent_df, out
