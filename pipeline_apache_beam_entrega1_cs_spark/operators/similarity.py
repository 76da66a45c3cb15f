"""Similarity search over an embedding column (array<float>) —
SURVEY.md §2B "Similarity search" row.

- ``cosine_topk``: exact brute-force top-k, the correctness baseline.
  Dot products are native ``zip_with``/``aggregate`` expressions (no
  UDF); the cross join is bounded by a small query set, so the cost is
  |queries| × |corpus| — fine when queries are few, and the exact
  re-rank step under any ANN scheme.
- ``embedding_cosine_pairs``: near-duplicate detection by cosine within
  a blocking key (here the corpus partitioning column) — pairwise only
  inside blocks.
- ``lsh_ann_topk``: the scale path — BucketedRandomProjectionLSH
  (random-hyperplane buckets) prunes candidates before the exact
  re-rank. Recall is measured against ``cosine_topk`` in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns, evaluated
    left-to-right so the result is bit-identical to a sequential oracle."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding
    self). Deterministic: rank on (round(cos,6) desc, vec_id asc).

    The query side is tiny and broadcast; the corpus side streams — one
    pass over the corpus per plan, no shuffle until the per-query top-k
    window (which AQE keeps small because only k rows per query survive
    the rank filter)."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("cand_id"), _as_double("embedding").alias("c_emb")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rk").cast("long").alias("rank"))
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.99,
    block_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: pairwise cosine within a blocking key.
    Blocking keeps the pair count at Σ block² instead of n²; at scale the
    block key comes from LSH bucketing (see lsh_ann_topk) rather than a
    semantic label.

    ``block_cap`` bounds the quadratic (VERDICT r11 item 2): semantic
    labels have FIXED cardinality, so at 100× data each block is 100×
    larger and pairs grow 10,000×. With a cap, each block contributes at
    most C(cap, 2) pairs — a deterministic hash-ordered sample (rank by
    md5(vec_id), the same expression DuckDB evaluates, so oracles can
    replicate the kept set exactly). Capped-block losses are reported by
    ``dedup_cosine_threshold_sweep``'s n_capped_blocks / n_rows_dropped
    columns, mirroring dedup_lsh_bucket_stats."""
    from .dedup import _shuffle_partitions

    base = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col("vec_id"),
        _as_double("embedding").alias("emb"),
    )
    if block_cap is not None:
        wcap = Window.partitionBy("blk").orderBy(
            F.md5(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc()
        )
        base = (
            base.withColumn("_rk", F.row_number().over(wcap))
            .filter(F.col("_rk") <= block_cap)
            .drop("_rk")
        )
    a = base.select(
        "blk", F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a")
    )
    b = base.select(
        "blk", F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b")
    )
    # explicit-count barrier (the dedup._shuffle_partitions rule): the
    # in-block pair cosine stage is CPU-dense but byte-light, so left
    # to AQE it coalesces to the scan's split layout and runs
    # single-core — measured 2.16 s -> 0.71 s at sf0.1 (SCALING.md
    # round 11). Per-block skew at scale is the known limit of
    # semantic-label blocking; the LSH-bucketed variant below is the
    # geometry-bounded path.
    return (
        a.repartition(_shuffle_partitions(a), "blk")
        .join(b, "blk")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors: k-means
    partitions the corpus into centroid lists; each query probes only its
    ``n_probe`` nearest lists and exact-cosine re-ranks the candidates.

    The scale math: search cost drops from |corpus| to
    ~|corpus| * n_probe / n_centroids per query, and the corpus-side
    structure is a plain (cluster -> rows) partitioning — at 100 TB the
    lists live as a cluster-partitioned table and a probe is a partition-
    pruned scan. Centroids are tiny and broadcast. Recall is measured
    against the exact baseline in tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id",
        _as_double("embedding").alias("emb"),
        array_to_vector(_as_double("embedding")).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id", "emb", F.col("prediction").alias("cluster")
    )

    # centroid table: tiny (n_centroids x dim) -> literal broadcast side
    spark = embeddings.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster INT, centroid ARRAY<DOUBLE>",
    )
    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_dist").asc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q_emb",
            "cluster",
            (1 - cosine(F.col("q_emb"), F.col("centroid"))).alias("c_dist"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "q_emb", "cluster")
    )
    cands = probes.join(assigned, "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return (
        cands.select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rk").cast("long").alias("rank"))
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bucket_length: float = 2.0,
    num_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbors via BucketedRandomProjectionLSH:
    hyperplane-bucket candidates, then exact cosine re-rank of the
    candidate set. Returns the same shape as cosine_topk (recall measured
    against it in tests). Rows-only oracle — bucket boundaries are not
    SQL-expressible."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.select(
        "vec_id", array_to_vector(_as_double("embedding")).alias("features"),
        _as_double("embedding").alias("emb"),
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(vecs)
    q = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("features").alias("q_features"),
        F.col("emb").alias("q_emb"),
    )
    cands = model.approxSimilarityJoin(
        vecs, q.selectExpr("query_id as vec_id", "q_features as features", "q_emb as emb"),
        float("inf"), distCol="_d",
    ).select(
        F.col("datasetB.vec_id").alias("query_id"),
        F.col("datasetA.vec_id").alias("cand_id"),
        F.round(cosine(F.col("datasetB.emb"), F.col("datasetA.emb")), 6).alias("cos_sim"),
    ).filter(F.col("cand_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id").asc())
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rk").cast("long").alias("rank"))
    )


def embedding_cosine_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.35,
    bucket_length: float = 4.0,
    num_tables: int = 6,
    seed: int = 42,
    max_bucket: int = 1024,
    dim: int | None = None,
    arrow_verify: bool = True,
) -> DataFrame:
    """Near-duplicate vector pairs with LSH-bucket blocking — the 100 TB
    variant of ``embedding_cosine_pairs``.

    ``embedding_cosine_pairs`` blocks on a SEMANTIC column (label): its
    pairwise cost is Σ block², which degenerates toward all-pairs when
    labels are coarse. Here the block key is data-independent geometry:
    ``num_tables`` p-stable random projections (fixed-seed Gaussian
    planes, evaluated as literal-array expressions inside the scan
    stage — the MLlib BucketedRandomProjectionLSH fit/transform this
    replaced cost ~2 s of driver fit + vector<->array conversions per
    run for the identical math, measured in SCALING.md round 12) assign
    each vector a bucket per table; candidate pairs are generated only
    inside a (table, bucket) cell, deduped across tables on BARE IDS
    (the round-11 93 s -> 6.4 s fix: the distinct runs on 16-byte id
    pairs, never on 1 KB embedding rows), then exact-cosine verified.

    The verify stage is the irreducible cost — on near-uniform data a
    low threshold makes candidates ~= all pairs (measured round 12:
    recall at 0.35 collapses below 0.9 for ANY bucket_length that
    actually prunes, because 0.35-pairs are the bulk tail, not a
    near-dup cluster) — so it runs VECTORIZED and PER CELL (round-15
    restructure, guide §2.3 "shuffle keys and metadata instead of
    payloads" + §4.2): each capped (table, bucket) cell's members are
    collected ONCE (<= max_bucket structs of ~dim doubles), one
    mapInArrow pass computes every within-cell pairwise cosine with
    the exact same numpy per-pair reduction the round-12 verify used
    (bit-identical roundings), and only SURVIVORS (cos >= threshold)
    leave Python. The cross-table dedup then runs on the survivor set
    (~0.2% of candidates at threshold 0.35) instead of materializing
    |candidates| (near n²) id-pair rows through a self-join, a distinct
    and two embedding re-attach joins — measured 3.25 s -> 1.67 s at
    sf0.1 (min-of-3; the round-12 arrow-verify pipeline profiled at
    3.25 s in the same session, the expression pipeline at 6.98 s;
    candidate set and output rows IDENTICAL by construction — 4097
    pairs, zero value mismatches). Shuffle budget: num_tables copies of
    the corpus through ONE exchange into cells, vs the old path's 6x
    id-explode + 2M-row distinct + ~|pairs| * 2 * dim * 8 B verify
    materialization. ``arrow_verify=False`` keeps the round-12
    expression pipeline (id-pair join + interpreted Catalyst fold) for
    the A/B; tests assert both return identical pair sets.

    Two knobs bound the pairwise cost: ``bucket_length`` sets the
    expected bucket population, and ``max_bucket`` hard-caps it — cells
    above the cap are dropped before pair generation, exactly like the
    n-gram dedup's frequency cap, so worst-case pairwise work is
    <= max_bucket²/2 * num_tables cosines no matter how degenerate the
    geometry (and per-cell memory is <= max_bucket * dim * 8 B plus one
    bounded chunk of pair rows). Recall vs the exact all-pairs baseline
    is asserted in tests (rows-only oracle: bucket boundaries are not
    SQL-expressible)."""
    import numpy as np

    # The plane literals must match the embedding length: zip_with pads
    # the shorter array with nulls, so a dim mismatch would null every
    # dot/bucket and the bucket equi-join would silently return ZERO
    # pairs (ADVICE r12). Derive dim from the data by default (one
    # limit-1 scan — bounded), and guard every row in-plan so a ragged
    # corpus fails loudly instead of dropping rows.
    if dim is None:
        # Probe only positive-size embeddings: size(NULL) is null (a
        # None probe would crash int() with a bare TypeError, ADVICE
        # r13), and an empty-embedding FIRST row must not mask valid
        # rows behind it — the probe result would otherwise depend on
        # partition order, not on the data (ADVICE r14). The ValueError
        # is reserved for a corpus with NO positive-size embedding at
        # all (ragged rows still fail loudly via the in-plan guard).
        first = (
            embeddings.where(F.size("embedding") > 0)
            .select(F.size("embedding").alias("d"))
            .first()
        )
        if first is None:
            has_any = (
                embeddings.where(F.col("embedding").isNotNull()).first()
                is not None
            )
            if has_any:
                raise ValueError(
                    "embedding_cosine_pairs_lsh: cannot infer embedding "
                    "dim (every non-null embedding is empty); pass dim= "
                    "explicitly or clean empty embeddings first"
                )
            dim = 1  # no non-null embeddings: planes moot, output empty
        else:
            dim = int(first["d"])
    planes = np.random.RandomState(seed).standard_normal((num_tables, dim))
    emb_col = _as_double("embedding")
    guarded = F.when(F.size("embedding") == dim, emb_col).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "embedding_cosine_pairs_lsh: embedding length "
                ),
                # coalesce: a NULL embedding must produce THIS labeled
                # message, not null out the whole concat into an
                # anonymous [USER_RAISED_EXCEPTION] null (ADVICE r13)
                F.coalesce(
                    F.size("embedding").cast("string"), F.lit("NULL")
                ),
                F.lit(f" != expected dim {dim} (vec_id "),
                F.coalesce(F.col("vec_id").cast("string"), F.lit("NULL")),
                F.lit(")"),
            )
        )
    )
    vecs = embeddings.select("vec_id", guarded.alias("emb"))
    bucket_exprs = []
    for t in range(num_tables):
        plane = F.array(*[F.lit(float(x)) for x in planes[t]])
        dot = F.aggregate(
            F.zip_with(F.col("emb"), plane, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket_exprs.append(
            F.floor(dot / F.lit(float(bucket_length))).cast("long")
        )
    if not arrow_verify:
        # Round-12 expression pipeline, kept verbatim as the A/B
        # reference: id-only bucket explode, candidate self-join,
        # 16-byte id-pair distinct, embedding re-attach, interpreted
        # Catalyst cosine fold.
        hashed = vecs.select(
            "vec_id",
            F.posexplode(F.array(*bucket_exprs)).alias("tbl", "bucket"),
        )
        live = (
            hashed.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .filter((F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket))
            .select("tbl", "bucket")
        )
        pruned = hashed.join(live, ["tbl", "bucket"])
        a = pruned.select("tbl", "bucket", F.col("vec_id").alias("vec_a"))
        b = pruned.select("tbl", "bucket", F.col("vec_id").alias("vec_b"))
        pair_ids = (
            a.join(b, ["tbl", "bucket"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .distinct()
        )
        ea = vecs.select(
            F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a")
        )
        eb = vecs.select(
            F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b")
        )
        cand = pair_ids.join(ea, "vec_a").join(eb, "vec_b")
        return cand.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), 6).alias("cos_sim"),
        ).filter(F.col("cos_sim") >= threshold)

    # Per-cell vectorized verify (round 15): one exchange collects each
    # live capped cell's members; numpy computes all within-cell
    # cosines; only survivors leave Python; cross-table dedup runs on
    # survivors. Candidate set identical to the expression pipeline.
    #
    # The live-cell pre-filter runs on ID-ONLY rows (ADVICE r15,
    # medium): filtering on size AFTER collect_list means a degenerate
    # over-cap cell (low-variance geometry hashing most of the corpus
    # into one bucket) materializes the entire cell's embeddings
    # (~n·dim·8 B) in a single aggregation buffer before being dropped.
    # Counting on vec_id-only rows first and broadcast-joining members
    # to the (tiny) live cell list guarantees no over-cap cell ever
    # aggregates embedding payloads — the docstring's per-cell memory
    # bound now holds DURING aggregation, not just after. Cost: the
    # bucket expressions are evaluated twice (once id-only, once with
    # emb attached), same as the expression pipeline's hashed/pruned
    # split; the join adds no exchange (live is broadcast).
    hashed = vecs.select(
        "vec_id",
        F.posexplode(F.array(*bucket_exprs)).alias("tbl", "bucket"),
    )
    live = (
        hashed.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter((F.col("_bsz") >= 2) & (F.col("_bsz") <= max_bucket))
        .select("tbl", "bucket")
    )
    members = vecs.select(
        "vec_id",
        "emb",
        F.posexplode(F.array(*bucket_exprs)).alias("tbl", "bucket"),
    )
    cells = (
        members.join(F.broadcast(live), ["tbl", "bucket"])
        .groupBy("tbl", "bucket")
        .agg(F.collect_list(F.struct("vec_id", "emb")).alias("ms"))
        .select("ms")
    )

    def cell_verify(batches):
        import numpy as _np
        import pyarrow as pa

        # bound the pair-row chunk so one max_bucket cell peaks at
        # ~2 * CHUNK * dim * 8 B of gathered operands
        chunk = 1 << 16
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out_a, out_b, out_c = [], [], []
            for cell in batch.column("ms"):
                sv = cell.values
                ids = _np.asarray(sv.field("vec_id"), dtype=_np.int64)
                x = _np.asarray(
                    sv.field("emb").flatten(), dtype=_np.float64
                ).reshape(len(ids), -1)
                order = _np.argsort(ids, kind="stable")
                ids, x = ids[order], x[order]
                # per-vector norms: same (v*v).sum(axis=1) reduction the
                # round-12 per-pair verify used — bit-identical values
                norms = _np.sqrt((x * x).sum(axis=1))
                ii, jj = _np.triu_indices(len(ids), k=1)
                for s in range(0, len(ii), chunk):
                    ai, bi = ii[s : s + chunk], jj[s : s + chunk]
                    raw = (x[ai] * x[bi]).sum(axis=1) / (
                        norms[ai] * norms[bi]
                    )
                    # HALF_UP (away from zero), matching F.round and
                    # the DuckDB oracle — np.round is half-to-even,
                    # which diverges on exact 6th-decimal midpoints
                    # (ADVICE r12).
                    cs = _np.copysign(
                        _np.floor(_np.abs(raw) * 1e6 + 0.5), raw
                    ) / 1e6
                    keep = cs >= threshold
                    # strict vec_a < vec_b semantics (ADVICE r15): two
                    # distinct rows sharing a vec_id would otherwise
                    # emit an (x, x) pair that both legacy paths'
                    # strict-inequality filter drops.
                    keep &= ids[ai] != ids[bi]
                    if keep.any():
                        out_a.append(ids[ai][keep])
                        out_b.append(ids[bi][keep])
                        out_c.append(cs[keep])
            if out_a:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(_np.concatenate(out_a), pa.int64()),
                        pa.array(_np.concatenate(out_b), pa.int64()),
                        pa.array(_np.concatenate(out_c), pa.float64()),
                    ],
                    ["vec_a", "vec_b", "cos_sim"],
                )

    return cells.mapInArrow(
        cell_verify, "vec_a long, vec_b long, cos_sim double"
    ).distinct()


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array<double> columns, evaluated
    left-to-right (same sequential-fold convention as cosine())."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def kmeans_lloyd(embeddings: DataFrame, k: int = 8, iters: int = 2) -> DataFrame:
    """Deterministic k-means: ``iters`` unrolled Lloyd iterations over
    the embedding column, entirely as Catalyst plans — the iterative-
    algorithm pattern (fixed iteration count => a straight-line plan; an
    unknown count would loop this body driver-side like
    operators/components.connected_components).

    Determinism conventions that make it hash-comparable cross-engine:
    init centroids are the k smallest vec_ids; distances and updated
    centroid components round to 6 dp, so an argmin near-tie (closer
    than 1e-6) collapses to an exact tie in BOTH engines and breaks on
    the smaller cluster id; assignment is min(struct(dist, cluster)).

    Scale shape per iteration: centroids are a k-row broadcast (the
    sanctioned bounded nested-loop attach); assignment is one
    struct-min groupBy; the centroid update is posexplode ->
    (cluster, dim) mergeable avg -> sort_array collect. Nothing in the
    plan depends on corpus size beyond linear passes; k and dims are
    constants. Returns (vec_id, cluster) — the final assignment."""
    vecs = embeddings.select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cents, assign = _kmeans_fit(vecs, k, iters)
    return assign(cents).select("vec_id", "cluster")


def _kmeans_fit(vecs: DataFrame, k: int, iters: int):
    """Shared unrolled-Lloyd fit (see kmeans_lloyd for the determinism
    conventions): returns the final centroid DataFrame (cluster, c) and
    the assign(cents) function — so the deterministic IVF can reuse the
    exact same quantizer its SQL oracle replays."""
    cents = vecs.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"), F.col("v").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        d = F.round(_sq_dist(F.col("v"), F.col("c")), 6)
        return (
            vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", "v", "cluster", d.alias("d"))
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("d", "cluster")).alias("m"),
                F.first("v").alias("v"),  # identical within the group
            )
            .select(
                "vec_id",
                "v",
                F.col("m.d").alias("d"),
                F.col("m.cluster").alias("cluster"),
            )
        )

    def materialize(c: DataFrame) -> DataFrame:
        # k-row driver materialization between iterations — the
        # MLlib-KMeans structure (centroids live on the driver, data
        # never does). Without it every downstream reference re-plans
        # the whole fit subtree and Catalyst+AQE re-optimization
        # dominates wall time: the lazy straight-line form cost ~3.7 s
        # of driver work per consuming query at sf0.1 vs ~0.9 s
        # materialized (SCALING.md round 9). Values are identical —
        # the collect only pins the same deterministic rounded
        # centroids — so the SQL oracle's full-fit replay still
        # hash-matches.
        rows = c.collect()
        return c.sparkSession.createDataFrame(rows, c.schema)

    for _ in range(iters):
        assigned = assign(cents)
        cents = (
            assigned.select(
                "cluster", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s["cv"],
                ).alias("c")
            )
        )
    return materialize(cents), assign


def ivf_ann_topk_det(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    iters: int = 2,
    n_probe: int = 4,
) -> DataFrame:
    """Deterministic IVF approximate nearest neighbors: the same
    inverted-file structure as ivf_ann_topk, but the coarse quantizer is
    the deterministic unrolled-Lloyd k-means (_kmeans_fit) instead of
    MLlib — so the ENTIRE path (centroid fit -> list assignment ->
    n_probe nearest-list pruning -> exact cosine re-rank) is replayable
    as plain SQL and hash-comparable cross-engine. The same move
    dedup_minhash_banded made for the MinHash family: the ANN scale path
    gains a value-hash-oracle-able variant beside the MLlib one.

    Scale shape is unchanged from ivf_ann_topk: the corpus-side
    structure is a (cluster -> rows) partitioning (a cluster-partitioned
    table at 100 TB, probes are partition-pruned scans), centroids are a
    k-row broadcast, and per-query cost drops from |corpus| to roughly
    |corpus| * n_probe / n_centroids. Recall vs the exact baseline is
    asserted in tests like the MLlib variant's."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    cents, assign = _kmeans_fit(vecs, n_centroids, iters)
    assigned = assign(cents)  # (vec_id, v, cluster) — the inverted lists

    q = assigned.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_dist").asc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_v",
            "cluster",
            F.round(_sq_dist(F.col("q_v"), F.col("c")), 6).alias("c_dist"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "q_v", "cluster")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        probes.join(assigned, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            F.round(cosine(F.col("q_v"), F.col("v")), 6).alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "cand_id", "cos_sim", F.col("rk").cast("long").alias("rank")
        )
    )


def _pq_fit(embeddings: DataFrame, m: int, k: int, iters: int):
    """Shared unified-pass PQ fit (see pq_codes for the conventions and
    the measured chain-vs-unified plan comparison): returns
    (sub, cents, assign) where ``sub`` is the (vec_id, s, vs) subvector
    frame, ``cents`` the final (s, cluster, c) codebooks, and
    ``assign(cents)`` the (vec_id, s, vs, d, cluster) code assignment —
    so ADC search replays the exact quantizer its SQL oracle does."""
    w = (F.size(F.col("v")) / F.lit(m)).cast("int")
    sub = embeddings.select(
        "vec_id", _as_double("embedding").alias("v")
    ).select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col("v"), s * w + 1, w),
            )
        ).alias("s", "vs"),
    )
    cents = sub.filter(F.col("vec_id") < k).select(
        "s", F.col("vec_id").cast("int").alias("cluster"), F.col("vs").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        d = F.round(_sq_dist(F.col("vs"), F.col("c")), 6)
        return (
            sub.join(F.broadcast(cents), "s")
            .select("vec_id", "s", "vs", "cluster", d.alias("d"))
            .groupBy("vec_id", "s")
            .agg(
                F.min(F.struct("d", "cluster")).alias("m"),
                F.first("vs").alias("vs"),  # identical within the group
            )
            .select(
                "vec_id",
                "s",
                "vs",
                F.col("m.d").alias("d"),
                F.col("m.cluster").alias("cluster"),
            )
        )

    for _ in range(iters):
        cents = (
            assign(cents)
            .select("s", "cluster", F.posexplode("vs").alias("pos", "val"))
            .groupBy("s", "cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
            .groupBy("s", "cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "cv"))),
                    lambda st: st["cv"],
                ).alias("c")
            )
        )
    return sub, cents, assign


def pq_codes(
    embeddings: DataFrame, m: int = 4, k: int = 4, iters: int = 1
) -> DataFrame:
    """Product quantization (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split each embedding into m
    contiguous subvectors, fit an independent k-centroid codebook per
    subspace with the deterministic unrolled-Lloyd recipe
    (_kmeans_fit's conventions: init = k smallest vec_ids, 6-dp
    rounding, min-struct argmin), and emit each vector's code word per
    subspace plus the total squared reconstruction error.

    The compression step a 100 TB embedding store runs before ADC-style
    ANN: m log2(k) bits per vector instead of 4·dims bytes. Subspace
    width is floor(dims/m) on BOTH engines (integer division), so when
    dims is not divisible by m the trailing dims % m dimensions are
    consistently excluded from every codebook — not silently assigned
    to the last subspace on one side only.

    Scale shape: ALL m subspaces run as ONE keyed pass — subspace index
    is a column, the (vec_id, subspace, subvector) rows join the
    (subspace, cluster, centroid) table by HASH on the subspace key
    (m·k rows broadcast — a keyed BroadcastHashJoin, not a nested
    loop), and each Lloyd step is one (vec_id, s) struct-min groupBy
    plus one (s, cluster, dim) mergeable-avg update. The first form of
    this operator built m separate fit/assign chains and joined them on
    vec_id: 16 Exchanges / 6 SortMergeJoins / 16 BNLJs at m=4 vs
    5 Exchanges / 2 keyed BroadcastHashJoins / 0 nested loops here
    (measured, formatted-plan node counts) — per-item work is
    identical, the chain form just paid m× the shuffle machinery."""
    sub, cents, assign = _pq_fit(embeddings, m, k, iters)
    final = assign(cents)
    return final.groupBy("vec_id").agg(
        *[
            F.min(F.when(F.col("s") == s, F.col("cluster")))
            .cast("bigint")
            .alias(f"code_{s}")
            for s in range(m)
        ],
        # d values are exact 6-dp decimals; summing them AS decimals is
        # order-independent (a double sum's addition order varies with
        # partitioning), and the decimal->double hop goes through a
        # string per the spec.py convention
        F.sum(F.col("d").cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
        .alias("recon_err"),
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 4,
    codebook_k: int = 4,
    iters: int = 1,
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k search over
    PQ-compressed vectors — the query path pq_codes compresses FOR
    (Jégou et al. 2011 §III): each query builds an m×codebook_k distance
    TABLE (exact squared distance from its subvectors to every
    centroid), and a candidate's approximate distance is the sum of m
    table lookups selected by its stored code words — the corpus's full
    vectors are never touched at query time.

    100 TB shape: the distance tables are |queries|·m·codebook_k rows —
    broadcast; the only per-candidate work is the keyed (s, cluster)
    broadcast-hash probe + one (query, candidate) decimal-sum aggregate
    (order-independent), then the standard total-ordered top-k window.
    Composable with IVF pruning (probe lists first, ADC inside lists).
    Deterministic end to end: same unrolled-Lloyd quantizer as
    pq_codes, 6-dp rounded table entries, decimal sums, ties broken on
    cand_id."""
    sub, cents, assign = _pq_fit(embeddings, m, codebook_k, iters)
    codes = assign(cents).select("vec_id", "s", "cluster")
    q_tables = (
        sub.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), "s", "vs")
        .join(F.broadcast(cents), "s")
        .select(
            "query_id",
            "s",
            "cluster",
            F.round(_sq_dist(F.col("vs"), F.col("c")), 6)
            .cast("decimal(18,6)")
            .alias("qd"),
        )
    )
    cand = (
        codes.join(F.broadcast(q_tables), ["s", "cluster"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(
            F.sum("qd").cast("string").cast("double").alias("adc_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("cand_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "cand_id", "adc_dist", F.col("rk").cast("long").alias("rank")
        )
    )


def pq_ivf_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    coarse_iters: int = 2,
    n_probe: int = 4,
    m: int = 4,
    codebook_k: int = 4,
    pq_iters: int = 1,
) -> DataFrame:
    """IVF-PQ: the production ANN index architecture (FAISS's IVFADC,
    Jégou et al. 2011 §IV) — a coarse quantizer prunes to ``n_probe``
    inverted lists, then ADC ranks ONLY the listed candidates by
    summed distance-table lookups over their PQ codes. Both quantizers
    are the deterministic unrolled-Lloyd fits (_kmeans_fit / _pq_fit),
    so the entire composed index — coarse fit → list assignment →
    probe pruning → PQ fit → code assignment → ADC ranking — replays
    as SQL and is value-hash oracle-able.

    100 TB shape: per-query candidate volume drops from |corpus| to
    ~|corpus|·n_probe/n_centroids BEFORE any distance work (at scale
    the lists are a cluster-partitioned table and probes are
    partition-pruned scans), and the remaining work per candidate is m
    table lookups on its stored codes — full vectors are touched only
    at fit time. Distance tables and centroid sets broadcast; the only
    big shuffle is the (query, candidate) decimal-sum aggregate."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    coarse_cents, coarse_assign = _kmeans_fit(vecs, n_centroids, coarse_iters)
    lists = coarse_assign(coarse_cents).select("vec_id", "cluster")

    q = vecs.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_dist").asc(), F.col("cluster").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(coarse_cents))
        .select(
            "query_id",
            "cluster",
            F.round(_sq_dist(F.col("q_v"), F.col("c")), 6).alias("c_dist"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "cluster")
    )

    sub, cents, assign = _pq_fit(embeddings, m, codebook_k, pq_iters)
    codes = assign(cents).select(
        F.col("vec_id").alias("cand_id"), "s", F.col("cluster").alias("code")
    )
    q_tables = (
        sub.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), "s", "vs")
        .join(F.broadcast(cents), "s")
        .select(
            "query_id",
            "s",
            F.col("cluster").alias("code"),
            F.round(_sq_dist(F.col("vs"), F.col("c")), 6)
            .cast("decimal(18,6)")
            .alias("qd"),
        )
    )
    cand = (
        probes.join(lists, "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"))
    )
    scored = (
        cand.join(codes, "cand_id")
        .join(F.broadcast(q_tables), ["query_id", "s", "code"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("qd").cast("string").cast("double").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "cand_id", "adc_dist", F.col("rk").cast("long").alias("rank")
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (greedy, unrolled fixed rounds)
# ---------------------------------------------------------------------------

def mmr_rerank(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m: int = 8,
) -> DataFrame:
    """Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998)
    over the exact-cosine candidate set: greedily pick
    argmax 0.5*rel(c) - 0.5*max_{s in selected} sim(c, s), k rounds.

    The retrieval-stack tail: an ANN stage (here cosine_topk as the
    exact stand-in for ann_pq_ivf_adc_topk's output) hands m candidates
    per query; the re-rank itself is per-query O(m^2) pair sims + k
    greedy rounds — independent of corpus size, so at 100 TB it costs
    the same as at 1 GB. Greedy selection is UNROLLED into k
    deterministic rounds (the kmeans_lloyd/pagerank fixed-iteration
    recipe): each round is an (anti-join remaining, max-sim penalty
    against selected, argmax via min(struct)) trio. All scores are
    DECIMAL off round-6 cosines — bit-identical in any engine; ties
    break on cand_id. Round-1 penalty is 0, so mmr = 0.5*rel there.
    """
    cand = cosine_topk(embeddings, query_ids, k=m)
    emb = embeddings.select(
        F.col("vec_id"), _as_double("embedding").alias("emb")
    )
    ce = (
        cand.join(emb, cand.cand_id == emb.vec_id)
        .select(
            "query_id",
            "cand_id",
            F.col("cos_sim").cast("decimal(10,6)").alias("rel"),
            "emb",
        )
    )
    return _mmr_core(ce, k)


def _mmr_core(ce: DataFrame, k: int) -> DataFrame:
    """The greedy-MMR selection rounds over an arbitrary candidate set
    ``ce`` = (query_id, cand_id, rel DECIMAL(10,6), emb array<double>) —
    shared by mmr_rerank (exact-cosine candidates) and
    retrieval_pipeline (IVF-PQ candidates)."""
    lam = F.lit("0.5").cast("decimal(2,1)")
    dzero = F.lit("0").cast("decimal(10,6)")
    pair = (
        ce.select("query_id", F.col("cand_id").alias("a"), F.col("emb").alias("ea"))
        .join(
            ce.select("query_id", F.col("cand_id").alias("b"), F.col("emb").alias("eb")),
            "query_id",
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6)
            .cast("decimal(10,6)")
            .alias("sim"),
        )
    )
    # candidates and their pair sims are k/m-bounded per query — tiny at
    # ANY corpus size. Caching them collapses the unrolled rounds' plan
    # from ~2^k replays of the retrieval stage to one (the audit showed
    # 45 Exchanges uncached vs a handful cached); at 100 TB this is the
    # natural materialization point between retrieval and re-rank.
    pair = pair.cache()
    cands = ce.select("query_id", "cand_id", "rel").cache()

    def argmax(scored: DataFrame, rank: int) -> DataFrame:
        return (
            scored.groupBy("query_id")
            .agg(F.min(F.struct((-F.col("mmr")).alias("neg"), F.col("cand_id"),
                                F.col("rel"), F.col("mmr"))).alias("m"))
            .select(
                "query_id",
                F.col("m.cand_id").alias("cand_id"),
                F.col("m.rel").alias("rel"),
                F.col("m.mmr").alias("mmr"),
                F.lit(rank).cast("long").alias("pick_rank"),
            )
        )

    picks: list[DataFrame] = []
    sel = None  # (query_id, cand_id) selected so far
    for r in range(1, k + 1):
        if sel is None:
            scored = cands.select(
                "query_id", "cand_id", "rel",
                (lam * F.col("rel")).cast("decimal(14,7)").alias("mmr")
            )
        else:
            pen = (
                pair.join(
                    sel.select("query_id", F.col("cand_id").alias("b")),
                    ["query_id", "b"],
                )
                .groupBy("query_id", F.col("a").alias("cand_id"))
                .agg(F.max("sim").alias("pen"))
            )
            rem = cands.join(sel.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_anti")
            scored = rem.join(pen, ["query_id", "cand_id"], "left").select(
                "query_id",
                "cand_id",
                "rel",
                (lam * F.col("rel") - lam * F.coalesce("pen", dzero))
                .cast("decimal(14,7)")
                .alias("mmr"),
            )
        pick = argmax(scored, r)
        picks.append(pick)
        new_sel = pick.select("query_id", "cand_id")
        sel = new_sel if sel is None else sel.union(new_sel)

    out = picks[0]
    for p in picks[1:]:
        out = out.union(p)
    result = out.select(
        "query_id",
        "pick_rank",
        "cand_id",
        F.col("rel").cast("string").cast("double").alias("rel"),
        F.col("mmr").cast("string").cast("double").alias("mmr_score"),
    )
    # Materialize the k-rows-per-query result THROUGH the cached
    # intermediates, then release them: repeated invocations in a
    # long-lived session (driver loops, bench reruns) must not
    # accumulate cached pair/candidate relations in executor storage
    # (ADVICE r7). The final frame stays cached — it IS the output the
    # caller consumes, and it is pick_rank*|queries| rows by
    # construction, corpus-size-independent.
    result = result.cache()
    result.count()
    pair.unpersist()
    cands.unpersist()
    return result


def retrieval_pipeline_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 3,
    m: int = 8,
    **ivf_kwargs,
) -> DataFrame:
    """The full serving-stack retrieval job as ONE declarative plan:
    IVF-PQ candidate generation (pq_ivf_adc_topk — coarse-quantizer
    pruning + ADC ranking over stored codes) -> exact-cosine re-scoring
    of the m survivors -> greedy MMR diversification (_mmr_core).

    The composition mirrors production FAISS-style serving: the index
    prunes to ~|corpus|·n_probe/n_centroids candidates without touching
    full vectors, full-precision vectors are loaded ONLY for the m
    finalists per query, and the diversity pass is per-query O(m²).
    Every stage is the deterministic unrolled form, so the whole
    pipeline replays as a single SQL oracle."""
    cand = pq_ivf_adc_topk(embeddings, query_ids, k=m, **ivf_kwargs).select(
        "query_id", "cand_id"
    )
    # Driver-pin the index -> re-rank boundary: the candidate list is
    # |queries|·m rows BY CONSTRUCTION (corpus-size-independent — the
    # same bounded class as _kmeans_fit's k-row centroid pin, and the
    # natural serving handoff: a FAISS-style index returns exactly this
    # list). Without the pin, _mmr_core's pair self-join inlines the
    # ENTIRE composed IVF-PQ chain twice into every MMR round's plan
    # and Catalyst planning dominates wall time (the round-9 kmeans
    # lesson, re-found by round-14 profiling of ann_retrieval_pipeline,
    # VERDICT r13 item 3). Values are identical — the collect pins the
    # deterministic ranked candidates the SQL oracle replays in full.
    cand = cand.sparkSession.createDataFrame(cand.collect(), cand.schema)
    emb = embeddings.select(F.col("vec_id"), _as_double("embedding").alias("emb"))
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("q_emb")
    )
    ce = (
        cand.join(emb, cand.cand_id == emb.vec_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("q_emb"), F.col("emb")), 6)
            .cast("decimal(10,6)")
            .alias("rel"),
            "emb",
        )
    )
    return _mmr_core(ce, k)


def truncated_rescore_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = 64,
    prefix_dims: int = 32,
) -> DataFrame:
    """Matryoshka-style two-stage retrieval: coarse top-m using only the
    FIRST ``prefix_dims`` dimensions, then exact full-dimension cosine
    re-scoring of the m survivors down to top-k. With MRL-trained
    embeddings the prefix carries most of the signal, so the coarse pass
    reads prefix_dims/d of the vector bytes per candidate — on a
    columnar store with per-dimension chunking (or a stored truncated
    copy) that is a 2x scan-cost cut here (these synthetic embeddings
    are iid random, so the prefix is an arbitrary projection; MRL
    checkpoints would support a far more aggressive prefix), the dimension-axis analog of
    what IVF does on the row axis. Both stages are deterministic
    (round-6 scores, cand_id tie-breaks), so the whole two-stage plan is
    value-hash oracle-able, unlike learned-index ANN.

    Scale shape: stage 1 is the cosine_topk stream (broadcast queries x
    corpus pass, WindowGroupLimit keeps ~m rows per query per task);
    stage 2 touches only |queries| x m rows."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("q_emb")
    )
    c = embeddings.select(
        F.col("vec_id").alias("cand_id"), _as_double("embedding").alias("c_emb")
    )
    coarse = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            "q_emb",
            "c_emb",
            F.round(
                cosine(
                    F.slice(F.col("q_emb"), 1, prefix_dims),
                    F.slice(F.col("c_emb"), 1, prefix_dims),
                ),
                6,
            ).alias("coarse_sim"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("coarse_sim").desc(), F.col("cand_id").asc()
    )
    survivors = (
        coarse.withColumn("crk", F.row_number().over(wc))
        .filter(F.col("crk") <= m)
        .select(
            "query_id",
            "cand_id",
            "coarse_sim",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), 6).alias("cos_sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id").asc()
    )
    return (
        survivors.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "cand_id",
            "coarse_sim",
            "cos_sim",
            F.col("rk").cast("long").alias("rank"),
        )
    )


def semantic_cluster_dedup(
    embeddings: DataFrame, k: int = 8, iters: int = 2, threshold: float = 0.35
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with the
    deterministic unrolled-Lloyd k-means, then inside each cluster mark
    every vector that has a SMALLER-id neighbor with cosine >=
    ``threshold`` as a duplicate — keep-min-id, never dropDuplicates.

    Output: (vec_id, cluster, is_dup, n_close) — one row per vector, so
    the keep set is the is_dup = false slice and the dedup decision is
    auditable (n_close = how many kept-or-dropped earlier vectors it
    collided with).

    100 TB shape: the quantizer is the k-row broadcast + straight-line
    Lloyd plan of kmeans_lloyd; pair generation is an EQUI-join on the
    cluster id (Σ|cluster|² work, never n²) — in production k scales
    with corpus size (the paper runs 50k clusters on LAION) so cluster
    populations stay bounded and the per-cluster quadratic term is a
    constant; the dup verdict is one mergeable count aggregate keyed on
    the larger vec_id. Fully hash-oracle-able because every stage is
    the deterministic k-means + rounded cosine recipe."""
    vecs = embeddings.select("vec_id", _as_double("embedding").alias("v"))
    cents, assign = _kmeans_fit(vecs, k, iters)
    # Per-vector norms are computed ONCE here and reused per pair: the
    # expression is the exact one cosine() evaluates, so the floats are
    # bitwise-identical to recomputing them pair-side (oracle parity
    # holds) while the per-pair work drops from dot+2 norms to dot
    # alone — the pair stage is the Σ|cluster|² hot loop. The pair join
    # is additionally SALTED: with small k the raw join has only k
    # distinct keys, so the quadratic stage would run on <= k tasks
    # (and AQE coalesces small-byte stages further); the a-side salt
    # (vec_id mod S) with an S-fold replicated b-side keeps every pair
    # exactly once (at the a-vector's salt) and spreads the work S*k
    # ways. In production k scales with corpus (SemDeDup runs 50k
    # clusters) and the salt becomes a no-op cost.
    # The assignment subtree is referenced THREE times (pair a-side,
    # pair b-side, final row list). The explicit cluster repartition is
    # a shared Exchange boundary directly above it, so physical
    # planning (ReusedExchange / AQE stage reuse) executes the
    # crossJoin+argmin assignment ONCE and the two extra references
    # read shuffle output — measured 4.35 s -> 3.36 s (-23%) at sf0.1
    # bench shape (round-10 ladder in SCALING.md; the r9 VERDICT ask).
    # The exchange carries 2k compact rows here and O(corpus) at scale
    # — the same rows the pair join would shuffle anyway.
    n_part = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    assigned = (
        assign(cents)
        .select("vec_id", "v", "cluster", _norm(F.col("v")).alias("nrm"))
        .repartition(n_part, "cluster")
    )
    S = 16
    a = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
        (F.col("vec_id") % S).cast("int").alias("salt"),
    )
    b = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
        F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("salt"),
    )
    # Shuffled-hash pair join, building on the UNREPLICATED a side
    # (round 16, guide §3.1): sort-merge sorted both sides — including
    # the S-fold-replicated b rows WITH their embedding payloads —
    # before every pair stage. Hashing the a side skips both sorts:
    # measured 3.40 -> 2.66-2.67 s min-of-3 at sf0.1 (quiet window,
    # pair set bit-identical). Memory: the per-partition build holds
    # only a-side rows, |cluster|/S vectors per (cluster, salt) key,
    # bounded by the same cluster-population contract that bounds the
    # pair work itself (k scales with corpus; SemDeDup runs 50k
    # clusters), so the hash relation stays small where the operator
    # is usable at all.
    close = (
        a.hint("shuffle_hash").join(b, ["cluster", "salt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(
            F.round(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                6,
            )
            >= threshold
        )
        .groupBy("vec_b")
        .agg(F.count(F.lit(1)).alias("n_close"))
    )
    return (
        assigned.join(close, assigned.vec_id == close.vec_b, "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.col("n_close").isNotNull().alias("is_dup"),
            F.coalesce(F.col("n_close"), F.lit(0).cast("long")).alias("n_close"),
        )
    )
