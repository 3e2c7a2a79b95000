"""Approximate-nearest-neighbor search over embedding columns.

Two paths:
- cosine_topk:      brute-force exact top-k — broadcast the (small) query
                    set against the corpus; one window per query for the
                    top-k cut.  The 100 TB baseline when queries are few.
- lsh_cosine_topk:  random-hyperplane LSH — deterministic ±1 hyperplanes,
                    sign-pattern bucket key computed in the scan stage;
                    candidates = bucket equi-join (shuffles only
                    (id, bucket) pairs), then exact re-rank within
                    candidates.  The scale path when queries are many.

Dot products use a sequential fold (operators.dedup.dot_col) so results
are bit-reproducible across engines; hyperplanes are ±1 vectors derived
from md5 so the bucket function is engine-neutral and literal-embeddable
in oracle SQL.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import dot_col, norm_col


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 random hyperplanes: bit b of md5(seed:plane:block)
    drives entry sign.  Pure function of (n_planes, dim, seed)."""
    planes: list[list[int]] = []
    for p in range(n_planes):
        row: list[int] = []
        block = 0
        bits: list[int] = []
        while len(row) < dim:
            if not bits:
                h = hashlib.md5(f"{seed}:{p}:{block}".encode()).digest()
                bits = [(byte >> k) & 1 for byte in h for k in range(8)]
                block += 1
            row.append(1 if bits.pop(0) else -1)
        planes.append(row)
    return planes


def lsh_bucket_col(vec_col, planes: Sequence[Sequence[int]]):
    """Sign-pattern bucket key: one char per hyperplane ('1' if dot>0 else
    '0').  ±1 entries mean the dot is a sequential add/subtract fold —
    deterministic and cheap (no multiplies needed, but we keep the generic
    fold for clarity; Catalyst codegens it either way)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for plane in planes:
        lit = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(F.when(dot_col(v, lit) > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    `queries` is a (id_col, vec_col) DataFrame assumed small: it is
    broadcast, so the plan is a single pass over the corpus with no
    shuffle of the corpus itself; the window sort runs per query over
    n_corpus rows of (ids, score) — the classic scatter-gather ANN
    baseline.  Self-matches are excluded.  Ties break by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
    ).withColumn("qn", norm_col(F.col("qv")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
    ).withColumn("cn", norm_col(F.col("cv")))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col("cv", "qv") / (F.col("cn") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: exact re-rank restricted to corpus
    vectors in the query's hyperplane bucket.  Recall < 1 by construction;
    multiplying probes (bit-flip neighbors) is the standard extension.

    `dim` is required: inferring it would cost a first() job over the
    corpus before the plan even builds (a full scan stage at 100 TB)."""
    if dim is None:
        raise ValueError(
            "pass dim= explicitly (embedding width); inferring it would run "
            "a scan job before planning"
        )
    planes = hyperplanes(n_planes, dim, seed)
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    ).withColumn("cn", norm_col(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_col(vec_col, planes).alias("bucket"),
    ).withColumn("qn", norm_col(F.col("qv")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", dot_col("cv", "qv") / (F.col("cn") * F.col("qn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _seq_norm(vec: list[float]) -> float:
    """Sequential-fold L2 norm in Python floats (IEEE doubles, same
    accumulation order as norm_col's JVM fold -> identical bits)."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + x * x
    return math.sqrt(acc)


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
    max_literal_cells: int = 4096,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    by cosine (ties break toward the lower centroid id).  The assignment
    column then serves as the block key for search/near-dup (the inverted
    list).  Centroids typically come from a driver-side k-means over a
    sample (`ivf_train`, optionally `ivf_refine`) — any small (id, vec)
    table works.

    Plan shape: when the quantizer fits in the plan
    (n_cells <= `max_literal_cells`), the centroid table is collected
    (it is KB–MB sized by construction) and the argmin is computed IN
    THE SCAN STAGE as a `least()` over per-centroid (−cosine, cid)
    structs — zero joins, zero Exchange: at 100 TB the corpus is
    never shuffled just to learn its cell.  The previous formulation
    (broadcast join + row_number window partitioned by id) exchanged
    corpus × n_cells rows — n_cells-fold shuffle amplification.  Very
    large quantizers (beyond `max_literal_cells`) fall back to that
    join+window path, where the broadcast keeps the corpus scan-local
    but the window still shuffles; quantizers that big should prefer a
    NumPy matmul in mapInPandas (not engine-neutral, so not the oracle
    lane).
    """
    cent_rows = None
    if centroids.count() <= max_literal_cells:
        cent_rows = centroids.select(
            F.col(centroid_id).alias("cid"), F.col(centroid_vec).alias("cv")
        ).collect()

    if cent_rows:
        v = F.col(vec_col)
        # bind the row norm once in its own projection — inlined, each
        # candidate struct would re-fold it (n_cells x dim per row)
        tmp = emb.withColumn("__nv", norm_col(v))
        candidates = []
        for r in sorted(cent_rows, key=lambda r: r["cid"]):
            cv = F.array(*[F.lit(float(x)) for x in r["cv"]])
            sim = dot_col(v, cv) / (F.col("__nv") * F.lit(_seq_norm(list(r["cv"]))))
            candidates.append(
                F.struct((-sim).alias("ns"), F.lit(r["cid"]).alias("cid"))
            )
        best = F.least(*candidates) if len(candidates) > 1 else candidates[0]
        return tmp.withColumn("ivf_cell", best.getField("cid")).drop("__nv")

    cents = centroids.select(
        F.col(centroid_id).alias("cid"), F.col(centroid_vec).alias("cv")
    ).withColumn("cn", norm_col(F.col("cv")))
    base = emb.withColumn("__n", norm_col(F.col(vec_col)))
    scored = base.join(F.broadcast(cents)).withColumn(
        "__sim", dot_col(vec_col, "cv") / (F.col("__n") * F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__sim"), F.asc("cid"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "__sim", "__n", "cv", "cn")
        .withColumnRenamed("cid", "ivf_cell")
    )


def ivf_train(
    emb: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    iters: int = 10,
    seed: int = 42,
    max_sample_per_cell: int = 1000,
):
    """Driver-side k-means (Lloyd's) over a BOUNDED sample: the coarse
    quantizer for IVF.  The sample is small by design (~`max_sample_per_cell`
    rows per centroid suffices) and is hard-capped with limit() regardless
    of `sample_fraction`, so the driver never collects more than
    n_cells*max_sample_per_cell vectors no matter the corpus size; the
    full corpus is only ever *assigned* (ivf_assign, one broadcast pass).
    `sample_fraction=None` (default) takes the cap straight off the scan
    (zero-shuffle); pass a fraction to randomize which rows feed the cap.
    Returns a (centroid_id, centroid) DataFrame.
    """
    import numpy as np

    cap = int(n_cells * max_sample_per_cell)
    sample = emb.select(vec_col)
    if sample_fraction is not None and sample_fraction < 1.0:
        sample = sample.sample(fraction=sample_fraction, seed=seed)
    X = np.array([r[0] for r in sample.limit(cap).collect()], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(axis=0)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id int, centroid array<double>",
    )


def ivf_refine(
    emb: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    iters: int = 1,
) -> DataFrame:
    """Distributed Lloyd refinement of IVF centroids over the FULL corpus.

    `ivf_train` fits a bounded driver-side sample; this polishes those
    centroids against every vector without ever collecting them: each
    iteration is one mapInPandas pass emitting per-(partition, cell)
    partial sums — (cell, sum vector, count), KBs per partition — merged
    driver-side into new means.  No shuffle, no raw-row collect; cost is
    `iters` scans.

    Assignment uses cosine (argmax dot/|v||c|), the same metric
    `ivf_assign`/`ivf_topk` use at query time, so refinement optimizes
    the quantizer actually deployed (spherical k-means; the unnormalized
    member mean assigns identically to the normalized one because a
    centroid's scale cancels in its own cosine).  Empty cells keep their
    previous centroid.  Returns the same (centroid_id, centroid) schema
    as ivf_train.
    """
    import numpy as np
    import pandas as pd
    from typing import Iterator

    spark = emb.sparkSession
    rows = sorted(
        ((int(r["centroid_id"]), np.asarray(r["centroid"], dtype=np.float64))
         for r in centroids.collect()),
        key=lambda t: t[0],
    )
    cids = [t[0] for t in rows]
    C = np.vstack([t[1] for t in rows])
    src = emb.select(vec_col)

    for _ in range(max(0, iters)):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        bc = spark.sparkContext.broadcast(Cn)
        n_cells, dim = C.shape

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cn = bc.value
            sums = np.zeros((n_cells, dim))
            counts = np.zeros(n_cells, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf.iloc[:, 0].to_numpy())
                nv = np.linalg.norm(X, axis=1, keepdims=True)
                nv[nv == 0] = 1.0
                cells = ((X / nv) @ cn.T).argmax(axis=1)
                np.add.at(sums, cells, X)
                np.add.at(counts, cells, 1)
            hit = counts > 0
            if hit.any():
                idx = np.nonzero(hit)[0]
                yield pd.DataFrame(
                    {
                        "cell": idx.astype("int32"),
                        "vsum": [sums[i].tolist() for i in idx],
                        "n": counts[idx],
                    }
                )

        agg = src.mapInPandas(
            partials, schema="cell int, vsum array<double>, n long"
        ).collect()
        bc.unpersist()
        tot = np.zeros_like(C)
        cnt = np.zeros(n_cells, dtype=np.int64)
        for r in agg:
            tot[r["cell"]] += np.asarray(r["vsum"])
            cnt[r["cell"]] += r["n"]
        upd = cnt > 0
        C = np.where(upd[:, None], tot / np.maximum(cnt, 1)[:, None], C)

    return spark.createDataFrame(
        [(cids[i], [float(x) for x in C[i]]) for i in range(len(cids))],
        "centroid_id int, centroid array<double>",
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus vectors are assigned to their nearest cell once
    (the inverted lists); each query probes its `nprobe` nearest cells and
    re-ranks exactly within them.  Recall grows with nprobe; cost is
    ~nprobe/n_cells of brute force."""
    cents = centroids.select(
        F.col("centroid_id").alias("cid"), F.col("centroid").alias("cv")
    ).withColumn("cn", norm_col(F.col("cv")))

    corpus = ivf_assign(emb, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col("ivf_cell").alias("cell"),
    ).withColumn("nn", norm_col(F.col("nv")))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", norm_col(F.col("qv")))
    scored_cells = q.join(F.broadcast(cents)).withColumn(
        "__sim", dot_col("qv", "cv") / (F.col("qn") * F.col("cn"))
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("cid"))
    probes = (
        scored_cells.withColumn("__rk", F.row_number().over(wc))
        .filter(F.col("__rk") <= nprobe)
        .select("query_id", "qv", "qn", F.col("cid").alias("cell"))
    )

    cand = corpus.join(F.broadcast(probes), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine", dot_col("nv", "qv") / (F.col("nn") * F.col("qn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space with a coarse quantizer, then within each cluster remove every
    vector that has a semantic near-duplicate at cosine >= `threshold`.

    This is the semantic member of the dedup family: exact/MinHash/
    SimHash catch lexical duplication, `embedding_near_dup` catches
    near-identical vectors inside a CALLER-provided block — SemDeDup
    additionally derives the blocks from the geometry itself (k-means
    cells), so paraphrases and cross-lingual re-posts that share no
    tokens still deduplicate.

    Keep rule (deterministic, engine-neutral): a vector is kept iff NO
    same-cell vector with a SMALLER id has cosine >= threshold to it.
    The paper keeps one arbitrary representative per epsilon-
    neighborhood; pinning min-id makes the output a pure function of the
    input, invariant to partitioning and re-runs.  Note this is EXISTS
    semantics, not connected components: in a chain a~b~c with
    cos(a,c) < threshold, b is removed (a is smaller) and c is removed
    iff cos(b,c) >= threshold even though b itself was removed — chain
    collapse to one representative needs `resolve_dup_clusters` over
    `embedding_near_dup` pairs when that is wanted.

    `centroids` is a small (centroid_id, centroid) table — typically
    `ivf_train(emb, n_cells)` (distributed Lloyd refinement available
    via `ivf_refine`).  Returns (id_col, ivf_cell, keep).

    Scale shape (100 TB): small quantizers assign IN THE SCAN STAGE
    (literal least() argmin, no shuffle of the corpus — see ivf_assign);
    the only corpus shuffle is the in-cell self-join, whose pair space
    is the sum of per-cell squares — pick n_cells ~ corpus/10k so cells
    stay ~10k vectors (the paper uses ~100k clusters for LAION-scale).
    `max_cell` guards the degenerate cell (zero/default embeddings all
    landing together): cells larger than it are EXCLUDED from pairing —
    counted per cell BEFORE any pair materializes, same philosophy as
    the LSH `max_bucket` guard — and their rows come back keep=True
    (a cell that big is a pathology to handle separately, not a
    neighborhood to self-join).
    """
    assigned = ivf_assign(
        emb.select(F.col(id_col), F.col(vec_col)), centroids, id_col, vec_col
    )
    from .dedup import embedding_near_dup

    pairable = assigned
    if max_cell is not None:
        ok_cells = (
            assigned.groupBy("ivf_cell")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_cell)
            .select("ivf_cell")
        )
        pairable = assigned.join(F.broadcast(ok_cells), "ivf_cell")
    pairs = embedding_near_dup(
        pairable, id_col, vec_col, block_col="ivf_cell", threshold=threshold
    )
    removed = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__rm", F.lit(True))
    )
    return (
        assigned.join(removed, id_col, "left")
        .select(
            F.col(id_col),
            F.col("ivf_cell"),
            F.col("__rm").isNull().alias("keep"),
        )
    )
