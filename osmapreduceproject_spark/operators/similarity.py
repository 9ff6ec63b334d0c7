"""Embedding similarity search (SURVEY.md §2.B LLM-pipeline rows).

Two paths over an ``array<float>`` embedding column:

- :func:`cosine_topk` — exact brute-force top-k for a (small) query set.
  The query side is broadcast; similarity is a zip_with/aggregate
  higher-order expression (JVM-side, codegen'd — no Python). Cost is
  O(|queries| · N) with no shuffle of the corpus: the right default when
  |queries| is bounded, even at 100 TB corpus size.
- :func:`lsh_topk` — approximate path: random-hyperplane (SRP) LSH
  bucketing; candidates come from equi-joins on bucket signatures, so
  cost tracks collisions, not N·Q. Recall/latency traded via
  (num_planes, num_tables).

All float math is accumulated in double, left-to-right (F.aggregate is a
sequential fold) → deterministic, oracle-comparable after rounding.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in double, sequential fold → deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# NOTE (measured, do not "optimize" back): expanding the dot product into a
# getItem-chain expression (64 scalar multiply-adds per dot) to get it into
# whole-stage codegen FAILS — three dots per cosine in one projection blow
# janino's 64KB single-method limit (one expression tree cannot be
# split into sub-methods), and Spark pays two failed compiles before
# falling back to the interpreted path anyway. The higher-order fold in
# :func:`dot` is interpreted but compile-free, and benches faster end-to-end.


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's own size estimate for a plan (bytes) — free at
    composition time; used only to pick between value-identical
    execution strategies, so a bad estimate can cost time, never
    correctness."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover — estimation must never break a query
        return 1 << 62


# Cost switch for cosine_topk (guide §1.2/§4.1): below this many
# query·corpus-bytes the bounded-query brute ranking stays on the JVM
# broadcast-join + fold path (no Python workers to spin up); above it
# the Arrow/numpy scoring pass wins (vectorized flops amortize the
# worker round-trip). 64 MiB ≈ 160k pairs at the fixture's ~400 B/row —
# the measured crossover sits near 100k pairs. Parameterised (env) so a
# cluster profile can move it; both paths are bit-identical (r15
# property tests), so the switch can never change a result.
_COSINE_ARROW_MIN_QUERY_BYTES = int(
    os.environ.get("SPARK_GRAFT_COSINE_ARROW_BYTES", str(64 * 1024 * 1024))
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector, brute force.

    The query side is bounded by contract and EAGERLY collected at
    composition time (it was a driver-built broadcast hash relation
    before r15 — same rows, same memory); the corpus never shuffles
    for the similarity computation; the only shuffle is the final
    per-query top-k window, keyed by query_id (bounded cardinality),
    with WindowGroupLimit pruning each scan task's output to k rows
    per query BEFORE that exchange. Ranking uses the *rounded*
    similarity plus the neighbor id as tiebreak so results are fully
    deterministic across engines and partitionings.

    TWO value-identical execution strategies, cost-switched on
    |queries| × estimated corpus bytes (r16, guide §1.2 — the r15
    Arrow rewrite regressed every small consumer ~1.4× because the
    Python-worker spin-up never amortizes at thousands of pairs):

    - small (q34/q203 shapes): the pre-r15 JVM path — queries
      broadcast-joined to the corpus, one interpreted dot fold per
      pair over precomputed per-row norms. No Python boundary at all.
    - large (q297/q329/hubness shapes): Arrow ``mapInPandas`` scoring
      — one numpy product-matrix + cumulative-sum pass per batch (the
      JVM fold measured ~10 µs/pair; q297 pre-containment spent
      31–41 s in it). BIT-IDENTICAL to the fold by construction:
      float→double casts exact, per-element f64 products the same
      IEEE ops, ``np.cumsum`` IS the sequential left fold of the JVM
      ``aggregate`` (property-tested in tests/test_operators.py),
      norms the same fold + correctly-rounded sqrt, finalize keeps the
      dot/(corpus_norm · query_norm) operand order, 6-decimal ROUNDING
      STAYS IN THE JVM. NULL/length-mismatched vectors yield NULL sims
      exactly as the zip_with fold does, and rows whose id is NULL are
      dropped exactly as the JVM join predicate drops them.

    Known edge divergence (ADVICE r15, documented): a vector whose
    ELEMENTS contain NaN produces a NaN sim on the JVM path (ranked
    first by desc) but a NULL sim through Arrow (pandas→Arrow nullifies
    NaN, ranked last). No declared dataset carries NaN embeddings; feed
    NaN-free vectors or pre-filter if a new caller cannot guarantee it.
    """
    from ..plans.inspect import fan_out

    qid_t = queries.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    q_pairs = [(r[0], r[1]) for r in q_rows if r[0] is not None]

    if len(q_pairs) * _plan_size_bytes(corpus) < _COSINE_ARROW_MIN_QUERY_BYTES:
        # JVM path: broadcast the (tiny) query side, one fold per pair.
        q = queries.where(F.col(id_col).isNotNull()).select(
            F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec")
        ).withColumn("__qn", norm(F.col("__qvec")))
        c = corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
            "__cn", norm(F.col(vec_col))
        )
        scored_jvm = c.join(
            F.broadcast(q), F.col(id_col) != F.col(query_id_col)
        ).withColumn(
            "sim",
            F.round(
                dot(F.col(vec_col), F.col("__qvec")) / (F.col("__cn") * F.col("__qn")),
                6,
            ),
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("sim").desc(), F.col(id_col).asc()
        )
        return (
            scored_jvm.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
        )

    # Arrow path. The query set ships as a broadcast VARIABLE (r16,
    # ADVICE r15 watch item): the pickled task closure holds only the
    # handle, so a large bounded query set crosses the wire via torrent
    # blocks once per executor instead of riding in every task binary.
    q_bc = corpus.sparkSession.sparkContext.broadcast(q_pairs)

    def score(batches):
        import numpy as np
        import pandas as pd

        q_pairs = q_bc.value
        # Group query vectors by length: a pair only produces a non-NULL
        # dot when both arrays have equal length (zip_with pads the
        # shorter side with NULL, which nulls the whole fold) — vectorize
        # per length group, emit NULL sims for everything else.
        by_len: dict[int, list[int]] = {}
        for qi, (qid, qv) in enumerate(q_pairs):
            if qv is not None:
                by_len.setdefault(len(qv), []).append(qi)
        q_ids = np.array([qid for qid, _ in q_pairs])
        groups = {}
        for d, idxs in by_len.items():
            Qg = np.array(
                [np.asarray(q_pairs[i][1], dtype=np.float64) for i in idxs]
            ).reshape(len(idxs), d)
            QP = Qg * Qg
            np.cumsum(QP, axis=1, out=QP)
            groups[d] = (np.array(idxs), Qg, np.sqrt(QP[:, -1]))
        m = len(q_pairs)
        for pdf in batches:
            n = len(pdf)
            if n == 0 or m == 0:
                continue
            ids = pdf[id_col].to_numpy()
            # NULL corpus ids never pair (the JVM join predicate
            # id != query_id is NULL → row dropped); mirror that here.
            id_ok = pdf[id_col].notna().to_numpy()
            vecs = pdf[vec_col].tolist()
            for lo in range(0, n, 64):
                hi = min(lo + 64, n)
                rows = hi - lo
                lens: dict[int, list[int]] = {}
                for ci in range(lo, hi):
                    v = vecs[ci]
                    if v is not None:
                        lens.setdefault(len(v), []).append(ci)

                def block_for(d, cidx):
                    # bit-identity contract: per-element f64 products then
                    # a SEQUENTIAL cumulative sum — np.cumsum is the exact
                    # left fold the JVM higher-order aggregate runs, and
                    # the finalize keeps the dot/(corpus_norm · query_norm)
                    # operand order (rounding stays in the JVM)
                    qidx, Qg, qn = groups[d]
                    C = np.array(
                        [np.asarray(vecs[i], dtype=np.float64) for i in cidx]
                    ).reshape(len(cidx), d)
                    CP = C * C
                    np.cumsum(CP, axis=1, out=CP)
                    cn = np.sqrt(CP[:, -1])
                    P = C[:, None, :] * Qg[None, :, :]
                    np.cumsum(P, axis=2, out=P)
                    return qidx, P[:, :, -1] / (cn[:, None] * qn[None, :])

                only = next(iter(lens)) if len(lens) == 1 else None
                if (
                    only is not None
                    and only in groups
                    and len(lens[only]) == rows
                    and len(groups[only][0]) == m
                ):
                    # fast path (every vector regular, one length): a pure
                    # float64 sims matrix, no object boxing
                    _, sims = block_for(only, lens[only])
                else:
                    # rare path: NULL sims (object cells) exactly where the
                    # JVM fold yields NULL — null or length-mismatched vecs
                    sims = np.full((rows, m), None, dtype=object)
                    for d, cidx in lens.items():
                        if d not in groups:
                            continue
                        qidx, block = block_for(d, cidx)
                        ri = np.array([i - lo for i in cidx])
                        sims[ri[:, None], qidx[None, :]] = block
                # drop self-pairs and NULL-id rows (the JVM join's
                # id != query_id predicate does both)
                qv = np.tile(q_ids, rows)
                cv = np.repeat(ids[lo:hi], m)
                keep = (qv != cv) & np.repeat(id_ok[lo:hi], m)
                yield pd.DataFrame(
                    {"__qid": qv[keep], "__nid": cv[keep],
                     "__sim": sims.ravel()[keep]}
                )

    scored = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        score, f"__qid {qid_t}, __nid {nid_t}, __sim double"
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("sim").desc(), F.col("__nid").asc()
    )
    return (
        scored.withColumn("sim", F.round(F.col("__sim"), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__nid").alias("neighbor_id"),
            "sim",
            "rank",
        )
    )


def hash_u01(i: int) -> float:
    """Deterministic uniform [0,1) from an integer counter (splitmix64)."""
    x = (i + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return x / 2**64


def _sparse_planes(
    dim: int, num_planes: int, table: int, density: int = 8
) -> list[list[tuple[int, int]]]:
    """±1 sparse random hyperplanes (Achlioptas / Li very-sparse
    projections): ``density`` nonzero entries per plane, positions and
    signs from the splitmix counter hash — deterministic across
    runs/engines.

    Why sparse instead of the Gaussian planes of :func:`_deterministic_planes`:
    sign(Σ ±vec[i]) over a handful of elements compiles to ``getItem`` +
    scalar adds — whole-stage-codegen'd — while a dense dot is an
    interpreted higher-order ``aggregate`` fold. Measured ~4× cheaper per
    signature at equal plane counts, with the standard mild recall cost of
    sparse projections. Entries are sorted by dimension so both engines
    add in the same order (bit-identical sums → identical sign decisions).
    """
    density = max(1, min(density, dim))  # dim < density would never terminate
    planes: list[list[tuple[int, int]]] = []
    for p in range(num_planes):
        chosen: dict[int, int] = {}
        c = 0
        while len(chosen) < density:
            idx = int(hash_u01(table * 7_000_003 + p * 10_007 + c) * dim) % dim
            sign = 1 if hash_u01(table * 7_000_003 + p * 10_007 + 100_000 + c) >= 0.5 else -1
            c += 1
            if idx not in chosen:
                chosen[idx] = sign
        planes.append(sorted(chosen.items()))
    return planes


def _sparse_signature(vec: Column, planes: list[list[tuple[int, int]]]) -> Column:
    """Signature from sparse ±1 planes: bit i = sign(Σ_j s_j·vec[d_j])."""
    bits = []
    for i, entries in enumerate(planes):
        proj = None
        for idx, sign in entries:
            term = vec.getItem(idx).cast("double")
            term = term if sign > 0 else -term
            proj = term if proj is None else proj + term
        bits.append(F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int = 64,
    num_planes: int = 12,
    num_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: SRP-LSH candidate generation + exact re-rank.

    Each vector gets ``num_tables`` bucket signatures; query↔corpus
    candidates are equi-joined on (table, signature) — the scale path when
    the query set is itself huge (no broadcast possible). Exact cosine is
    then computed only for candidates. Recall < 1.0 by construction;
    raise num_tables / lower num_planes to trade cost for recall.

    Signatures come from the same sparse ±1 plane family as
    :func:`embedding_neardup_pairs` (deterministic splitmix positions,
    codegen'd getItem sums, one projection column per table before the
    explode — see the janino note there), so the full pipeline is
    replicable in oracle SQL and q52 is value-checked, not rows-only.

    Candidate rows stay NARROW until scoring (r14 bench finding): the
    bucket join and the distinct carry only (id, query_id) — never
    vectors — and the two side frames (vector + its ONCE-PER-ROW
    precomputed norm, the cosine_topk r13 recipe) join back onto the
    deduplicated pairs afterwards, so each surviving candidate pays
    exactly one interpreted dot fold and the distinct's exchange
    moves ids instead of 64-float arrays (measured on the q338 shape:
    13.5 → 9.6 s warm at sf0.1, bit-identical output — same candidate
    set, same fold, same dot/(corpus_norm · query_norm) operand
    order).

    PRECONDITION: ``id_col`` must be unique per row on BOTH sides
    (ADVICE r14). The narrow-candidate distinct collapses on
    (id, query_id) and then re-joins vectors BY ID — a duplicated id
    would re-expand each collapsed pair into the rank window, where
    the old vector-carrying distinct silently merged them. Every
    caller feeds key-deduplicated frames (vec_id is the embeddings
    table's key); assert upstream if a new call site can't guarantee
    it.
    """
    def sigs_only(df: DataFrame, idc: str) -> DataFrame:
        sig_cols = []
        for t in range(num_tables):
            planes = _sparse_planes(dim, num_planes, t)
            sig_cols.append(
                _sparse_signature(F.col(vec_col), planes).alias(f"__sig_{t}")
            )
        structs = [
            F.struct(F.lit(t).alias("tbl"), F.col(f"__sig_{t}").alias("sig"))
            for t in range(num_tables)
        ]
        return (
            df.select(F.col(idc), *sig_cols)
            .select(F.col(idc), F.explode(F.array(*structs)).alias("ts"))
            .select(idc, F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))
        )

    cb = sigs_only(corpus, id_col)
    qb = sigs_only(
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col)),
        query_id_col,
    )
    # One exchange for the whole tail (r15 optimization): hash the
    # collided pairs on query_id ONCE; the (id, query_id) dedup is an
    # aggregate whose grouping keys are a superset of the partitioning
    # (same pair → same query_id → same partition, so the distinct is
    # exact), the two vector join-backs broadcast, and the final top-k
    # window partitions by query_id — all three reuse this partitioning,
    # where the previous .distinct() hashed on (id, query_id) and the
    # rank window then re-shuffled the scored stream on query_id.
    cand = (
        cb.join(qb, ["tbl", "sig"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(id_col, query_id_col)
        .repartition(F.col(query_id_col))
        .distinct()
    )
    cn = corpus.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__cn")
    )
    qn = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        cand.join(cn, id_col)
        .join(qn, query_id_col)
        .withColumn(
            "sim",
            F.round(
                dot(F.col(vec_col), F.col("__qvec"))
                / (F.col("__cn") * F.col("__qn")),
                6,
            ),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 10,
    num_tables: int = 6,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine ≥ threshold) via SRP-LSH
    buckets + exact verification — the same candidates-from-equi-joins
    discipline as MinHash dedup (operators/dedup.py minhash_lsh_pairs),
    never an all-pairs self-join.

    Shape: each vector gets ``num_tables`` signed-random-projection
    signatures (deterministic hyperplanes); candidate pairs come from a
    self-equi-join on (table, signature); exact cosine is computed for
    candidates only. Cost tracks bucket collisions (for random pairs,
    ~``num_tables``·2^-``num_planes``), not N². Recall is the standard
    SRP tradeoff, 1-(1-(1-θ/π)^planes)^tables: with the defaults ≈0.997
    at sim 0.99, ≈0.92 at 0.95, but only ≈0.19 down at 0.9 — sign-LSH
    bucketing is a ≥0.95 near-dup tool; catching 0.9-boundary pairs with
    high recall needs ~5× more tables (or multi-probe), which is a cost
    knob, not a design change.

    Signature and bucket tables are persisted (self-join would re-execute
    the upstream DAG); callers release via
    ``plans.inspect.release_intermediates()``.
    """
    from ..plans.inspect import tracked_persist

    # Signatures are computed as one PROJECTION COLUMN PER TABLE before the
    # explode: codegen splits a projection per-expression into sub-methods,
    # but a single explode(array(struct(sig_0..sig_T))) generator is ONE
    # expression tree — at 6 tables × 10 planes it exceeds janino's 64KB
    # method limit and the stage pays a failed compile + interpreted
    # fallback (measured). The explode then only references plain columns.
    sig_cols = []
    for t in range(num_tables):
        planes = _sparse_planes(dim, num_planes, t)
        sig_cols.append(_sparse_signature(F.col(vec_col), planes).alias(f"__sig_{t}"))
    with_sigs = df.select(F.col(id_col), *sig_cols)
    structs = [
        F.struct(F.lit(t).alias("tbl"), F.col(f"__sig_{t}").alias("sig"))
        for t in range(num_tables)
    ]
    buckets = tracked_persist(
        with_sigs.select(F.col(id_col), F.explode(F.array(*structs)).alias("ts"))
        .select(id_col, F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))
    )
    a = buckets.select(F.col(id_col).alias("a_id"), "tbl", "sig")
    b = buckets.select(F.col(id_col).alias("b_id"), "tbl", "sig")
    cand = (
        a.join(b, ["tbl", "sig"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # Plain re-scan (cheaper than caching the corpus), with the L2 norm
    # computed ONCE PER VECTOR in the projection: the verify join then
    # evaluates one dot fold per candidate pair instead of re-folding both
    # norms per pair (3 folds → 1). Same expression structure as
    # cosine() — dot/(norm·norm) in doubles — so the value is
    # bit-identical and the oracle unchanged.
    vecs = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__nrm")
    )
    av = vecs.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        F.col("__nrm").alias("__a_nrm"),
    )
    bv = vecs.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        F.col("__nrm").alias("__b_nrm"),
    )
    return (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn(
            "sim",
            F.round(
                dot(F.col("a_vec"), F.col("b_vec"))
                / (F.col("__a_nrm") * F.col("__b_nrm")),
                6,
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("a_id", "b_id", "sim")
    )


def _ivf_cents(
    corpus: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> DataFrame:
    """Deterministic coarse quantizer: first ``n_centroids`` corpus
    vectors by id, numbered 0..n-1 (broadcast-tiny)."""
    wc = Window.orderBy(id_col)
    return (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select((F.row_number().over(wc) - 1).alias("cid"), F.col(vec_col).alias("__cvec"))
    )


def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """IVF list assignment: (id, cid) per corpus vector — argmax of the
    rounded dot product against the broadcast quantizer, ties to the
    larger cid (the max_by(cid, struct(score, cid)) rule shared with
    :func:`ivf_topk` so index audits see the index search uses).

    Scale shape: corpus × broadcast(centroids) scored JVM-side, one
    partial-aggregating max_by per vector — no shuffle of vectors beyond
    the id-keyed agg, no collect. ``keep_vec`` carries the vector through
    for consumers that re-rank (ivf_topk); audits leave it off so only
    (id, cid) pairs flow."""
    cents = _ivf_cents(corpus, n_centroids, id_col, vec_col)
    score = F.round(dot(F.col(vec_col), F.col("__cvec")), 6)
    aggs = ([F.first(vec_col).alias(vec_col)] if keep_vec else []) + [
        F.max_by("cid", F.struct("__score", "cid")).alias("cid")
    ]
    return (
        corpus.crossJoin(F.broadcast(cents))
        .withColumn("__score", score)
        .groupBy(id_col)
        .agg(*aggs)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse index.

    Train: centroids are the first ``n_centroids`` corpus vectors by id —
    deterministic; a production deployment would run k-means, but the
    operator contract (assign → probe → re-rank) is identical and that is
    the tested surface.

    The quantizer is a *broadcast DataFrame*, not driver-side literals:
    assignment is ``corpus × broadcast(centroids)`` scored with a JVM
    sequential-fold dot product, then ``max_by`` per vector — fully lazy
    (no collect), no giant literal expression trees to re-analyze per
    call, and the identical shape works when centroids number in the
    thousands. Search: each query probes its top ``nprobe`` centroid
    lists; candidates equi-join on the list id; exact cosine re-ranks.
    Cost per query drops from O(N) to O(N·nprobe/n_centroids) expected.

    At 100 TB: n_centroids should scale to thousands (√N rule) so each
    inverted list stays executor-sized; the list-id join key then has
    enough cardinality to avoid reducer skew, and AQE splits any hot
    list. Rounded scores + id tiebreaks keep results deterministic.
    """
    cents = _ivf_cents(corpus, n_centroids, id_col, vec_col)
    # assign: argmax_{cid} <vec, centroid>; ties break to the larger cid
    assigned = ivf_assign(corpus, n_centroids, id_col, vec_col, keep_vec=True)
    # probe: top-nprobe centroids per query, same ordering/tie rule
    qscored = (
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec"))
        .crossJoin(F.broadcast(cents))
        .withColumn("__score", F.round(dot(F.col("__qvec"), F.col("__cvec")), 6))
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__score").desc(), F.col("cid").desc()
    )
    probes = (
        qscored.withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= nprobe)
        .select(query_id_col, "__qvec", "cid")
    )
    cand = (
        assigned.join(probes, "cid")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(id_col, vec_col, query_id_col, "__qvec")
        .distinct()
    )
    scored = cand.withColumn("sim", F.round(cosine(F.col(vec_col), F.col("__qvec")), 6))
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def kmeans(
    df: DataFrame,
    k: int,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means over an ``array<float>`` column.

    The canonical *iterative* MapReduce job (the reference's map→combine
    →reduce cycle run ``iters`` times): assign each vector to its nearest
    centroid (map, via a broadcast join — no literal trees, no collect),
    then recompute centroids as per-cluster means (reduce, one partial→
    final aggregation on k keys). Initialization is the first ``k``
    vectors by id, so runs are reproducible.

    Per iteration: one broadcast of k·dim floats + one k-key shuffle of
    partial sums — driver never touches vector data; at 100 TB each
    iteration is a scan-bound pass. Returns (cid, centroid, n_members)
    after ``iters`` rounds.

    Reference parity note: the per-cluster mean is the same
    partial/final combine as `/root/reference/max_aggregation.cpp:53-63`,
    generalized from max to (sum, count) pairs.
    """
    wc = Window.orderBy(id_col)
    cents = (
        df.orderBy(id_col)
        .limit(k)
        .select((F.row_number().over(wc) - 1).alias("cid"), F.col(vec_col).alias("__cvec"))
    )
    vecs = df.select(id_col, F.col(vec_col).alias("__v"))
    # Squared diffs in DOUBLE even when both inputs are float32: float32
    # subtract/multiply round differently across engines (and differently
    # from iteration 2, where centroids are already double means), so the
    # double cast is what makes every distance bit-identical to the
    # unrolled SQL oracle's CAST(.. AS DOUBLE) arithmetic.
    dist2 = F.aggregate(
        F.zip_with(
            F.col("__v"),
            F.col("__cvec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for _ in range(iters):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .withColumn("__d", F.round(dist2, 9))
            .groupBy(id_col)
            .agg(
                F.first("__v").alias("__v"),
                # nearest centroid; ties to the smaller cid
                F.min_by("cid", F.struct("__d", "cid")).alias("cid"),
            )
        )
        # Reduce: per-(cluster, dimension) mean via posexplode + hash agg.
        # Never collects member vectors into one task — partial sums make
        # a billion-member cluster the same plan as a ten-member one.
        per_dim = (
            assigned.select("cid", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("val").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        # Means rounded to 9 decimals per iteration: a double SUM's value
        # depends on accumulation order (partitioning here, engine there),
        # so unrounded means would feed last-ulp jitter forward into the
        # next assignment round. The round is a fixed-point contraction of
        # that jitter — it keeps every iteration's centroids identical
        # across runs, partitionings, and engines.
        cents = (
            per_dim.withColumn("m", F.round(F.col("s") / F.col("n"), 9))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("__cvec"),
                F.first("n").alias("n_members"),
            )
        )
    return cents.select(
        "cid", F.col("__cvec").alias("centroid"), "n_members"
    )


def embedding_norm_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding health report: vector count, dimension spread,
    and L2-norm min/avg/max — the sanity pass an embedding pipeline runs
    before indexing (all-zero vectors, un-normalized batches, and
    mixed-dimension corruption all show up here, and all three break
    cosine retrieval silently if unchecked).

    Scale shape: the norm is the same sequential double fold as
    :func:`norm` (narrow map, deterministic); the report is one
    label-keyed aggregation with map-side combine — the only exchange
    carries O(labels × partitions) pre-aggregated rows.

    Returns (label, n_vecs, n_dims_min, n_dims_max, n_zero_vecs,
    min_norm, avg_norm, max_norm); norms rounded to 6 decimals.
    """
    v = F.col(vec_col)
    rn = F.round(norm(v), 6)
    return (
        df.select(F.col(label_col), F.size(v).cast("bigint").alias("n_dims"), rn.alias("l2"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("n_dims").alias("n_dims_min"),
            F.max("n_dims").alias("n_dims_max"),
            F.sum(F.when(F.col("l2") == 0.0, 1).otherwise(0)).alias("n_zero_vecs"),
            F.min("l2").alias("min_norm"),
            F.round(F.avg("l2"), 6).alias("avg_norm"),
            F.max("l2").alias("max_norm"),
        )
    )


def _sq_subdist(a: Column, b: Column, j: Column, d_sub: int) -> Column:
    """Squared L2 distance between subspace ``j`` (1-based) of two
    vectors: sequential double fold over the ``d_sub`` slice →
    bit-deterministic and identical to the DuckDB replica's order."""
    start = (j - 1) * d_sub + 1
    return F.aggregate(
        F.zip_with(
            F.slice(a, start, d_sub),
            F.slice(b, start, d_sub),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via product quantization (PQ) with asymmetric
    distance computation (ADC) — the memory-scale path for vector search:
    each corpus vector is stored as ``m`` one-byte codes (here m=4: a
    64-dim float vector compresses 64×), and query-time distance is a
    table lookup per subspace, never a full-vector scan.

    Train: like :func:`ivf_topk`, the codebook is the first ``k_codes``
    corpus vectors' subvectors — deterministic; production would run
    k-means per subspace (the :func:`kmeans` operator composes), but the
    encode → lookup-table → ADC contract is identical and is the tested
    surface.

    Scale shape: the codebook is a broadcast DataFrame (m·k_codes rows);
    encoding is corpus × broadcast with a partial-aggregating
    ``min_by`` per (vector, subspace) — map-side combine, one narrow
    shuffle of m rows per vector. ADC joins the code table against the
    per-query lookup table on (subspace, code) — k-codes-bounded build
    side, broadcast. The per-subspace partial distances are summed via
    conditional single-element aggregates added in fixed subspace order,
    so the estimate is bit-deterministic across engines and partition
    orders. No cross join against raw vectors anywhere after encode.

    Returns (query_id, neighbor_id, est_dist, rank), est_dist ascending
    (squared L2 estimate, 6 decimals), ties broken by neighbor id.
    """
    # Vector dimensionality: prefer the explicit ``dim`` parameter (no
    # Spark job at DataFrame-construction time — plan-only consumers like
    # tools/dump_plans.py stay lazy). The fallback probe is guarded: an
    # empty corpus raises a clear error instead of head()'s None TypeError.
    if dim is None:
        row = corpus.select(vec_col).head()
        if row is None or row[0] is None:
            raise ValueError(
                f"pq_topk: cannot infer vector dim from an empty corpus / null "
                f"{vec_col!r}; pass dim= explicitly"
            )
        dim = len(row[0])
    d_sub = dim // m
    wc = Window.orderBy(id_col)
    cb = (
        corpus.orderBy(id_col)
        .limit(k_codes)
        .select((F.row_number().over(wc) - 1).alias("code"), F.col(vec_col).alias("__cvec"))
        .select(
            "code",
            "__cvec",
            F.explode(F.array(*[F.lit(j) for j in range(1, m + 1)])).alias("j"),
        )
    )
    # encode: argmin_code over each subspace; partial-aggregating min_by
    enc = (
        corpus.crossJoin(F.broadcast(cb))
        .withColumn(
            "__d", _sq_subdist(F.col(vec_col), F.col("__cvec"), F.col("j"), d_sub)
        )
        .groupBy(id_col, "j")
        .agg(F.min_by("code", F.struct("__d", "code")).alias("code"))
    )
    # per-query lookup table: distance from the query's subvector to every
    # codebook entry of that subspace
    qd = (
        queries.select(F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qvec"))
        .crossJoin(F.broadcast(cb))
        .select(
            query_id_col,
            "j",
            "code",
            _sq_subdist(F.col("__qvec"), F.col("__cvec"), F.col("j"), d_sub).alias("__qd"),
        )
    )
    per_sub = [
        F.sum(F.when(F.col("j") == j, F.col("__qd"))).alias(f"__d{j}")
        for j in range(1, m + 1)
    ]
    est_expr = F.col("__d1")
    for j in range(2, m + 1):
        est_expr = est_expr + F.col(f"__d{j}")
    est = (
        enc.join(F.broadcast(qd), ["j", "code"])
        .where(F.col(id_col) != F.col(query_id_col))
        .groupBy(query_id_col, id_col)
        .agg(*per_sub)
        .withColumn("est_dist", F.round(est_expr, 6))
    )
    w = Window.partitionBy(query_id_col).orderBy("est_dist", F.col(id_col).asc())
    return (
        est.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "est_dist", "rank")
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shape semantic dedup (Abbas et al. 2023, public paper):
    cluster the embedding space, then compare cosine similarity WITHIN
    each cluster only — semantic near-dup candidates from cluster
    blocking instead of an all-pairs scan. Complements the text-surface
    strategies (MinHash catches lexical copies; this catches paraphrases
    whose embeddings coincide) and the SRP-LSH path (bucket recall is
    probabilistic there, cluster-local here).

    Recall contract: a ≥threshold pair is found iff both members land in
    the same cluster — the paper's trade by design (near-identical
    embeddings quantize together; the miss band is pairs straddling a
    cluster boundary). Deterministic end-to-end: the coarse quantizer is
    :func:`ivf_assign` (first-n-by-id centroids, rounded-score argmax,
    cid tiebreak) and similarities round to 6 decimals with id-ordered
    pairs.

    Scale shape: assignment is corpus × broadcast(quantizer) with a
    partial max_by; the self-join keys on cid, so the shuffle moves each
    vector once and pair volume is Σ |cluster|²/2, controlled by
    n_clusters (√N rule keeps clusters executor-sized; AQE splits a hot
    cluster). Nothing all-pairs, nothing driver-side.
    """
    from ..plans.inspect import tracked_persist

    # r15: persist the assignment (the self-join's two sides otherwise
    # each re-run the corpus × quantizer scoring pass) and precompute
    # each side's norm ONCE PER VECTOR before the pair join (the
    # cosine_topk r13 recipe — the per-pair work drops from three
    # interpreted folds to the one irreducible dot; bit-identical: same
    # folds, same dot/(a_norm · b_norm) operand order).
    assigned = tracked_persist(
        ivf_assign(emb, n_clusters, id_col, vec_col, keep_vec=True).select(
            "cid", F.col(id_col), F.col(vec_col),
            norm(F.col(vec_col)).alias("__n"),
        )
    )
    a = assigned.select(
        "cid", F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("__av"), F.col("__n").alias("__an"),
    )
    b = assigned.select(
        "cid", F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("__bv"), F.col("__n").alias("__bn"),
    )
    return (
        a.join(b, "cid")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "sim",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn")),
                6,
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("a_id", "b_id", "cid", "sim")
    )


def cluster_drift(
    old: DataFrame,
    new: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots — the
    monitoring report a dataset refresh publishes before retraining on
    it: both snapshots are assigned with the SAME deterministic coarse
    quantizer (centroids from the OLD snapshot, so the partition of the
    space is held fixed), then each cluster reports its population shift
    and how far its mean vector moved. A new crawl that floods one
    semantic region shows up as (n_new ≫ n_old); a subtle domain shift
    shows up as centroid_drift with stable counts.

    Cross-engine determinism: per-dimension means are computed over
    ``round(x·scale)`` integer components (exact, associative sums); the
    L2 over the 64 per-dimension mean deltas runs as a sequential fold
    over the dimension-sorted array (the q123 rule — never an
    order-arbitrary float sum). Returns
    (cid, n_old, n_new, centroid_drift) with drift in original units,
    6 decimals; a cluster empty on either side reports NULL drift.

    Scale shape: assignment is corpus × broadcast(quantizer); the
    component explode shuffles (cid, dim)-keyed partial sums (bounded:
    n_centroids × dim keys, map-side combined), never vectors; the
    final join/aggregate touches n_centroids rows.
    """
    cents = _ivf_cents(old, n_centroids, id_col, vec_col)

    def _assigned(corpus: DataFrame) -> DataFrame:
        score = F.round(dot(F.col(vec_col), F.col("__cvec")), 6)
        return (
            corpus.crossJoin(F.broadcast(cents))
            .withColumn("__score", score)
            .groupBy(id_col)
            .agg(
                F.first(vec_col).alias(vec_col),
                F.max_by("cid", F.struct("__score", "cid")).alias("cid"),
            )
        )

    def _dim_sums(corpus: DataFrame) -> DataFrame:
        return (
            _assigned(corpus)
            .select("cid", F.posexplode(vec_col).alias("dim", "__x"))
            .groupBy("cid", "dim")
            .agg(
                F.sum(
                    F.round(F.col("__x").cast("double") * scale).cast("bigint")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    o = _dim_sums(old).select(
        "cid", "dim", F.col("s").alias("s_old"), F.col("n").alias("n_old")
    )
    nw = _dim_sums(new).select(
        "cid", "dim", F.col("s").alias("s_new"), F.col("n").alias("n_new")
    )
    j = o.join(nw, ["cid", "dim"], "full_outer")
    delta = (
        F.col("s_new").cast("double") / F.col("n_new")
        - F.col("s_old").cast("double") / F.col("n_old")
    )
    per_cid = j.groupBy("cid").agg(
        F.max(F.coalesce("n_old", F.lit(0))).alias("n_old"),
        F.max(F.coalesce("n_new", F.lit(0))).alias("n_new"),
        F.array_sort(
            F.collect_list(F.struct(F.col("dim"), (delta * delta).alias("d2")))
        ).alias("__deltas"),
    )
    drift = F.when(
        (F.col("n_old") > 0) & (F.col("n_new") > 0),
        F.round(
            F.sqrt(
                F.aggregate(
                    "__deltas", F.lit(0.0), lambda acc, e: acc + e["d2"]
                )
            )
            / scale,
            6,
        ),
    )
    return per_cid.select(
        "cid", "n_old", "n_new", drift.alias("centroid_drift")
    )


def recall_at_k(
    exact: DataFrame,
    approx: DataFrame,
    query_id_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the
    exact one — the standard ANN quality gate (the q168 calibration
    contract applied to retrieval): both inputs in the
    :func:`cosine_topk` output shape, recall = |approx ∩ exact| /
    |exact| per query. Run at sample scale against brute force, pick
    nprobe/bands/n_centroids, then trust the index corpus-wide where
    brute force is unaffordable — without this gate an ANN index's
    recall is a guess.

    One equi-join on (query, neighbor) + two query-keyed counts — all
    exchanges on the query key, bounded by k rows per query. Returns
    (query_id, n_expected, n_hit, recall), 6-decimal; a query present
    only in ``exact`` reports recall 0.
    """
    # distinct() pins SET semantics: duplicate (query, neighbor) rows in
    # either input would multiply through the equi-join and push recall
    # past 1.0; top-k producers shouldn't emit dups, but the gate must
    # not trust that.
    e = exact.select(F.col(query_id_col), F.col(neighbor_col)).distinct()
    a = approx.select(F.col(query_id_col), F.col(neighbor_col)).distinct()
    hits = e.join(a, [query_id_col, neighbor_col]).groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    totals = e.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_expected"))
    return (
        totals.join(hits, query_id_col, "left")
        .select(
            query_id_col,
            "n_expected",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_expected"),
                6,
            ).alias("recall"),
        )
    )


def cluster_cohesion(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster assignment-quality report over the deterministic
    coarse quantizer: member count, mean cosine to the OWN centroid
    (cohesion), and mean dot-score margin to the SECOND-best centroid
    (separation) — the index-health readout that says whether an IVF
    partitioning is worth probing at nprobe=1 (q166 checks list
    BALANCE; this checks list QUALITY: high cohesion + wide margin
    means the coarse quantizer respects the data's geometry, near-zero
    margin means queries will straddle lists).

    Scale shape (the :func:`ivf_assign` conventions exactly): corpus ×
    broadcast(centroids) scored JVM-side with the same rounded-dot
    tie-to-larger-cid rule, per-vector top-2 via one id-keyed
    sort_array over ≤ n_centroids structs, then one cid-keyed
    aggregation of integer-quantized cosines/margins (exact sums, one
    IEEE division each, 6 decimals). Nothing all-pairs; vectors shuffle
    once on the id key. Returns
    (cid, n_members, mean_cosine, mean_margin).
    """
    cents = _ivf_cents(corpus, n_centroids, id_col, vec_col)
    score = F.round(dot(F.col(vec_col), F.col("__cvec")), 6)
    cos = F.round(cosine(F.col(vec_col), F.col("__cvec")), 6)
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.struct(score.alias("s"), F.col("cid").alias("cid"), cos.alias("cos")).alias(
            "__sc"
        ),
    )
    top2 = scored.groupBy(id_col).agg(
        F.reverse(F.array_sort(F.collect_list("__sc"))).alias("__arr")
    )
    best = F.element_at("__arr", 1)
    second = F.element_at("__arr", 2)
    per_vec = top2.select(
        best["cid"].alias("cid"),
        F.round(best["cos"] * 1_000_000).cast("bigint").alias("__cosq"),
        F.round((best["s"] - second["s"]) * 1_000_000)
        .cast("bigint")
        .alias("__marq"),
    )
    return per_vec.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum("__cosq").cast("double") / F.count(F.lit(1)) / 1_000_000, 6
        ).alias("mean_cosine"),
        F.round(
            F.sum("__marq").cast("double") / F.count(F.lit(1)) / 1_000_000, 6
        ).alias("mean_margin"),
    )


def silhouette_report(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cluster simplified (centroid-based) silhouette over the
    deterministic coarse quantizer — the normalized cousin of
    :func:`cluster_cohesion`'s raw margin: with cosine distance
    a = 1 − cos(best centroid) and b = 1 − cos(second-best),
    s = (b − a)/max(a, b) ∈ [0, 1] here (b ≥ a by construction), so
    clusters are comparable across corpora and embedding scales where
    a dot-score margin is not. The standard medoid-silhouette
    shortcut: per-vector work is against ≤ n_centroids BROADCAST
    centroids, never other vectors — the O(n·k) report a 100 TB
    corpus can afford where true pairwise silhouette (O(n²)) cannot.

    Conventions mirror cluster_cohesion with ONE deliberate change:
    ranking is by rounded COSINE (tie-to-larger-cid), not raw dot —
    silhouette is a cosine-distance statistic, and cosine ranking is
    what guarantees b ≥ a (s ∈ [0, 1]) regardless of vector norms.
    Centroid frame from :func:`_ivf_cents`, one id-keyed top-2 over
    ≤ n_centroids structs, per-vector s quantized to micro-units
    before the per-cluster mean (exact sums, one IEEE division).
    Vectors whose both top distances are 0 (exactly on two duplicate
    centroid directions) emit NULL s and are excluded from the mean
    but counted. Returns
    (cid, n_members, n_scored, mean_silhouette), 6-decimal.
    """
    cents = _ivf_cents(corpus, n_centroids, id_col, vec_col)
    cos = F.round(cosine(F.col(vec_col), F.col("__cvec")), 6)
    scored = corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.struct(cos.alias("cos"), F.col("cid").alias("cid")).alias("__sc"),
    )
    top2 = scored.groupBy(id_col).agg(
        F.reverse(F.array_sort(F.collect_list("__sc"))).alias("__arr")
    )
    best = F.element_at("__arr", 1)
    second = F.element_at("__arr", 2)
    a = 1.0 - best["cos"]
    b = 1.0 - second["cos"]
    sil = F.when(F.greatest(a, b) > 0, F.round((b - a) / F.greatest(a, b), 6))
    per_vec = top2.select(
        best["cid"].alias("cid"),
        F.round(sil * 1_000_000).cast("bigint").alias("__sq"),
    )
    return per_vec.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.count("__sq").alias("n_scored"),
        F.when(
            F.count("__sq") > 0,
            F.round(F.sum("__sq").cast("double") / F.count("__sq") / 1_000_000, 6),
        ).alias("mean_silhouette"),
    )


def knn_graph_stats(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    edges: DataFrame | None = None,
) -> DataFrame:
    """Health report of the directed k-nearest-neighbor graph over an
    embedding corpus: reciprocity (what fraction of edges point both
    ways — low reciprocity means asymmetric neighborhoods, the classic
    hubness symptom), the maximum in-degree (hub strength), the count
    of never-cited vectors (isolated from everyone's top-k — ANN
    recall suffers exactly there), and the mean edge similarity — the
    diagnostics an embedding-quality gate reads BEFORE trusting
    :func:`lsh_topk`/:func:`ivf_topk` recall numbers, since hub-heavy
    graphs are precisely where bucketed ANN breaks.

    ``edges`` selects the edge source. ``None`` (the fixture-scale
    baseline) builds the exact :func:`cosine_topk` edge list — an
    O(n²·d) brute scoring pass that is only appropriate as a
    small-corpus oracle/recall reference. The 100 TB path passes a
    prebuilt ANN edge list (``lsh_topk(corpus, corpus, k)`` /
    :func:`ivf_topk` output — columns (query_id, neighbor_id, sim));
    candidate generation is then bucket equi-joins, never all-pairs,
    and the stats below are identical in shape either way (VERDICT r13
    item #2 — q338 grades the LSH-fed form, q297 keeps the brute
    baseline). Reciprocity is ONE self-equi-join of the edge list on
    swapped endpoints (edge volume = n·k, never n²); in-degrees are
    one count; the mean rides exact micro-integer sums of the ROUNDED
    sims. One row: (n_nodes, k, n_edges, n_reciprocal, reciprocity,
    max_in_degree, n_isolated, mean_sim), 6-decimal.
    """
    from ..plans.inspect import (
        intermediates_mark,
        release_intermediates_since,
        tracked_persist,
    )

    if edges is None:
        edges = cosine_topk(corpus, corpus, k, id_col=id_col, vec_col=vec_col)
    mark = intermediates_mark()
    # the edge list feeds FIVE actions (reciprocity semi-join probes it
    # twice more) — persist once so the O(n·n) brute scoring runs once,
    # not per action (review finding, r12)
    e = tracked_persist(
        edges.select(
            F.col("query_id").alias("__q"),
            F.col("neighbor_id").alias("__n"),
            F.round(F.col("sim") * 1_000_000).cast("bigint").alias("__sq"),
        )
    )
    # Action 1: one pass over the edge list for (n_edges, Σsim) — this
    # also materializes the persisted frame, so the combined action
    # below reads cached blocks (no racy double-compute across its
    # concurrent legs). Action 2: ONE job whose plan crossJoins the
    # remaining one-row aggregates (reciprocity semi-join count,
    # in-degree count/max, distinct node count) — r15 optimization:
    # the previous form ran these as FIVE separate driver actions,
    # i.e. five scheduler round-trips at fixture scale and five passes
    # over the edge frame at corpus scale; values are unchanged.
    agg = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("__sq").alias("__ssim"),
    ).first()
    rev = e.select(F.col("__q").alias("__n"), F.col("__n").alias("__q"))
    recip_f = (
        e.join(rev, ["__q", "__n"], "left_semi")
        .agg(F.count(F.lit(1)).alias("__recip"))
    )
    indeg_f = (
        e.groupBy("__n")
        .agg(F.count(F.lit(1)).alias("__d"))
        .agg(
            F.count(F.lit(1)).alias("__cited"),
            F.coalesce(F.max("__d"), F.lit(0)).alias("__max_in"),
        )
    )
    nodes_f = (
        corpus.select(id_col).distinct().agg(F.count(F.lit(1)).alias("__nn"))
    )
    combined = recip_f.crossJoin(indeg_f).crossJoin(nodes_f).first()
    recip = int(combined["__recip"])
    cited = int(combined["__cited"])
    max_in = combined["__max_in"]
    n_nodes = int(combined["__nn"])
    release_intermediates_since(mark)
    from .stats import _round6_half_away as rnd

    n_edges = int(agg["n_edges"])
    mean_sim = (
        None if n_edges == 0 else int(agg["__ssim"]) / n_edges / 1_000_000
    )
    return corpus.sparkSession.createDataFrame(
        [(
            n_nodes, k, n_edges, recip,
            rnd(recip / n_edges) if n_edges else None,
            int(max_in), n_nodes - cited, rnd(mean_sim),
        )],
        "n_nodes bigint, k int, n_edges bigint, n_reciprocal bigint, "
        "reciprocity double, max_in_degree bigint, n_isolated bigint, "
        "mean_sim double",
    )


def centroid_similarity(
    corpus: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between GROUP CENTROIDS — the
    corpus-geometry readout ("which sources/labels occupy the same
    region of embedding space?") that complements :func:`cluster_drift`
    (one group across time) and :func:`cluster_cohesion` (members vs
    their own centroid): near-1 off-diagonal pairs are candidates for
    merged curation or targeted decontamination.

    Scale shape: one posexplode → (group, dim) aggregation (hash
    exchange on the pair key, map-side combine — vector volume never
    shuffles twice), then every downstream frame is bounded at
    groups × dims; the pair join is a broadcast-size self-join on the
    dim key. Exactness: coordinates micro-quantize once
    (round(v·10⁶)), per-dim sums are exact DECIMAL, the centroid mean
    is exact-integer-operand division, and every cross/self product is
    re-quantized half-up BEFORE summation (round(mₐ·m_b/10⁶) — integer
    sums, order-independent), so cosine =
    dot/√(‖a‖²·‖b‖²) composes identical operands on both engines.
    Zero-norm centroids emit NULL cosine. Returns
    (group_a, group_b, n_a, n_b, cosine) for group_a < group_b; n_a/n_b
    count only rows with a non-NULL vector — the population the
    centroid actually averages (ADVICE r12).
    """
    ex = corpus.select(
        F.col(group_col).alias("__g"),
        F.posexplode(F.col(vec_col)).alias("__pos", "__v"),
    )
    q = ex.select(
        "__g",
        "__pos",
        F.round(F.col("__v").cast("double") * 1_000_000).cast("bigint").alias("__q"),
    )
    cent = q.groupBy("__g", "__pos").agg(
        F.sum(F.col("__q").cast("decimal(38,0)")).alias("__s"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    )
    m = cent.select(
        "__g",
        "__pos",
        (F.col("__s").cast("double") / F.col("__n")).alias("__m"),  # micro-units
    )
    norms = m.groupBy("__g").agg(
        F.sum(
            F.round(F.col("__m") * F.col("__m") / 1_000_000).cast("bigint")
        ).alias("__nrm"),
    )
    # n_a/n_b describe the population the centroid averages: rows with a
    # NULL vector contribute nothing to the centroid (posexplode emits no
    # rows), so they must not inflate the counts either (ADVICE r12)
    counts = (
        corpus.where(F.col(vec_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__cnt"))
    )
    a = m.select(
        F.col("__g").alias("__ga"), "__pos", F.col("__m").alias("__ma")
    )
    b = m.select(
        F.col("__g").alias("__gb"), "__pos", F.col("__m").alias("__mb")
    )
    dots = (
        a.join(b, "__pos")
        .where(F.col("__ga") < F.col("__gb"))
        .groupBy("__ga", "__gb")
        .agg(
            F.sum(
                F.round(F.col("__ma") * F.col("__mb") / 1_000_000).cast("bigint")
            ).alias("__dot")
        )
    )
    na = norms.select(
        F.col("__g").alias("__ga"), F.col("__nrm").alias("__nrma")
    )
    nb = norms.select(
        F.col("__g").alias("__gb"), F.col("__nrm").alias("__nrmb")
    )
    ca = counts.select(F.col("__g").alias("__ga"), F.col("__cnt").alias("n_a"))
    cb = counts.select(F.col("__g").alias("__gb"), F.col("__cnt").alias("n_b"))
    out = dots.join(na, "__ga").join(nb, "__gb").join(ca, "__ga").join(cb, "__gb")
    ok = (F.col("__nrma") > 0) & (F.col("__nrmb") > 0)
    return out.select(
        F.col("__ga").alias("group_a"),
        F.col("__gb").alias("group_b"),
        "n_a",
        "n_b",
        F.when(
            ok,
            F.round(
                F.col("__dot").cast("double")
                / F.sqrt(F.col("__nrma").cast("double") * F.col("__nrmb")),
                6,
            ),
        ).alias("cosine"),
    )


def embedding_exact_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precision: int = 4,
) -> DataFrame:
    """Exact-duplicate detection over an EMBEDDING column — the vector
    twin of content-hash text dedup (re-encoded copies of the same
    document produce bit-near-identical vectors; they waste index
    space and bias ANN training): each vector canonicalizes to the
    cross-engine md5 hash of its coordinates quantized at 10^−precision,
    and identical signatures form duplicate groups. One summary row:
    (n_vectors, n_signatures, n_dup_groups, n_redundant) — n_redundant
    is the count a keep-first pass would drop.

    Scale shape: one narrow map (transform + array_join + md5 — all
    JVM built-ins, no Python) then one signature-keyed count; vectors
    shuffle once as 60-bit hashes, never as arrays. Quantization uses
    half-away rounding on each coordinate (F.round — the oracle's
    round()), so the signature is engine-independent; NULL vectors are
    excluded (documented).
    """
    from ..functions.hashing import md5_int

    scale = 10 ** int(precision)
    canon = F.expr(
        f"array_join(transform({vec_col}, x -> "
        f"CAST(CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT) AS STRING)"
        "), ',')"
    )
    sigs = corpus.where(F.col(vec_col).isNotNull()).select(
        md5_int(canon).alias("__sig")
    )
    per = sigs.groupBy("__sig").agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    zero = F.lit(0).cast("bigint")
    # coalesce: an empty/all-NULL corpus reports zeros, not NULL sums
    # (review finding, r12)
    return per.agg(
        F.coalesce(F.sum("__n"), zero).cast("bigint").alias("n_vectors"),
        F.count(F.lit(1)).cast("bigint").alias("n_signatures"),
        F.coalesce(F.sum((F.col("__n") > 1).cast("int")), zero)
        .cast("bigint")
        .alias("n_dup_groups"),
        F.coalesce(F.sum(F.col("__n") - 1), zero).cast("bigint").alias(
            "n_redundant"
        ),
    )


def _truncation_tagged_edges(
    corpus: DataFrame,
    q_pairs: list,
    k: int,
    trunc_dim: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Both brute rankings of :func:`dim_truncation_report` from ONE
    corpus scan and ONE Arrow scoring pass (r16, guide §1.2/§4.2 — the
    two separate cosine_topk calls each scanned, collected, shipped and
    scored the same corpus; this was the heaviest new entry of r15's
    bench at 12.3 s cold).

    The fusion is free by construction: ``np.cumsum`` over the
    per-element products already holds EVERY prefix of the sequential
    fold, so the truncated dot/norm is the cumsum read at index
    ``trunc_dim-1`` — the identical left fold over the identical first
    ``trunc_dim`` element products that scoring ``slice(vec, 1,
    trunc_dim)`` re-computes from scratch. Same IEEE ops in the same
    order → bit-identical sims on both rankings; rounding and the
    rank-window tiebreaks stay in the JVM exactly as in
    :func:`cosine_topk`. Mixed-length corpora fall back to two
    independent grouped passes in the same batch (a full-d group and a
    min(d, trunc_dim) group — the slice can EQUALIZE lengths that the
    full ranking treats as mismatched, so the truncated grouping is its
    own). Emits one row per (ranking, query, rank-1..k): (__which 0 =
    full / 1 = truncated, __q, __n).
    """
    from ..plans.inspect import fan_out

    qid_t = corpus.schema[id_col].dataType.simpleString()
    q_bc = corpus.sparkSession.sparkContext.broadcast(q_pairs)

    def score(batches):
        import numpy as np
        import pandas as pd

        q_pairs = q_bc.value
        m = len(q_pairs)
        q_ids = np.array([qid for qid, _ in q_pairs])

        def build_groups(slice_to=None):
            # index groups by effective length (full, or min(len, t))
            by_len: dict[int, list[int]] = {}
            for qi, (_, qv) in enumerate(q_pairs):
                if qv is not None:
                    d = len(qv) if slice_to is None else min(len(qv), slice_to)
                    by_len.setdefault(d, []).append(qi)
            out = {}
            for d, idxs in by_len.items():
                # d = len(qv) (full) or min(len(qv), trunc_dim) (truncated):
                # [:d] is the whole vector resp. exactly slice(vec, 1, t)
                Qg = np.array(
                    [np.asarray(q_pairs[i][1][:d], dtype=np.float64) for i in idxs]
                ).reshape(len(idxs), d)
                QP = Qg * Qg
                np.cumsum(QP, axis=1, out=QP)
                # keep the whole cumsum: the fast path reads the query
                # norm at prefix t-1 from the same array
                out[d] = (np.array(idxs), Qg, np.sqrt(QP[:, -1]), QP)
            return out

        groups_full = build_groups(None)
        groups_tr = build_groups(trunc_dim)
        for pdf in batches:
            n = len(pdf)
            if n == 0 or m == 0:
                continue
            ids = pdf[id_col].to_numpy()
            id_ok = pdf[id_col].notna().to_numpy()
            vecs = pdf[vec_col].tolist()
            for lo in range(0, n, 64):
                hi = min(lo + 64, n)
                rows = hi - lo
                lens: dict[int, list[int]] = {}
                for ci in range(lo, hi):
                    v = vecs[ci]
                    if v is not None:
                        lens.setdefault(len(v), []).append(ci)

                def block_for(groups, d, cidx, slice_to=None):
                    # same contract as cosine_topk's block: f64 products,
                    # SEQUENTIAL cumulative sum (the exact JVM fold),
                    # dot/(corpus_norm · query_norm) operand order
                    qidx, Qg, qn, _ = groups[d]
                    C = np.array(
                        [np.asarray(vecs[i][:slice_to] if slice_to else vecs[i],
                                    dtype=np.float64)[:d] for i in cidx]
                    ).reshape(len(cidx), d)
                    CP = C * C
                    np.cumsum(CP, axis=1, out=CP)
                    P = C[:, None, :] * Qg[None, :, :]
                    np.cumsum(P, axis=2, out=P)
                    return qidx, P[:, :, -1] / (
                        np.sqrt(CP[:, -1])[:, None] * qn[None, :]
                    )

                only = next(iter(lens)) if len(lens) == 1 else None
                tr_of = lambda d: min(d, trunc_dim)  # noqa: E731
                if (
                    only is not None
                    and only in groups_full
                    and len(lens[only]) == rows
                    and len(groups_full[only][0]) == m
                ):
                    # fast path: one regular length group — ONE cumsum
                    # pass yields the full dot at [-1] and the truncated
                    # dot/norms at [t-1]
                    d = only
                    t = tr_of(d)
                    qidx, Qg, qn, QP = groups_full[d]
                    C = np.array(
                        [np.asarray(vecs[i], dtype=np.float64) for i in lens[d]]
                    ).reshape(rows, d)
                    CP = C * C
                    np.cumsum(CP, axis=1, out=CP)
                    P = C[:, None, :] * Qg[None, :, :]
                    np.cumsum(P, axis=2, out=P)
                    sims_f = P[:, :, -1] / (np.sqrt(CP[:, -1])[:, None] * qn[None, :])
                    sims_t = P[:, :, t - 1] / (
                        np.sqrt(CP[:, t - 1])[:, None] * np.sqrt(QP[:, t - 1])[None, :]
                    )
                else:
                    # rare path (mixed/NULL lengths): two independent
                    # grouped passes — full by d, truncated by min(d, t)
                    sims_f = np.full((rows, m), None, dtype=object)
                    sims_t = np.full((rows, m), None, dtype=object)
                    for d, cidx in lens.items():
                        ri = np.array([i - lo for i in cidx])
                        if d in groups_full:
                            qidx, block = block_for(groups_full, d, cidx)
                            sims_f[ri[:, None], qidx[None, :]] = block
                        td = tr_of(d)
                        if td in groups_tr:
                            qidx, block = block_for(
                                groups_tr, td, cidx, slice_to=trunc_dim
                            )
                            sims_t[ri[:, None], qidx[None, :]] = block
                qv = np.tile(q_ids, rows)
                cv = np.repeat(ids[lo:hi], m)
                keep = (qv != cv) & np.repeat(id_ok[lo:hi], m)
                yield pd.DataFrame(
                    {
                        "__qid": qv[keep],
                        "__nid": cv[keep],
                        "__sim_f": sims_f.ravel()[keep],
                        "__sim_t": sims_t.ravel()[keep],
                    }
                )

    scored = fan_out(corpus.select(F.col(id_col), F.col(vec_col))).mapInPandas(
        score, f"__qid {qid_t}, __nid {qid_t}, __sim_f double, __sim_t double"
    )
    tagged = scored.select(
        F.col("__qid").alias("__q"),
        F.col("__nid").alias("__n"),
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("w"), F.col("__sim_f").alias("s")),
                F.struct(F.lit(1).alias("w"), F.col("__sim_t").alias("s")),
            )
        ).alias("__ws"),
    ).select(
        "__q",
        "__n",
        F.col("__ws.w").alias("__which"),
        F.round(F.col("__ws.s"), 6).alias("sim"),
    )
    w = Window.partitionBy("__which", "__q").orderBy(
        F.col("sim").desc(), F.col("__n").asc()
    )
    return (
        tagged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("__which", "__q", "__n")
    )


def dim_truncation_report(
    corpus: DataFrame,
    k: int = 5,
    trunc_dim: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Retrieval quality under dimension truncation: recall@k of the
    FIRST-``trunc_dim``-coordinates neighbor ranking against the
    full-dimension ranking — the Matryoshka/MRL question ("can we
    serve search on half the vector and halve the index RAM?") an
    embedding-serving pipeline answers empirically before committing
    to a truncated index, and the drift screen for embeddings that
    were TRAINED matryoshka (their truncated recall should be near 1;
    a low number means the prefix dims don't carry the geometry).

    Both edge lists are the exact :func:`cosine_topk` brute baseline
    (broadcast/collected queries, per-query bounded rank, rounded-sim +
    id tiebreak on both engines); the truncated side scores on
    ``slice(vec, 1, trunc_dim)``. Since r16 both rankings come from ONE
    corpus scan and ONE Arrow scoring pass
    (:func:`_truncation_tagged_edges` — the truncated dot/norm is the
    prefix of the full ranking's own cumulative sum, so the second
    ranking is free; bit-identical values, same JVM rounding/tiebreaks),
    with a two-call :func:`cosine_topk` fallback below the Arrow cost
    threshold. Overlap is counted per (query, neighbor) pair straight
    off the tagged edge frame — never n². Per-query recall (overlap/k —
    an exact rational) micro-quantizes half-up before the exact mean;
    queries whose truncated list reproduces the full list exactly count
    toward frac_full_recall. One row: (n_queries, k, trunc_dim,
    mean_recall, frac_full_recall).
    """
    if trunc_dim < 1:
        raise ValueError(f"dim_truncation_report: trunc_dim must be ≥ 1, got {trunc_dim}")
    q_rows = corpus.select(F.col(id_col), F.col(vec_col)).collect()
    q_pairs = [(r[0], r[1]) for r in q_rows if r[0] is not None]
    if len(q_pairs) * _plan_size_bytes(corpus) < _COSINE_ARROW_MIN_QUERY_BYTES:
        # tiny corpus: two JVM brute rankings (cosine_topk cost-switches
        # to its broadcast-join path below the same threshold)
        tcorp = corpus.select(
            F.col(id_col), F.slice(F.col(vec_col), 1, trunc_dim).alias(vec_col)
        )
        edges = (
            cosine_topk(corpus, corpus, k, id_col=id_col, vec_col=vec_col)
            .select(
                F.lit(0).alias("__which"),
                F.col("query_id").alias("__q"),
                F.col("neighbor_id").alias("__n"),
            )
            .unionAll(
                cosine_topk(tcorp, tcorp, k, id_col=id_col, vec_col=vec_col).select(
                    F.lit(1).alias("__which"),
                    F.col("query_id").alias("__q"),
                    F.col("neighbor_id").alias("__n"),
                )
            )
        )
    else:
        edges = _truncation_tagged_edges(
            corpus, q_pairs, k, trunc_dim, id_col, vec_col
        )
    # overlap WITHOUT a second pass: each (q, n) pair carries whether it
    # made the full and/or the truncated top-k; hits per query = full
    # pairs that are also truncated pairs — arithmetic-identical to the
    # former full ⋉ trunc semi-join + left join-back (and the old NULL →
    # 0 coalesce: a query with zero hits sums to 0 here)
    pair_flags = edges.groupBy("__q", "__n").agg(
        F.max(F.when(F.col("__which") == 0, 1).otherwise(0)).alias("__in_full"),
        F.max(F.when(F.col("__which") == 1, 1).otherwise(0)).alias("__in_trunc"),
    )
    per_q = (
        pair_flags.where(F.col("__in_full") == 1)
        .groupBy("__q")
        .agg(F.sum("__in_trunc").cast("bigint").alias("__h"))
    )
    scored = per_q.select(
        F.round(F.col("__h").cast("double") / k * 1_000_000)
        .cast("bigint")
        .alias("__qr"),
        (F.col("__h") == k).cast("bigint").alias("__full"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum("__qr").alias("__sr"),
        F.sum("__full").alias("__nf"),
    )
    return agg.select(
        "n_queries",
        F.lit(int(k)).alias("k"),
        F.lit(int(trunc_dim)).alias("trunc_dim"),
        F.when(
            F.col("n_queries") > 0,
            F.round(
                F.col("__sr").cast("double") / F.col("n_queries") / 1_000_000, 6
            ),
        ).alias("mean_recall"),
        F.when(
            F.col("n_queries") > 0,
            F.round(F.col("__nf").cast("double") / F.col("n_queries"), 6),
        ).alias("frac_full_recall"),
    )


def pq_reconstruction_error(
    corpus: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Reconstruction-quality report for the :func:`pq_topk` product
    quantizer: encode every vector with the SAME deterministic codebook
    (first ``k_codes`` corpus vectors' subvectors) and measure the
    squared-L2 error the code words lose — the "is 64× compression
    safe here" number an index build publishes BEFORE queries trust
    :func:`pq_topk`'s distance estimates (:func:`recall_at_k` measures
    the end effect; this isolates the quantizer's own distortion and
    the relative error that drives it).

    Shape: corpus × broadcast(codebook) (m·k_codes rows), the per-
    (vector, subspace) argmin distance via partial-aggregating MIN —
    the pq_topk encode pass with the distance KEPT; per-vector errors
    and squared norms micro-quantize half-up before exact DECIMAL
    sums, so both means are single divisions over integers. One row:
    (n_vectors, m, k_codes, mean_sq_error, mean_vec_sq_norm,
    rel_error = mse/mean-norm), 6-decimal; an empty corpus raises (no
    codebook exists).
    """
    if dim is None:
        row = corpus.select(vec_col).head()
        if row is None or row[0] is None:
            raise ValueError(
                f"pq_reconstruction_error: cannot infer vector dim from an "
                f"empty corpus / null {vec_col!r}; pass dim= explicitly"
            )
        dim = len(row[0])
    d_sub = dim // m
    wc = Window.orderBy(id_col)
    cb = (
        corpus.orderBy(id_col)
        .limit(k_codes)
        .select(
            (F.row_number().over(wc) - 1).alias("code"),
            F.col(vec_col).alias("__cvec"),
        )
        .select(
            "code",
            "__cvec",
            F.explode(F.array(*[F.lit(j) for j in range(1, m + 1)])).alias("j"),
        )
    )
    enc = (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cb))
        .withColumn(
            "__d", _sq_subdist(F.col(vec_col), F.col("__cvec"), F.col("j"), d_sub)
        )
        .groupBy(id_col, "j")
        .agg(F.min("__d").alias("__mind"))
    )
    per_vec = enc.groupBy(id_col).agg(
        F.sum(F.round(F.col("__mind") * 1_000_000).cast("bigint")).alias("__eq")
    )
    norms = corpus.select(
        F.col(id_col),
        F.round(dot(F.col(vec_col), F.col(vec_col)) * 1_000_000)
        .cast("bigint")
        .alias("__nq"),
    )
    dec = "decimal(38,0)"
    agg = per_vec.join(norms, id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.col("__eq").cast(dec)).alias("__se"),
        F.sum(F.col("__nq").cast(dec)).alias("__sn"),
    )
    mse = F.col("__se").cast("double") / F.col("n_vectors") / 1_000_000
    mnorm = F.col("__sn").cast("double") / F.col("n_vectors") / 1_000_000
    return agg.select(
        "n_vectors",
        F.lit(int(m)).alias("m"),
        F.lit(int(k_codes)).alias("k_codes"),
        F.round(mse, 6).alias("mean_sq_error"),
        F.round(mnorm, 6).alias("mean_vec_sq_norm"),
        F.when(mnorm > 0, F.round(mse / mnorm, 6)).alias("rel_error"),
    )


def neighbor_label_purity(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    edges: DataFrame | None = None,
) -> DataFrame:
    """Label purity of the k-nearest-neighbor graph: per query label,
    the fraction of outgoing kNN edges that land on a SAME-label
    neighbor — the leave-one-out sanity check of an embedding space
    ("do my labels actually cluster?") that :func:`silhouette_report`
    answers with centroid geometry and this answers with the LOCAL
    neighborhoods retrieval will actually serve. Low purity for one
    label = that class is shattered in embedding space; low purity
    everywhere = the embeddings don't encode the labels at all.

    ``edges`` follows the :func:`knn_graph_stats` convention: ``None``
    builds the exact :func:`cosine_topk` baseline (fixture-scale —
    O(n²·d)); the 100 TB path passes an ANN edge list
    (``lsh_topk(corpus, corpus, k)`` — bucket equi-joins, never
    all-pairs). On top of the edge frame: two hash joins to the
    (id, label) projection and one label-keyed count — n·k edge rows,
    never n². NULL-labeled vectors are excluded from BOTH ends (a
    NULL is not a class, the markov/cohort convention). Returns one
    row per label: (label, n_queries, n_edges, n_same_label, purity),
    purity 6-decimal.
    """
    if edges is None:
        edges = cosine_topk(corpus, corpus, k, id_col=id_col, vec_col=vec_col)
    lab = corpus.where(F.col(label_col).isNotNull()).select(
        F.col(id_col), F.col(label_col)
    )
    j = (
        edges.select("query_id", "neighbor_id")
        .join(
            lab.select(
                F.col(id_col).alias("query_id"),
                F.col(label_col).alias("__ql"),
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(label_col).alias("__nl"),
            ),
            "neighbor_id",
        )
    )
    out = j.groupBy(F.col("__ql").alias("label")).agg(
        F.count_distinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(
            F.when(F.col("__ql") == F.col("__nl"), 1).otherwise(0)
        ).alias("n_same_label"),
    )
    # purity is an exact integer ratio: the floor(x·10⁶ + 0.5) recipe is
    # the cross-engine half-up round (the multimodal convention)
    ratio = F.col("n_same_label").cast("double") / F.col("n_edges")
    return out.select(
        "label",
        F.col("n_queries").cast("bigint").alias("n_queries"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_same_label").cast("bigint").alias("n_same_label"),
        (F.floor(ratio * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
            "purity"
        ),
    )


def embedding_dim_variance(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension variance census of an embedding column, reduced to
    the anisotropy summary an embedding-QA pass reads BEFORE building
    any index: total variance (trace), the hottest dimension and its
    share, and the participation ratio PR = (Σv)²/Σv² — the effective
    number of active dimensions (PR = d for isotropic noise, PR → 1
    when one axis carries everything). Collapsed/anisotropic embedding
    spaces break cosine-ANN recall long before q203's gate can say
    why; rogue dimensions also tell you :func:`dim_truncation_report`'s
    prefix assumption is unsafe.

    Scale shape: ONE posexplode streams (dim, value) pairs into a
    d-key aggregation (map-side combined — vector volume never
    shuffles, d·partitions rows do); the finalize is a second
    aggregation over the d per-dim rows. Exactness: values quantize to
    micro-units; per-dim Σx and Σx² accumulate DECIMAL(38,0); each
    per-dim variance finalizes in ONE fixed-order double expression
    and re-quantizes half-up to micro-units so trace, shares, and PR
    are sums/ratios of identical integers on both engines. Identical
    vectors → all variances 0 → NULL shares/PR (0/0 guarded); the
    hottest-dim tiebreak is the smaller dim index. One row:
    (n_vectors, n_dims, total_variance, max_dim_variance, max_var_dim,
    top_dim_share, participation_ratio).
    """
    dec = "decimal(38,0)"
    pool = df.where(F.col(vec_col).isNotNull())
    cells = pool.select(
        F.posexplode(F.col(vec_col)).alias("__dim", "__x")
    ).select(
        "__dim",
        F.round(F.col("__x").cast("double") * 1_000_000)
        .cast("bigint").alias("__xq"),
    )
    per_dim = cells.groupBy("__dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(F.col("__xq").cast(dec)).alias("__s"),
        F.sum(F.col("__xq").cast(dec) * F.col("__xq")).alias("__ss"),
    )
    n_d = F.col("__n").cast("double")
    # population variance in VALUE units²: (Σx²−(Σx)²/n)/n / 10¹²
    var_d = (
        (F.col("__ss").cast("double")
         - F.col("__s").cast("double") * F.col("__s").cast("double") / n_d)
        / n_d
        / 1e12
    )
    qvar = per_dim.select(
        "__dim",
        "__n",
        F.floor(var_d * 1_000_000 + F.lit(0.5)).cast("bigint").alias("__qv"),
    )
    # argmax with smaller-dim tiebreak: max over (qv, −dim) structs —
    # a struct max compares fields in order, no window-in-agg needed
    agg = qvar.agg(
        F.max("__n").alias("__nvec"),
        F.count(F.lit(1)).cast("bigint").alias("n_dims"),
        F.sum(F.col("__qv").cast(dec)).alias("__trace"),
        F.max(
            F.struct(F.col("__qv").alias("v"), (-F.col("__dim")).alias("nd"))
        ).alias("__top"),
        F.sum(F.col("__qv").cast(dec) * F.col("__qv")).alias("__ss2"),
    )
    tr = F.col("__trace").cast("double")
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    return agg.select(
        F.col("__nvec").cast("bigint").alias("n_vectors"),
        "n_dims",
        (tr / 1_000_000).alias("total_variance"),
        (F.col("__top.v").cast("double") / 1_000_000).alias(
            "max_dim_variance"
        ),
        (-F.col("__top.nd")).cast("int").alias("max_var_dim"),
        F.when(
            F.col("__trace") > 0, h6(F.col("__top.v").cast("double") / tr)
        ).alias("top_dim_share"),
        F.when(
            F.col("__ss2") > 0,
            h6(tr * tr / F.col("__ss2").cast("double")),
        ).alias("participation_ratio"),
    )


def hubness_report(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    edges: DataFrame | None = None,
) -> DataFrame:
    """In-degree (k-occurrence) distribution of the kNN graph — the
    hubness diagnosis that :func:`knn_graph_stats` only headlines
    (max in-degree, isolated count): high-dimensional embedding
    spaces concentrate distances, so a few "hub" vectors appear in
    everyone's top-k while "antihubs" appear in no one's
    (Radovanović et al., JMLR 2010) — and retrieval/dedup quality
    degrades exactly there. Reports the distribution's CV and
    skewness, hub mass under the classic N_k > mean + 2σ definition
    (share of ALL edges landing on hubs), and the antihub fraction.

    ``edges`` follows the :func:`knn_graph_stats` convention:
    ``None`` builds the exact :func:`cosine_topk` edge list (an
    O(n²·d) brute pass — small-corpus oracle/recall reference ONLY);
    the 100 TB path passes a prebuilt ANN edge list
    (``lsh_topk``/:func:`ivf_topk` output, columns
    (query_id, neighbor_id, sim)) so candidates come from bucket
    equi-joins, never all-pairs. Scale shape: edge volume collapses
    to ONE per-node in-degree frame (left join against the distinct
    id frame keeps zero-degree nodes); exact integer moments
    (Σd, Σd², Σd³) in DECIMAL feed a broadcast one-row threshold; a
    second bounded pass classifies nodes. The in-degree frame is
    tracked-persisted (two passes) — callers release via
    plans.inspect.release_intermediates(). One row:
    (n_nodes, k, n_edges, mean_in_degree, indeg_cv, indeg_skewness,
    n_hubs, hub_edge_share, n_antihubs, antihub_frac), 6-decimal;
    an empty corpus reports NULL ratios, a zero-variance in-degree
    distribution (every node cited exactly k times) reports NULL
    CV-normalized stats with zero hubs.
    """
    from ..plans.inspect import tracked_persist

    if edges is None:
        edges = cosine_topk(corpus, corpus, k, id_col=id_col, vec_col=vec_col)
    ids = corpus.select(F.col(id_col).alias("__id")).distinct()
    indeg = edges.groupBy(F.col("neighbor_id").alias("__id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__di")
    )
    d = tracked_persist(
        ids.join(indeg, "__id", "left").select(
            F.coalesce(F.col("__di"), F.lit(0)).cast("bigint").alias("__d")
        )
    )
    dec = "decimal(38,0)"
    dq = F.col("__d").cast(dec)
    mom = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(dq), F.lit(0).cast(dec)).alias("__s1"),
        F.coalesce(F.sum(dq * dq), F.lit(0).cast(dec)).alias("__s2"),
        F.coalesce(F.sum(dq * dq * dq), F.lit(0).cast(dec)).alias("__s3"),
    )
    # population central moments in ONE fixed operand order (exact
    # integer sums → identical doubles on any engine)
    n_d = F.col("__n").cast("double")
    mean = F.col("__s1").cast("double") / n_d
    m2 = F.col("__s2").cast("double") / n_d - mean * mean
    m3 = (
        F.col("__s3").cast("double") / n_d
        - F.lit(3.0) * mean * (F.col("__s2").cast("double") / n_d)
        + F.lit(2.0) * mean * mean * mean
    )
    thr = mom.select(
        "__n", "__s1", "__s2", "__s3",
        F.when(m2 > 0, mean + F.lit(2.0) * F.sqrt(m2)).alias("__thr"),
    )
    cls = d.crossJoin(F.broadcast(thr)).agg(
        F.sum(
            (F.col("__thr").isNotNull() & (F.col("__d") > F.col("__thr")))
            .cast("bigint")
        ).alias("__nh"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__thr").isNotNull()
                    & (F.col("__d") > F.col("__thr")),
                    F.col("__d"),
                ).otherwise(F.lit(0)).cast(dec)
            ),
            F.lit(0).cast(dec),
        ).alias("__he"),
        F.sum((F.col("__d") == 0).cast("bigint")).alias("__na"),
    )
    one = cls.crossJoin(F.broadcast(thr))
    ok = F.col("__n") > 0
    okv = ok & (m2 > 0)
    h6 = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)) / 1_000_000  # noqa: E731
    s6 = lambda x: (  # noqa: E731
        F.when(x >= 0, F.floor(x * 1_000_000 + F.lit(0.5))).otherwise(
            -F.floor(-x * 1_000_000 + F.lit(0.5))
        )
        / 1_000_000
    )
    return one.select(
        F.col("__n").alias("n_nodes"),
        F.lit(k).cast("int").alias("k"),
        F.col("__s1").cast("bigint").alias("n_edges"),
        F.when(ok, h6(mean)).alias("mean_in_degree"),
        F.when(okv & (F.col("__s1") > 0), h6(F.sqrt(m2) / mean)).alias(
            "indeg_cv"
        ),
        F.when(okv, s6(m3 / F.sqrt(m2 * m2 * m2))).alias("indeg_skewness"),
        F.coalesce(F.col("__nh"), F.lit(0)).cast("bigint").alias("n_hubs"),
        F.when(
            ok & (F.col("__s1") > 0),
            h6(F.col("__he").cast("double") / F.col("__s1").cast("double")),
        ).alias("hub_edge_share"),
        F.coalesce(F.col("__na"), F.lit(0)).cast("bigint").alias("n_antihubs"),
        F.when(ok, h6(F.col("__na").cast("double") / n_d)).alias(
            "antihub_frac"
        ),
    )
