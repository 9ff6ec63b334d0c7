"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-disciplined for 100 TB:

- exact        : hash-groupBy on content hash (one shuffle on a 60-bit key)
- ngram_jaccard: exact set-similarity over w-shingle sets via an
                 inverted index (explode → self-join on shingle → count)
- minhash_lsh  : MinHash over shingle sets (one md5 base hash + k
                 universal-hash permutations mod 2^31-1) + banded LSH —
                 candidate pairs come from equi-joins on band hashes,
                 never an all-pairs comparison
- simhash      : 64-bit sign-of-weighted-bits fingerprint; near-dups =
                 small hamming distance within band buckets
- embedding    : cosine-threshold near-dup over embedding vectors
                 (delegates to operators/similarity.py)

All hashes use the cross-engine md5 family (functions/hashing.py) so every
strategy is DuckDB-oracle-checkable. No Python UDFs anywhere — signatures
are higher-order array expressions, so the map side is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, seeded_hash
from ..plans.inspect import fan_out, release_local_checkpoint, tracked_persist
from .text import shingles, tokens

P31 = 2147483647  # 2^31-1, the family's reduction modulus


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    h_s(x) = (a_s·x + b_s) mod 2^31-1. Derived from a fixed splitmix64
    counter so Spark plans and generated oracle SQL embed identical
    literals. a_s ∈ [1, p), b_s ∈ [0, p)."""
    coeffs = []
    x = 0x9E3779B97F4A7C15
    for _ in range(num_hashes):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 16) % (P31 - 1) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (x >> 16) % P31
        coeffs.append((a, b))
    return coeffs


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content match.

    GroupBy on the 60-bit content hash, not the raw text — the shuffle
    moves 8-byte keys instead of document bodies, which at 100 TB is the
    difference between shuffling key-space and shuffling the corpus.
    """
    h = md5_int(F.col(content_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def dup_groups(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate clusters: (content hash, first id, count>1)."""
    return (
        df.groupBy(md5_int(F.col(content_col)).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("first_id"))
        .where(F.col("n_dups") > 1)
    )


def _distinct_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    df = fan_out(df)
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    k: int = 3,
    block_col: str | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over distinct k-shingle sets, via a
    shingle inverted index.

    explode(distinct shingles) → self-join on shingle (optionally within
    a ``block_col`` blocking key) → |A∩B| per pair, combined with per-doc
    set sizes for |A∪B|. Shingles (not unigrams) keep the index selective:
    a shared shingle implies shared *sequence*, so join fan-out tracks
    true near-dups instead of vocabulary overlap. Integer-count
    arithmetic → deterministic across engines.

    ``max_df`` is the 100 TB guard: a shingle appearing in d documents
    contributes d²/2 candidate rows to the inverted-index self-join
    *before* the threshold filter can prune anything — boilerplate
    (license headers, navigation chrome) makes that quadratic. With
    ``max_df`` set, shingles with document frequency > max_df are dropped
    from the index (one narrow groupBy over the index + a broadcast
    anti-join — the hot set is tiny by definition), bounding per-shingle
    fan-out at max_df²/2 and total candidates at O(|index|·max_df).
    Semantics become "Jaccard over shingles with df ≤ max_df": set sizes
    are computed over the capped sets too, so the score remains a true
    Jaccard of the indexed sets. Default None (off) so fixture-scale
    consumers keep exact uncapped semantics unless they opt in; capped
    consumers (q113/q157/q158) apply the identical cap in their DuckDB
    oracles.
    """
    cols = [id_col] + ([block_col] if block_col else [])
    df = fan_out(df)
    sh = F.array_distinct(shingles(F.col(text_col), k))
    # Materialized once: the inverted index feeds three consumers (sizes,
    # a-side, b-side) that would each re-run the shingle explode.
    # tracked_persist → callers release via plans.inspect.release_intermediates().
    toks = tracked_persist(df.select(*cols, F.explode(sh).alias("tok")))
    if max_df is not None:
        # Document frequency == row count per tok: the index already holds
        # one row per (doc, distinct shingle). The hot set (df > max_df)
        # is small by construction — broadcast anti-join, no extra shuffle
        # of the index itself. The CAPPED index is persisted too: without
        # it, each of the three consumers below would re-run the df
        # groupBy + anti-join over the raw index (measured ~2× on q113's
        # warm time at sf0.1); with it, the cap is paid once.
        hot = (
            toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("tok")
        )
        toks = tracked_persist(toks.join(F.broadcast(hot), "tok", "left_anti"))
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = toks.select(*[F.col(c).alias(f"a_{c}") for c in cols], F.col("tok"))
    b = toks.select(*[F.col(c).alias(f"b_{c}") for c in cols], F.col("tok"))
    join_cond = [a["tok"] == b["tok"], a[f"a_{id_col}"] < b[f"b_{id_col}"]]
    if block_col:
        join_cond.append(a[f"a_{block_col}"] == b[f"b_{block_col}"])
    inter = (
        a.join(b, join_cond)
        .groupBy(f"a_{id_col}", f"b_{id_col}")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias(f"a_{id_col}"), F.col("set_size").alias("a_size"))
    sb = sizes.select(F.col(id_col).alias(f"b_{id_col}"), F.col("set_size").alias("b_size"))
    pairs = (
        inter.join(sa, f"a_{id_col}").join(sb, f"b_{id_col}")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("a_size") + F.col("b_size") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(f"a_{id_col}", f"b_{id_col}", "n_common", "a_size", "b_size", "jaccard")
    )
    return pairs


def _base_hash(col: F.Column, hash_family: str) -> F.Column:
    """Per-shingle base hash in [0, 2^31-1).

    ``md5`` is the cross-engine family (DuckDB-replicable → every query
    stays oracle-checkable) and is the default; ``xxhash64`` is the
    PRODUCTION path — a JVM intrinsic (no hex string materialization, no
    conv()) measured ~2× faster on the signature stage. Same signature
    statistics, not bit-compatible with the oracle family.
    """
    if hash_family == "md5":
        return md5_int(col) % P31
    if hash_family == "xxhash64":
        return ((F.xxhash64(col) % P31) + P31) % P31
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """MinHash signature over distinct k-shingles.

    Shape: explode(distinct shingles) → one md5 base hash per (doc,
    shingle) row → groupBy(doc) with ``num_hashes`` universal-hash mins
    h_s(x) = (a_s·x + b_s) mod 2^31-1. The md5 is computed exactly once
    per shingle (array-transform formulations re-evaluate it per
    signature column — no common-subexpression elimination across
    independent expression trees), and the permutations are pure
    arithmetic, so widening the signature is nearly free. One shuffle on
    the doc id; partial aggregation makes the map side emit one partial
    signature per doc per partition. All intermediates < 2^62
    (ANSI-overflow safe).
    """
    toks = fan_out(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("tok"),
    ).withColumn("h", _base_hash(F.col("tok"), hash_family))
    coeffs = _minhash_coeffs(num_hashes)
    return toks.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % P31).alias(f"mh_{s}")
            for s, (a, b) in enumerate(coeffs)
        ]
    )


def _band_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    bands: int,
    k: int,
    hash_family: str,
) -> DataFrame:
    """(id, band, band-hash) bucket rows from the banded MinHash
    signature — the shared candidate-generation core of the self-join
    (:func:`minhash_lsh_pairs`) and cross-corpus
    (:func:`cross_corpus_neardup_pairs`) LSH paths."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, k, hash_family)
    return _bands_from_sig(sig, id_col, num_hashes, bands, hash_family)


def _bands_from_sig(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int, hash_family: str
) -> DataFrame:
    """Banding over an already-computed signature frame — split out so
    consumers that need BOTH the signature and its buckets (the q168
    calibration report) band a persisted signature instead of running
    the shingle→signature DAG twice."""
    rows_per_band = num_hashes // bands
    band_exprs = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        joined = F.concat_ws(",", *[p.cast("string") for p in parts])
        band_hash = md5_int(joined) if hash_family == "md5" else F.xxhash64(joined)
        band_exprs.append(F.struct(F.lit(b).alias("band"), band_hash.alias("bh")))
    return sig.select(F.col(id_col), F.explode(F.array(*band_exprs)).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def cross_corpus_neardup_pairs(
    corpus: DataFrame,
    probe: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora — fuzzy benchmark
    decontamination.

    q103's exact n-gram decontamination catches verbatim benchmark text;
    a paraphrased or lightly-edited eval item evades it. This is the
    near-dup complement: the same banded-MinHash machinery as
    :func:`minhash_lsh_pairs`, with candidates restricted to CROSS-corpus
    band collisions (corpus-side id × probe-side id), then
    exact-Jaccard-verified against ``threshold``.

    Scale shape: each side is shingled/signed once; candidates come from
    an equi-join of the two bucket tables on (band, band-hash) — never
    corpus × probe. With |probe| ≪ |corpus| (the normal decontamination
    shape: a few benchmarks vs a web-scale corpus) the probe bucket table
    is broadcast-sized, so the corpus side never shuffles for the
    candidate join. rows = (corpus_id, probe_id, jaccard ≥ threshold).
    """
    cb = tracked_persist(
        _band_buckets(corpus, id_col, text_col, num_hashes, bands, k, hash_family)
    )
    pb = tracked_persist(
        _band_buckets(probe, id_col, text_col, num_hashes, bands, k, hash_family)
    )
    a = cb.select(F.col(id_col).alias("corpus_id"), "band", "bh")
    b = pb.select(F.col(id_col).alias("probe_id"), "band", "bh")
    cand = a.join(b, ["band", "bh"]).select("corpus_id", "probe_id").distinct()
    shingle_sets = lambda d: fan_out(d).select(  # noqa: E731
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), k)).alias("tokset"),
    )
    at = shingle_sets(corpus).select(
        F.col(id_col).alias("corpus_id"), F.col("tokset").alias("a_toks")
    )
    bt = shingle_sets(probe).select(
        F.col(id_col).alias("probe_id"), F.col("tokset").alias("b_toks")
    )
    return (
        cand.join(at, "corpus_id")
        .join(bt, "probe_id")
        .withColumn("n_common", F.size(F.array_intersect("a_toks", "b_toks")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("a_toks") + F.size("b_toks") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("corpus_id", "probe_id", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH over shingle-MinHash
    signatures, then exact-Jaccard verification of candidates only.

    Scale shape: candidates come from a groupBy/join on (band_id,
    band_hash) — an equi-shuffle on small keys; a pair is compared only
    if it collides in ≥1 band, so cost tracks true near-dups, not N².
    rows = (a_id, b_id, jaccard ≥ threshold).
    """
    # Materialize the bucket table: the a/b self-join would otherwise
    # execute the whole shingle→signature DAG twice (Spark shares no
    # common subplans across self-join branches). This is the classic
    # MinHash design at any scale — signatures are tiny ((1+bands) ints
    # per doc) and always worth materializing before banding joins.
    buckets = tracked_persist(
        _band_buckets(df, id_col, text_col, num_hashes, bands, k, hash_family)
    )
    a = buckets.select(F.col(id_col).alias("a_id"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("b_id"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    # Exact verification of candidates only, on the same shingle sets.
    # Persisted for the same self-join reason as the bucket table; at
    # 100 TB the candidate set is sparse, so the two probe joins against
    # this table dominate any recompute saving — but recomputing the
    # shingle explode twice is strictly worse.
    toks = tracked_persist(
        fan_out(df).select(
            F.col(id_col),
            F.array_distinct(shingles(F.col(text_col), k)).alias("tokset"),
        )
    )
    at = toks.select(F.col(id_col).alias("a_id"), F.col("tokset").alias("a_toks"))
    bt = toks.select(F.col(id_col).alias("b_id"), F.col("tokset").alias("b_toks"))
    verified = (
        cand.join(at, "a_id")
        .join(bt, "b_id")
        .withColumn("n_common", F.size(F.array_intersect("a_toks", "b_toks")))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("a_toks") + F.size("b_toks") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
    return verified


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iters: int = 20,
    checkpoint_interval: int = 5,
) -> DataFrame:
    """Connected components over an arbitrary undirected pair graph, as
    iterative min-label propagation to fixpoint. Returns (id, cluster_id)
    where cluster_id is the minimum member id of the component.

    Pair-source-agnostic: feed it exact-Jaccard pairs
    (:func:`ngram_jaccard_pairs`), MinHash pairs
    (:func:`minhash_lsh_pairs`), or embedding near-dup pairs
    (similarity.embedding_neardup_pairs) — the clustering step of a dedup
    pipeline is the same graph problem regardless of how candidate pairs
    were found.

    The per-iteration plan is one equi-join + one groupBy on the EDGE set
    (sparse relative to the corpus) plus a broadcast-able label update;
    convergence takes component-diameter iterations, and near-dup
    components are clique-like (diameter 1–2). At 100 TB: checkpoint
    labels every few iterations to cut lineage, and switch to
    :func:`connected_components_star` (alternating large-star/small-star
    rounds, O(log n)) if adversarial long chains are possible.
    Deterministic: min is order-insensitive.

    ``max_iters`` is a lineage-depth guard, not a truncation point: if the
    labels have not reached fixpoint within ``max_iters`` rounds (a
    component with diameter > ``max_iters``), the function raises rather
    than silently returning wrong cluster labels.

    Every ``checkpoint_interval`` iterations the label frame is
    ``localCheckpoint``-ed: persist alone truncates *recomputation* but
    the logical plan still doubles per round (analyzer/optimizer time and
    lineage depth grow without bound on long chains); the checkpoint cuts
    the plan back to a leaf. localCheckpoint (executor-local blocks, no
    HDFS round-trip) is the right default for this always-rebuildable
    intermediate; pass a cluster checkpoint dir and use ``checkpoint()``
    where executor loss must be survivable mid-job.
    """
    edges = tracked_persist(
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
    )
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    cached = None  # the persisted label frame awaiting release
    prev_ckpt = None  # the checkpointed label frame awaiting release
    converged = False
    for it in range(max_iters):
        nbr = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # The convergence flag rides ALONG in the update projection
        # (changed ⇔ a neighbor label strictly improved ours) instead of
        # re-joining the old and new label frames per round: the probe
        # becomes a filter over the just-persisted frame — one fewer
        # full-label-frame join and exchange per iteration (a few percent
        # at fixture scale where the loop is scheduling-bound; at corpus
        # scale the removed join is label-volume work per round).
        new_labels = tracked_persist(
            labels.join(nbr, labels["node"] == nbr["src"], "left").select(
                F.col("node"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
                ).alias("__changed"),
            )
        )
        changed = new_labels.where(F.col("__changed")).limit(1).count()
        # The convergence probe materialized new_labels; the previous
        # round's label cache is dead — release it eagerly so storage
        # stays at one label frame regardless of iteration count. Track
        # the persisted frame explicitly: after a checkpoint, ``labels``
        # is the checkpointed DataFrame and unpersisting IT would be a
        # no-op, leaking one cache entry per checkpoint interval.
        if cached is not None:
            cached.unpersist()
        cached = new_labels
        labels = new_labels.drop("__changed")
        if changed == 0:
            converged = True
            break
        if checkpoint_interval and (it + 1) % checkpoint_interval == 0:
            labels = labels.localCheckpoint(eager=True)
            # The eager checkpoint materialized its own executor-local
            # blocks; the persisted pre-checkpoint frame is dead now, not
            # next round — and so is the PREVIOUS checkpoint (every
            # frame between the two is persisted or dead, so nothing can
            # recompute through it). Only the latest checkpoint's blocks
            # survive; the returned labels may be that frame, so it is
            # never released here.
            cached.unpersist()
            cached = None
            if prev_ckpt is not None:
                release_local_checkpoint(prev_ckpt)
            prev_ckpt = labels
    if not converged:
        raise RuntimeError(
            f"connected_components did not reach fixpoint in {max_iters} "
            "iterations (a component's diameter exceeds max_iters); raise "
            "max_iters or use connected_components_star for long-chain graphs"
        )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))


def connected_components_star(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_rounds: int = 100,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14). Same contract as :func:`connected_components` — returns
    (id, cluster_id) with cluster_id = the component's minimum member id —
    but round count scales with **log(component size)**, not component
    DIAMETER: this is the escape hatch for adversarial long-chain graphs
    where min-label propagation would need diameter iterations (a 300k-node
    path converges here in ~10 rounds vs 300k).

    Each round is two edge-set rewrites, each one groupBy + one equi-join
    on the (sparse) edge set:

    - large-star: per node u over the undirected adjacency, connect every
      strictly-larger neighbor to m = min(N(u) ∪ {u});
    - small-star: per node u over edges oriented large→small, connect u
      and all its (smaller) neighbors to m = min(N(u)).

    Both preserve connectivity and strictly shrink a monovariant until the
    edge set is a star forest whose centers are component minima; fixpoint
    is detected by an O(1)-row signature (count + bit_xor of xxhash64 over
    canonical edges) going stable across a full round — no driver-side
    edge materialization. Labels then read directly off the final stars.

    Each round's output is an EAGER ``localCheckpoint`` — a deliberate
    plan-size control, not just a lineage cut: one round references its
    input ~12× (two unions, two self-aggregation joins), so building on
    live plans grows the logical tree ~12× per round and the driver dies
    assembling plan/explain strings long before the data is a problem
    (measured: a 5-round toy graph OOMs an 8 GB driver). Persist-based
    cache substitution also bounds this, but only while every prior
    round's cache entry is retained; the checkpoint leaf makes round
    plans O(1) by construction and lets each round's scratch (the
    persisted large-star frame, the previous round's blocks) be released
    as soon as the next checkpoint materializes. At 100 TB: every step is
    an equi-join/groupBy on edges (shuffles the edge set, never the
    corpus), and the per-round checkpoint is the standard iterative-graph
    discipline (executor-local blocks; use ``checkpoint()`` with a
    cluster dir where executor loss must be survivable mid-job).
    Deterministic: min/bit_xor are order-insensitive.

    ``max_rounds`` is a safety guard like ``max_iters`` in the label
    version: rounds needed in practice track ~log₂(n) (a 300k-node path
    converges in ~10; the Kiveris worst-case bound is O(log² n)), so 100
    rounds covers any plausible input, and the function raises rather
    than returning unconverged labels.
    """
    # Canonical large→small orientation (u > v), self-loops dropped.
    e_raw = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y")).where(
        F.col(a_col) != F.col(b_col)
    )
    edges = (
        e_raw.select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _signature(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("sig"),
        ).first()
        return (row["n"], row["sig"])

    sig = _signature(edges)
    converged = False
    for rnd in range(max_rounds):
        # Large-star over undirected adjacency: m = min(N(u) ∪ {u}) is
        # least(min-neighbor, u); emit (neighbor, m) for neighbors > u.
        und = edges.select("u", "v").union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = und.groupBy("u").agg(F.min("v").alias("mn"))
        large = tracked_persist(
            und.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("mn"), F.col("u")).alias("v"),
            )
            .distinct()
        )
        # Small-star over the (already large→small) star edges:
        # m = min(N(u)); reconnect every neighbor and u itself to m.
        mins2 = large.groupBy("u").agg(F.min("v").alias("mn"))
        new_edges = (
            large.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .union(mins2.select(F.col("u"), F.col("mn").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _signature(new_edges)
        # The eager checkpoint materialized new_edges as its own blocks,
        # so this round's scratch is dead — release the persisted
        # large-star frame AND the previous round's checkpoint blocks
        # explicitly (not left to GC + ContextCleaner, which lets a
        # tight invocation loop accumulate dead rounds): storage stays
        # bounded at ~one round's edge sets however many rounds a
        # 100 TB graph takes.
        large.unpersist()
        release_local_checkpoint(edges)
        edges = new_edges
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not stabilize in {max_rounds} "
            "rounds — far beyond the ~log2(n) rounds any plausible graph "
            "needs; inspect the edge set for non-determinism"
        )
    # Fixpoint edge set is a star forest: (member, component-min) rows.
    return (
        nodes.select(F.col(id_col).alias("node"))
        .join(edges, F.col("node") == F.col("u"), "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("v"), F.col("node")).alias("cluster_id"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
    max_iters: int = 20,
    method: str = "label",
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    exact-Jaccard near-dup pair graph — the canonical-representative step
    used to pick one survivor per duplicate group in training-data dedup.

    ``method``: ``"label"`` (min-label propagation — converges in diameter
    rounds, ideal for the shallow near-clique graphs real near-dups form)
    or ``"star"`` (:func:`connected_components_star` — O(log n) rounds,
    the safe choice when component shape is unknown/adversarial).
    """
    a, b = f"a_{id_col}", f"b_{id_col}"
    pairs = ngram_jaccard_pairs(df, id_col, text_col, threshold, k).select(a, b)
    if method == "star":
        return connected_components_star(df, pairs, id_col=id_col, a_col=a, b_col=b)
    return connected_components(df, pairs, id_col=id_col, a_col=a, b_col=b, max_iters=max_iters)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: bit b of the output is 1 iff more (distinct)
    tokens hash with bit b set than unset.

    Bit-parallel form: one token row carries ONE 64-bit hash; the per-bit
    majority votes are ``bits`` separate SUM aggregate columns in a single
    ``groupBy(id)`` — full map-side partial aggregation, ONE shuffle of
    O(docs × bits) partial rows, and no ×bits row explosion of the token
    stream (the explode(bit) form multiplies the shuffled row count by the
    bit width before any combining). 32 bits keeps every intermediate well
    inside BIGINT under ANSI mode.
    """
    tok = _distinct_tokens(df, id_col, text_col).withColumn(
        "h", seeded_hash(F.col("tok"), 0)
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{b}")
        for b in range(bits)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    fingerprint = None
    for b in range(bits):
        term = F.when(
            F.col(f"v_{b}") > 0, F.lit(1 << b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select(F.col(id_col), fingerprint.alias("simhash"))


def delta_dedup_status(
    incoming: DataFrame,
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingestion dedup classification: label every incoming
    document ``dup_of_corpus`` (exact content already indexed),
    ``dup_in_batch`` (repeated within the incoming batch itself — only
    the lowest-id copy stays ``new``), or ``new``. This is the admission
    filter of a continuously-growing corpus: only ``new`` rows proceed to
    indexing, and the three counts are the ingestion-health metrics.

    Scale shape: both sides reduce to 60-bit content hashes before
    anything moves — the corpus side collapses to its distinct hash set
    (8-byte keys, one shuffle), joined LEFT against the incoming batch on
    the hash; within-batch duplicates use a hash-partitioned row_number
    (parallel by hash, no global sort). Nothing ever shuffles document
    bodies, and the corpus is never re-read per batch in production (its
    hash set is the persisted dedup index this operator's join models).
    """
    h = md5_int(F.col(content_col))
    inc = incoming.withColumn("__h", h)
    corpus_hashes = (
        corpus.select(h.alias("__h")).distinct().withColumn("__in_corpus", F.lit(1))
    )
    w = Window.partitionBy("__h").orderBy(F.col(id_col).asc())
    return (
        inc.join(corpus_hashes, "__h", "left")
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "dedup_status",
            F.when(F.col("__in_corpus") == 1, F.lit("dup_of_corpus"))
            .when(F.col("__rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new")),
        )
        .drop("__h", "__in_corpus", "__rn")
    )


def minhash_calibration_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """One-row QA report on the MinHash estimator over the LSH candidate
    set: how far the signature-agreement estimate (matching components /
    num_hashes) sits from exact Jaccard, and what fraction of candidates
    the exact verification keeps at ``threshold`` — the calibration
    check that decides whether num_hashes/bands are adequate BEFORE a
    corpus-wide dedup run trusts the estimator.

    Output: (n_candidates, n_verified, precision, mean_abs_err,
    max_abs_err). Per-pair |est − exact| is scaled to integer millionths
    before aggregating, so the means are sums of exact integers divided
    once in double — bit-identical across engines and partition orders.

    Scale shape: identical to :func:`minhash_lsh_pairs` — candidates
    from band equi-joins, signatures banded from ONE persisted signature
    frame (not recomputed), exact verification on candidates only — plus
    a scalar final whose single-partition exchange carries one
    pre-aggregated row per partition.
    """
    sig = tracked_persist(
        minhash_signature(df, id_col, text_col, num_hashes, k, hash_family)
    )
    buckets = _bands_from_sig(sig, id_col, num_hashes, bands, hash_family)
    a = buckets.select(F.col(id_col).alias("a_id"), "band", "bh")
    b = buckets.select(F.col(id_col).alias("b_id"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    sig_a = sig.select(
        F.col(id_col).alias("a_id"), *[F.col(f"mh_{s}").alias(f"a_mh_{s}") for s in range(num_hashes)]
    )
    sig_b = sig.select(
        F.col(id_col).alias("b_id"), *[F.col(f"mh_{s}").alias(f"b_mh_{s}") for s in range(num_hashes)]
    )
    matches = sum(
        (F.col(f"a_mh_{s}") == F.col(f"b_mh_{s}")).cast("int") for s in range(num_hashes)
    )
    toks = tracked_persist(
        fan_out(df).select(
            F.col(id_col),
            F.array_distinct(shingles(F.col(text_col), k)).alias("tokset"),
        )
    )
    at = toks.select(F.col(id_col).alias("a_id"), F.col("tokset").alias("a_toks"))
    bt = toks.select(F.col(id_col).alias("b_id"), F.col("tokset").alias("b_toks"))
    n_common = F.size(F.array_intersect("a_toks", "b_toks"))
    exact = n_common.cast("double") / (
        F.size("a_toks") + F.size("b_toks") - n_common
    )
    est = matches.cast("double") / F.lit(float(num_hashes))
    err_u = F.round(F.abs(est - exact) * 1000000).cast("bigint")
    scored = (
        cand.join(sig_a, "a_id")
        .join(sig_b, "b_id")
        .join(at, "a_id")
        .join(bt, "b_id")
        .select(
            err_u.alias("err_u"),
            (exact >= threshold).cast("bigint").alias("is_verified"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("is_verified").alias("n_verified"),
        F.round(
            F.sum("is_verified").cast("double") / F.count(F.lit(1)), 6
        ).alias("precision"),
        F.round(
            F.sum("err_u").cast("double") / (F.count(F.lit(1)) * 1000000.0), 6
        ).alias("mean_abs_err"),
        F.round(F.max("err_u").cast("double") / 1000000.0, 6).alias("max_abs_err"),
    )


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 2,
    prefix_len: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy duplicates: pairs within Levenshtein
    distance ``max_dist`` over a normalized string column — the
    typo/variant matcher (product names, author strings, addresses)
    that set-similarity dedup misses because one edit changes every
    shingle containing it.

    Candidates come from BLOCKING, never all-pairs: an equi-join on the
    normalized ``prefix_len``-prefix, pre-filtered by the edit-distance
    length bound (|len(a)−len(b)| ≤ max_dist — exact, no recall loss)
    before Levenshtein evaluates. Prefix blocking is the standard ER
    recall trade, with two documented miss classes: (a) pairs differing
    inside the first ``prefix_len`` characters, and (b) a string
    SHORTER than ``prefix_len`` blocks on its full text, so it pairs
    only with strings sharing that exact short prefix-block — 'abc' vs
    'abcd' (distance 1) is missed because their keys are 'abc' vs
    'abcd'. Production raises recall with a second pass on another key
    family (suffix, phonetic, smaller ``prefix_len``) — same operator,
    different parameters. Spark's ``levenshtein`` accepts a threshold
    so the quadratic DP row short-circuits at max_dist+1.

    ``max_block`` is the 100 TB guard (same failure class and same fix
    as ``ngram_jaccard_pairs``' max_df): a block of d strings
    contributes d²/2 Levenshtein evaluations, and on URL- or
    template-shaped corpora (every entity starting 'http', 'the ', a
    shared brand prefix) one block is O(n) — the join goes quadratic
    and AQE can split the hot partition but not reduce the pair count.
    With ``max_block`` set, blocks holding more than that many strings
    are dropped ENTIRELY (one narrow groupBy on the block key + a
    broadcast anti-join) before the self-join, bounding per-block
    fan-out at max_block²/2. Documented recall trade: members of a
    dropped block can still be matched by a different key family, and
    a saturated prefix usually means the block key carries no signal
    anyway.

    Scale shape: one equi-shuffle on the prefix key; block sizes bound
    the comparison volume (``max_block`` bounds it adversarially); the
    length filter prunes before the edit-distance kernel runs.
    Deterministic: exact integer distances, id-ordered pairs.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    keyed = df.select(
        F.col(id_col),
        norm.alias("__s"),
        F.substring(norm, 1, prefix_len).alias("__blk"),
        F.length(norm).alias("__len"),
    )
    if max_block is not None:
        hot = (
            keyed.groupBy("__blk")
            .agg(F.count(F.lit(1)).alias("__bc"))
            .where(F.col("__bc") > int(max_block))
            .select("__blk")
        )
        keyed = keyed.join(F.broadcast(hot), "__blk", "left_anti")
    a = keyed.select(
        F.col(id_col).alias("a_id"), F.col("__s").alias("__sa"),
        F.col("__blk"), F.col("__len").alias("__la"),
    )
    b = keyed.select(
        F.col(id_col).alias("b_id"), F.col("__s").alias("__sb"),
        F.col("__blk"), F.col("__len").alias("__lb"),
    )
    return (
        a.join(b, "__blk")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        )
        .withColumn("dist", F.levenshtein("__sa", "__sb", max_dist))
        .where((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select("a_id", "b_id", "dist")
    )


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph — the
    hub-document score of a dup graph (a template that spawned hundreds
    of near-copies out-ranks its copies, which connected components
    can't see: CC says only WHICH cluster, centrality says which member
    is the source) and the engine's second iterative-algorithm class
    after min-label/star components (power iteration instead of label
    propagation).

    Deterministic and ORACLE-REPLICABLE by construction: the iteration
    count is FIXED (no convergence probe — a fixpoint test on floats is
    engine-dependent; a fixed power-iteration count is the same chained
    computation everywhere), every iteration's ranks are quantized to
    12 decimals on the way out (absorbing float-sum association noise
    far below signal), dangling/isolated mass is redistributed
    uniformly, and the final ranks round to 6. An oracle replays the
    same ``iters`` steps as chained SQL CTEs.

    Scale shape per iteration: one equi-join of the edge list against
    the rank vector plus one dst-keyed partial-aggregating sum — the
    exchanges carry (node, rank) pairs and edge endpoints, never
    payloads; the dangling scalar is a broadcast single row; the rank
    frame is checkpoint-truncated per round and the previous round's
    blocks GC'd, so storage holds ONE rank vector regardless of
    ``iters``.

    Lineage discipline (the connected_components lesson, applied
    unconditionally here): ``persist`` truncates RECOMPUTATION but not
    the analyzed plan, and this loop references the edge list twice and
    the rank vector three times per round — with a heavy edge GENERATOR
    (the dup-graph case: a full near-dup pair pipeline) the plan tree
    grows geometrically in ``iters`` and a 5-iteration run OOMs the
    driver in plan stringification alone (measured under a default-heap
    session, r9 hostile sweep). So the loop INPUTS (edges, deg) and
    each round's rank vector are ``localCheckpoint``-ed: every
    iteration plans against leaves, and the plan is constant-size in
    ``iters``.
    """
    n = nodes.count()
    if n == 0:
        return nodes.select(
            F.col(id_col).alias("node"), F.lit(0.0).alias("rank")
        )
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # base is a loop input too: without its own leaf, a heavy nodes
    # pipeline would be re-planned AND re-executed inside every round's
    # eager rank checkpoint
    base = nodes.select(F.col(id_col).alias("node")).localCheckpoint(eager=True)
    ranks = base.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iters):
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges["src"] == ranks["node"])
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        # eager checkpoint = materialize + truncate to a leaf; once the
        # NEW round's blocks exist, the previous round's are dead and
        # released explicitly (not left to Python GC + ContextCleaner —
        # a tight invocation loop like the bench rerun block would
        # otherwise accumulate one dead rank frame per round per run)
        prev = ranks
        ranks = (
            base.join(contrib, base["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dang") / n),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(prev)
    # the loop inputs are dead too once the final rank checkpoint is
    # materialized (the returned frame's lineage is just that leaf)
    for dead in (edges, deg, base):
        release_local_checkpoint(dead)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: ``|A∩B| / |A|`` (and the
    mirror ``/ |B|``) over distinct k-shingle sets, keeping pairs where
    EITHER direction reaches ``threshold``. Containment is the
    subset-quoting detector symmetric Jaccard structurally misses: a
    short doc fully embedded in a long one has Jaccard ≈ |A|/|B| (small)
    but containment(A→B) = 1.0 — reused passages, quoted articles,
    aggregator pages. The standard companion to Jaccard in the dedup
    literature (Broder's resemblance vs containment).

    Reuses :func:`ngram_jaccard_pairs`'s capped inverted-index machinery
    (one implementation: same index, same ``max_df`` hot-shingle guard
    and its oracle-mirrored semantics, same candidate bound
    O(|index|·max_df)); the containment filter replaces the Jaccard
    filter in the SAME stage, so Catalyst collapses it into the
    candidate aggregation — no extra pass. Output keeps both directions
    plus Jaccard for triage.
    """
    base = ngram_jaccard_pairs(
        df, id_col=id_col, text_col=text_col, threshold=0.0, k=k, max_df=max_df
    )
    cont_a = F.col("n_common").cast("double") / F.col("a_size")
    cont_b = F.col("n_common").cast("double") / F.col("b_size")
    return (
        base.withColumn("containment_a", F.round(cont_a, 6))
        .withColumn("containment_b", F.round(cont_b, 6))
        .where(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
        .select(
            f"a_{id_col}", f"b_{id_col}", "n_common", "a_size", "b_size",
            "containment_a", "containment_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def cluster_size_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """Duplicate-cluster SIZE distribution — the one-page answer to "how
    duplicated is this corpus": for each cluster size s, how many
    connected components of the near-dup graph have exactly s members
    and how many documents they hold (s = 1 rows are the unduplicated
    mass; the s ≥ 2 tail × (s−1)/s is exactly what dedup would delete).
    The summary a curation run reads BEFORE committing to
    :func:`dedup_clusters`' full materialization — template storms show
    up as one giant s, light paraphrase dup as a long s = 2 tail.

    Rides :func:`dedup_clusters` (min-label CC over the exact-Jaccard
    pair graph — q92's graded machinery) and collapses the label frame
    twice: cluster → size (doc-count rows), then size → (n_clusters,
    n_docs) — both exchanges are cluster/size-keyed and the output is
    at most |distinct sizes| rows. Returns
    (cluster_size, n_clusters, n_docs), n_docs = size · n_clusters by
    construction (asserted in the parity test).
    """
    labels = dedup_clusters(df, id_col=id_col, text_col=text_col,
                            threshold=threshold, k=k)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).alias("n_docs"),
    ).select(
        "cluster_size", "n_clusters", F.col("n_docs").cast("bigint").alias("n_docs")
    )


def lsh_bucket_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Per-band health report of the MinHash LSH index: bucket count,
    occupancy, the largest bucket, the singleton fraction, and the
    exact candidate-pair mass Σ c·(c−1)/2 each band would emit — the
    "is my banding parameterization sane" audit read BEFORE running
    :func:`minhash_lsh_pairs` at scale (one mega-bucket in one band
    IS the quadratic blowup; a ~100% singleton rate means the bands
    are too selective to recall anything). The index-side companion
    to q168's estimator-accuracy calibration.

    Reuses the exact candidate-generation core (:func:`_band_buckets`
    — same signatures, same banding the pair join consumes), then
    aggregates ONLY bucket counts: pairs are COUNTED via c·(c−1)/2 in
    DECIMAL(38,0), never materialized, so the report costs one
    (band, hash) groupBy however skewed the buckets are. Returns one
    row per band: (band, n_docs, n_buckets, max_bucket_size,
    singleton_frac, mean_bucket_size, candidate_pairs), 6-decimal.
    """
    buckets = _band_buckets(df, id_col, text_col, num_hashes, bands, k, hash_family)
    sizes = buckets.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("__c"))
    cd = F.col("__c").cast("decimal(38,0)")
    agg = sizes.groupBy("band").agg(
        F.sum("__c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("__c").alias("max_bucket_size"),
        F.sum((F.col("__c") == 1).cast("bigint")).alias("__singletons"),
        # Σ c·(c−1) stays integral in DECIMAL(38,0); halve once after
        F.sum(cd * (cd - 1)).alias("__pairs2"),
    )
    return agg.select(
        "band",
        "n_docs",
        "n_buckets",
        "max_bucket_size",
        F.round(
            F.col("__singletons").cast("double") / F.col("n_buckets"), 6
        ).alias("singleton_frac"),
        F.round(
            F.col("n_docs").cast("double") / F.col("n_buckets"), 6
        ).alias("mean_bucket_size"),
        (F.col("__pairs2") / 2).cast("bigint").alias("candidate_pairs"),
    )


def soft_dedup_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates
    (:func:`dedup_clusters` → keep-first), assign every document the
    training weight 1/cluster_size — the repetition-discount used when
    duplicates carry signal (popular ≠ redundant) but must not dominate
    the loss. Reports the per-source effect: raw count, effective
    (weighted) count, and the dedup discount 1 − effective/raw — the
    number a data-mixing stage feeds back into its sampling rates.

    Rides the SAME cluster assignment as the hard-dedup path (one
    implementation: :func:`dedup_clusters` — banded candidates, never
    N²), so hard and soft views can never disagree about what a
    duplicate is. Exactness: weights are micro-quantized rationals
    (round_half_up(10⁶/k) as integers), so per-source sums are exact
    and the finalize is one division. Returns
    (source, n_docs, effective_docs, dedup_discount).
    """
    clusters = dedup_clusters(df, id_col=id_col, text_col=text_col,
                              threshold=threshold, k=k)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("__k")
    )
    weighted = (
        clusters.join(sizes, "cluster_id")
        .select(
            id_col,
            F.floor(F.lit(1_000_000.0) / F.col("__k") + F.lit(0.5))
            .cast("bigint")
            .alias("__wq"),
        )
        .join(df.select(id_col, source_col), id_col)
    )
    g = weighted.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # DECIMAL(38,0) accumulation — the cohort_ltv micro-unit-mass
        # convention: a bigint sum of 10⁶-scaled weights would wrap
        # silently past ~9.2e12 docs per source (ADVICE r12)
        F.sum(F.col("__wq").cast("decimal(38,0)")).alias("__eff"),
    )
    eff = F.col("__eff").cast("double")
    return g.select(
        source_col,
        "n_docs",
        F.round(eff / 1_000_000, 6).alias("effective_docs"),
        F.round(F.lit(1.0) - eff / 1_000_000 / F.col("n_docs"), 6).alias(
            "dedup_discount"
        ),
    )


def cross_source_dup_matrix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    threshold: float = 0.8,
    k: int = 3,
) -> DataFrame:
    """Source×source near-duplicate matrix: every exact-Jaccard
    near-dup pair (:func:`ngram_jaccard_pairs` VERBATIM — same
    shingles, same threshold, one pairing implementation) mapped to
    its unordered source pair and counted — the provenance readout on
    top of the dedup machinery: WITHIN-source counts find sources that
    syndicate themselves (boilerplate mills), CROSS-source counts find
    scrape-of-a-scrape pairs where dedup order decides which source's
    docs survive (and therefore whose distribution the training set
    inherits — the q118 source-cap decision input). Promotes
    q158_source_overlap_matrix's inline query to the operator surface
    (documented overlap): this adds the distinct-doc involvement count
    and the within_source flag, and defaults to the uncapped pair
    semantics where q158 grades the max_df=5 operating point.

    Shape on top of the pair frame: two hash joins to the (id, source)
    projection, one count per unordered source pair (source_a ≤
    source_b lexicographically, documented), plus the distinct-doc
    involvement count (a posexplode of the two endpoint ids — 2 rows
    per pair, never document volume). Returns
    (source_a, source_b, n_pairs, n_docs_involved, within_source).
    """
    pairs = ngram_jaccard_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold, k=k
    )
    src = df.select(F.col(id_col), F.col(source_col))
    j = (
        pairs.select(f"a_{id_col}", f"b_{id_col}")
        .join(
            src.select(
                F.col(id_col).alias(f"a_{id_col}"),
                F.col(source_col).alias("__sa"),
            ),
            f"a_{id_col}",
        )
        .join(
            src.select(
                F.col(id_col).alias(f"b_{id_col}"),
                F.col(source_col).alias("__sb"),
            ),
            f"b_{id_col}",
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            F.col(f"a_{id_col}").alias("__ia"),
            F.col(f"b_{id_col}").alias("__ib"),
        )
    )
    docs = (
        j.select(
            "source_a", "source_b",
            F.explode(F.array("__ia", "__ib")).alias("__d"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count_distinct("__d").alias("n_docs_involved"))
    )
    cnt = j.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    return cnt.join(docs, ["source_a", "source_b"]).select(
        "source_a",
        "source_b",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("n_docs_involved").cast("bigint").alias("n_docs_involved"),
        (F.col("source_a") == F.col("source_b")).alias("within_source"),
    )
