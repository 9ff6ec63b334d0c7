"""End-to-end pipeline compositions — the operator catalog as a usable
product surface.

Every stage is one of the individually graded operators (queries.py),
composed the way a production curation job would chain them; nothing
here introduces new semantics, only the glue. The composition returns
the intermediate frame per stage so callers choose what to pay for:
counting every stage is a reporting decision, not a tax the pipeline
imposes.

Scale notes inherit from the operators: filters are narrow scans, exact
dedup shuffles 60-bit hashes, near-dup candidates come from banded-LSH
equi-joins (xxhash64 family by default — the production path; pass
``hash_family="md5"`` for oracle-replicable runs), cluster assignment is
the checkpointed min-label loop, and per-source caps plan as
WindowGroupLimit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.dedup import connected_components, exact_dedup, minhash_lsh_pairs
from .operators.sampling import cap_per_source


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 1000,
    languages: list[str] | None = None,
    near_dup_threshold: float = 0.8,
    cap: int | None = None,
    hash_family: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[str, DataFrame]]:
    """Standard pretraining-corpus curation: length filter → optional
    language filter → exact dedup (keep lowest id) → MinHash near-dup
    CLUSTER dedup (connected components over LSH pairs, keep each
    cluster's minimum id — not just pairwise survivors, so A≈B≈C keeps
    exactly one doc) → optional per-source cap.

    Returns the ordered list of (stage_name, DataFrame); the last entry
    is the curated corpus. Stages are lazy — call
    :func:`curation_report` to force counts.
    """
    stages: list[tuple[str, DataFrame]] = [("input", docs)]
    n_tok = F.size(F.split(F.col(text_col), " "))
    d = docs.where((n_tok >= min_tokens) & (n_tok <= max_tokens))
    stages.append(("length_filter", d))
    if languages:
        d = d.where(F.col("lang").isin(list(languages)))
        stages.append(("lang_filter", d))
    d = exact_dedup(d, content_col=text_col, id_col=id_col)
    stages.append(("exact_dedup", d))
    pairs = minhash_lsh_pairs(
        d,
        id_col=id_col,
        text_col=text_col,
        threshold=near_dup_threshold,
        hash_family=hash_family,
    )
    clusters = connected_components(d.select(id_col), pairs, id_col=id_col)
    d = (
        d.join(clusters, id_col)
        .where(F.col(id_col) == F.col("cluster_id"))
        .drop("cluster_id")
    )
    stages.append(("near_dedup", d))
    if cap is not None:
        d = cap_per_source(d, cap=cap)
        stages.append(("source_cap", d))
    return stages


def curation_report(stages: list[tuple[str, DataFrame]]) -> list[tuple[str, int]]:
    """Force a (stage, surviving_docs) count per stage — the funnel a
    curation run publishes. Each count is one job; run on the cluster
    that runs the pipeline, never collect the data itself."""
    return [(name, df.count()) for name, df in stages]
