"""Property-based tests (hypothesis) — SURVEY.md §5.2 item 3.

Randomized small inputs through the real operators, invariants checked
against pandas oracles. Few examples per property (each runs a Spark
job); the fixed derandomized profile keeps CI deterministic.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=5)
vals = st.integers(min_value=-1000, max_value=1000)
rows = st.lists(st.tuples(keys, vals), min_size=1, max_size=40)


@given(data=rows)
@SET
def test_salted_join_equals_plain(spark, data):
    from osmapreduceproject_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)], "k bigint, v bigint, rid bigint"
    )
    right = left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    got = sorted(map(tuple, salted_join(left, right, on="k", salts=3, salt_src=["rid"]).collect()))
    want = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == want


@given(data=rows)
@SET
def test_exact_dedup_keeps_min_id(spark, data):
    from osmapreduceproject_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, f"text-{k}") for i, (k, _) in enumerate(data)], "doc_id bigint, text string"
    )
    out = exact_dedup(df).collect()
    pdf = pd.DataFrame([(i, f"text-{k}") for i, (k, _) in enumerate(data)],
                       columns=["doc_id", "text"])
    want = pdf.groupby("text")["doc_id"].min().to_dict()
    got = {r["text"]: r["doc_id"] for r in out}
    assert got == want


@given(
    ltimes=st.lists(st.integers(0, 100), min_size=1, max_size=20),
    rtimes=st.lists(st.integers(0, 100), min_size=1, max_size=20),
)
@SET
def test_asof_join_matches_pandas(spark, ltimes, rtimes):
    from osmapreduceproject_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(sorted(ltimes))], "k bigint, t bigint, lid bigint"
    )
    right = spark.createDataFrame(
        # distinct right timestamps: at equal ts the window picks the last
        # right row, pandas merge_asof the last in input order — dedup to
        # make the oracle well-defined
        [(1, t, 100 + t) for t in sorted(set(rtimes))], "k bigint, t bigint, payload bigint"
    )
    got = {
        (r["lid"]): r["payload_asof"]
        for r in asof_join(left, right, on="k", left_time="t", right_time="t",
                           right_cols=["payload"]).collect()
    }
    lp = pd.DataFrame({"t": sorted(ltimes), "lid": range(len(ltimes))})
    rp = pd.DataFrame({"t": sorted(set(rtimes))})
    rp["payload"] = 100 + rp["t"]
    merged = pd.merge_asof(lp, rp, on="t", direction="backward")
    want = {
        int(row.lid): (None if pd.isna(row.payload) else int(row.payload))
        for row in merged.itertuples()
    }
    assert got == want


@given(
    data=st.lists(
        st.tuples(st.integers(min_value=0, max_value=200), vals),
        min_size=1,
        max_size=50,
    )
)
@SET
def test_ranked_sort_matches_python_sorted(spark, data):
    """ranked_sort positions == Python sorted() ranks on random data with
    duplicate keys (the (key, uid) pair makes the total order unique)."""
    from osmapreduceproject_spark.mapreduce import ranked_sort
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    df = spark.createDataFrame(
        [(k, i) for i, (k, _) in enumerate(data)], "k bigint, uid bigint"
    )
    got = sorted(
        (r["pos"], r["k"], r["uid"])
        for r in ranked_sort(df, [F.col("k").asc(), F.col("uid").asc()], num_partitions=3).collect()
    )
    release_intermediates()
    want = [
        (i + 1, k, uid)
        for i, (k, uid) in enumerate(sorted((k, i) for i, (k, _) in enumerate(data)))
    ]
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
        ),
        min_size=0,
        max_size=20,
    )
)
@SET
def test_connected_components_match_union_find(spark, edges):
    """connected_components on random graphs == Python union-find:
    min-label propagation must close arbitrary chains/cycles, not just
    the clique-like graphs real near-dups produce."""
    from osmapreduceproject_spark.operators.dedup import connected_components
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    n = 15
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges if a != b] or [(0, 0)],
        "a_id bigint, b_id bigint",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, pairs).collect()
    }
    release_intermediates()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            parent[find(a)] = find(b)
    want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}
    assert got == want


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
        ),
        min_size=0,
        max_size=20,
    )
)
@SET
def test_connected_components_star_match_union_find(spark, edges):
    """connected_components_star (large-star/small-star rounds) on random
    graphs == Python union-find — same contract as the min-label version,
    exercised over arbitrary chains/cycles/self-loop-free multigraphs."""
    from osmapreduceproject_spark.operators.dedup import connected_components_star
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    n = 15
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges if a != b] or [(0, 0)],
        "a_id bigint, b_id bigint",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_star(nodes, pairs).collect()
    }
    release_intermediates()
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            parent[find(a)] = find(b)
    want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_boilerplate_removal_matches_python(spark, docs):
    """remove_boilerplate_tokens on random tiny corpora == the direct
    Python computation: df-thresholded stopword set, order/duplicate-
    preserving removal, exact removal counts — including the all-stop and
    no-stop corners the fixture can't hit."""
    from collections import Counter

    from osmapreduceproject_spark.operators.text import remove_boilerplate_tokens

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_boilerplate_tokens(df, max_df_frac=0.5).collect()
    }
    dfreq: Counter = Counter()
    for ws in docs:
        dfreq.update(set(ws))
    stop = {w for w, c in dfreq.items() if c > 0.5 * len(docs)}
    want = {
        i: (" ".join(w for w in ws if w not in stop), sum(w in stop for w in ws))
        for i, ws in enumerate(docs)
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=8),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_word_entropy_matches_python(spark, docs):
    """word_entropy on random tiny corpora == direct Python H = log2(n) −
    Σ c·log2(c)/n, to the operator's 6-decimal rounding."""
    import math
    from collections import Counter

    from osmapreduceproject_spark.operators.text import word_entropy

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["entropy"]) for r in word_entropy(df).collect()
    }
    want = {}
    for i, ws in enumerate(docs):
        n = len(ws)
        s = sum(c * math.log2(c) for c in Counter(ws).values())
        want[i] = (n, round(math.log2(n) - s / n, 6))
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
@SET
def test_unigram_logprob_matches_python(spark, docs):
    """unigram_logprob on random tiny corpora == direct Python mean
    log2(corpus unigram probability), to 6 decimals."""
    import math
    from collections import Counter

    from osmapreduceproject_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_logprob(df).collect()
    }
    freq = Counter(w for ws in docs for w in ws)
    total = sum(freq.values())
    want = {
        i: (
            len(ws),
            round(sum(math.log2(freq[w] / total) for w in ws) / len(ws), 6),
        )
        for i, ws in enumerate(docs)
    }
    assert got == want


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=6)
)
@SET
def test_mixing_weights_match_python(spark, counts):
    """mixing_weights on arbitrary strata sizes == direct Python
    n^alpha / Z to the 6-decimal rounding, and weights sum to ~1."""
    from osmapreduceproject_spark.operators.sampling import mixing_weights

    rows = [(f"s{j}", i) for j, c in enumerate(counts) for i in range(c)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint")
    got = {
        r["source"]: (r["n_docs"], r["weight"])
        for r in mixing_weights(df, alpha=0.7).collect()
    }
    z = sum(c ** 0.7 for c in counts)
    want = {f"s{j}": (c, round(c ** 0.7 / z, 6)) for j, c in enumerate(counts)}
    assert got == want
    assert abs(sum(w for _, w in got.values()) - 1.0) < 1e-4


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=10),
        min_size=1,
        max_size=6,
    )
)
@SET
def test_repetition_score_matches_python(spark, docs):
    """repetition_score == direct Python 1 − distinct/total 3-gram
    shingles (whole text when shorter than k), to 6 decimals."""
    from osmapreduceproject_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_distinct_ngrams"], r["repetition"])
        for r in repetition_score(df, k=3).collect()
    }
    want = {}
    for i, ws in enumerate(docs):
        if len(ws) >= 3:
            sh = [" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)]
        else:
            sh = [" ".join(ws)]
        want[i] = (len(sh), len(set(sh)), round(1.0 - len(set(sh)) / len(sh), 6))
    assert got == want


@given(data=rows, cap=st.integers(min_value=1, max_value=6))
@SET
def test_cap_per_source_matches_pandas_oracle(spark, data, cap):
    """cap_per_source keeps exactly the cap-smallest rows per stratum
    under the content-hash order — replicated with a pandas oracle over
    the same md5 bucket values."""
    from osmapreduceproject_spark.operators.sampling import cap_per_source

    df = spark.createDataFrame(
        [(i, f"s{k}") for i, (k, _) in enumerate(data)], "doc_id bigint, source string"
    )
    got = {r["doc_id"] for r in cap_per_source(df, cap=cap).collect()}
    import hashlib

    def bucket(doc_id):
        h = hashlib.md5(f"cap|{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) % 1_000_000

    pdf = pd.DataFrame(
        [(i, f"s{k}") for i, (k, _) in enumerate(data)], columns=["doc_id", "source"]
    )
    pdf["b"] = pdf["doc_id"].map(bucket)
    want = set(
        pdf.sort_values(["b", "doc_id"]).groupby("source").head(cap)["doc_id"]
    )
    assert got == want


@given(texts=st.lists(st.sampled_from(["a b c d", "a b c x", "p q r s", "a b"]),
                      min_size=1, max_size=12))
@SET
def test_duplicate_ngram_fraction_matches_python_oracle(spark, texts):
    """dup_frac equals the Python-computed share of a doc's distinct
    3-shingles whose corpus df ≥ 2, and always lies in [0, 1]."""
    from collections import Counter

    from osmapreduceproject_spark.operators.text import duplicate_ngram_stats
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_dup_shingles"], r["dup_frac"])
        for r in duplicate_ngram_stats(df).collect()
    }
    release_intermediates()

    def sh(t):
        w = t.split(" ")
        return set(
            " ".join(w[i:i + 3]) for i in range(len(w) - 2)
        ) if len(w) >= 3 else {t}

    dfreq = Counter(g for t in texts for g in sh(t))
    for i, t in enumerate(texts):
        s = sh(t)
        dup = sum(1 for g in s if dfreq[g] >= 2)
        assert got[i][0] == len(s) and got[i][1] == dup
        assert got[i][2] == round(dup / len(s), 6)
        assert 0.0 <= got[i][2] <= 1.0


@given(texts=st.lists(
    st.sampled_from(["a b c d e f", "a b c d x y", "p q r s t u", "a b", "x y a b c d"]),
    min_size=2, max_size=10))
@SET
def test_duplicate_span_stats_matches_python_oracle(spark, texts):
    """Span stats equal a direct Python gaps-and-islands computation:
    duplicated positions are those whose 3-shingle occurs in ≥2 distinct
    docs; runs are maximal consecutive position blocks."""
    from collections import defaultdict

    from osmapreduceproject_spark.operators.text import duplicate_span_stats
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_dup_positions"], r["n_runs"], r["max_run_shingles"])
        for r in duplicate_span_stats(df).collect()
    }
    release_intermediates()

    def shingle_list(t):
        w = t.split(" ")
        return [" ".join(w[i:i + 3]) for i in range(len(w) - 2)] if len(w) >= 3 else [t]

    docs_of = defaultdict(set)
    for i, t in enumerate(texts):
        for g in set(shingle_list(t)):
            docs_of[g].add(i)
    want = {}
    for i, t in enumerate(texts):
        dup_pos = [p for p, g in enumerate(shingle_list(t)) if len(docs_of[g]) >= 2]
        if not dup_pos:
            continue
        runs, cur = [], 1
        for a, b in zip(dup_pos, dup_pos[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        want[i] = (len(dup_pos), len(runs), max(runs))
    assert got == want


@given(events=st.lists(
    st.tuples(st.integers(0, 4),                    # user
              st.sampled_from(["view", "click", "purchase", "other"]),
              st.integers(0, 50)),                  # minute offset
    min_size=1, max_size=30))
@SET
def test_funnel_counts_match_python_oracle(spark, events):
    """Step counts equal the min-timestamp funnel computed directly in
    Python, and are non-increasing down the funnel."""
    from datetime import datetime, timedelta

    from osmapreduceproject_spark.operators.events import funnel_counts

    base = datetime(2024, 1, 1)
    rows = [(u, t, base + timedelta(minutes=m)) for u, t, m in events]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    got = [r.n_users for r in funnel_counts(df).orderBy("step").collect()]

    mins = {}
    for u, t, m in events:
        if t in ("view", "click", "purchase"):
            key = (u, t)
            mins[key] = min(mins.get(key, m), m)
    n = [0, 0, 0]
    for u in {u for u, _, _ in events}:
        m1 = mins.get((u, "view"))
        m2 = mins.get((u, "click"))
        m3 = mins.get((u, "purchase"))
        if m1 is not None:
            n[0] += 1
            if m2 is not None and m2 >= m1:
                n[1] += 1
                if m3 is not None and m3 >= m2:
                    n[2] += 1
    assert got == n
    assert got[0] >= got[1] >= got[2]


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.integers(min_value=0, max_value=3),  # type index
        ),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_event_transitions_match_python(spark, events):
    """Transition counts equal a per-user python fold over the id-ordered
    sequence; total transitions == n_events - n_active_users; probs
    row-normalize to 1 per from_type."""
    from datetime import datetime, timedelta

    from osmapreduceproject_spark.operators.events import event_transitions

    types = ["view", "click", "purchase", "error"]
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, u, types[t], t0 + timedelta(seconds=i))
        for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, event_type string, ts timestamp")
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transitions(df).collect()
    }
    import collections

    seqs = collections.defaultdict(list)
    for i, (u, t) in enumerate(events):
        seqs[u].append((i, types[t]))
    want = collections.Counter()
    for u, seq in seqs.items():
        ordered = [t for _, t in sorted(seq)]
        for a, b in zip(ordered, ordered[1:]):
            want[(a, b)] += 1
    assert got == dict(want)
    assert sum(got.values()) == len(events) - len(seqs)


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_vocab_health_matches_python(spark, docs):
    """Single-stratum vocab health equals a python Counter oracle."""
    from osmapreduceproject_spark.operators.text import vocab_health

    texts = [" ".join(f"w{t}" for t in d) for d in docs]
    df = spark.createDataFrame([("s", t) for t in texts], "source string, text string")
    r = vocab_health(df).collect()[0]
    import collections

    c = collections.Counter(t for d in docs for t in d)
    n_tokens = sum(c.values())
    n_types = len(c)
    n_hapax = sum(1 for v in c.values() if v == 1)
    top = max(c.values())
    assert r["n_tokens"] == n_tokens and r["n_types"] == n_types
    assert r["type_token_ratio"] == round(n_types / n_tokens, 6)
    assert r["hapax_share"] == round(n_hapax / n_types, 6)
    assert r["top_word_share"] == round(top / n_tokens, 6)


@given(
    inc=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=15),
    corp=st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=15),
)
@SET
def test_delta_dedup_status_matches_python(spark, inc, corp):
    """Status classification equals the obvious python rule: corpus
    membership wins, then first-in-batch by id, else new."""
    from osmapreduceproject_spark.operators.dedup import delta_dedup_status

    incoming = spark.createDataFrame(
        [(i, f"text-{k}") for i, k in enumerate(inc)], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [(100 + i, f"text-{k}") for i, k in enumerate(corp)] or [(999, "zz")],
        "doc_id bigint, text string",
    )
    corpus_texts = {f"text-{k}" for k in corp} if corp else {"zz"}
    got = {
        r["doc_id"]: r["dedup_status"]
        for r in delta_dedup_status(incoming, corpus).collect()
    }
    seen: set[str] = set()
    want = {}
    for i, k in enumerate(inc):  # ids ascend with i → first = min id
        t = f"text-{k}"
        if t in corpus_texts:
            want[i] = "dup_of_corpus"
        elif t in seen:
            want[i] = "dup_in_batch"
        else:
            want[i] = "new"
            seen.add(t)
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
    ),
    ps=st.lists(st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=4),
)
@SET
def test_exact_percentile_matches_python(spark, vals, ps):
    """Two-pass bucket percentiles equal the ceil(p*n)-rank element of
    the fully sorted list for arbitrary data and percentiles."""
    import math

    from osmapreduceproject_spark.operators.stats import exact_percentile

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = exact_percentile(df, "x", ps, n_buckets=7)
    s = sorted(float(v) for v in vals)
    want = [s[max(1, math.ceil(p * len(s))) - 1] for p in ps]
    assert got == want


@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=3,
        max_size=10,
    )
)
@SET
def test_fuzzy_match_finds_planted_single_edit(spark, words):
    """A string and its one-char-appended variant (same prefix, length
    diff 1) always pair at distance 1."""
    from osmapreduceproject_spark.operators.dedup import fuzzy_match_pairs

    s = " ".join(words)
    df = spark.createDataFrame(
        [(1, s), (2, s + "x"), (3, "unrelated totally different string")],
        "doc_id bigint, text string",
    )
    out = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_match_pairs(df, max_dist=2, prefix_len=4).collect()
    }
    assert out.get((1, 2)) == 1
    assert all(3 not in k for k in out)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=200),    # offset seconds
            st.integers(min_value=-50, max_value=50),   # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): fill is tie-free
    )
)
@SET
def test_resample_ffill_matches_python(spark, obs):
    """Every slot equals the last observation at-or-before it; slots span
    exactly [ceil(min/step), floor(max/step)] per key."""
    from datetime import datetime, timedelta, timezone

    from osmapreduceproject_spark.operators.windows import resample_ffill

    step = 30
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    base = int(t0.timestamp())
    df = spark.createDataFrame(
        [(k, t0 + timedelta(seconds=s), float(v)) for k, s, v in obs],
        "k bigint, ts timestamp, v double",
    )
    got = {
        (r["k"], r["slot_epoch"]): (r["v"], r["staleness_s"])
        for r in resample_ffill(df, key="k", ts="ts", value_col="v",
                                step_seconds=step).collect()
    }
    want = {}
    bykey: dict[int, list[tuple[int, float]]] = {}
    for k, s, v in obs:
        bykey.setdefault(k, []).append((base + s, float(v)))
    for k, series in bykey.items():
        series.sort()
        lo, hi = series[0][0], series[-1][0]
        first = -(-lo // step) * step
        last = (hi // step) * step
        t = first
        while t <= last:
            prior = [(e, v) for e, v in series if e <= t]
            e, v = prior[-1]
            want[(k, t)] = (v, t - e)
            t += step
    assert got == want


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=4, max_size=50
    ),
    n_bins=st.integers(min_value=2, max_value=6),
)
@SET
def test_equi_depth_buckets_matches_python(spark, vals, n_bins):
    """Bucket of v = smallest b with v <= quantile_disc(b/n_bins), else
    n_bins — for arbitrary (tied, skewed) data."""
    import math

    from osmapreduceproject_spark.operators.stats import equi_depth_buckets

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {}
    for r in equi_depth_buckets(df, "x", n_bins, n_buckets=8).collect():
        got.setdefault(r["x"], set()).add(r["bucket"])
    s = sorted(float(v) for v in vals)
    bounds = [
        s[max(1, math.ceil(i / n_bins * len(s))) - 1] for i in range(1, n_bins)
    ]

    def want_bucket(v):
        for i, b in enumerate(bounds):
            if v <= b:
                return i + 1
        return n_bins

    for v, buckets in got.items():
        assert buckets == {want_bucket(v)}


@given(keys=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=60))
@SET
def test_cms_matches_python_sketch(spark, keys):
    """CMS estimates equal a pure-Python replay of the same md5 sketch,
    and the one-sided error invariant holds: estimate >= exact count."""
    import hashlib
    from collections import Counter

    from osmapreduceproject_spark.operators.stats import cms_heavy_hitters

    depth, width = 3, 16
    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    got = {
        r["k"]: (r["exact_count"], r["cms_estimate"])
        for r in cms_heavy_hitters(df, "k", depth=depth, width=width,
                                   min_share=0.0).collect()
    }

    def h(s, seed):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    sketch = Counter()
    for k in keys:
        for s in range(depth):
            sketch[(s, h(str(k), s) % width)] += 1
    exact = Counter(str(k) for k in keys)
    for k, cnt in exact.items():
        est = min(sketch[(s, h(k, s) % width)] for s in range(depth))
        assert got[k] == (cnt, est)
        assert est >= cnt


@given(vals=st.lists(st.integers(min_value=-500, max_value=500), min_size=1, max_size=30),
       alpha_pct=st.integers(min_value=1, max_value=99))
@SET
def test_ewma_matches_python_fold(spark, vals, alpha_pct):
    """The integer-state EWMA recurrence replays exactly in Python."""
    import datetime

    from osmapreduceproject_spark.operators.windows import ewma

    alpha = alpha_pct / 100.0
    base = datetime.datetime(2025, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=3600 * i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    got = [
        r["ewma"]
        for r in ewma(df, "k", "ts", "v", 3600, alpha=alpha)
        .orderBy("slot_epoch")
        .collect()
    ]
    def rnd(x):
        # Spark's round and DuckDB's round both take ties AWAY from zero
        # (verified: round(2.5)=3, round(-2.5)=-3 on each); Python's
        # builtin round is half-to-even and diverges on exact .5 states
        # (e.g. 0.85 * 1228250 = 1044012.5), so the replica must not use it.
        import math

        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    state = None
    want = []
    for v in vals:
        vq = rnd(float(v) * 1_000_000)
        state = vq if state is None else rnd(alpha * vq + (1.0 - alpha) * state)
        want.append(state / 1_000_000.0)
    assert got == want


@given(texts=st.lists(
    st.sampled_from(["a b c d e", "a b c d e f g", "x y z w", "a b c", "p q"]),
    min_size=2, max_size=10))
@SET
def test_containment_matches_python_sets(spark, texts):
    """Containment pairs equal brute-force shingle-set arithmetic."""
    from osmapreduceproject_spark.operators.dedup import containment_pairs

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["a_doc_id"], r["b_doc_id"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(df, threshold=0.5).collect()
    }

    def sh(t):
        w = t.split(" ")
        if len(w) < 3:
            return {t}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = {}
    for i, ti in docs:
        for j, tj in docs:
            if i >= j:
                continue
            inter = len(sh(ti) & sh(tj))
            if not inter:
                continue
            ca = round(inter / len(sh(ti)), 6)
            cb = round(inter / len(sh(tj)), 6)
            if ca >= 0.5 or cb >= 0.5:
                want[(i, j)] = (ca, cb)
    assert got == want


@given(texts=st.lists(
    st.sampled_from([
        "the quick brown fox jumps over the lazy dog again and again",
        "1 2 3 4 5 6",
        "# # # # code",
        "word " * 8,
        "tiny",
    ]),
    min_size=1, max_size=8))
@SET
def test_gopher_rules_match_python(spark, texts):
    """Gopher rule flags equal a pure-Python evaluation of the same
    thresholds over the same tokenization."""
    from osmapreduceproject_spark.operators.text import gopher_rules

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["reasons"], r["keep"])
        for r in gopher_rules(df, min_words=5, stopwords=["the", "and"]).collect()
    }
    for i, t in docs:
        ws = t.split(" ")
        lines = t.split("\n")
        n = len(ws)
        mean_wl = round(sum(len(w) for w in ws) / n, 6)
        n_hash = t.count("#")
        n_ell = (len(t) - len(t.replace("...", ""))) / 3
        sym = round((n_hash + n_ell) / n, 6)
        bullet = round(
            sum(l.startswith(("- ", "* ", "• ")) for l in lines) / len(lines), 6
        )
        ell = round(sum(l.endswith("...") for l in lines) / len(lines), 6)
        alpha = round(sum(any(c.isascii() and c.isalpha() for c in w) for w in ws) / n, 6)
        hits = sum(s in ws for s in ["the", "and"])
        reasons = [
            r for cond, r in [
                (n < 5, "too_few_words"),
                (n > 100_000, "too_many_words"),
                (mean_wl < 3.0, "short_words"),
                (mean_wl > 10.0, "long_words"),
                (sym > 0.1, "symbol_heavy"),
                (bullet > 0.9, "bullet_heavy"),
                (ell > 0.3, "ellipsis_heavy"),
                (alpha < 0.8, "non_alpha"),
                (hits < 2, "no_stopwords"),
            ] if cond
        ]
        assert got[i] == (",".join(reasons), not reasons), (i, t, got[i], reasons)


@given(texts=st.lists(
    st.sampled_from(["a b c", "x y", "a a b", "hello world foo"]),
    min_size=1, max_size=6))
@SET
def test_hashing_vectorizer_matches_python(spark, texts):
    """Signed feature-hash triplets equal a pure-Python md5 replay."""
    import hashlib
    from collections import defaultdict

    from osmapreduceproject_spark.operators.text import hashing_vectorizer

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["bucket"]): r["weight"]
        for r in hashing_vectorizer(df, dim=16).collect()
    }

    def h(s, seed=None):
        key = f"{seed}:{s}" if seed is not None else s
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    want = defaultdict(int)
    for i, t in docs:
        for tok in t.split(" "):
            sign = 1 if h(tok, 1) % 2 == 0 else -1
            want[(i, h(tok) % 16)] += sign
    assert got == dict(want)


@given(vals=st.lists(st.floats(min_value=0.01, max_value=9999,
                               allow_nan=False, allow_infinity=False),
                     min_size=1, max_size=40))
@SET
def test_benford_digits_match_python(spark, vals):
    """First-digit counts equal Python's string-of-cents extraction."""
    from collections import Counter

    from osmapreduceproject_spark.operators.stats import benford_check

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["digit"]: r["n"] for r in benford_check(df, "x").collect()}

    def rnd(x):
        import math
        return math.floor(x + 0.5)

    want = Counter(int(str(rnd(abs(v) * 100))[0]) for v in vals if rnd(abs(v) * 100) >= 1)
    assert got == {d: want.get(d, 0) for d in range(1, 10)}


@given(epochs=st.lists(st.integers(min_value=1_600_000_000, max_value=1_700_000_000),
                       min_size=2, max_size=40, unique=True),
       frac_pct=st.integers(min_value=10, max_value=90))
@SET
def test_temporal_split_no_leakage(spark, epochs, frac_pct):
    """On arbitrary timestamp sets every train row precedes every eval
    row, the cutoff is the exact discrete quantile, and the split is
    exhaustive."""
    import math

    from pyspark.sql import functions as F

    from osmapreduceproject_spark.operators.sampling import temporal_split

    frac = frac_pct / 100.0
    df = spark.createDataFrame(
        [(e,) for e in epochs], "e bigint"
    ).select(F.timestamp_seconds(F.col("e")).alias("ts"), "e")
    out = temporal_split(df, "ts", train_frac=frac).collect()
    assert len(out) == len(epochs)
    cutoff_us = sorted(e * 1_000_000 for e in epochs)[
        max(1, math.ceil(frac * len(epochs))) - 1
    ]
    for r in out:
        assert r["cutoff_epoch_us"] == cutoff_us
        assert (r["split"] == "train") == (r["e"] * 1_000_000 <= cutoff_us)


@given(texts=st.lists(
    st.sampled_from(["a b c d e f g h i", "one two", "w " * 30, "single"]),
    min_size=1, max_size=6),
    chunk=st.integers(min_value=2, max_value=6),
    stride=st.integers(min_value=1, max_value=4))
@SET
def test_chunk_documents_matches_python(spark, texts, chunk, stride):
    """Overlapping chunks equal a pure-Python slicer for arbitrary
    (chunk_tokens, stride) combinations, stride <= chunk_tokens."""
    import math

    from osmapreduceproject_spark.operators.text import chunk_documents

    stride = min(stride, chunk)
    docs = [(i, t.strip()) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    }
    want = {}
    for i, t in docs:
        ws = t.split(" ")
        for k in range(math.ceil(len(ws) / stride)):
            piece = ws[k * stride: k * stride + chunk]
            want[(i, k)] = (len(piece), " ".join(piece))
    assert got == want


@given(texts=st.lists(
    st.sampled_from([
        "the cat sat. the dog ran! what now?",
        "aeiou xyz qqq",
        "a b c d e",
        "yes",
    ]),
    min_size=1, max_size=6))
@SET
def test_readability_matches_python(spark, texts):
    """Flesch proxy equals pure-Python regex counting of vowel groups
    and terminal-punctuation runs."""
    import re

    from osmapreduceproject_spark.operators.text import readability

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"], r["flesch"])
        for r in readability(df).collect()
    }
    for i, t in docs:
        low = t.lower()
        n_words = len(t.split(" "))
        n_sent = max(len(re.findall(r"[.!?]+", low)), 1)
        n_syll = len(re.findall(r"[aeiouy]+", low))
        fl = round(206.835 - 1.015 * (n_words / n_sent) - 84.6 * (n_syll / n_words), 6)
        assert got[i] == (n_words, n_sent, n_syll, fl), (t, got[i])


@given(
    data=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=-50, max_value=50)),
        min_size=2,
        max_size=60,
    )
)
@SET
def test_ks_test_matches_python_ecdf(spark, data):
    """The ranged prefix-sum KS D equals the brute-force ECDF max over
    pooled values — and both groups must be non-empty to have ECDFs."""
    from osmapreduceproject_spark.operators.stats import ks_test
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    a = [float(v) for g, v in data if g]
    b = [float(v) for g, v in data if not g]
    if not a or not b:
        return
    rows = [("a" if g else "b", float(v)) for g, v in data]
    df = spark.createDataFrame(rows, "g string, v double")
    row = ks_test(df, "g", "v", "a", "b").first()
    values = sorted(set(a) | set(b))
    want = max(
        abs(
            sum(1 for x in a if x <= t) / len(a)
            - sum(1 for x in b if x <= t) / len(b)
        )
        for t in values
    )
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["d_stat"] - round(want, 6)) < 2e-6
    release_intermediates()


@given(
    counts=st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=12)
)
@SET
def test_gini_matches_python(spark, counts):
    """Ranked-moment Gini equals the classic sorted-counts formula."""
    from osmapreduceproject_spark.operators.stats import gini_concentration
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    rows = [(k,) for k, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "k bigint")
    row = gini_concentration(df, "k").first()
    xs = sorted(counts)
    n, sx = len(xs), sum(xs)
    want = (2.0 * sum((i + 1) * x for i, x in enumerate(xs))) / (n * sx) - (
        n + 1
    ) / n
    assert row["n_keys"] == n and row["n_rows"] == sx
    assert abs(row["gini"] - round(want, 6)) < 2e-6
    release_intermediates()


@given(
    data=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=0, max_value=20)),
        min_size=2,
        max_size=60,
    )
)
@SET
def test_auc_matches_python_midranks(spark, data):
    """Exact AUC equals the pairwise probability P(score_pos > score_neg)
    + 0.5 P(tie) — the definition the midrank formula compresses."""
    from osmapreduceproject_spark.operators.stats import auc_roc
    from osmapreduceproject_spark.plans.inspect import release_intermediates

    pos = [v for y, v in data if y]
    neg = [v for y, v in data if not y]
    if not pos or not neg:
        return
    df = spark.createDataFrame(
        [(float(v), bool(y)) for y, v in data], "s double, y boolean"
    )
    row = auc_roc(df, "s", "y").first()
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - round(want, 6)) < 2e-6
    release_intermediates()


@given(vals=st.lists(st.integers(min_value=-40, max_value=40), min_size=1, max_size=30))
@SET
def test_holt_linear_matches_python_fold(spark, vals):
    """The coupled integer level/trend recurrence replays exactly in
    Python (same away-from-zero rounding contract as the ewma test)."""
    import datetime
    import math

    from osmapreduceproject_spark.operators.windows import holt_linear

    def rnd(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    base = datetime.datetime(2025, 1, 1)
    rows = [
        (1, base + datetime.timedelta(seconds=3600 * i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, v double")
    got = [
        (r["level"], r["trend"])
        for r in holt_linear(df, "k", "ts", "v", 3600, alpha=0.3, beta=0.1)
        .orderBy("slot_epoch")
        .collect()
    ]
    lq = bq = None
    want = []
    for v in vals:
        vq = rnd(float(v) * 1_000_000)
        if lq is None:
            lq, bq = vq, 0
        else:
            nl = rnd(0.3 * vq + 0.7 * (lq + bq))
            bq = rnd(0.1 * (nl - lq) + 0.9 * bq)
            lq = nl
        want.append((lq / 1_000_000.0, bq / 1_000_000.0))
    assert got == want


@given(
    points=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=20),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=20,
    ),
    grid=st.sampled_from([1, 3, 7, 16]),
)
@SET
def test_point_in_interval_join_matches_bruteforce(spark, points, ivs, grid):
    """The grid decomposition is pure plumbing: for ANY grid size the
    output equals the brute-force containment predicate, exactly once
    per (point, interval) pair — including negative bounds (floor
    semantics), empty intervals (dropped), and points on boundaries
    (lo inclusive, hi exclusive)."""
    from osmapreduceproject_spark.operators.joins import point_in_interval_join

    pts = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid int, p long"
    )
    intervals = spark.createDataFrame(
        [(j, lo, lo + ln) for j, (lo, ln) in enumerate(ivs)],
        "iid int, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in point_in_interval_join(pts, intervals, "p", "lo", "hi", grid).collect()
    )
    want = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, ln) in enumerate(ivs)
        if lo <= p < lo + ln
    )
    assert got == want


@given(
    labels=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2)), min_size=2, max_size=60
    )
)
@SET
def test_cohens_kappa_matches_python(spark, labels):
    """Kappa against the direct Python contingency computation — and the
    bounds: po=1 ⇒ κ=1 (unless pe=1 → NULL), κ ≤ 1 always."""
    from osmapreduceproject_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame(labels, "a int, b int")
    row = cohens_kappa(df, "a", "b").first()
    n = len(labels)
    po = sum(1 for a, b in labels if a == b) / n
    from collections import Counter

    ca, cb = Counter(a for a, _ in labels), Counter(b for _, b in labels)
    pe = sum(ca[k] * cb.get(k, 0) for k in ca) / (n * n)
    assert row["n"] == n
    assert abs(row["po"] - round(po, 6)) < 1e-9
    assert abs(row["pe"] - round(pe, 6)) < 1e-9
    if pe < 1.0:
        assert abs(row["kappa"] - round((po - pe) / (1 - pe), 6)) < 1e-9
        assert row["kappa"] <= 1.0 + 1e-9
    else:
        assert row["kappa"] is None


@given(
    series=st.lists(
        st.integers(min_value=-100, max_value=100), min_size=3, max_size=30
    )
)
@SET
def test_series_autocorrelation_matches_python(spark, series):
    """Lag-k ACF against a plain Python fold over the same quantized
    pairs (one key, hourly observations so the grid IS the series)."""
    import datetime
    import math as _math

    from osmapreduceproject_spark.operators.windows import series_autocorrelation

    base = datetime.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [
            (1, base + datetime.timedelta(hours=i), float(v))
            for i, v in enumerate(series)
        ],
        "k bigint, ts timestamp, v double",
    )
    got = {
        (r["lag"]): (r["n_pairs"], r["acf"])
        for r in series_autocorrelation(
            df, key="k", ts="ts", value_col="v", step_seconds=3600, max_lag=3
        ).collect()
    }
    for lag in (1, 2, 3):
        pairs = [
            (round(series[i] * 1e6), round(series[i - lag] * 1e6))
            for i in range(lag, len(series))
        ]
        if not pairs:
            assert lag not in got
            continue
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        want = (
            round((n * sxy - sx * sy) / _math.sqrt(vx * vy), 6)
            if n >= 2 and vx > 0 and vy > 0
            else None
        )
        assert got[lag][0] == n
        if want is None:
            assert got[lag][1] is None
        else:
            assert abs(got[lag][1] - want) < 1e-9


@given(
    data=st.lists(
        st.tuples(st.booleans(), st.integers(min_value=-500, max_value=500)),
        min_size=4,
        max_size=60,
    )
)
@SET
def test_brown_forsythe_matches_python(spark, data):
    """F statistic against a direct Python replay of the same quantized
    integer arithmetic (discrete medians, micro-unit deviations)."""
    import math as _math

    from osmapreduceproject_spark.operators.stats import brown_forsythe_test

    rows = [("a" if is_a else "b", float(v)) for is_a, v in data]
    df = spark.createDataFrame(rows, "g string, v double")
    row = brown_forsythe_test(df, "g", "v", "a", "b").first()
    ga = sorted(v for g, v in rows if g == "a")
    gb = sorted(v for g, v in rows if g == "b")
    assert row["n_a"] == len(ga) and row["n_b"] == len(gb)
    if not ga or not gb or len(ga) + len(gb) < 3:
        assert row["f_stat"] is None
        return
    med_a = ga[_math.ceil(len(ga) / 2) - 1]
    med_b = gb[_math.ceil(len(gb) / 2) - 1]
    assert row["median_a"] == med_a and row["median_b"] == med_b
    za = [round(abs(v - med_a) * 1e6) for v in ga]
    zb = [round(abs(v - med_b) * 1e6) for v in gb]
    na, nb = len(za), len(zb)
    sa, sb = sum(za), sum(zb)
    ssa, ssb = sum(z * z for z in za), sum(z * z for z in zb)
    mz = float(sa + sb) / (na + nb)
    da = float(sa) / na - mz
    db = float(sb) / nb - mz
    between = na * (da * da) + nb * (db * db)
    within = (float(ssa) - float(sa) * sa / na) + (float(ssb) - float(sb) * sb / nb)
    if within > 0:
        assert abs(row["f_stat"] - round(between / (within / (na + nb - 2)), 6)) < 1e-9
        assert row["f_stat"] >= 0
    else:
        assert row["f_stat"] is None
