"""Property-based differential tests (hypothesis): the operators with the
subtlest boundary semantics, checked against independent pure-pandas
references on randomized inputs.

Why these two: the fixture-based oracle gate already proves parity on
the shipped data, but fixtures can miss boundary configurations entirely
— the session-gap end-inclusivity bug was only caught by a hand-built
probe.  Randomized keys/timestamps with deliberate duplicates hunt
exactly those: equal timestamps across sides (asof inclusivity),
equal-gap boundaries (sessionize), multi-row ties (deterministic
collapse).  Examples are kept tiny and few — each example is a real
Spark job."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
    asof_join,
    sessionize,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# timestamps on a coarse grid so equal-ts and equal-gap collisions are
# common, not astronomically rare
_TS = st.integers(min_value=0, max_value=12)
_KEY = st.integers(min_value=0, max_value=2)
_VAL = st.integers(min_value=-5, max_value=5)


def _to_ts(h: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(hours=h)


@given(
    left=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=8),
    right=st.lists(st.tuples(_KEY, _TS, _VAL), min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(
        [{"k": k, "ts": _to_ts(t), "lid": i} for i, (k, t) in enumerate(left)]
    )
    rpdf = pd.DataFrame(
        [{"k": k, "ts": _to_ts(t), "value": v} for (k, t, v) in right]
    )
    # the operator collapses right (key, ts) duplicates to max(payload) —
    # apply the same collapse to the reference input
    rref = (
        rpdf.groupby(["k", "ts"], as_index=False)["value"].max().sort_values("ts")
    )
    expect = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rref.rename(columns={"value": "asof_value"}),
        on="ts",
        by="k",
        direction="backward",  # inclusive of equal ts, like the operator
    )
    got = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on=["k"],
        payload=["value"],
    ).toPandas()
    g = got.sort_values("lid").reset_index(drop=True)
    e = expect.sort_values("lid").reset_index(drop=True)
    assert list(g["lid"]) == list(e["lid"])
    ge = g["asof_value"].astype("float64").where(g["asof_value"].notna())
    ee = e["asof_value"].astype("float64").where(e["asof_value"].notna())
    assert ge.fillna(-999).tolist() == ee.fillna(-999).tolist()


def _sessions_ref(rows: list[tuple[int, int]], gap_hours: int) -> set[tuple]:
    """Pure-python gaps-and-islands: break when diff > gap (end-inclusive)."""
    out = []
    by_key: dict[int, list[int]] = {}
    for k, t in rows:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        ts.sort()
        sid, start, prev, n = 1, ts[0], ts[0], 0
        for t in ts:
            if t - prev > gap_hours:
                out.append((k, sid, start, prev, n))
                sid, start, n = sid + 1, t, 0
            prev = t
            n += 1
        out.append((k, sid, start, prev, n))
    return {
        (k, sid, _to_ts(s), _to_ts(e), n) for (k, sid, s, e, n) in out
    }


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=3,
            max_size=3,
        ),
        min_size=3,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_packed_argmax_assignment_matches_window_reference(spark, vecs):
    """The encoded-long argmax of _assign_nearest must equal the
    row_number-window reference argmax ((csim DESC, cid ASC) pick) on
    arbitrary float vectors — ties, negatives, near-boundary values."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sales_forecast_mlops_at_scale_spark.operators.llm.embedsim import (
        _assign_nearest,
        _dot,
        _prepared,
    )

    # skip degenerate zero vectors (norm 0 → NaN cosine on both paths)
    vecs = [v for v in vecs if np.linalg.norm(v) > 1e-6]
    if len(vecs) < 2:
        return
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    c = _prepared(df, "vec_id", "embedding")
    centroids = (
        _prepared(df.limit(2), "vec_id", "embedding")
        .select(
            F.col("vid").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    got = {
        (r.vid, r.cid)
        for r in _assign_nearest(c, centroids, "cid", 6).collect()
    }
    sim = F.round(_dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")), 6)
    w = Window.partitionBy("vid").orderBy(F.col("csim").desc(), F.col("cid").asc())
    ref = {
        (r.vid, r.cid)
        for r in c.join(F.broadcast(centroids))
        .withColumn("csim", sim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vid", "cid")
        .collect()
    }
    assert got == ref


@given(
    values=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40)
)
@settings(**_SETTINGS)
def test_kmv_exact_below_k_and_bounded_above(spark, values):
    """KMV must be exact below k and never report n_seen_distinct larger
    than the true distinct count (hash collisions can only shrink it)."""
    from sales_forecast_mlops_at_scale_spark.operators.llm import kmv_distinct

    df = spark.createDataFrame([(f"v-{v}",) for v in values], "v string")
    row = kmv_distinct(df, "v", k=8).collect()[0]
    true_distinct = len(set(values))
    assert row.n_seen_distinct <= true_distinct
    if true_distinct < 8:
        assert row.n_seen_distinct == true_distinct
        assert row.estimate == float(true_distinct)


@given(rows=st.lists(st.tuples(_KEY, _TS), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_sessionize_matches_reference(spark, rows):
    pdf = pd.DataFrame(
        [
            {"user_id": k, "ts": _to_ts(t), "event_id": i, "value": 1.0}
            for i, (k, t) in enumerate(rows)
        ]
    )
    got = sessionize(
        spark.createDataFrame(pdf), keys=("user_id",), gap="2 hours"
    ).toPandas()
    got_set = {
        (
            r.user_id,
            r.session_id,
            r.session_start.to_pydatetime(),
            r.session_end.to_pydatetime(),
            r.n_events,
        )
        for r in got.itertuples()
    }
    assert got_set == _sessions_ref(rows, gap_hours=2)


# -- dup_span_coverage vs a brute-force python reference ----------------------

# tiny vocab + short docs so cross-doc n-gram collisions are common
_WORD = st.sampled_from(["aa", "bb", "cc"])
_DOC = st.lists(_WORD, min_size=0, max_size=12)


@given(docs=st.lists(_DOC, min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_dup_span_matches_bruteforce(spark, docs):
    from sales_forecast_mlops_at_scale_spark.operators.llm.dupspan import (
        dup_span_coverage,
    )

    n = 3
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    # brute-force reference: positional n-grams, cross-doc dup test,
    # covered = union of [pos, pos+n-1] token spans
    grams = {}  # gram -> set of doc ids
    per_doc = []
    for i, words in enumerate(docs):
        gs = [tuple(words[j : j + n]) for j in range(len(words) - n + 1)]
        per_doc.append(gs)
        for g in gs:
            grams.setdefault(g, set()).add(i)
    expected = {}
    for i, words in enumerate(docs):
        covered = set()
        n_dup = 0
        for j, g in enumerate(per_doc[i]):
            if len(grams[g]) >= 2:
                n_dup += 1
                covered.update(range(j, j + n))
        expected[i] = (len(words), max(len(words) - n + 1, 0), n_dup, len(covered))

    out = dup_span_coverage(
        spark.createDataFrame(rows, ["doc_id", "text"]), n=n
    ).collect()
    assert len(out) == len(docs)
    for r in out:
        exp = expected[r.doc_id]
        got = (r.n_tokens, r.n_grams, r.n_dup_grams, r.covered_tokens)
        assert got == exp, f"doc {r.doc_id}: {got} != {exp}"


# -- bpe_train vs a pure-python BPE reference ---------------------------------


def _bpe_reference(texts, n_merges):
    """Sennrich-style BPE on whitespace tokens of normalized text:
    greedy argmax pair (ties by pair string), left-to-right merge."""
    import re
    from collections import Counter

    tf = Counter()
    for t in texts:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        if norm:
            tf.update(norm.split(" "))
    vocab = {tok: list(tok) + ["</w>"] for tok in tf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for tok, syms in vocab.items():
            w = tf[tok]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += w
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(best)
        a, b = best
        for tok, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[tok] = out
    return merges, vocab


_BPE_WORD = st.sampled_from(["aba", "bab", "aa", "abab", "b", "cab"])


@given(docs=st.lists(st.lists(_BPE_WORD, min_size=1, max_size=6), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_bpe_train_matches_reference(spark, docs):
    from sales_forecast_mlops_at_scale_spark.operators.llm.bpe import bpe_train

    texts = [" ".join(ws) for ws in docs]
    ref_merges, ref_vocab = _bpe_reference(texts, 4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, seg = bpe_train(df, n_merges=4)
    assert merges == ref_merges
    got = {r.token: list(r.symbols) for r in seg.collect()}
    assert got == ref_vocab


@given(docs=st.lists(st.lists(_BPE_WORD, min_size=1, max_size=6), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_bpe_train_local_matches_reference(spark, docs):
    """The driver-local incremental trainer (lazy-deletion heap +
    inverted index) must be merge-for-merge identical to the pure
    recount reference — including the re-created-pair and merged-string
    collision cases the aa/abab fixture words provoke."""
    from sales_forecast_mlops_at_scale_spark.operators.llm.bpe import (
        bpe_train_local,
    )

    texts = [" ".join(ws) for ws in docs]
    ref_merges, ref_vocab = _bpe_reference(texts, 6)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, seg = bpe_train_local(df, n_merges=6)
    assert merges == ref_merges
    got = {r.token: list(r.symbols) for r in seg.collect()}
    assert got == ref_vocab


@given(docs=st.lists(st.lists(_BPE_WORD, min_size=1, max_size=6), min_size=1, max_size=4))
@settings(**_SETTINGS)
def test_bpe_encode_matches_reference_segmentation(spark, docs):
    """bpe_encode with a trained merge list reproduces the reference
    per-token segmentation for every token OCCURRENCE in the corpus —
    the encode path (vocab-scale apply + corpus rejoin) can't drift from
    the training-side segmentation."""
    from sales_forecast_mlops_at_scale_spark.operators.llm.bpe import (
        bpe_encode,
        bpe_train,
    )

    texts = [" ".join(ws) for ws in docs]
    ref_merges, ref_vocab = _bpe_reference(texts, 4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    merges, _ = bpe_train(df, n_merges=4)
    rows = bpe_encode(df, merges).collect()
    # every occurrence segmented per the reference vocab
    for r in rows:
        assert list(r.pieces) == ref_vocab[r.token], r.token
    # occurrence multiset matches the corpus token stream
    import re
    from collections import Counter

    want = Counter()
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        if norm:
            want.update((i, tok) for tok in norm.split(" "))
    got = Counter((r.doc_id, r.token) for r in rows)
    assert got == want


@given(
    blobs=st.lists(
        st.binary(min_size=0, max_size=120), min_size=1, max_size=6
    )
)
@settings(**_SETTINGS)
def test_cdc_chunks_match_bruteforce_reference(spark, blobs):
    """CDC chunking equals a direct python restatement of the scheme on
    arbitrary binary payloads: same boundaries, same tiling, same
    digests; NULL-safety via the empty-blob skip."""
    import hashlib as hl

    from sales_forecast_mlops_at_scale_spark.operators.llm.cdc import (
        CDC_DIV,
        CDC_WINDOW,
        cdc_chunks,
    )
    from sales_forecast_mlops_at_scale_spark.operators.llm.winnow import (
        POLY_BASE,
        POLY_MOD,
    )

    def ref_chunks(content: bytes):
        n = len(content)
        if n == 0:
            return []
        w = CDC_WINDOW
        starts = {0}
        for p in range(0, n - w + 1):
            h = 0
            for j in range(w):
                h = (h * POLY_BASE + content[p + j]) % POLY_MOD
            if h % CDC_DIV == 0 and p + w < n:
                starts.add(p + w)
        bounds = sorted(starts) + [n]
        out = []
        for i, (s, e) in enumerate(zip(bounds[:-1], bounds[1:])):
            out.append(
                (i, e - s, hl.md5(content.hex()[2 * s : 2 * e].encode()).hexdigest())
            )
        return out

    assets = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        "asset_id long, content binary",
    )
    got = {}
    for r in cdc_chunks(assets).collect():
        got.setdefault(r.asset_id, []).append(
            (r.chunk_idx, r.chunk_len, r.chunk_digest)
        )
    for i, b in enumerate(blobs):
        expect = ref_chunks(b)
        assert sorted(got.get(i, [])) == sorted(expect), (i, b.hex())


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
    budget=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_stratified_sample_allocation_invariants(spark, sizes, budget):
    """sqrt-allocation invariants on arbitrary strata shapes: per-stratum
    take = min(stratum size, integer sqrt allocation); total allocation
    never exceeds the budget."""
    import math

    from sales_forecast_mlops_at_scale_spark.operators.llm.curation import (
        stratified_sample,
    )

    rows = [
        (s * 1000 + i, f"s{s}")
        for s, n in enumerate(sizes)
        for i in range(n)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, ["source"], budget=budget).collect()
    taken = {}
    for r in out:
        taken[r.source] = taken.get(r.source, 0) + 1
    qs = {f"s{s}": math.floor(math.sqrt(n) * 1e6 + 0.5) for s, n in enumerate(sizes) if n}
    tq = sum(qs.values())
    for s, n in enumerate(sizes):
        if n == 0:
            continue
        alloc = (budget * qs[f"s{s}"]) // tq
        assert taken.get(f"s{s}", 0) == min(n, alloc)
    assert sum(taken.values()) <= budget


# -- star-contraction connected components vs union-find ----------------------


_EDGE = st.tuples(
    st.integers(min_value=1, max_value=24), st.integers(min_value=1, max_value=24)
)


@given(raw=st.lists(_EDGE, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_star_contraction_matches_union_find(spark, raw):
    """The large-star/small-star phase alone (max_iter=0 skips the cheap
    propagation entirely) must reproduce a pure-python union-find's
    component-min labeling on arbitrary random graphs — multi-component,
    dense blobs, chains, pre-formed stars, repeated edges collapsed."""
    from sales_forecast_mlops_at_scale_spark.operators.llm import (
        connected_components,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, max_iter=0).collect()
    }
    assert got == want


# -- binned-quantile sketch vs exact percentile -------------------------------


@given(
    vals=st.lists(st.integers(min_value=-20, max_value=20), min_size=1, max_size=40),
    q=st.sampled_from([0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]),
)
@settings(**_SETTINGS)
def test_binned_quantiles_error_bound_on_random_data(spark, vals, q):
    """Sketch estimate within one cell width of the exact rank value for
    arbitrary integer data (heavy ties, negatives, singletons, extreme
    q) — checks the rank/cumulative/interpolation logic, not just the
    fixture's smooth distribution."""
    from sales_forecast_mlops_at_scale_spark.operators.llm.sketches import (
        QSKETCH_BINS,
        binned_quantiles,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double"
    )
    rows = binned_quantiles(df, "x", (q,)).collect()
    assert len(rows) == 1
    est = rows[0].estimate
    s = sorted(vals)
    # the sketch's rank definition: r = max(1, ceil(q*n)), 1-indexed
    import math

    r = max(1, math.ceil(q * len(s)))
    exact = float(s[r - 1])
    cell = (max(s) - min(s)) / QSKETCH_BINS
    # + half an ulp of the operator's 6-digit output rounding: an
    # estimate sitting exactly one cell from the exact value can round
    # AWAY by up to 5e-7 (e.g. cell = 2/256 = 0.0078125 -> 0.007813)
    assert abs(est - exact) <= cell + 5e-7 + 1e-9, (vals, q, est, exact)


# -- decayed counters: stream fold == batch, under ANY batch partition ---------

_DECAY_DAY = st.integers(min_value=-10, max_value=120)  # spans pre-epoch too
_DECAY_CENTS = st.integers(min_value=0, max_value=9999)


@given(
    rows=st.lists(
        st.tuples(_KEY, _DECAY_DAY, _DECAY_CENTS), min_size=1, max_size=24
    ),
    assign=st.lists(st.integers(min_value=0, max_value=2), min_size=24, max_size=24),
    shift=st.sampled_from([2, 4, 8]),
)
@settings(**_SETTINGS)
def test_decay_fold_equals_batch_under_random_partitions(
    spark, tmp_path_factory, rows, assign, shift
):
    """The module's central claim, randomized: for ANY event set (incl.
    pre-epoch days and ages past the pruning horizon) and ANY partition
    of it into 3 ordered batches (incl. empty ones), the folded state
    serves decayed_num/n_events BIT-EQUAL to the batch operator."""
    import datetime as dt_

    from sales_forecast_mlops_at_scale_spark.operators.timeseries import (
        decayed_score,
    )
    from sales_forecast_mlops_at_scale_spark.streaming import decay

    def frame(rws):
        return spark.createDataFrame(
            [
                (
                    k,
                    dt_.datetime(1970, 1, 1) + dt_.timedelta(days=d, hours=3),
                    cents / 100.0,
                )
                for k, d, cents in rws
            ],
            "user_id long, ts timestamp, value double",
        )

    root = str(tmp_path_factory.mktemp("decayprop") / "state")
    batches = [[], [], []]
    for r, b in zip(rows, assign):
        batches[b].append(r)
    for b in batches:
        if b:  # empty frames can't infer schema; fold skips them anyway
            decay.fold_batch(
                spark, frame(b), root, keys=["user_id"], shift=shift
            )
    got = {
        r.user_id: (r.n_events, r.decayed_num)
        for r in decay.read_scores(
            spark, root, keys=["user_id"], shift=shift
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.decayed_num)
        for r in decayed_score(frame(rows), keys=["user_id"], shift=shift).collect()
    }
    assert got == want
