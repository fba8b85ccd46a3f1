"""Time-series operators (interval join, rolling stats) plus the
round-6 curation/sampling additions (DSIR, Bloom decontamination,
weighted reservoir sampling, tokenizer fertility).

Semantics on hand-built and randomized inputs, brute-force equality
gates, and plan-quality gates (the bucketized interval join must run
as an equi-join — never a BroadcastNestedLoopJoin/cartesian; the
weighted sample must lower to TakeOrderedAndProject)."""

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from declarative_dataflow_spark.operators import curation, sampling, text, timeseries


def _ts(day, hour, minute=0, second=0):
    return dt.datetime(2024, 1, day, hour, minute, second)


@pytest.fixture()
def events(spark):
    rows = [
        # (event_id, ts, user_id, value)
        (1, _ts(1, 0, 0), 1, 10.0),
        (2, _ts(1, 0, 30), 1, 20.0),
        (3, _ts(1, 1, 0), 1, 30.0),   # 1h window: events 1..3 (range inclusive)
        (4, _ts(1, 3, 0), 1, 40.0),   # alone
        (5, _ts(1, 0, 45), 2, 5.0),   # other user
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


def test_interval_join_basic(spark, events):
    points = events.select("event_id", "user_id", "ts")
    iv = spark.createDataFrame(
        [
            (100, 1, _ts(1, 0, 0), _ts(1, 0, 59)),
            (101, 1, _ts(1, 1, 0), _ts(1, 4, 0)),
            (102, 2, _ts(1, 0, 0), _ts(1, 23, 0)),
        ],
        ["iv_id", "user_id", "start", "end"],
    )
    out = sorted(
        (r["event_id"], r["iv_id"])
        for r in timeseries.interval_join(
            points, iv, on=["user_id"], bucket_seconds=3600
        ).collect()
    )
    # event 3 lands exactly on 101's start (inclusive); event 1 on 100's.
    assert out == [(1, 100), (2, 100), (3, 101), (4, 101), (5, 102)]


def test_interval_join_equals_naive_range_join_randomized(spark):
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(200_000)))
        for i in range(120)
    ]
    ivs = []
    for j in range(40):
        s = base + dt.timedelta(seconds=rng.randrange(200_000))
        ivs.append(
            (j, rng.randrange(3), s, s + dt.timedelta(seconds=rng.randrange(30_000)))
        )
    p = spark.createDataFrame(pts, ["pid", "k", "ts"])
    v = spark.createDataFrame(ivs, ["vid", "k", "start", "end"])
    got = sorted(
        (r["pid"], r["vid"])
        for r in timeseries.interval_join(
            p, v, on=["k"], bucket_seconds=7200
        ).collect()
    )
    want = sorted(
        (pid, vid)
        for (pid, pk, pt) in pts
        for (vid, vk, s, e) in ivs
        if pk == vk and s <= pt <= e
    )
    assert got == want


def test_interval_join_is_equi_join_not_cartesian(spark, events):
    points = events.select("event_id", "user_id", "ts")
    iv = spark.createDataFrame(
        [(100, 1, _ts(1, 0, 0), _ts(1, 2, 0))],
        ["iv_id", "user_id", "start", "end"],
    )
    plan = (
        timeseries.interval_join(points, iv, on=["user_id"], bucket_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# rolling_stats
# ---------------------------------------------------------------------------


def test_rolling_stats_trailing_window(spark, events):
    out = {
        r["event_id"]: (r["n_win"], r["avg_win"], r["max_win"])
        for r in timeseries.rolling_stats(events, window_seconds=3600).collect()
    }
    assert out[1] == (1, 10.0, 10.0)
    assert out[2] == (2, 15.0, 20.0)
    assert out[3] == (3, 20.0, 30.0)  # range frame is inclusive of -1h
    assert out[4] == (1, 40.0, 40.0)
    assert out[5] == (1, 5.0, 5.0)


def test_rolling_stats_equals_brute_force_randomized(spark):
    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(20_000)),
            rng.randrange(4),
            round(rng.uniform(-50, 50), 3),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        r["event_id"]: (r["n_win"], r["avg_win"], r["max_win"])
        for r in timeseries.rolling_stats(df, window_seconds=3600).collect()
    }
    for (i, ts, u, v) in rows:
        win = [
            w
            for (_, t2, u2, w) in rows
            if u2 == u and ts - dt.timedelta(hours=1) <= t2 <= ts
        ]
        assert got[i][0] == len(win)
        assert got[i][1] == pytest.approx(sum(win) / len(win), abs=2e-6)
        assert got[i][2] == pytest.approx(max(win), abs=1e-9)


# ---------------------------------------------------------------------------
# sessionize / session_stats
# ---------------------------------------------------------------------------


def test_sessionize_gap_boundary_and_ordering(spark):
    rows = [
        (1, _ts(1, 0, 0), 1, 0.0),
        (2, _ts(1, 0, 10), 1, 0.0),   # 10 min gap -> same session
        (3, _ts(1, 0, 40), 1, 0.0),   # exactly 30 min -> still same (strict >)
        (4, _ts(1, 2, 0), 1, 0.0),    # 80 min -> new session
        (5, _ts(1, 0, 5), 2, 0.0),    # other key, own numbering
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {
        r["event_id"]: r["session_seq"]
        for r in timeseries.sessionize(df, gap_seconds=1800).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_equals_brute_force_randomized(spark):
    rng = random.Random(17)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(100_000)), rng.randrange(5), 0.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {
        r["event_id"]: r["session_seq"]
        for r in timeseries.sessionize(df, gap_seconds=600).collect()
    }
    by_user = {}
    for (i, ts, u, _) in rows:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, i in evs:
            if prev is None or (ts - prev).total_seconds() > 600:
                seq += 1
            prev = ts
            assert got[i] == seq, f"event {i}"


def test_session_stats_rollup(spark, events):
    out = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_s"])
        for r in timeseries.session_stats(events, gap_seconds=3600).collect()
    }
    # user 1: events 1,2,3 within 1h gaps; event 4 is 2h after event 3.
    assert out[(1, 1)] == (3, 3600.0)
    assert out[(1, 2)] == (1, 0.0)
    assert out[(2, 1)] == (1, 0.0)


def test_sessionize_window_is_partitioned(spark, events):
    from tools.plan_audit import global_sort_windows

    plan = (
        timeseries.sessionize(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert not global_sort_windows(plan)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_strictly_ordered_chain(spark):
    rows = [
        # user 1 completes view -> click -> buy in order
        (1, _ts(1, 1), 1, "view"),
        (2, _ts(1, 2), 1, "click"),
        (3, _ts(1, 3), 1, "buy"),
        # user 2: click BEFORE the first view -> depth 1
        (4, _ts(1, 2), 2, "view"),
        (5, _ts(1, 1), 2, "click"),
        # user 3: view and click at the SAME instant -> strict > breaks
        (6, _ts(1, 1), 3, "view"),
        (7, _ts(1, 1), 3, "click"),
        # user 4 never views -> absent
        (8, _ts(1, 1), 4, "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = {
        r["user_id"]: (r["depth"], r["t1"], r["t2"], r["t3"])
        for r in timeseries.funnel(df, ["view", "click", "buy"]).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1][0] == 3 and None not in out[1][1:]
    assert out[2][0] == 1 and out[2][2] is None
    assert out[3][0] == 1
    # chain breaks imply suffix NULLs
    assert out[2][3] is None and out[3][3] is None


def test_funnel_greedy_earliest_is_optimal(spark):
    # A later view would let click at t=2 count, but greedy-earliest
    # still completes via the click at t=4: min never loses keys.
    rows = [
        (1, _ts(1, 1), 1, "view"),
        (2, _ts(1, 3), 1, "view"),
        (3, _ts(1, 4), 1, "click"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = timeseries.funnel(df, ["view", "click"]).collect()[0]
    assert out["depth"] == 2
    assert out["t1"] < out["t2"]


def test_funnel_equals_brute_force_randomized(spark):
    rng = random.Random(29)
    base = dt.datetime(2024, 1, 1)
    types = ["a", "b", "c", "x"]
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(10_000)),
            rng.randrange(8),
            rng.choice(types),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        r["user_id"]: r["depth"]
        for r in timeseries.funnel(df, ["a", "b", "c"]).collect()
    }
    for u in range(8):
        evs = sorted((ts, t) for (_, ts, uu, t) in rows if uu == u)
        cur, depth = None, 0
        for step in ["a", "b", "c"]:
            nxt = [ts for (ts, t) in evs if t == step and (cur is None or ts > cur)]
            if not nxt:
                break
            cur = min(nxt)
            depth += 1
        if depth == 0:
            assert u not in got
        else:
            assert got[u] == depth, f"user {u}"


def test_funnel_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, _ts(1, 1), 1, "view"), (2, _ts(1, 2), 1, "click")],
        ["event_id", "ts", "user_id", "event_type"],
    )
    plan = (
        timeseries.funnel(df, ["view", "click"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------


def test_retention_hand_case(spark):
    d0, d1, d2 = _ts(1, 5), _ts(2, 5), _ts(3, 5)
    rows = [
        (1, d0, 1), (2, d1, 1), (3, d2, 1),     # user 1: offsets 0,1,2
        (4, d1, 2), (5, d1, 2),                  # user 2: cohort day1, offset 0 once
        (6, d0, 3), (7, d2, 3),                  # user 3: offsets 0,2
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    out = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in timeseries.retention(df, period_seconds=86_400).collect()
    }
    day0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert out[(day0, 0)] == 2      # users 1, 3
    assert out[(day0, 1)] == 1      # user 1
    assert out[(day0, 2)] == 2      # users 1, 3
    assert out[(day0 + 1, 0)] == 1  # user 2, counted once
    assert len(out) == 4


def test_retention_equals_brute_force_randomized(spark):
    rng = random.Random(37)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(400_000)), rng.randrange(10))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in timeseries.retention(df, period_seconds=86_400).collect()
    }
    buckets = {}
    for (_, ts, u) in rows:
        b = int((ts - dt.datetime(1970, 1, 1)).total_seconds()) // 86_400
        buckets.setdefault(u, set()).add(b)
    want = {}
    for u, bs in buckets.items():
        c = min(bs)
        for b in bs:
            want[(c, b - c)] = want.get((c, b - c), 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_brute_force_keys(spark):
    rows = [(i, f"doc {i}", (i % 7) + 1) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    out = sampling.weighted_sample(df, k=10, weight_col="n_chars").collect()
    assert len(out) == 10
    # Recompute every key driver-side from the same md5 hash and check
    # the selection is exactly the 10 largest.
    import hashlib

    def key(i, w):
        h = int(hashlib.md5(f"wsample_{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 1) / 4294967296.0) / w, 12)

    want = sorted(
        ((key(i, w), -i) for (i, _, w) in rows), reverse=True
    )[:10]
    want_ids = sorted(-x[1] for x in want)
    assert sorted(r["doc_id"] for r in out) == want_ids
    for r in out:
        assert r["sample_key"] == pytest.approx(key(r["doc_id"], r["w"]), abs=1e-12)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, "a", 0), (2, "b", -3), (3, "c", 5)], ["doc_id", "text", "n_chars"]
    )
    out = sampling.weighted_sample(df, k=10, weight_col="n_chars").collect()
    assert [r["doc_id"] for r in out] == [3]


def test_weighted_sample_lowers_to_take_ordered(spark):
    df = spark.createDataFrame(
        [(i, "x", i + 1) for i in range(20)], ["doc_id", "text", "n_chars"]
    )
    plan = (
        sampling.weighted_sample(df, k=5, weight_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


@pytest.fixture()
def dsir_docs(spark):
    tgt = [
        (i, "high quality prose with varied careful words number " + str(i), "en")
        for i in range(8)
    ]
    raw = [
        (100 + i, "spam spam buy now click here spam buy " + str(i), "de")
        for i in range(8)
    ]
    return spark.createDataFrame(tgt + raw, ["doc_id", "text", "lang"])


def test_dsir_prefers_target_like_documents(spark, dsir_docs):
    out = curation.dsir_weights(
        dsir_docs, dsir_docs.filter(F.col("lang") == "en"), n_buckets=256
    ).collect()
    w = {r["doc_id"]: r["dsir_logw"] for r in out}
    tgt_mean = sum(w[i] for i in range(8)) / 8
    raw_mean = sum(w[100 + i] for i in range(8)) / 8
    # Target-like docs must score strictly higher than the spam slice.
    assert tgt_mean > raw_mean + 1.0
    assert len(out) == 16


def test_dsir_feature_counts_are_distinct_bigrams(spark, dsir_docs):
    out = {
        r["doc_id"]: r["n_feats"]
        for r in curation.dsir_weights(
            dsir_docs, dsir_docs.limit(1), n_buckets=256
        ).collect()
    }
    # 9 tokens -> 8 distinct bigrams (all unique in the constructed text)
    assert out[0] == 8


def test_dsir_model_join_broadcasts(spark, dsir_docs):
    plan = (
        curation.dsir_weights(dsir_docs, dsir_docs.limit(4), n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# bloom_contamination
# ---------------------------------------------------------------------------


def test_bloom_flags_superset_of_exact_contamination(spark):
    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(60)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ev = df.filter(F.col("doc_id") % 10 == 0)
    exact = {
        r["doc_id"]: r["n_hit"]
        for r in curation.contamination(df, ev, n=3).collect()
    }
    bloom = {
        r["doc_id"]: r["n_flagged"]
        for r in curation.bloom_contamination(df, ev, n=3).collect()
    }
    # One-sided error: every exact hit is flagged (no false negatives).
    for d, hits in exact.items():
        assert bloom[d] >= hits
    # Eval docs themselves are fully flagged.
    assert bloom[0] == exact[0]
    ngrams = {
        r["doc_id"]: r["n_ngrams"]
        for r in curation.bloom_contamination(df, ev, n=3).collect()
    }
    assert all(bloom[d] == ngrams[d] for d in (0, 10, 20, 30))


def test_bloom_tiny_filter_false_positives(spark):
    # An 8-bit filter saturates: everything collides -> all flagged.
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "v w x y z")], ["doc_id", "text"]
    )
    ev = df.filter("doc_id = 1")
    out = {
        r["doc_id"]: (r["n_flagged"], r["n_ngrams"])
        for r in curation.bloom_contamination(
            df, ev, n=3, m_bits=2, k_hashes=1
        ).collect()
    }
    assert out[2][0] > 0  # false positive by construction
    assert out[1][0] == out[1][1]


def test_bloom_filter_broadcasts(spark):
    df = spark.createDataFrame(
        [(i, f"a b c d e f g {i}") for i in range(10)], ["doc_id", "text"]
    )
    plan = (
        curation.bloom_contamination(df, df.limit(2), n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "ab cd", "en"),   # 2 words, 2 subwords, 5 bytes
            (2, "a1b", "en"),     # 1 word, 3 subwords (a|1|b), 3 bytes
            (3, "xyz", "de"),     # 1 word, 1 subword, 3 bytes
        ],
        ["doc_id", "text", "lang"],
    )
    out = {r["grp"]: r for r in text.tokenizer_fertility(df).collect()}
    en = out["en"]
    assert (en["n_docs"], en["n_words"], en["n_subwords"], en["n_bytes"]) == (
        2,
        3,
        5,
        8,
    )
    assert en["fertility"] == pytest.approx(5 / 3, abs=1e-4)
    assert en["bytes_per_token"] == pytest.approx(8 / 5, abs=1e-4)
    de = out["de"]
    assert (de["n_words"], de["n_subwords"], de["n_bytes"]) == (1, 1, 3)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def test_asof_join_basic(spark):
    pts = spark.createDataFrame(
        [
            (1, 1, _ts(1, 10)),
            (2, 1, _ts(1, 12)),
            (3, 2, _ts(1, 9)),   # no prior quote -> NULLs
        ],
        ["event_id", "user_id", "ts"],
    )
    qts = spark.createDataFrame(
        [
            (100, 1, _ts(1, 9), 5.0),
            (101, 1, _ts(1, 12), 7.0),  # exactly at point 2's ts -> visible
            (102, 2, _ts(1, 11), 9.0),
        ],
        ["quote_id", "user_id", "ts", "value"],
    )
    from declarative_dataflow_spark.operators import timeseries

    out = {
        r["event_id"]: (r["asof_quote_id"], r["asof_value"])
        for r in timeseries.asof_join(pts, qts, on=["user_id"]).collect()
    }
    assert out[1] == (100, 5.0)
    assert out[2] == (101, 7.0)
    assert out[3] == (None, None)


def test_asof_join_equals_brute_force_randomized(spark):
    rng = random.Random(23)
    base = dt.datetime(2024, 1, 1)
    pts = [
        (i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(50_000)))
        for i in range(150)
    ]
    qts = [
        (
            1000 + j,
            rng.randrange(3),
            base + dt.timedelta(seconds=rng.randrange(50_000)),
            float(j),
        )
        for j in range(60)
    ]
    from declarative_dataflow_spark.operators import timeseries

    p = spark.createDataFrame(pts, ["event_id", "user_id", "ts"])
    q = spark.createDataFrame(qts, ["quote_id", "user_id", "ts", "value"])
    got = {
        r["event_id"]: (r["asof_quote_id"], r["asof_value"])
        for r in timeseries.asof_join(p, q, on=["user_id"]).collect()
    }
    for (i, u, t) in pts:
        cand = [(qid, qu, qt, v) for (qid, qu, qt, v) in qts if qu == u and qt <= t]
        if not cand:
            assert got[i] == (None, None)
        else:
            best = max(cand, key=lambda c: (c[2], c[0]))
            assert got[i] == (best[0], best[3]), f"point {i}"


def test_asof_join_plan_has_no_join_operator(spark):
    from declarative_dataflow_spark.operators import timeseries

    pts = spark.createDataFrame(
        [(1, 1, _ts(1, 10))], ["event_id", "user_id", "ts"]
    )
    qts = spark.createDataFrame(
        [(100, 1, _ts(1, 9), 5.0)], ["quote_id", "user_id", "ts", "value"]
    )
    plan = (
        timeseries.asof_join(pts, qts, on=["user_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window, no inequality join


# ---------------------------------------------------------------------------
# zorder
# ---------------------------------------------------------------------------


def _morton(vals, bits):
    key = 0
    n = len(vals)
    for j, v in enumerate(vals):
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * n + (n - 1 - j))
    return key


def test_zorder_key_hand_case(spark):
    from declarative_dataflow_spark import layout

    df = spark.createDataFrame([(0b101, 0b011)], ["x", "y"])
    out = df.select(layout.zorder_key(["x", "y"], bits=3).alias("z")).collect()
    # interleave: x bits in odd lanes (higher), y bits in even lanes
    assert out[0]["z"] == _morton((0b101, 0b011), 3) == 0b100111


def test_zorder_key_matches_python_morton_randomized(spark):
    from declarative_dataflow_spark import layout

    rng = random.Random(31)
    rows = [(i, rng.randrange(1 << 16), rng.randrange(1 << 16)) for i in range(300)]
    df = spark.createDataFrame(rows, ["i", "x", "y"])
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", layout.zorder_key(["x", "y"], bits=16).alias("z")
        ).collect()
    }
    for (i, x, y) in rows:
        assert got[i] == _morton((x, y), 16)


def test_zorder_key_rejects_overflow(spark):
    from declarative_dataflow_spark import layout

    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b", "c"], bits=21)


def test_zorder_layout_tightens_per_partition_ranges(spark):
    """Range-partitioning by the z-key keeps BOTH dimensions' min/max
    spans narrow inside each partition — the property parquet min/max
    pruning feeds on. Compare against partitioning by x alone, where
    the y spans stay corpus-wide."""

    from declarative_dataflow_spark import layout

    rng = random.Random(5)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(4096)]
    df = spark.createDataFrame(rows, ["x", "y"]).coalesce(4)

    def mean_span(frame, col):
        import math as m

        parts = (
            frame.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r["span"] for r in parts) / len(parts)

    z = layout.zorder_layout(df, ["x", "y"], bits=8, partitions=16)
    by_x = df.repartitionByRange(16, "x")
    # z-order: both dims localized; 16 partitions over a 256x256 grid
    # should leave mean spans well under half the domain in each dim.
    assert mean_span(z, "x") < 128
    assert mean_span(z, "y") < 128
    # single-dim layout: the other dimension stays corpus-wide.
    assert mean_span(by_x, "y") > 200


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_hand_cases(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "aaaa"), (3, ""), (4, "abcd")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
    assert out[1]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[1]["n_distinct"] == 2 and out[1]["n_chars"] == 4
    # one-symbol alphabet: exactly 0.0, never -0.0
    assert out[2]["entropy"] == 0.0 and math.copysign(1, out[2]["entropy"]) == 1
    assert out[3] ["n_chars"] == 0 and out[3]["entropy"] == 0.0
    assert out[4]["entropy"] == pytest.approx(math.log(4), abs=1e-6)


def test_char_entropy_is_map_only(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    plan = (
        text.char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# blocklist_filter
# ---------------------------------------------------------------------------


def test_blocklist_word_delimited_matching(spark):
    df = spark.createDataFrame(
        [
            (1, "the assembly passed cleanly"),   # 'ass' must NOT match
            (2, "what an ass he was"),
            (3, "a slow scan is bad"),            # phrase match
            (4, "slow is fine scan is fine"),     # phrase NOT adjacent
            (5, "totally clean text here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_blocked"], r["blocked"])
        for r in text.blocklist_filter(df, ["ass", "slow scan"]).collect()
    }
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    assert out[3] == (1, True)
    assert out[4] == (0, False)
    assert out[5] == (0, False)


def test_blocklist_counts_distinct_phrases(spark):
    df = spark.createDataFrame(
        [(1, "bad worse bad worse terrible")], ["doc_id", "text"]
    )
    out = text.blocklist_filter(df, ["bad", "worse", "absent"]).collect()[0]
    # distinct phrases hit, not occurrences
    assert out["n_blocked"] == 2


def test_blocklist_empty_list_blocks_nothing(spark):
    df = spark.createDataFrame([(1, "anything")], ["doc_id", "text"])
    out = text.blocklist_filter(df, []).collect()[0]
    assert out["n_blocked"] == 0 and out["blocked"] is False


def test_blocklist_broadcasts_phrase_set(spark):
    df = spark.createDataFrame(
        [(i, f"word soup {i}") for i in range(20)], ["doc_id", "text"]
    )
    plan = (
        text.blocklist_filter(df, ["soup", "word soup"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_blocklist_column_equals_join_form(spark):
    """The row-local arrays_overlap form (streaming gate) flags
    exactly the docs the join-based blocklist_filter flags."""

    rng = random.Random(41)
    vocab = ["alpha", "beta", "gamma", "delta", "slow", "scan", "ass"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(8))) for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    phrases = ["ass", "slow scan", "beta gamma delta"]
    via_join = {
        r["doc_id"]: r["blocked"]
        for r in text.blocklist_filter(df, phrases).collect()
    }
    via_col = {
        r["doc_id"]: r["b"]
        for r in df.select(
            "doc_id", text.blocklist_column(phrases).alias("b")
        ).collect()
    }
    assert via_join == via_col


def test_char_entropy_column_equals_operator(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "aaaa"), (3, ""), (4, "mixed bag of chars")],
        ["doc_id", "text"],
    )
    via_op = {
        r["doc_id"]: r["entropy"] for r in text.char_entropy(df).collect()
    }
    via_col = {
        r["doc_id"]: r["e"]
        for r in df.select(
            "doc_id", text.char_entropy_column().alias("e")
        ).collect()
    }
    assert via_op == via_col


# ---------------------------------------------------------------------------
# hash_embed
# ---------------------------------------------------------------------------


def test_hash_embed_unit_norm_and_determinism(spark):
    df = spark.createDataFrame(
        [
            (1, "spark query engine"),
            (2, "spark query engine"),
            (3, "completely different words here"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: [r[f"e{i}"] for i in range(16)] for r in text.hash_embed(df, dim=16).collect()}
    # identical docs -> identical vectors
    assert out[1] == out[2]
    # unit L2 norm (within rounding)
    assert sum(x * x for x in out[1]) == pytest.approx(1.0, abs=1e-4)
    # different text -> different vector
    assert out[1] != out[3]
    # empty text -> hash of '' still lands somewhere; norm 1 vector
    assert sum(abs(x) for x in out[4]) > 0


def test_hash_embed_cosine_geometry(spark):
    # shared-vocabulary docs are closer than disjoint-vocabulary docs
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),
            (3, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: [r[f"e{i}"] for i in range(16)] for r in text.hash_embed(df, dim=16).collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(out[1], out[2]) > cos(out[1], out[3])


def test_hash_embed_single_aggregation(spark):
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = text.hash_embed(df)._jdf.queryExecution().executedPlan().toString()
    # one shuffle: the doc_id aggregation (AQE wraps it; no join at all)
    assert "Join" not in plan


def test_hash_embed_feeds_semdedup(spark):
    """Composition: model-free embeddings straight into SemDeDup —
    duplicate documents pair up through the kmeans-bucketed path."""

    rows = [(i, "the quick brown fox jumps high") for i in range(3)] + [
        (10 + i, f"totally unrelated text number {i} with words") for i in range(6)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    emb = text.hash_embed(df, dim=16).select(
        F.col("doc_id").alias("vec_id"),
        F.array(*[f"e{i}" for i in range(16)]).alias("embedding"),
    )
    pairs = sorted(
        (r["a"], r["b"])
        for r in curation.semdedup(emb, k=2, iters=1, threshold=0.999).collect()
    )
    assert [(0, 1), (0, 2), (1, 2)] == [p for p in pairs if p[0] < 10]


# ---------------------------------------------------------------- resample


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "value"]
    )


def test_resample_locf_gap_fill(spark):
    # obs at 0s (v=1) and 3h+10s (v=2), hourly grid: ticks 0..3 all
    # carry v=1 (tick 3 = 10800s predates the 10810s observation);
    # the final observation sits off-grid so it emits nothing.
    df = _mk_events(
        spark,
        [
            (1, dt.datetime(1970, 1, 1, 0, 0, 0), 7, 1.0),
            (2, dt.datetime(1970, 1, 1, 3, 0, 10), 7, 2.0),
        ],
    )
    out = sorted(
        (r["grid_us"], r["value"])
        for r in timeseries.resample_locf(df, grid_seconds=3600).collect()
    )
    assert out == [(i * 3_600_000_000, 1.0) for i in range(4)]


def test_resample_locf_on_grid_and_ties(spark):
    # two observations at the SAME timestamp: the higher event_id wins
    # (max_by total order); an observation exactly on a grid tick is
    # visible at that tick.
    df = _mk_events(
        spark,
        [
            (1, dt.datetime(1970, 1, 1, 2, 0, 0), 7, 10.0),
            (2, dt.datetime(1970, 1, 1, 2, 0, 0), 7, 20.0),
        ],
    )
    out = [
        (r["grid_us"], r["value"])
        for r in timeseries.resample_locf(df, grid_seconds=3600).collect()
    ]
    assert out == [(7_200_000_000, 20.0)]


def test_resample_locf_matches_bruteforce(spark):
    rng = random.Random(42)
    rows = []
    eid = 0
    for user in range(5):
        for _ in range(rng.randint(1, 30)):
            eid += 1
            secs = rng.randint(0, 86_400)
            rows.append(
                (
                    eid,
                    dt.datetime(1970, 1, 1) + dt.timedelta(seconds=secs),
                    user,
                    float(rng.randint(0, 100)),
                )
            )
    grid = 1800
    got = sorted(
        (r["user_id"], r["grid_us"], r["value"])
        for r in timeseries.resample_locf(
            _mk_events(spark, rows), grid_seconds=grid
        ).collect()
    )

    # brute force: per key, latest (ts, event_id) observation <= tick
    exp = []
    by_user = {}
    for e, ts, u, v in rows:
        by_user.setdefault(u, []).append((ts.timestamp(), e, v))
    for u, obs in by_user.items():
        obs.sort()
        lo_t = min(t for t, _, _ in obs)
        hi_t = max(t for t, _, _ in obs)
        tick = math.ceil(lo_t / grid)
        while tick * grid <= hi_t:
            best = max((t, e, v) for t, e, v in obs if t <= tick * grid)
            exp.append((u, tick * grid * 1_000_000, best[2]))
            tick += 1
    assert got == sorted(exp)


def test_resample_locf_no_nested_loop(spark):
    df = _mk_events(spark, [(1, dt.datetime(1970, 1, 1), 1, 1.0)])
    plan = (
        timeseries.resample_locf(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------- z-score


def test_rolling_zscore_flags_spike(spark):
    rows = [
        (i, dt.datetime(1970, 1, 1) + dt.timedelta(hours=i), 7, 10.0)
        for i in range(1, 9)
    ] + [(9, dt.datetime(1970, 1, 1, 9), 7, 100.0)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = timeseries.rolling_zscore(
        df, window_seconds=86_400, min_n=8, threshold=2.0
    ).collect()
    assert [(r["event_id"], r["value"]) for r in out] == [(9, 100.0)]
    # z of the spike against 8x10 + 1x100: mean 20, std 28.28 -> ~2.83
    assert abs(out[0]["z"] - 2.828427) < 1e-5


def test_rolling_zscore_min_n_guard(spark):
    # 3 events: even a wild spike is unflagged below min_n support
    rows = [
        (1, dt.datetime(1970, 1, 1, 0), 7, 10.0),
        (2, dt.datetime(1970, 1, 1, 1), 7, 10.0),
        (3, dt.datetime(1970, 1, 1, 2), 7, 9999.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    assert (
        timeseries.rolling_zscore(df, min_n=8, threshold=2.0).count() == 0
    )


def test_rolling_zscore_matches_bruteforce(spark):
    rng = random.Random(13)
    rows = []
    for eid in range(1, 120):
        rows.append(
            (
                eid,
                dt.datetime(1970, 1, 1)
                + dt.timedelta(seconds=rng.randint(0, 200_000)),
                rng.randrange(3),
                float(rng.randint(0, 60)),
            )
        )
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    win, min_n, thr = 50_000, 5, 1.5
    got = {
        r["event_id"]: r["z"]
        for r in timeseries.rolling_zscore(
            df, window_seconds=win, min_n=min_n, threshold=thr
        ).collect()
    }
    exp = {}
    for eid, ts, u, v in rows:
        t = ts.timestamp()
        peers = [
            w
            for _, ts2, u2, w in rows
            if u2 == u and t - win <= ts2.timestamp() <= t
        ]
        n = len(peers)
        if n < min_n:
            continue
        mean = sum(peers) / n
        var = max(sum(x * x for x in peers) / n - mean * mean, 0.0)
        if var == 0:
            continue
        z = round((v - mean) / (var ** 0.5), 6)
        if abs(z) > thr:
            exp[eid] = z
    assert set(got) == set(exp)
    for eid in exp:
        assert abs(got[eid] - exp[eid]) < 1e-6, eid


# ---------------------------------------------------------------------------
# Property gates: interval_join and asof_join vs DuckDB (random data)
# ---------------------------------------------------------------------------

import os as _os

import duckdb as _duckdb
from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_PROP_TS = _settings(
    max_examples=int(_os.environ.get("SPARK_GRAFT_PROP_EXAMPLES", "50")) // 2,
    deadline=None,
    suppress_health_check=[_HealthCheck.too_slow],
)

_points = _st.lists(
    _st.tuples(_st.integers(0, 1), _st.integers(0, 40)),
    min_size=1,
    max_size=15,
)
_intervals = _st.lists(
    _st.tuples(_st.integers(0, 1), _st.integers(0, 40), _st.integers(0, 20)),
    min_size=1,
    max_size=10,
)


@_PROP_TS
@_given(points=_points, intervals=_intervals)
def test_prop_interval_join_matches_duckdb(spark, points, intervals):
    """The bucketized interval join (explode-by-bucket + residual
    filter) equals a plain range-predicate join — inclusive on BOTH
    ends — for random points and intervals, including intervals that
    span many buckets and zero-length intervals."""

    from pyspark.sql import functions as F

    from declarative_dataflow_spark.operators.timeseries import interval_join

    p_rows = [(k, i, s) for i, (k, s) in enumerate(points)]
    i_rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(intervals)]
    pdf = spark.createDataFrame(p_rows, ["k", "pid", "sec"]).select(
        "k", "pid", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    idf = spark.createDataFrame(i_rows, ["k", "iid", "s", "e"]).select(
        "k",
        "iid",
        F.timestamp_seconds(F.col("s")).alias("start"),
        F.timestamp_seconds(F.col("e")).alias("end"),
    )
    # bucket deliberately small (5s) so intervals span many buckets
    out = interval_join(pdf, idf, ["k"], bucket_seconds=5)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())

    con = _duckdb.connect()
    try:
        con.execute("CREATE TABLE p (k BIGINT, pid BIGINT, sec BIGINT)")
        con.execute(
            "CREATE TABLE iv (k BIGINT, iid BIGINT, s BIGINT, e BIGINT)"
        )
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", p_rows)
        con.executemany("INSERT INTO iv VALUES (?, ?, ?, ?)", i_rows)
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT pid, iid FROM p JOIN iv USING (k) "
                "WHERE sec >= s AND sec <= e"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


_quotes = _st.lists(
    _st.tuples(_st.integers(0, 1), _st.integers(0, 40), _st.integers(0, 99)),
    min_size=1,
    max_size=12,
)


@_PROP_TS
@_given(points=_points, quotes=_quotes)
def test_prop_asof_join_matches_duckdb(spark, points, quotes):
    """The union+window as-of join (no inequality join in the plan)
    equals the classic formulation: for each point, the latest quote
    with quote_ts <= point_ts on the same key, ties on quote_ts
    resolved to the highest quote id, points without a prior quote
    keeping NULLs."""

    from pyspark.sql import functions as F

    from declarative_dataflow_spark.operators.timeseries import asof_join

    p_rows = [(k, i, s) for i, (k, s) in enumerate(points)]
    q_rows = [(k, i, s, v) for i, (k, s, v) in enumerate(quotes)]
    pdf = spark.createDataFrame(p_rows, ["k", "event_id", "sec"]).select(
        "k", "event_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    qdf = spark.createDataFrame(
        q_rows, ["k", "quote_id", "sec", "value"]
    ).select(
        "k",
        "quote_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    out = asof_join(pdf, qdf, ["k"])
    got = sorted(
        (r["event_id"], r["asof_quote_id"], r["asof_value"])
        for r in out.collect()
    )

    con = _duckdb.connect()
    try:
        con.execute("CREATE TABLE p (k BIGINT, pid BIGINT, sec BIGINT)")
        con.execute(
            "CREATE TABLE q (k BIGINT, qid BIGINT, sec BIGINT, v BIGINT)"
        )
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", p_rows)
        con.executemany("INSERT INTO q VALUES (?, ?, ?, ?)", q_rows)
        want = sorted(
            tuple(r)
            for r in con.execute(
                "SELECT pid, "
                "(SELECT qid FROM q WHERE q.k = p.k AND q.sec <= p.sec "
                " ORDER BY q.sec DESC, qid DESC LIMIT 1) AS aqid, "
                "(SELECT CAST(v AS DOUBLE) FROM q WHERE q.k = p.k "
                " AND q.sec <= p.sec "
                " ORDER BY q.sec DESC, qid DESC LIMIT 1) AS av "
                "FROM p"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


def test_changepoint_step_function(spark):
    """A clean level shift (0 -> 10 at day 11) must put the max
    mean_shift exactly at the boundary bucket with the full step
    height, zero shift deep inside the flat regions, and only
    full-window buckets in the output."""

    rows = []
    for day in range(1, 21):  # Jan 1..20
        v = 0.0 if day <= 10 else 10.0
        rows.append(("k", _ts(day, 1), v))
        rows.append(("k", _ts(day, 13), v))
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        r["bucket"]: r
        for r in timeseries.changepoint(df, window=3).collect()
    }
    # 20 daily buckets, both 3-wide windows full => buckets 4..18
    # (1-indexed days; bucket ids are epoch days)
    day1 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert len(out) == 15 and min(out) == day1 + 3 and max(out) == day1 + 17
    boundary = out[day1 + 10]  # left = days 8,9,10; right = days 11,12,13
    assert boundary["left_mean"] == 0.0
    assert boundary["right_mean"] == 10.0
    assert boundary["mean_shift"] == 10.0
    assert max(r["mean_shift"] for r in out.values()) == 10.0
    assert out[day1 + 3]["mean_shift"] == 0.0   # deep in the flat left
    assert out[day1 + 17]["mean_shift"] == 0.0  # deep in the flat right


def test_changepoint_weights_by_event_count(spark):
    """Window means weight buckets by their EVENT counts (sum/sum),
    not a mean-of-daily-means: a day with two 6.0 events and a day
    with one 0.0 event average to 4.0, not 3.0."""

    rows = [
        ("k", _ts(1, 1), 6.0),
        ("k", _ts(1, 2), 6.0),
        ("k", _ts(2, 1), 0.0),
        ("k", _ts(3, 1), 1.0),
        ("k", _ts(4, 1), 1.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {
        r["bucket"]: r
        for r in timeseries.changepoint(df, window=2).collect()
    }
    day1 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    r = out[day1 + 2]  # left = days 1,2 (3 events), right = days 3,4
    assert r["left_mean"] == 4.0
    assert r["right_mean"] == 1.0
    assert r["mean_shift"] == 3.0
    # min_shift filters
    kept = timeseries.changepoint(df, window=2, min_shift=2.5).collect()
    assert [k["bucket"] for k in kept] == [day1 + 2]


_cp_events = _st.lists(
    _st.tuples(
        _st.integers(0, 1),        # key
        _st.integers(0, 12),       # day
        _st.integers(0, 23),       # hour
        _st.integers(-1000, 1000),  # value in hundredths
    ),
    min_size=1,
    max_size=30,
)


@_PROP_TS
@_given(events=_cp_events)
def test_prop_changepoint_matches_duckdb(spark, events):
    """changepoint == the DuckDB two-sided ROWS-frame formulation on
    random sparse multi-key event sets — including duplicate
    (key, day) rows (count weighting), GAPPED day sequences (ROWS
    frames skip missing days in both engines), and negative values."""

    from declarative_dataflow_spark.operators.timeseries import changepoint

    rows = [
        (f"k{k}", dt.datetime(2024, 1, 1 + d, h), v / 100.0)
        for (k, d, h, v) in events
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    got = sorted(tuple(r) for r in changepoint(df, window=2).collect())

    con = _duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE ev (event_type VARCHAR, ts TIMESTAMP, "
            "value DOUBLE)"
        )
        con.executemany("INSERT INTO ev VALUES (?, ?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in con.execute(
                "WITH daily AS (SELECT event_type AS key, "
                "CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) "
                "AS bucket, sum(CAST(value AS DECIMAL(18,6))) AS s, "
                "count(*) AS c FROM ev GROUP BY 1, 2), "
                "win AS (SELECT key, bucket, "
                "count(*) OVER wl AS nl, sum(s) OVER wl AS sl, "
                "sum(c) OVER wl AS cl, count(*) OVER wr AS nr, "
                "sum(s) OVER wr AS sr, sum(c) OVER wr AS cr FROM daily "
                "WINDOW wl AS (PARTITION BY key ORDER BY bucket "
                "ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), "
                "wr AS (PARTITION BY key ORDER BY bucket "
                "ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING)) "
                "SELECT key, bucket, "
                "round(CAST(sl AS DOUBLE) / cl, 6), "
                "round(CAST(sr AS DOUBLE) / cr, 6), "
                "round(abs(CAST(sr AS DOUBLE) / cr - "
                "CAST(sl AS DOUBLE) / cl), 6) "
                "FROM win WHERE nl = 2 AND nr = 2"
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


@_PROP_TS
@_given(
    events=_st.lists(
        _st.tuples(
            _st.integers(0, 3),               # user
            _st.integers(0, 40),              # time (seconds-ish)
            _st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_prop_last_touch_attribution_matches_bruteforce(spark, events):
    """PROPERTY: last_touch_attribution == the obvious per-user scan
    (latest strictly-preceding touch by (tu, event_id) order; NULL for
    direct conversions; non-touch non-conversion types invisible)."""

    import datetime

    from declarative_dataflow_spark.operators import timeseries as T

    rows = [
        (
            i,
            datetime.datetime(2024, 1, 1)
            + datetime.timedelta(seconds=t),
            u,
            ty,
        )
        for i, (u, t, ty) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = sorted(
        (r["event_id"], r["touch_event_id"], r["touch_type"], r["gap_us"])
        for r in T.last_touch_attribution(df).collect()
    )

    base = datetime.datetime(2024, 1, 1)
    tu = {i: int((r[1] - base).total_seconds() * 1_000_000)
          for i, r in zip(range(len(rows)), rows)}
    want = []
    for i, (u, t, ty) in enumerate(events):
        if ty != "purchase":
            continue
        touches = [
            (tu[j], j)
            for j, (u2, _, ty2) in enumerate(events)
            if u2 == u
            and ty2 in ("view", "click")
            and (tu[j], j) < (tu[i], i)
        ]
        if touches:
            bt, bj = max(touches)
            want.append((i, bj, events[bj][2], tu[i] - bt))
        else:
            want.append((i, None, None, None))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# r11: ewma_dyadic / time_weighted_avg / transition_matrix / burstiness / rfm
# ---------------------------------------------------------------------------


@_PROP_TS
@_given(
    rows=_st.lists(
        _st.tuples(
            _st.integers(0, 1),            # user
            _st.integers(0, 50),           # second offset
            _st.integers(-400, 400),       # value in 0.25 steps
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_prop_ewma_matches_bruteforce(spark, rows):
    """PROPERTY: ewma_dyadic == the truncated dyadic convolution
    computed in plain Python Fractions (exact arithmetic — the
    operator's decimal chain must equal the mathematical value
    rounded HALF_UP to 6)."""

    from fractions import Fraction

    data = [
        (i, dt.datetime(2024, 1, 1, 0, 0, s), u, q / 4.0)
        for i, (u, s, q) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["event_id", "ts", "user_id", "value"])
    got = {
        r["event_id"]: r["ewma"]
        for r in timeseries.ewma_dyadic(df, taps=4).collect()
    }
    series = {}
    for i, (u, s, q) in enumerate(rows):
        series.setdefault(u, []).append((s, i, Fraction(q, 4)))
    want = {}
    for u, evs in series.items():
        evs.sort()
        for pos, (_, i, _) in enumerate(evs):
            acc = Fraction(0)
            for j in range(4):
                if pos - j >= 0:
                    # value quantized to 6 decimals first (the
                    # DECIMAL(18,6) cast), then the dyadic weight
                    v6 = round(evs[pos - j][2], 6)
                    acc += Fraction(v6).limit_denominator(10**7) * Fraction(
                        1, 2 ** (j + 1)
                    )
            # HALF_UP round to 6 in exact arithmetic
            scaled = acc * 10**6
            fl = scaled.numerator // scaled.denominator
            rem = scaled - fl
            want[i] = float(
                Fraction(fl + (1 if rem >= Fraction(1, 2) else 0), 10**6)
            )
    for i in got:
        assert abs(got[i] - want[i]) < 1e-12, (i, got[i], want[i])


@_PROP_TS
@_given(
    rows=_st.lists(
        _st.tuples(
            _st.integers(0, 1),
            _st.integers(0, 50),
            _st.integers(-40, 40),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_prop_twap_matches_bruteforce(spark, rows):
    """PROPERTY: time_weighted_avg == sum(v*gap)/sum(gap) computed in
    exact Fractions over each key's ordered series (keys with a single
    event vanish — no holding period)."""

    from fractions import Fraction

    data = [
        (i, dt.datetime(2024, 1, 1, 0, 0, s), u, q / 4.0)
        for i, (u, s, q) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["event_id", "ts", "user_id", "value"])
    got = {
        r["user_id"]: (r["n_holds"], r["held_us"], r["twap"])
        for r in timeseries.time_weighted_avg(df).collect()
    }
    series = {}
    for i, (u, s, q) in enumerate(rows):
        series.setdefault(u, []).append((s * 1_000_000, Fraction(q, 4)))
    want = {}
    for u, evs in series.items():
        evs.sort()
        if len(evs) < 2:
            continue
        num = Fraction(0)
        den = 0
        for (t0, v), (t1, _) in zip(evs, evs[1:]):
            num += round(v, 6) * (t1 - t0)
            den += t1 - t0
        # emulate the engines: IEEE double quotient, then HALF_UP on
        # the double's exact decimal expansion (Spark's round =
        # BigDecimal(double).setScale(6, HALF_UP))
        import decimal

        qd = float(Fraction(num, den))
        want_val = float(
            decimal.Decimal(qd).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )
        want[u] = (len(evs) - 1, den, want_val)
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0] and got[u][1] == want[u][1]
        assert abs(got[u][2] - want[u][2]) < 5e-7, (u, got[u], want[u])


def test_transition_matrix_counts_and_rows_normalize(spark):
    """Directed chain per user; probabilities row-normalize to 1 and
    counts match the hand-traced consecutive pairs."""

    rows = [
        (1, _ts(1, 0), 1, "a"),
        (2, _ts(1, 1), 1, "b"),
        (3, _ts(1, 2), 1, "a"),
        (4, _ts(1, 3), 1, "b"),
        (5, _ts(1, 0), 2, "a"),
        (6, _ts(1, 1), 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in timeseries.transition_matrix(df).collect()
    }
    # from 'a': a->b twice (user1), a->c once (user2); from 'b': b->a once
    assert got[("a", "b")] == (2, round(2 / 3, 6))
    assert got[("a", "c")] == (1, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1.0)
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    for f, s in sums.items():
        assert abs(s - 1.0) < 1e-5, (f, s)


@_PROP_TS
@_given(
    rows=_st.lists(
        _st.tuples(_st.integers(0, 1), _st.integers(0, 1000)),
        min_size=3,
        max_size=24,
        unique=True,
    )
)
def test_prop_burstiness_matches_bruteforce(spark, rows):
    """PROPERTY: burstiness == population variance/mean of integer
    second gaps (converted to seconds), computed in exact Fractions."""

    from fractions import Fraction

    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u)
        for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, ["event_id", "ts", "user_id"])
    got = {
        r["user_id"]: (r["n_gaps"], r["mean_gap_s"], r["dispersion_s"])
        for r in timeseries.burstiness(df).collect()
    }
    series = {}
    for i, (u, s) in enumerate(rows):
        series.setdefault(u, []).append(s * 1_000_000)
    want = {}
    for u, ts in series.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        if len(gaps) < 2:
            continue
        mean = Fraction(sum(gaps), len(gaps))
        var = Fraction(sum(g * g for g in gaps), len(gaps)) - mean * mean
        disp = var / mean if mean else None
        want[u] = (len(gaps), float(mean / 10**6), float(disp / 10**6))
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 5e-6
        assert abs(got[u][2] - want[u][2]) < 5e-6


def test_rfm_segments_banding_edges(spark):
    """Hand-pinned customers on the exact band boundaries: 30/90/365
    days, 2/5/10 orders, 1k/5k/20k revenue — the CASE ladders must be
    inclusive on the documented side."""

    base = dt.datetime(2024, 12, 31)
    rows = []
    # cust 1: newest order on corpus max (recency 0 -> r=4), 10 orders
    # of 2000 each (f=4, m=4 at 20k)
    for i in range(10):
        rows.append((100 + i, 1, 2000.0, base - dt.timedelta(days=i)))
    # cust 2: one order 366 days old, 500 total -> r=1, f=1, m=1
    rows.append((200, 2, 500.0, base - dt.timedelta(days=366)))
    # cust 3: two orders, newest exactly 90 days old, 5000 total
    # -> r=3 (<=90), f=2, m=3
    rows.append((300, 3, 2500.0, base - dt.timedelta(days=90)))
    rows.append((301, 3, 2500.0, base - dt.timedelta(days=100)))
    df = spark.createDataFrame(
        rows, ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )
    got = {
        r["custkey"]: (
            r["recency_days"], r["frequency"], r["r_score"],
            r["f_score"], r["m_score"], r["segment"],
        )
        for r in timeseries.rfm_segments(df).collect()
    }
    assert got[1] == (0, 10, 4, 4, 4, 444)
    assert got[2] == (366, 1, 1, 1, 1, 111)
    assert got[3] == (90, 2, 3, 2, 3, 323)


def test_top_paths_counts_and_tie_order(spark):
    """Hand-traced 3-step paths + the deterministic (n desc, path asc)
    cut; depth < 2 raises."""

    rows = [
        (1, _ts(1, 0), 1, "a"), (2, _ts(1, 1), 1, "b"),
        (3, _ts(1, 2), 1, "c"), (4, _ts(1, 3), 1, "a"),
        (5, _ts(1, 0), 2, "a"), (6, _ts(1, 1), 2, "b"),
        (7, _ts(1, 2), 2, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = [
        (r["t1"], r["t2"], r["t3"], r["n"])
        for r in timeseries.top_paths(df, top_k=2).collect()
    ]
    # paths: u1: abc, bca; u2: abc -> abc x2, bca x1; top-2 cut
    assert got == [("a", "b", "c", 2), ("b", "c", "a", 1)]
    with pytest.raises(ValueError, match="depth"):
        timeseries.top_paths(df, depth=1)


def test_seasonality_dow_and_shares(spark):
    """2024-01-01 was a Monday (dow 0); shares row-normalize per key;
    avg is the exact decimal mean."""

    rows = [
        (1, dt.datetime(2024, 1, 1), "click", 2.0),   # Monday
        (2, dt.datetime(2024, 1, 2), "click", 4.0),   # Tuesday
        (3, dt.datetime(2024, 1, 8), "click", 6.0),   # Monday
        (4, dt.datetime(2024, 1, 7), "view", 1.0),    # Sunday
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    got = {
        (r["event_type"], r["dow"]): (r["n"], r["share"], r["avg_value"])
        for r in timeseries.seasonality(df).collect()
    }
    assert got[("click", 0)] == (2, round(2 / 3, 6), 4.0)
    assert got[("click", 1)] == (1, round(1 / 3, 6), 4.0)
    assert got[("view", 6)] == (1, 1.0, 1.0)
