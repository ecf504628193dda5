"""Unit tests for the round-12 operators — each verified against an
INDEPENDENT pure-Python/numpy replica (the five-gate discipline's
third implementation), plus the op-specific invariants."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyspark.sql.functions as F

from pg_archiver_spark.catalog import load
from pg_archiver_spark.registry import QUERIES, load_all_operators

load_all_operators()


def _round6(x: float) -> float:
    return float(
        Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def test_mann_kendall_matches_python_replica(spark, sf_dir):
    rows = QUERIES["analytics_mann_kendall"](spark, sf_dir).collect()
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("p"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("c")
        )
        .collect()
    )
    series: dict[str, list[tuple[int, int]]] = {}
    for r in monthly:
        series.setdefault(r.p, []).append((r.m, int(r.c)))
    assert len(rows) == len(series)
    for r in rows:
        pts = sorted(series[r.priority])
        n = len(pts)
        s = sum(
            (1 if pts[j][1] > pts[i][1] else -1 if pts[j][1] < pts[i][1] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(c for _, c in pts)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        assert r.n_months == n
        assert r.s_stat == s
        assert r.var18 == var18
        assert abs(r.s_stat) <= n * (n - 1) // 2
        if s == 0:
            assert r.z_mk == 0.0
        else:
            z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
            assert r.z_mk == _round6(z)


def test_threshold_sweep_matches_python_replica(spark, sf_dir):
    rows = QUERIES["ml_confusion_threshold_sweep"](spark, sf_dir).collect()
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey", "o_orderstatus")
        .collect()
    )
    ranked = sorted(orders, key=lambda r: (r.o_totalprice, r.o_orderkey))
    n = len(ranked)
    scored = [
        ((i * 1000) // n, 1 if r.o_orderstatus == "F" else 0)
        for i, r in enumerate(ranked)
    ]
    assert [r.threshold_milli for r in rows] == list(range(100, 1000, 100))
    prev_tp = None
    for r in rows:
        t = r.threshold_milli
        tp = sum(1 for p, y in scored if p >= t and y == 1)
        fp = sum(1 for p, y in scored if p >= t and y == 0)
        fn = sum(1 for p, y in scored if p < t and y == 1)
        tn = n - tp - fp - fn
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        assert r.precision_pm == (tp * 1000 // (tp + fp) if tp + fp else -1)
        assert r.recall_pm == (tp * 1000 // (tp + fn) if tp + fn else -1)
        assert r.f1_pm == (
            2000 * tp // (2 * tp + fp + fn) if 2 * tp + fp + fn else -1
        )
        # monotone: raising the threshold can only shrink tp
        if prev_tp is not None:
            assert tp <= prev_tp
        prev_tp = tp
        assert tp + fn == sum(y for _, y in scored)  # positives constant


def test_ndcg_matches_numpy_replica(spark, sf_dir):
    from pg_archiver_spark.functions.similarity import (
        _KNN_BATCH_IDS,
        _NDCG_DISC,
        _NDCG_PREFIX,
        NDCG_K,
    )

    rows = QUERIES["ml_ndcg_at_k"](spark, sf_dir).collect()
    emb = load(spark, sf_dir, "embeddings").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb}
    labels = {r.vec_id: r.label for r in emb}
    assert len(rows) == len(_KNN_BATCH_IDS)
    for r in rows:
        q = r.query_id
        qv = vecs[q]
        sims = []
        for vid, v in vecs.items():
            if vid == q:
                continue
            c = float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            c4 = float(
                Decimal(c).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
            )
            sims.append((-c4, vid))
        sims.sort()
        topk = [vid for _, vid in sims[:NDCG_K]]
        rel = [1 if labels[v] == labels[q] else 0 for v in topk]
        dcg = sum(rl * _NDCG_DISC[i] for i, rl in enumerate(rel))
        m = sum(1 for v in labels if v != q and labels[v] == labels[q])
        idcg = _NDCG_PREFIX[min(m, NDCG_K)]
        assert r.n_corpus_rel == m
        assert r.n_rel_topk == sum(rel)
        assert r.dcg_milli == dcg
        assert r.idcg_milli == idcg
        assert r.dcg_milli <= r.idcg_milli  # never beats ideal
        if m:
            assert r.ndcg == _round6(dcg / idcg)
            assert 0.0 <= r.ndcg <= 1.0
        else:
            assert r.ndcg == -1.0


def test_countmin_matches_python_replica_and_never_undercounts(
    spark, sf_dir
):
    from pg_archiver_spark.operators.aggregates import CMS_DEPTH, CMS_WIDTH

    rows = QUERIES["agg_countmin_sketch"](spark, sf_dir).collect()
    keys = [
        int(r.k)
        for r in load(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("k"))
        .collect()
    ]

    def bucket(d: int, k: int) -> int:
        h = hashlib.md5(f"cm{d}|{k}".encode()).hexdigest()[:15]
        return int(h, 16) % CMS_WIDTH

    cells: dict[tuple[int, int], int] = {}
    true_cnt: dict[int, int] = {}
    for k in keys:
        true_cnt[k] = true_cnt.get(k, 0) + 1
        for d in range(CMS_DEPTH):
            cells[(d, bucket(d, k))] = cells.get((d, bucket(d, k)), 0) + 1

    def est(k: int) -> int:
        return min(cells[(d, bucket(d, k))] for d in range(CMS_DEPTH))

    tops = sorted(true_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r.l_partkey, r.true_cnt, r.est_cnt) for r in rows] == [
        (k, c, est(k)) for k, c in tops
    ]
    # CMS one-sided error: NEVER undercounts, for any key
    for k in list(true_cnt)[:200]:
        assert est(k) >= true_cnt[k]
    for r in rows:
        assert r.over_cnt == r.est_cnt - r.true_cnt
        assert r.over_cnt >= 0


def test_runs_test_matches_python_replica(spark, sf_dir):
    import statistics as st

    rows = QUERIES["analytics_runs_test"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    daily = sorted(
        (r2.day, int(r2.c))
        for r2 in load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("c")
        )
        .collect()
    )
    med = st.median([float(c) for _, c in daily])
    signs = [1 if c > med else -1 for _, c in daily if float(c) != med]
    n1 = sum(1 for s in signs if s == 1)
    n2 = len(signs) - n1
    n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert (r.n1, r.n2, r.n_runs) == (n1, n2, n_runs)
    e = 2.0 * n1 * n2 / (n1 + n2) + 1.0
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / (float(n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert r.z_runs == _round6((n_runs - e) / math.sqrt(var))
    # runs count bounds: 1 <= R <= n1 + n2
    assert 1 <= r.n_runs <= r.n1 + r.n2


def test_skew_kurtosis_matches_numpy_replica(spark, sf_dir):
    from pg_archiver_spark.operators.aggregates import SKEW_Q

    rows = QUERIES["agg_skew_kurtosis"](spark, sf_dir).collect()
    raw = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("p"),
            F.expr(
                f"CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                f" DIV {SKEW_Q}"
            ).alias("xq"),
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r2 in raw:
        groups.setdefault(r2.p, []).append(int(r2.xq))
    assert len(rows) == len(groups)
    for r in rows:
        xs = np.array(groups[r.priority], dtype=np.int64)
        n = len(xs)
        c = int(xs.sum()) // n
        dev = xs - c
        t = [int((dev.astype(object) ** k).sum()) for k in (1, 2, 3, 4)]
        assert (r.n_orders, r.q_anchor) == (n, c)
        assert (r.t2, r.t3, r.t4) == (t[1], t[2], t[3])
        # exact-int ladder headroom: T4 must stay below 2^53
        assert abs(t[3]) < 2**53
        d = t[0] / n
        r2_, r3_, r4_ = t[1] / n, t[2] / n, t[3] / n
        m2 = r2_ - d * d
        g1 = (r3_ - 3 * d * r2_ + 2 * d**3) / m2**1.5
        g2 = (r4_ - 4 * d * r3_ + 6 * d * d * r2_ - 3 * d**4) / m2**2 - 3.0
        assert r.skewness_g1 == _round6(g1)
        assert r.kurtosis_excess == _round6(g2)
        # sanity: numpy's own (population) moments agree to float tol
        mu, sd = xs.mean(), xs.std()
        np_g1 = float(((xs - mu) ** 3).mean() / sd**3)
        np_g2 = float(((xs - mu) ** 4).mean() / sd**4 - 3.0)
        assert abs(r.skewness_g1 - np_g1) < 1e-6
        assert abs(r.kurtosis_excess - np_g2) < 1e-6


def test_notify_push_archival_commit_then_notify_order(spark, sf_dir):
    rows = QUERIES["source_notify_push_archival"](spark, sf_dir).collect()
    ids = sorted(
        r.event_id
        for r in load(spark, sf_dir, "events").select("event_id").collect()
    )
    total = len(ids)
    # python replica of the rank-derived ID cuts and half-open ranges
    b = [((rn * 3) // total) for rn in range(total)]
    c1 = max(i for i, bb in zip(ids, b) if bb == 0)
    c2 = max(i for i, bb in zip(ids, b) if bb == 1)
    c3 = ids[-1]
    n1 = sum(1 for i in ids if i <= c1)
    n2 = sum(1 for i in ids if c1 < i <= c2)
    n3 = sum(1 for i in ids if c2 < i <= c3)
    assert [(r.batch, r.n_rows, r.watermark) for r in rows] == [
        (1, n1, c1),
        (2, n2, c2),
        (3, n3, c3),
    ]
    # watermark ledger strictly ascends — replays are idempotent
    wms = [r.watermark for r in rows]
    assert wms == sorted(wms) and len(set(wms)) == 3
    assert sum(r.n_rows for r in rows) == total  # exactly-once coverage


def test_brier_decomposition_identity_and_replica(spark, sf_dir):
    rows = QUERIES["ml_brier_decomposition"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    orders = (
        load(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey", "o_orderstatus")
        .collect()
    )
    ranked = sorted(orders, key=lambda x: (x.o_totalprice, x.o_orderkey))
    n = len(ranked)
    scored = [
        ((i * 1000) // n, 1 if x.o_orderstatus == "F" else 0)
        for i, x in enumerate(ranked)
    ]
    bins: dict[int, list[tuple[int, int]]] = {}
    for p, y in scored:
        bins.setdefault(p // 100, []).append((p, y))
    sy_tot = sum(y for _, y in scored)
    sq_tot = sum((p - 1000 * y) ** 2 for p, y in scored)
    rel_num = sum(
        (sum(p for p, _ in b) - 1000 * sum(y for _, y in b)) ** 2
        // len(b)
        for b in bins.values()
    )
    res_num = sum(
        (n * sum(y for _, y in b) - len(b) * sy_tot) ** 2 // len(b)
        for b in bins.values()
    )
    assert r.n == n
    assert r.brier == _round6(sq_tot / (n * 1e6))
    assert r.reliability == _round6(rel_num / (n * 1e6))
    assert r.resolution == _round6(res_num / n**3)
    assert r.uncertainty == _round6(sy_tot * (n - sy_tot) / n**2)
    # Generalized Murphy identity (Stephenson et al.): with forecasts
    # VARYING inside a bin, Brier = REL - RES + UNC + WBV - 2*WBC,
    # where WBV/WBC are the within-bin variance/covariance terms (zero
    # only for constant-per-bin forecasts). Verify it exactly from the
    # replica, up to the op's per-bin integer truncation + 6dp rounds.
    wbv = wbc = 0.0
    for b in bins.values():
        nk = len(b)
        pbar = sum(p for p, _ in b) / nk / 1000.0
        ybar = sum(y for _, y in b) / nk
        for p, y in b:
            wbv += (p / 1000.0 - pbar) ** 2
            wbc += (p / 1000.0 - pbar) * (y - ybar)
    wbv /= n
    wbc /= n
    gap = r.brier - (
        r.reliability - r.resolution + r.uncertainty + wbv - 2 * wbc
    )
    assert abs(gap) < 2e-5, gap
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9
    assert r.reliability >= 0.0 and r.resolution >= 0.0


def test_spearman_matches_scipy_style_replica(spark, sf_dir):
    rows = QUERIES["analytics_spearman_corr"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_quantity").cast("decimal(18,2)").alias("x"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
        )
        .collect()
    )
    xs = [float(row.x) for row in li]
    ys = [float(row.y) for row in li]
    n = len(xs)
    assert r.n == n

    def midrank(vals):
        order = sorted(range(n), key=lambda i: vals[i])
        ranks = [0.0] * n
        i = 0
        while i < n:
            j = i
            while j + 1 < n and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    rx, ry = midrank(xs), midrank(ys)
    mean_rx = sum(rx) / n
    mean_ry = sum(ry) / n
    num = sum((a - mean_rx) * (b - mean_ry) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mean_rx) ** 2 for a in rx)
        * sum((b - mean_ry) ** 2 for b in ry)
    )
    rho = num / den
    # the op's exact-integer path vs the float replica: agree to float
    # accumulation noise, well inside the 6dp output grid
    assert abs(r.spearman_rho - rho) < 1e-6
    assert -1.0 <= r.spearman_rho <= 1.0
    # midrank invariant: average ranks always sum to n(n+1)/2 exactly
    assert abs(sum(rx) - n * (n + 1) / 2) < 1e-9
    assert abs(sum(ry) - n * (n + 1) / 2) < 1e-9
    # the fixture's quantity and price are independent draws — the
    # null-calibration read: |rho| must be small (not a sign pin)
    assert abs(r.spearman_rho) < 0.1


def test_countmin_sketch_is_mergeable(spark, sf_dir):
    """CMS counters ADD: sketch(A ∪ B) == sketch(A) + sketch(B) cell
    by cell — the property that makes the sketch partition-parallel
    and stream-mergeable. Verified on the fixture key stream split in
    half (pure-python replica; no engine involvement needed — the
    bucket function is the op's md5 contract)."""
    from pg_archiver_spark.operators.aggregates import CMS_DEPTH, CMS_WIDTH

    keys = [
        int(r.l_partkey)
        for r in load(spark, sf_dir, "lineitem")
        .select("l_partkey")
        .collect()
    ]

    def bucket(d: int, k: int) -> int:
        h = hashlib.md5(f"cm{d}|{k}".encode()).hexdigest()[:15]
        return int(h, 16) % CMS_WIDTH

    def sketch(ks):
        c: dict[tuple[int, int], int] = {}
        for k in ks:
            for d in range(CMS_DEPTH):
                b = (d, bucket(d, k))
                c[b] = c.get(b, 0) + 1
        return c

    half = len(keys) // 2
    a, b, whole = sketch(keys[:half]), sketch(keys[half:]), sketch(keys)
    merged: dict[tuple[int, int], int] = dict(a)
    for cell, v in b.items():
        merged[cell] = merged.get(cell, 0) + v
    assert merged == whole
