"""Per-operator unit tests for round-9 batch S (q268-q273) -- the six
operators the round-8 snapshot commit shipped without evidence
(VERDICT r8 item 3). Each test pins the exact-integer contract on a
tiny hand-built frame where the expected output is computable by hand
or by an independent sequential reference, plus partition invariance
for the window-dependent ones."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pos_data_insertion_etl_spark.operators.graph import (
    local_clustering_coefficient,
)
from pos_data_insertion_etl_spark.operators.scoring import (
    isotonic_calibrate_bins,
)
from pos_data_insertion_etl_spark.operators.stats import (
    anova_oneway,
    neyman_allocation,
    wilson_intervals,
)
from pos_data_insertion_etl_spark.operators.survival import kaplan_meier

# ------------------------------------------------ q267 control twin


def test_mixture_twin_is_exact_control():
    """q267's whole point is A/B isolation of name-keyed driver state:
    it must stay byte-identical to q131 in oracle SQL and share the
    same underlying callable semantics (same module function chain).
    If either drifts, the twin experiment stops being a control."""
    from pos_data_insertion_etl_spark.plans import all_queries

    qs = all_queries()
    q131, q267 = qs["q131_mixture_budget_sample"], qs["q267_mixture_budget_v2"]
    assert q131.oracle == q267.oracle
    import inspect

    # Both bodies call budgeted_mixture_sample with identical args.
    b131, b267 = inspect.getsource(q131.spark), inspect.getsource(q267.spark)
    for frag in (
        'budgeted_mixture_sample',
        '{"src0": 0.5, "src1": 0.3, "src2": 0.2}',
        "total_tokens=10_000",
        'size_col="n_chars"',
    ):
        assert frag in b131 and frag in b267, frag

# -------------------------------------------------- q268 Kaplan-Meier


def _km_reference(durations):
    """Sequential KM over (t, event) pairs: risk table + cumulative
    rounded-micro log-survival, NULL after survival hits zero."""
    from collections import defaultdict

    ev = defaultdict(int)
    ce = defaultdict(int)
    for t, e in durations:
        (ev if e else ce)[t] += 1
    times = sorted(set(ev) | set(ce))
    at_risk = len(durations)
    out = {}
    cum = 0
    dead = False
    for t in times:
        d, c = ev.get(t, 0), ce.get(t, 0)
        if d > 0 and d == at_risk:
            dead = True
        term = (
            0
            if d == 0
            else round(math.log((at_risk - d) / at_risk) * 1e6)
            if not dead
            else None
        )
        if not dead:
            cum += term
        out[t] = (at_risk, d, c, None if dead else cum)
        at_risk -= d + c
    return out


def test_kaplan_meier_hand_case(spark):
    """Classic textbook frame: events at 1,1,3; censors at 2,4."""
    data = [(1, 1), (1, 1), (2, 0), (3, 1), (4, 0)]
    df = spark.createDataFrame(data, "t_days long, is_event long")
    got = {r.t_days: r for r in kaplan_meier(df).collect()}
    ref = _km_reference(data)
    assert set(got) == set(ref)
    for t, (n_risk, d, c, lnm) in ref.items():
        r = got[t]
        assert (r.n_risk, r.n_event, r.n_censor) == (n_risk, d, c), t
        assert r.ln_surv_micro == lnm, t


def test_kaplan_meier_terminal_zero_survival(spark):
    """Everyone still at risk events at the last time: S hits exactly
    0, so the terminal row's curve value is NULL, not -inf."""
    data = [(1, 1), (2, 1), (2, 1)]
    df = spark.createDataFrame(data, "t_days long, is_event long")
    rows = {r.t_days: r for r in kaplan_meier(df).collect()}
    assert rows[1].ln_surv_micro == round(math.log(2 / 3) * 1e6)
    assert rows[2].n_risk == 2 and rows[2].n_event == 2
    assert rows[2].ln_surv_micro is None


def test_kaplan_meier_censor_only_time_flat_curve(spark):
    """A censor-only time keeps the curve flat (term 0) but still
    shrinks the risk set for later times."""
    data = [(1, 0), (2, 1), (2, 1), (3, 1)]
    df = spark.createDataFrame(data, "t_days long, is_event long")
    rows = {r.t_days: r for r in kaplan_meier(df).collect()}
    assert rows[1].ln_surv_micro == 0 and rows[1].n_censor == 1
    assert rows[2].n_risk == 3
    assert rows[2].ln_surv_micro == round(math.log(1 / 3) * 1e6)


def test_kaplan_meier_partition_invariance(spark):
    data = [(t % 7, (t * 3) % 2) for t in range(200)]
    df = spark.createDataFrame(data, "t_days long, is_event long")
    a = sorted(map(tuple, kaplan_meier(df).collect()))
    b = sorted(map(tuple, kaplan_meier(df.repartition(13)).collect()))
    assert a == b


# -------------------------------------------------------- q269 ANOVA


def test_anova_matches_sequential_reference(spark):
    data = [("a", 10), ("a", 12), ("a", 11), ("b", 20), ("b", 22),
            ("c", 5), ("c", 6), ("c", 7), ("c", 8)]
    df = spark.createDataFrame(data, "g string, x long")
    row = anova_oneway(df, "g", "x").collect()[0]
    groups = {}
    for g, x in data:
        groups.setdefault(g, []).append(x)
    cg = {g: round(sum(v) ** 2 / len(v) * 1000) for g, v in groups.items()}
    n = len(data)
    s = sum(x for _, x in data)
    q = sum(x * x for _, x in data)
    k = len(groups)
    ssb = sum(cg.values()) - round(s * s / n * 1000)
    ssw = q * 1000 - sum(cg.values())
    f = round(ssb / (k - 1) / (ssw / (n - k)) * 1e6)
    assert (row.k, row.n_total) == (k, n)
    assert (row.ssb_milli, row.ssw_milli, row.f_micro) == (ssb, ssw, f)


def test_anova_identical_groups_zero_f(spark):
    """Identical group distributions: SSB rounds to ~0 so F ~ 0."""
    data = [(g, x) for g in "abc" for x in (5, 10, 15)]
    df = spark.createDataFrame(data, "g string, x long")
    row = anova_oneway(df, "g", "x").collect()[0]
    assert row.ssb_milli == 0 and row.f_micro == 0


# ------------------------------------------------------- q270 Wilson


def test_wilson_matches_closed_form(spark):
    data = [("g1", 1)] * 8 + [("g1", 0)] * 2 + [("g2", 1)] + [("g2", 0)] * 9
    df = spark.createDataFrame(data, "g string, s long")
    got = {r.g: r for r in wilson_intervals(df, "g", "s").collect()}
    z = 1959964 / 1e6
    for g, n, x in (("g1", 10, 8), ("g2", 10, 1)):
        p = x / n
        denom = 1.0 + z * z / n
        center = (p + z * z / (2.0 * n)) / denom
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) / denom
        assert got[g].n == n and got[g].x == x
        assert got[g].lo_micro == round((center - half) * 1e6)
        assert got[g].hi_micro == round((center + half) * 1e6)
        # the interval brackets p and stays inside [0, 1]
        assert 0 <= got[g].lo_micro <= p * 1e6 <= got[g].hi_micro <= 1e6


def test_wilson_extreme_rates_stay_in_unit_interval(spark):
    """x=0 and x=n -- where the Wald interval collapses to a point or
    escapes [0,1] -- Wilson must stay strictly inside."""
    data = [("zero", 0)] * 5 + [("one", 1)] * 5
    df = spark.createDataFrame(data, "g string, s long")
    got = {r.g: r for r in wilson_intervals(df, "g", "s").collect()}
    assert got["zero"].lo_micro == 0 and got["zero"].hi_micro > 0
    assert got["one"].hi_micro == 1_000_000 and got["one"].lo_micro < 1e6


# ------------------------------------------------------- q271 Neyman


def test_neyman_allocation_exact_shares(spark):
    """Two strata, same size, one 10x noisier: allocation follows
    N_h * sigma_h exactly (floor shares + reported remainder)."""
    rows = [("lo", v) for v in (10, 11, 10, 11) * 25]  # sigma 0.5
    rows += [("hi", v) for v in (0, 10, 0, 10) * 25]  # sigma 5
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r for r in neyman_allocation(df, "g", "x", budget=1000).collect()}

    def w_milli(vals):
        n, s, q = len(vals), sum(vals), sum(v * v for v in vals)
        return round(math.sqrt(n * q - s * s) * 1000)

    w_lo = w_milli([10, 11] * 50)
    w_hi = w_milli([0, 10] * 50)
    wt = w_lo + w_hi
    assert got["lo"].w_milli == w_lo and got["hi"].w_milli == w_hi
    assert got["lo"].alloc == 1000 * w_lo // wt
    assert got["hi"].alloc == 1000 * w_hi // wt
    left = 1000 - got["lo"].alloc - got["hi"].alloc
    assert got["lo"].left_over == got["hi"].left_over == left
    assert 0 <= left < 2  # k-1 bound
    # the noisy stratum dominates ~10:1
    assert got["hi"].alloc > 8 * got["lo"].alloc


def test_neyman_all_constant_strata_null_alloc(spark):
    """Every stratum constant -> total weight 0: allocations must take
    the NULL path in BOTH engines (Spark ANSI would error on div 0;
    DuckDB // returns NULL -- the nullif guard aligns them)."""
    rows = [("a", 5)] * 10 + [("b", 7)] * 10
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r for r in neyman_allocation(df, "g", "x", budget=100).collect()}
    assert all(r.w_milli == 0 for r in got.values())
    assert all(r.alloc is None for r in got.values())


def test_neyman_constant_stratum_gets_zero(spark):
    """sigma = 0 -> weight 0 -> no budget, regardless of size."""
    rows = [("const", 7)] * 100 + [("vary", 1), ("vary", 9)] * 10
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r.g: r for r in neyman_allocation(df, "g", "x", budget=500).collect()}
    assert got["const"].w_milli == 0 and got["const"].alloc == 0
    assert got["vary"].alloc == 500  # floor of the full budget
    assert got["vary"].left_over == 0


# ------------------------------------------- q272 clustering coefficient


def test_lcc_triangle_with_pendant(spark):
    """Triangle 1-2-3 plus pendant edge 3-4: lcc(1)=lcc(2)=1,
    lcc(3)=1/3 (one closed of three wedge pairs), lcc(4) NULL."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src_id long, dst_id long"
    )
    got = {r.node: r for r in local_clustering_coefficient(edges).collect()}
    assert (got[1].deg, got[1].n_tri, got[1].lcc_ppm) == (2, 1, 1_000_000)
    assert (got[2].deg, got[2].n_tri, got[2].lcc_ppm) == (2, 1, 1_000_000)
    assert (got[3].deg, got[3].n_tri, got[3].lcc_ppm) == (3, 1, 333_333)
    assert (got[4].deg, got[4].n_tri) == (1, 0)
    assert got[4].lcc_ppm is None


def test_lcc_ignores_direction_and_duplicates(spark):
    """Both orientations + repeats of the same edge canonicalize to
    one undirected edge; self-loops drop."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1)],
        "src_id long, dst_id long",
    )
    got = {r.node: r for r in local_clustering_coefficient(edges).collect()}
    assert set(got) == {1, 2, 3}
    assert all(
        (r.deg, r.n_tri, r.lcc_ppm) == (2, 1, 1_000_000)
        for r in got.values()
    )


def test_lcc_complete_k4_all_ones(spark):
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        "src_id long, dst_id long",
    )
    rows = local_clustering_coefficient(edges).collect()
    assert len(rows) == 4
    assert all(r.deg == 3 and r.n_tri == 3 and r.lcc_ppm == 1_000_000
               for r in rows)


# ---------------------------------------------------- q273 isotonic/PAV


def _pav_reference(cnts, poss):
    """Sequential pool-adjacent-violators over per-bin (cnt, pos):
    the textbook stack algorithm, weighted by cnt."""
    blocks = []  # (cnt, pos)
    for c, p in zip(cnts, poss):
        blocks.append((c, p))
        while len(blocks) >= 2:
            c2, p2 = blocks[-1]
            c1, p1 = blocks[-2]
            if p1 * c2 <= p2 * c1:  # p1/c1 <= p2/c2: monotone, stop
                break
            blocks[-2:] = [(c1 + c2, p1 + p2)]
    # expand block means back to per-bin values by walking cnts
    per_bin = []
    i = 0
    for c_blk, p_blk in blocks:
        acc = 0
        while acc < c_blk:
            acc += cnts[i]
            per_bin.append(p_blk / c_blk)
            i += 1
    return per_bin


def test_isotonic_minmax_equals_sequential_pav(spark):
    """The distributed max-min identity must reproduce the sequential
    PAV fit exactly (weighted, with violations and ties)."""
    cnts = [10, 5, 20, 10, 8, 12, 30]
    poss = [9, 0, 10, 9, 1, 6, 30]
    rows = [(b, c, p) for b, (c, p) in enumerate(zip(cnts, poss))]
    df = spark.createDataFrame(rows, "bin long, cnt long, pos long")
    got = {r.bin: r for r in isotonic_calibrate_bins(df).collect()}
    ref = _pav_reference(cnts, poss)
    for b in range(len(cnts)):
        assert got[b].fitted_micro == round(ref[b] * 1e6), (
            b, got[b].fitted_micro, ref[b])
        assert got[b].rate_ppm == poss[b] * 1_000_000 // cnts[b]
    # monotone non-decreasing by construction
    fit = [got[b].fitted_micro for b in range(len(cnts))]
    assert fit == sorted(fit)


def test_isotonic_already_monotone_is_identity(spark):
    rows = [(0, 10, 1), (1, 10, 3), (2, 10, 5), (3, 10, 9)]
    df = spark.createDataFrame(rows, "bin long, cnt long, pos long")
    got = {r.bin: r for r in isotonic_calibrate_bins(df).collect()}
    for b, c, p in ((0, 10, 1), (1, 10, 3), (2, 10, 5), (3, 10, 9)):
        assert got[b].fitted_micro == round(p / c * 1e6)


def test_isotonic_partition_invariance(spark):
    rows = [(b, 5 + b % 3, (b * 7) % 6) for b in range(12)]
    df = spark.createDataFrame(rows, "bin long, cnt long, pos long")
    a = sorted(map(tuple, isotonic_calibrate_bins(df).collect()))
    b = sorted(
        map(tuple, isotonic_calibrate_bins(df.repartition(7)).collect())
    )
    assert a == b
