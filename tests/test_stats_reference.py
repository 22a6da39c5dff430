"""Independent-formula checks for the stats toolkit.

The DuckDB oracle proves Spark and DuckDB agree, but both run the SAME
SQL-shaped formula — a shared algebra mistake would sail through.  Each
test here recomputes the statistic with a NAIVE pure-Python algorithm
(direct pair enumeration, direct rank assignment, direct ECDF walk) over
the same sf0.001 parquet and compares to the registered query's output.
"""

from __future__ import annotations

import math

from redis_streams_spark.queries import all_queries

SF = "/root/testdata/sf0.001"
DAY_MS = 86_400_000


def _rows(spark, name):
    return all_queries()[name].fn(spark, SF).collect()


def _daily(duck):
    return duck.sql(
        f"SELECT epoch_ms(ts) // {DAY_MS} AS day, sum(value) AS v,"
        " count(*) AS n FROM events GROUP BY 1 ORDER BY day"
    ).fetchall()


def _doc_lengths(duck):
    return duck.sql(
        "SELECT source, n_chars FROM documents ORDER BY source, n_chars"
    ).fetchall()


def _avg_ranks(values):
    """value -> average rank (1-based, ties averaged), naive sort-based."""
    s = sorted(values)
    ranks: dict[float, float] = {}
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[s[i]] = (i + 1 + j) / 2  # mean of ranks i+1..j
        i = j
    return ranks


def test_kendall_tau_reference(spark, duck):
    d = _daily(duck)
    conc = disc = tx = ty = 0
    for i in range(len(d)):
        for j in range(i + 1, len(d)):
            dv = d[i][1] - d[j][1]
            dn = d[i][2] - d[j][2]
            if dv * dn > 0:
                conc += 1
            elif dv * dn < 0:
                disc += 1
            if dv == 0:
                tx += 1
            if dn == 0:
                ty += 1
    n0 = len(d) * (len(d) - 1) // 2
    tau = (conc - disc) / math.sqrt((n0 - tx) * (n0 - ty))
    (row,) = _rows(spark, "q_kendall_tau")
    assert row.n_days == len(d)
    assert row.n_pairs == n0
    assert row.concordant == conc and row.discordant == disc
    assert abs(row.tau_b - tau) < 1e-5


def test_spearman_reference(spark, duck):
    d = _daily(duck)
    rv = _avg_ranks([r[1] for r in d])
    rn = _avg_ranks([r[2] for r in d])
    xs = [rv[r[1]] for r in d]
    ys = [rn[r[2]] for r in d]
    n = len(d)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs))
    sy = math.sqrt(sum((y - my) ** 2 for y in ys))
    rho = cov / (sx * sy)
    (row,) = _rows(spark, "q_spearman_daily")
    assert row.n_days == n
    assert abs(row.rho - rho) < 1e-5


def test_mann_whitney_reference(spark, duck):
    docs = _doc_lengths(duck)
    all_vals = [v for _, v in docs]
    ranks = _avg_ranks(all_vals)
    n = len(all_vals)
    # tie term over value multiplicities
    from collections import Counter

    mult = Counter(all_vals)
    tie_term = sum(c**3 - c for c in mult.values())
    by_source: dict[str, list[int]] = {}
    for s, v in docs:
        by_source.setdefault(s, []).append(v)
    got = {r.source: r for r in _rows(spark, "q_mann_whitney")}
    assert set(got) == set(by_source)
    for s, vals in by_source.items():
        ns = len(vals)
        ms = n - ns
        rank_sum = sum(ranks[v] for v in vals)
        u = rank_sum - ns * (ns + 1) / 2
        mu = ns * ms / 2
        sigma = math.sqrt(
            ns * ms / 12 * ((n + 1) - tie_term / (n * (n - 1)))
        )
        z = (u - mu) / sigma
        assert got[s].n_docs == ns
        assert abs(got[s].u_stat - u) < 0.51  # u rounded at 2 dp
        assert abs(got[s].z_score - z) < 1e-3


def test_ks_and_wasserstein_reference(spark, duck):
    docs = _doc_lengths(duck)
    sources = sorted({s for s, _ in docs})[:2]
    a = sorted(v for s, v in docs if s == sources[0])
    b = sorted(v for s, v in docs if s == sources[1])
    grid = sorted(set(a) | set(b))

    def ecdf(vals, x):
        # right-continuous ECDF: P(X <= x)
        lo, hi = 0, len(vals)
        while lo < hi:
            mid = (lo + hi) // 2
            if vals[mid] <= x:
                lo = mid + 1
            else:
                hi = mid
        return lo / len(vals)

    d_stat = max(abs(ecdf(a, x) - ecdf(b, x)) for x in grid)
    w1 = sum(
        abs(ecdf(a, grid[i]) - ecdf(b, grid[i])) * (grid[i + 1] - grid[i])
        for i in range(len(grid) - 1)
    )
    (ks,) = _rows(spark, "q_ks_test")
    assert (ks.src_a, ks.src_b) == (sources[0], sources[1])
    assert ks.n_a == len(a) and ks.n_b == len(b)
    assert abs(ks.d_stat - d_stat) < 1e-5
    scale = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    assert abs(ks.ks_scaled - scale * d_stat) < 1e-3
    (wrow,) = _rows(spark, "q_wasserstein_1d")
    assert abs(wrow.w1_distance - w1) < 1e-3


def test_anova_and_levene_reference(spark, duck):
    docs = _doc_lengths(duck)
    by_source: dict[str, list[int]] = {}
    for s, v in docs:
        by_source.setdefault(s, []).append(v)

    def anova_f(groups):
        n = sum(len(g) for g in groups)
        k = len(groups)
        grand = sum(sum(g) for g in groups) / n
        ssb = sum(len(g) * (sum(g) / len(g) - grand) ** 2 for g in groups)
        ssw = sum(
            sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups
        )
        return (ssb / (k - 1)) / (ssw / (n - k)), ssb / (ssb + ssw), n, k

    f, eta, n, k = anova_f(list(by_source.values()))
    (row,) = _rows(spark, "q_anova_oneway")
    assert (row.k_groups, row.n_total) == (k, n)
    assert abs(row.f_stat - f) < max(1e-3, abs(f) * 1e-4)
    assert abs(row.eta_sq - eta) < 1e-5

    def median(vals):
        s = sorted(vals)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    zgroups = [
        [abs(x - median(g)) for x in g] for g in by_source.values()
    ]
    w, _, n2, k2 = anova_f(zgroups)
    (lrow,) = _rows(spark, "q_levene_test")
    assert (lrow.k_groups, lrow.n_total) == (k2, n2)
    assert abs(lrow.w_stat - w) < max(1e-3, abs(w) * 1e-4)


def test_runs_test_reference(spark, duck):
    d = _daily(duck)
    vals = [r[1] for r in d]
    med = sorted(vals)[len(vals) // 2] if len(vals) % 2 else (
        sorted(vals)[len(vals) // 2 - 1] + sorted(vals)[len(vals) // 2]
    ) / 2
    signs = [v > med for v in vals if v != med]
    runs = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
    n1 = sum(signs)
    n2 = len(signs) - n1
    e = 1 + 2 * n1 * n2 / (n1 + n2)
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    z = (runs - e) / math.sqrt(var)
    (row,) = _rows(spark, "q_runs_test")
    assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, runs)
    assert abs(row.e_runs - e) < 1e-3
    assert abs(row.z_score - z) < 1e-3


def test_cohens_d_reference(spark, duck):
    docs = _doc_lengths(duck)
    sources = sorted({s for s, _ in docs})[:2]
    a = [v for s, v in docs if s == sources[0]]
    b = [v for s, v in docs if s == sources[1]]

    def mean_var(g):
        m = sum(g) / len(g)
        return m, sum((x - m) ** 2 for x in g) / (len(g) - 1)

    m1, v1 = mean_var(a)
    m2, v2 = mean_var(b)
    pooled = math.sqrt(
        ((len(a) - 1) * v1 + (len(b) - 1) * v2) / (len(a) + len(b) - 2)
    )
    dval = (m1 - m2) / pooled
    g = dval * (1 - 3 / (4 * (len(a) + len(b)) - 9))
    (row,) = _rows(spark, "q_cohens_d")
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.cohens_d - dval) < 1e-5
    assert abs(row.hedges_g - g) < 1e-5


def test_mix_drift_reference(spark, duck):
    rows = duck.sql(
        f"SELECT epoch_ms(ts) // {DAY_MS} AS day, event_type, count(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    total = sum(r[2] for r in rows)
    types: dict[str, int] = {}
    days: dict[int, int] = {}
    for day, t, c in rows:
        types[t] = types.get(t, 0) + c
        days[day] = days.get(day, 0) + c
    counts = {(day, t): c for day, t, c in rows}
    got = {r.day_ms: r for r in _rows(spark, "q_mix_drift")}
    assert set(got) == {day * DAY_MS for day in days}
    for day, day_n in days.items():
        js = 0.0
        for t, tn in types.items():
            q = tn / total
            p = counts.get((day, t), 0) / day_n
            m = (p + q) / 2
            if p > 0:
                js += 0.5 * p * math.log(p / m)
            js += 0.5 * q * math.log(q / m)
        r = got[day * DAY_MS]
        assert r.n_events == day_n
        assert abs(r.js_divergence - js) < 1e-5
