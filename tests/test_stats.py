

def test_mad_outliers_hand_case(spark):
    """Hand-computed lower-median/MAD and the exact integer
    Iglewicz–Hoaglin flag (6745*d > 35000*MAD)."""
    from event_pipeline_spark.operators.stats import mad_outliers

    # values: 1,2,3,4,100 -> med=3 (rank 3 of 5); d=2,1,0,1,97 ->
    # sorted 0,1,1,2,97, MAD = 1 (rank 3); outlier iff 6745*d > 35000
    # -> d >= 6 -> only 97
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
    # even-n key: 1,2,3,4 -> lower median = 2 (rank 2 of 4);
    # d = 1,0,1,2 -> sorted 0,1,1,2 -> MAD = 1 (rank 2); no outliers
    rows += [(10 + i, "b", float(v)) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_type"]: r for r in mad_outliers(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["median_cents"], a["mad_cents"], a["n_outliers"]) == (300, 100, 1)
    assert (b["median_cents"], b["mad_cents"], b["n_outliers"]) == (200, 100, 0)


def test_percentiles_exact_nearest_rank(spark):
    """Nearest-rank definition on a hand case: 10 values 1..10 ->
    p50 = rank ceil(5) = 5, p90 = rank 9, p99 = rank ceil(9.9) = 10."""
    from event_pipeline_spark.operators.stats import percentiles_exact

    rows = [(i, "a", float(v)) for i, v in enumerate(range(1, 11))]
    rows += [(100, "b", 42.0)]  # n=1: every percentile = the element
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )
    out = {r["event_type"]: r for r in percentiles_exact(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["p50_cents"], a["p90_cents"], a["p99_cents"]) == (500, 900, 1000)
    assert (b["p50_cents"], b["p90_cents"], b["p99_cents"]) == (4200,) * 3


# -- Kolmogorov-Smirnov two-sample --------------------------------------------


def test_ks_two_sample_matches_python_ecdf(spark):
    """Pseudo-random integer samples vs a brute-force ECDF sweep."""
    import hashlib
    from fractions import Fraction

    from event_pipeline_spark.operators.stats import ks_two_sample

    rows = []
    a, b = [], []
    for i in range(400):
        h = hashlib.md5(f"ks{i}".encode()).hexdigest()
        v = int(h[:3], 16) % 60
        s = i % 2
        # shift sample 1 so the test has signal
        v = v + (7 if s else 0)
        (b if s else a).append(v)
        rows.append(("k", s, v))
    df = spark.createDataFrame(rows, "k string, s int, v long")
    out = ks_two_sample(
        df, key_col="k", sample_col="s", value_col="v"
    ).collect()[0]
    na, nb = len(a), len(b)
    d_ref = max(
        abs(
            Fraction(sum(1 for x in a if x <= v), na)
            - Fraction(sum(1 for x in b if x <= v), nb)
        )
        for v in set(a) | set(b)
    )
    assert out["n_a"] == na and out["n_b"] == nb
    assert int(out["d_num"]) == d_ref * na * nb
    assert out["d"] == int(out["d_num"]) / (na * nb)
    # exact decision replicates the squared inequality
    lam2 = Fraction(int(out["d_num"])) ** 2 * 10**6
    thr = Fraction(1844164) * (na + nb) * na * nb
    assert out["reject_05"] == (lam2 > thr)
    assert out["reject_05"]  # the shift is detectable


def test_ks_two_sample_identical_and_empty(spark):
    from event_pipeline_spark.operators.stats import ks_two_sample

    rows = [("same", s, v) for s in (0, 1) for v in (1, 2, 2, 5)]
    rows += [("one", 0, v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "k string, s int, v long")
    out = {
        r["k"]: r
        for r in ks_two_sample(
            df, key_col="k", sample_col="s", value_col="v"
        ).collect()
    }
    assert out["same"]["d"] == 0.0 and not out["same"]["reject_05"]
    assert out["one"]["d"] is None and out["one"]["reject_05"] is None


# -- population stability index -----------------------------------------------


def test_psi_bins_matches_python_reference(spark):
    """Shifted sample vs a from-scratch smoothed-PSI computation,
    including empty-bin rows from the spine."""
    import math

    from event_pipeline_spark.operators.stats import psi_bins

    exp = [5, 15, 15, 25, 25, 25, 35, 45, 45, 55] * 10
    act = [v + 30 for v in exp]  # shift right three bins
    rows = [(0, v) for v in exp] + [(1, v) for v in act]
    df = spark.createDataFrame(rows, "s int, v long")
    out = {
        r["bin"]: r
        for r in psi_bins(
            df, snapshot_col="s", value_col="v", lo=0, hi=100, n_bins=10
        ).collect()
    }
    assert sorted(out) == list(range(10))
    ne, na = len(exp) + 10, len(act) + 10
    for b in range(10):
        ce = sum(1 for v in exp if v * 10 // 100 == b)
        ca = sum(1 for v in act if min(v * 10 // 100, 9) == b)
        assert out[b]["n_expected"] == ce and out[b]["n_actual"] == ca
        pe, pa = (ce + 1) / ne, (ca + 1) / na
        want = round((pa - pe) * math.log(pa / pe), 7)
        assert out[b]["psi"] == want, b
    # the shift is visible: total PSI is large
    assert sum(r["psi"] for r in out.values()) > 0.5


def test_psi_bins_identical_snapshots_zero(spark):
    from event_pipeline_spark.operators.stats import psi_bins

    rows = [(s, v) for s in (0, 1) for v in (3, 14, 25, 77)]
    df = spark.createDataFrame(rows, "s int, v long")
    out = psi_bins(
        df, snapshot_col="s", value_col="v", lo=0, hi=100, n_bins=10
    ).collect()
    assert all(r["psi"] == 0.0 for r in out)
    # out-of-range clamps into edge bins, not dropped
    rows2 = [(0, -5), (1, 240)]
    out2 = {
        r["bin"]: r
        for r in psi_bins(
            spark.createDataFrame(rows2, "s int, v long"),
            snapshot_col="s", value_col="v", lo=0, hi=100, n_bins=10,
        ).collect()
    }
    assert out2[0]["n_expected"] == 1 and out2[9]["n_actual"] == 1


# -- difference-in-differences --------------------------------------------------


def test_did_textbook_case(spark):
    """Treated group jumps +30 post; control drifts +10: DiD = 20."""
    from event_pipeline_spark.operators.stats import did_estimate

    rows = (
        [(0, 0, 100)] * 4 + [(0, 1, 110)] * 4
        + [(1, 0, 200)] * 3 + [(1, 1, 230)] * 3
    )
    df = spark.createDataFrame(rows, "g int, p int, x long")
    out = did_estimate(
        df, group_col="g", period_col="p", value_col="x"
    ).collect()[0]
    assert (out["m00"], out["m01"]) == (100.0, 110.0)
    assert (out["m10"], out["m11"]) == (200.0, 230.0)
    assert out["did"] == 20.0
    assert (out["n00"], out["n11"]) == (4, 3)


def test_did_empty_cell_is_null(spark):
    from event_pipeline_spark.operators.stats import did_estimate

    rows = [(0, 0, 1), (0, 1, 2), (1, 1, 3)]  # no treated-pre cell
    df = spark.createDataFrame(rows, "g int, p int, x long")
    out = did_estimate(
        df, group_col="g", period_col="p", value_col="x"
    ).collect()[0]
    assert out["did"] is None and out["n10"] is None


# -- CUPED -----------------------------------------------------------------------


def test_cuped_matches_reference_and_reduces_bias(spark):
    """y = 2x + bucket-lift 5 with an imbalanced covariate: every
    emitted number equals a from-scratch Python computation of the
    CUPED definitions, and the adjusted lift sits far closer to the
    true 5 than the contaminated raw lift of 25."""
    from event_pipeline_spark.operators.stats import cuped_adjusted_lift

    rows = []
    for i in range(200):
        x = (i * 7) % 50
        rows.append((0, x, 2 * x))
    for i in range(200):
        x = (i * 7) % 50 + 10  # imbalanced pre-period
        rows.append((1, x, 2 * x + 5))
    df = spark.createDataFrame(rows, "b int, x long, y long")
    out = cuped_adjusted_lift(
        df, bucket_col="b", pre_col="x", value_col="y"
    ).collect()[0]

    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxx = sum(x * x for _, x, _ in rows)
    sxy = sum(x * y for _, x, y in rows)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    gx = sx / n

    def adj(b):
        xs = [(x, y) for bb, x, y in rows if bb == b]
        mx = sum(x for x, _ in xs) / len(xs)
        my = sum(y for _, y in xs) / len(xs)
        return my, my - theta * (mx - gx)

    my_a, adj_a = adj(0)
    my_b, adj_b = adj(1)
    assert out["theta"] == round(theta, 7)
    assert out["lift"] == round(my_b - my_a, 7) == 25.0
    assert out["adj_lift"] == round(adj_b - adj_a, 7)
    # the pooled theta absorbs most of the 2*10 covariate imbalance
    assert abs(out["adj_lift"] - 5.0) < abs(out["lift"] - 5.0) / 4


def test_cuped_zero_variance_covariate_is_null(spark):
    from event_pipeline_spark.operators.stats import cuped_adjusted_lift

    rows = [(b, 7, y) for b in (0, 1) for y in (1, 2, 3)]
    df = spark.createDataFrame(rows, "b int, x long, y long")
    out = cuped_adjusted_lift(
        df, bucket_col="b", pre_col="x", value_col="y"
    ).collect()[0]
    assert out["theta"] is None and out["adj_lift"] is None
    assert out["lift"] == 0.0


# -- Wilson intervals ------------------------------------------------------------


def test_wilson_interval_honest_at_extremes(spark):
    """p-hat = 0: the Wald interval would be width 0; Wilson keeps a
    positive upper bound (~ 3/n), and a textbook case matches the
    closed form."""
    import math

    from event_pipeline_spark.operators.stats import (
        _WILSON_Z,
        wilson_intervals,
    )

    rows = [("none", 0)] * 50 + [("half", i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, y int")
    out = {
        r["k"]: r
        for r in wilson_intervals(
            df, key_col="k", label_col="y"
        ).collect()
    }
    none = out["none"]
    assert none["rate"] == 0.0 and none["lo"] == 0.0
    assert 0.03 < none["hi"] < 0.11  # honest nonzero upper bound
    z, n, x = _WILSON_Z, 100, 50
    p = x / n
    denom = n + z * z
    center = (x + z * z / 2) / denom
    half = z * math.sqrt(p * (1 - p) * n + z * z / 4) / denom
    assert out["half"]["lo"] == round(center - half, 7)
    assert out["half"]["hi"] == round(center + half, 7)
    assert out["half"]["lo"] < 0.5 < out["half"]["hi"]


def test_histogram_equidepth_hand_case(spark):
    from event_pipeline_spark.operators.stats import histogram_equidepth

    # 10 values 1..10 into 4 buckets: tiling (r-1)*4 div 10 ->
    # sizes 3,2,3,2 with edges [1,3],[4,5],[6,8],[9,10]
    df = spark.createDataFrame(
        [("g", v, v) for v in range(1, 11)],
        "g string, v long, id long",
    )
    rows = {
        r["bucket"]: r
        for r in histogram_equidepth(
            df, group_col="g", value_col="v", id_col="id", n_buckets=4
        ).collect()
    }
    assert [(rows[b]["n"], rows[b]["lo"], rows[b]["hi"]) for b in range(4)] == [
        (3, 1, 3), (2, 4, 5), (3, 6, 8), (2, 9, 10)
    ]


def test_bootstrap_poisson_weight_ladder(spark):
    """The threshold ladder draws Poisson(1)-distributed weights:
    mean weight ~ 1, P(0) ~ e^-1, over a large deterministic draw."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.sketches import _md5_low64_col
    from event_pipeline_spark.operators.stats import _poisson1_weight

    from event_pipeline_spark.operators.stats import POISSON1_DRAW_BITS

    n = 20_000
    draws = spark.range(n).select(
        _poisson1_weight(
            (
                _md5_low64_col(
                    F.concat(F.col("id").cast("string"), F.lit(":0"))
                )
                % F.lit(str(1 << POISSON1_DRAW_BITS)).cast("decimal(20,0)")
            ).cast("bigint")
        ).alias("w")
    )
    agg = draws.agg(
        F.avg("w").alias("m"),
        F.avg((F.col("w") == 0).cast("double")).alias("p0"),
        F.max("w").alias("mx"),
    ).collect()[0]
    assert abs(agg["m"] - 1.0) < 0.02
    assert abs(agg["p0"] - 0.3679) < 0.01
    assert agg["mx"] <= 8


def test_bootstrap_ci_constant_series_and_order(spark):
    """All-equal values -> every replicate mean equals the value, so
    lo == mean == hi exactly; on a spread series lo <= mean <= hi."""
    from pyspark.sql import functions as F

    from event_pipeline_spark.operators.stats import bootstrap_mean_ci

    const = spark.range(200).select(
        F.lit("a").alias("k"), F.col("id").alias("id"),
        F.lit(500).alias("x"),
    )
    r = bootstrap_mean_ci(
        const, key_col="k", id_col="id", value_col="x"
    ).collect()[0]
    assert (r["mean"], r["boot_lo"], r["boot_hi"]) == (500.0, 500.0, 500.0)
    assert r["n"] == 200 and r["n_replicates"] == 100

    spread = spark.range(500).select(
        F.lit("b").alias("k"), F.col("id").alias("id"),
        (F.col("id") % 100).cast("bigint").alias("x"),
    )
    r2 = bootstrap_mean_ci(
        spread, key_col="k", id_col="id", value_col="x"
    ).collect()[0]
    assert r2["boot_lo"] < r2["mean"] < r2["boot_hi"]
    # a 95% CI of a mean of 500 draws from [0,100) is a few units wide
    assert r2["boot_hi"] - r2["boot_lo"] < 15


def test_bootstrap_replicates_bound():
    """replicates > 128 would overflow the signed-long double-hash
    draw under ANSI mode (round-10 ADVICE) — refused up front."""
    import pytest

    from event_pipeline_spark.operators.stats import bootstrap_mean_ci

    with pytest.raises(ValueError, match="replicates"):
        bootstrap_mean_ci(
            None, key_col="k", id_col="i", value_col="v", replicates=129
        )
    with pytest.raises(ValueError, match="replicates"):
        bootstrap_mean_ci(
            None, key_col="k", id_col="i", value_col="v", replicates=0
        )
