"""§2 extensions, eighty-second wave — classifier evaluation, forecast
calibration, and the chance-corrected-agreement completion.

- llm_classifier_eval: the confusion-matrix metric panel (precision /
  recall / F1 / Matthews φ) of the SHIPPED llm_lang_id 'en' gate
  against the fixture's true lang label — an eval harness a training-
  data pipeline runs on every heuristic filter before trusting it.
- events_brier_decomposition: Murphy's (1973) Brier-score
  decomposition BS = REL − RES + UNC of an hour-of-day purchase-rate
  forecaster, trained on the first half of the event calendar and
  scored on the second — THE standard probabilistic-forecast
  calibration report.
- agg_gwet_ac1: Gwet's AC1 (2008) on the agg_fleiss_kappa frame —
  the prevalence-robust agreement coefficient that repairs the kappa
  paradox (skewed categories drag kappa down even at high raw
  agreement).
- agg_scott_pi: Scott's π (1955) on the two-half quintile frame —
  the 2-rater pooled-marginal chance correction, the historical
  midpoint between percent agreement and Cohen's kappa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hadoop_deliver_spark.registry import register
from hadoop_deliver_spark.tables import dec2, tbl


@register(
    "llm_classifier_eval",
    """
    WITH toks AS (
        SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    scored AS (
        SELECT lang = 'en' AS truth,
               len(list_filter(t, x -> x IN ('the', 'and', 'of'))) AS s_en,
               len(list_filter(t, x -> x IN ('der', 'und', 'die'))) AS s_de,
               len(list_filter(t, x -> x IN ('el', 'los', 'que'))) AS s_es,
               len(list_filter(t, x -> x IN ('le', 'les', 'des'))) AS s_fr
        FROM toks
    ),
    pred AS (
        SELECT truth,
               s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0
                   AS p
        FROM scored
    ),
    cm AS (
        SELECT CAST(count(*) FILTER (p AND truth) AS BIGINT) AS tp,
               CAST(count(*) FILTER (p AND NOT truth) AS BIGINT) AS fp,
               CAST(count(*) FILTER (NOT p AND truth) AS BIGINT) AS fn,
               CAST(count(*) FILTER (NOT p AND NOT truth) AS BIGINT) AS tn
        FROM pred
    )
    SELECT tp, fp, fn, tn,
           round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision_en,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall_en,
           round(2 * CAST(tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1,
           round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE)
                        * ((tn + fp) * (tn + fn))), 6) AS mcc,
           2 * tp >= fp + fn AS f1_at_least_half,
           CAST(tp AS HUGEINT) * tn > CAST(fp AS HUGEINT) * fn
               AS better_than_chance
    FROM cm
    """,
    tags=("llm", "stats"),
)
def llm_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix evaluation of the SHIPPED llm_lang_id 'en'
    branch (marker-token argmax with its fixed tie-preference order,
    mirrored textually) against the fixture's true lang column — the
    eval harness a pipeline runs before trusting a heuristic gate:
    precision / recall / F1 / accuracy-free Matthews φ, all from
    FOUR exact integer cells. Every display is a single fixed-order
    expression of exact integers (F1 = 2TP/(2TP+FP+FN) is a plain
    rational; φ's denominator √((TP+FP)(TP+FN)(TN+FP)(TN+FN)) takes
    one double cast of exact int products). Both verdicts are FULLY
    exact with denominators cleared: F1 ≥ 1/2 ⇔ 2TP ≥ FP+FN, and
    φ > 0 ⇔ TP·TN > FP·FN (the standard better-than-chance sign
    identity). The corpus is synthetic word salad (the llm_lang_id
    caveat), so the measured numbers grade the PIPELINE, not the
    markers.

    Scale shape: one map-only scoring pass over documents, a 1-row
    4-cell reduce — map-side-combinable."""
    d = tbl(spark, sf_dir, "documents")
    t = F.split("text", " ")
    s_en = F.size(F.filter(t, lambda x: x.isin("the", "and", "of")))
    s_de = F.size(F.filter(t, lambda x: x.isin("der", "und", "die")))
    s_es = F.size(F.filter(t, lambda x: x.isin("el", "los", "que")))
    s_fr = F.size(F.filter(t, lambda x: x.isin("le", "les", "des")))
    pred = d.select(
        (F.col("lang") == "en").alias("truth"),
        (
            (s_en >= s_de) & (s_en >= s_es) & (s_en >= s_fr) & (s_en > 0)
        ).alias("p"),
    )
    cm = pred.agg(
        F.count_if(F.col("p") & F.col("truth")).cast("long").alias("tp"),
        F.count_if(F.col("p") & ~F.col("truth")).cast("long").alias("fp"),
        F.count_if(~F.col("p") & F.col("truth")).cast("long").alias("fn"),
        F.count_if(~F.col("p") & ~F.col("truth")).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (
        F.col("tp"),
        F.col("fp"),
        F.col("fn"),
        F.col("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp.cast("double") / (tp + fp), 6).alias("precision_en"),
        F.round(tp.cast("double") / (tp + fn), 6).alias("recall_en"),
        F.round(2 * tp.cast("double") / (2 * tp + fp + fn), 6).alias("f1"),
        F.round(
            (tp.cast("double") * tn - fp.cast("double") * fn)
            / F.sqrt(
                ((tp + fp) * (tp + fn)).cast("double")
                * ((tn + fp) * (tn + fn))
            ),
            6,
        ).alias("mcc"),
        (2 * tp >= fp + fn).alias("f1_at_least_half"),
        (tp.cast("decimal(38,0)") * tn > fp.cast("decimal(38,0)") * fn).alias(
            "better_than_chance"
        ),
    )


_BRIER_TERMS_SQL = {
    "rel": " + ".join(
        f"CASE WHEN n{h} > 0 THEN n{h} * (f{h} - CAST(c{h} AS DOUBLE) / n{h})"
        f" * (f{h} - CAST(c{h} AS DOUBLE) / n{h}) ELSE 0.0 END"
        for h in range(24)
    ),
    "res": " + ".join(
        f"CASE WHEN n{h} > 0 THEN n{h}"
        f" * (CAST(c{h} AS DOUBLE) / n{h} - CAST(c AS DOUBLE) / n)"
        f" * (CAST(c{h} AS DOUBLE) / n{h} - CAST(c AS DOUBLE) / n)"
        f" ELSE 0.0 END"
        for h in range(24)
    ),
}


@register(
    "events_brier_decomposition",
    f"""
    WITH b AS (SELECT CAST(min(ts) AS DATE) + 15 AS cutoff FROM events),
    train AS (
        SELECT hour(ts) AS h,
               CAST(count(*) AS BIGINT) AS b_t,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
                   AS a_t
        FROM events, b WHERE CAST(ts AS DATE) < cutoff GROUP BY 1
    ),
    ev AS (
        SELECT hour(ts) AS h,
               CAST(event_type = 'purchase' AS INT) AS o
        FROM events, b WHERE CAST(ts AS DATE) >= cutoff
    ),
    cells AS (
        SELECT ev.h,
               CAST(count(*) AS BIGINT) AS nh,
               CAST(sum(ev.o) AS BIGINT) AS ch,
               COALESCE(CAST(max(t.a_t) AS DOUBLE) / max(t.b_t), 0.0) AS fh
        FROM ev LEFT JOIN train t ON t.h = ev.h
        GROUP BY ev.h
    ),
    piv AS (
        SELECT
            {", ".join(
                f"COALESCE(max(CASE WHEN h = {h} THEN nh END), 0) AS n{h}, "
                f"COALESCE(max(CASE WHEN h = {h} THEN ch END), 0) AS c{h}, "
                f"COALESCE(max(CASE WHEN h = {h} THEN fh END), 0.0) AS f{h}"
                for h in range(24)
            )},
            CAST(sum(nh) AS BIGINT) AS n,
            CAST(sum(ch) AS BIGINT) AS c
        FROM cells
    ),
    m AS (
        SELECT n, c,
               ({_BRIER_TERMS_SQL["rel"]}) / n AS rel,
               ({_BRIER_TERMS_SQL["res"]}) / n AS res,
               CAST(c AS DOUBLE) / n * (1 - CAST(c AS DOUBLE) / n) AS unc
        FROM piv
    )
    SELECT n AS n_eval, c AS n_purchases,
           round(rel - res + unc, 6) AS brier,
           round(rel, 6) AS reliability,
           round(res, 6) AS resolution,
           round(unc, 6) AS uncertainty,
           res > rel AS has_skill
    FROM m
    """,
    tags=("events", "stats"),
)
def events_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy's (1973) Brier-score decomposition of a real forecast
    experiment: the hour-of-day purchase-rate forecaster is FIT on
    the first 15 calendar days (f_h = train purchases/train events
    per hour; hours unseen in training forecast 0 — the stated
    coalesce knob) and SCORED on the rest. Because the forecast is
    constant within each hour bin, the decomposition is exact:
    BS = REL − RES + UNC with REL = Σn_h(f_h−ō_h)²/n (calibration:
    how far forecasts sit from the outcome rates they preceded),
    RES = Σn_h(ō_h−ō)²/n (sharpness the binning actually earned),
    UNC = ō(1−ō) (climatology floor). The 24 (n_h, c_h, f_h) cells
    PIVOT to one row and every sum assembles in ONE fixed textual
    order of exact-integer-ratio terms (the events_rayleigh_hours
    24-cell device) — bit-identical doubles on both engines. The
    has_skill verdict RES > REL (⇔ BS < UNC: the forecaster beats
    climatology) compares those two bit-identical doubles.

    Scale shape: two keyed reduces over the event stream (train
    cells, eval cells — 24-key space), a 1-row pivot."""
    e = tbl(spark, sf_dir, "events")
    cutoff = e.agg(
        F.date_add(F.min(F.to_date("ts")), 15).alias("cutoff")
    )
    ec = e.crossJoin(F.broadcast(cutoff))
    train = (
        ec.filter(F.to_date("ts") < F.col("cutoff"))
        .groupBy(F.hour("ts").alias("h"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("bt"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("long")
            .alias("at"),
        )
    )
    ev = ec.filter(F.to_date("ts") >= F.col("cutoff")).select(
        F.hour("ts").alias("h"),
        (F.col("event_type") == "purchase").cast("int").alias("o"),
    )
    cells = (
        ev.groupBy("h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nh"),
            F.sum("o").cast("long").alias("ch"),
        )
        .join(F.broadcast(train), "h", "left")
        .select(
            "h",
            "nh",
            "ch",
            F.coalesce(
                F.col("at").cast("double") / F.col("bt"), F.lit(0.0)
            ).alias("fh"),
        )
    )
    piv = cells.agg(
        *[
            expr
            for h in range(24)
            for expr in (
                F.coalesce(
                    F.max(F.when(F.col("h") == h, F.col("nh"))), F.lit(0)
                ).alias(f"n{h}"),
                F.coalesce(
                    F.max(F.when(F.col("h") == h, F.col("ch"))), F.lit(0)
                ).alias(f"c{h}"),
                F.coalesce(
                    F.max(F.when(F.col("h") == h, F.col("fh"))),
                    F.lit(0.0),
                ).alias(f"f{h}"),
            )
        ],
        F.sum("nh").cast("long").alias("n"),
        F.sum("ch").cast("long").alias("c"),
    )
    n, c = F.col("n"), F.col("c")
    obar = c.cast("double") / n
    rel = res = None
    for h in range(24):
        nh, ch, fh = F.col(f"n{h}"), F.col(f"c{h}"), F.col(f"f{h}")
        oh = ch.cast("double") / nh
        rt = F.when(nh > 0, nh * (fh - oh) * (fh - oh)).otherwise(0.0)
        st = F.when(nh > 0, nh * (oh - obar) * (oh - obar)).otherwise(0.0)
        rel = rt if rel is None else rel + rt
        res = st if res is None else res + st
    m = piv.select(
        "n",
        "c",
        (rel / n).alias("rel"),
        (res / n).alias("res"),
        (obar * (1 - obar)).alias("unc"),
    )
    return m.select(
        n.alias("n_eval"),
        c.alias("n_purchases"),
        F.round(F.col("rel") - F.col("res") + F.col("unc"), 6).alias(
            "brier"
        ),
        F.round("rel", 6).alias("reliability"),
        F.round("res", 6).alias("resolution"),
        F.round("unc", 6).alias("uncertainty"),
        (F.col("res") > F.col("rel")).alias("has_skill"),
    )


@register(
    "agg_gwet_ac1",
    """
    WITH wk AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                    WHEN o_orderpriority = '2-HIGH' THEN 2
                    WHEN o_orderpriority = '3-MEDIUM' THEN 3
                    WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 4
                    ELSE 5 END AS rater,
               strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
                   AS week,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    common AS (
        SELECT week FROM wk GROUP BY week HAVING count(*) = 5
    ),
    rk AS (
        SELECT wk.rater, wk.week,
               row_number() OVER (PARTITION BY wk.rater
                                  ORDER BY wk.cents, wk.week) AS r,
               count(*) OVER (PARTITION BY wk.rater) AS n
        FROM wk JOIN common USING (week)
    ),
    cat AS (
        SELECT rater, week, 1 + (3 * (r - 1)) // n AS c
        FROM rk
    ),
    cnt AS (
        SELECT week, c, CAST(count(*) AS BIGINT) AS nc
        FROM cat GROUP BY week, c
    ),
    s AS (
        SELECT CAST(count(DISTINCT week) AS BIGINT) AS nw,
               CAST(sum(nc * (nc - 1)) AS BIGINT) AS a
        FROM cnt
    ),
    tc AS (
        SELECT CAST(sum(CAST(t AS HUGEINT) * t) AS HUGEINT) AS t2
        FROM (SELECT c, CAST(sum(nc) AS BIGINT) AS t
              FROM cnt GROUP BY c)
    )
    SELECT nw AS n_weeks,
           round(CAST(a AS DOUBLE) / (20.0 * nw), 6) AS p_a,
           round((25.0 * CAST(nw AS DOUBLE) * nw - CAST(t2 AS DOUBLE))
                 / (50.0 * nw * nw), 6) AS p_e_gwet,
           round((CAST(a AS DOUBLE) / (20.0 * nw)
                  - (25.0 * CAST(nw AS DOUBLE) * nw - CAST(t2 AS DOUBLE))
                    / (50.0 * nw * nw))
                 / (1 - (25.0 * CAST(nw AS DOUBLE) * nw
                         - CAST(t2 AS DOUBLE)) / (50.0 * nw * nw)), 6)
               AS ac1,
           5 * CAST(nw AS HUGEINT) * a
               > 50 * CAST(nw AS HUGEINT) * nw - 2 * t2
               AS agreement_above_chance
    FROM s CROSS JOIN tc
    """,
    tags=("agg", "stats"),
)
def agg_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 (2008) on the agg_fleiss_kappa frame (5 priority
    raters × common weeks × 3 revenue terciles): same observed
    agreement p_a = A/(20N), but the chance term is Gwet's
    1/(K−1)·Σπ_k(1−π_k) with π_k the POOLED prevalence T_k/(5N) —
    which, using ΣT_k = 5N, collapses EXACTLY to p_e =
    (25N² − ΣT_k²)/(50N²). This is the published repair of the kappa
    paradox: when categories are skewed, Fleiss' Σπ² chance term
    inflates and drags kappa toward 0 at high raw agreement, while
    AC1's π(1−π) form stays bounded — running both on the SAME frame
    makes the divergence visible. The verdict AC1 > 0 clears
    denominators exactly: 5·N·A > 50·N² − 2·ΣT_k²
    (DECIMAL(38)/HUGEINT; the fleiss device). Displays are
    fixed-order doubles of exact integers.

    Scale shape: identical to agg_fleiss_kappa — one keyed reduce to
    the (rater × week) grid, bounded rank windows, two grid
    reduces."""
    o = tbl(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("rater"),
        F.date_format(
            F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd"
        ).alias("week"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    common = (
        wk.groupBy("week")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 5)
        .select("week")
    )
    rk = wk.join(common, "week").select(
        "rater",
        "week",
        F.row_number()
        .over(Window.partitionBy("rater").orderBy("cents", "week"))
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("rater"))
        .alias("n"),
    )
    cat = rk.select(
        "rater", "week", F.expr("1 + (3 * (r - 1)) div n").alias("c")
    )
    cnt = cat.groupBy("week", "c").agg(
        F.count(F.lit(1)).cast("long").alias("nc")
    )
    s = cnt.agg(
        F.countDistinct("week").cast("long").alias("nw"),
        F.sum(F.col("nc") * (F.col("nc") - 1)).cast("long").alias("a"),
    )
    tc = (
        cnt.groupBy("c")
        .agg(F.sum("nc").cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t").cast("decimal(38,0)") * F.col("t")
            ).alias("t2")
        )
    )
    j = s.crossJoin(F.broadcast(tc))
    nw, a, t2 = F.col("nw"), F.col("a"), F.col("t2")
    nwd = nw.cast("double")
    pe = (25.0 * nwd * nw - t2.cast("double")) / (50.0 * nwd * nw)
    pa = a.cast("double") / (20.0 * nw)
    return j.select(
        nw.alias("n_weeks"),
        F.round(pa, 6).alias("p_a"),
        F.round(pe, 6).alias("p_e_gwet"),
        F.round((pa - pe) / (1 - pe), 6).alias("ac1"),
        (
            5 * nw.cast("decimal(38,0)") * a
            > 50 * nw.cast("decimal(38,0)") * nw - 2 * t2
        ).alias("agreement_above_chance"),
    )


@register(
    "agg_scott_pi",
    """
    WITH spend AS (
        SELECT o_custkey,
               CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 2 END
                   AS half,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    both_halves AS (
        SELECT o_custkey FROM spend GROUP BY o_custkey
        HAVING count(*) = 2
    ),
    rk AS (
        SELECT s.o_custkey, s.half,
               row_number() OVER (PARTITION BY s.half
                                  ORDER BY s.cents, s.o_custkey) AS r,
               count(*) OVER (PARTITION BY s.half) AS n
        FROM spend s JOIN both_halves USING (o_custkey)
    ),
    dec AS (
        SELECT o_custkey, half, 1 + (5 * (r - 1)) // n AS q
        FROM rk
    ),
    pair AS (
        SELECT a.q AS q1, b.q AS q2
        FROM dec a JOIN dec b
          ON a.o_custkey = b.o_custkey AND a.half = 1 AND b.half = 2
    ),
    marg AS (
        SELECT k,
               CAST(sum(m) AS BIGINT) AS mk
        FROM (
            SELECT q1 AS k, CAST(count(*) AS BIGINT) AS m
            FROM pair GROUP BY q1
            UNION ALL
            SELECT q2 AS k, CAST(count(*) AS BIGINT) AS m
            FROM pair GROUP BY q2
        ) GROUP BY k
    ),
    s AS (
        SELECT CAST((SELECT count(*) FROM pair) AS BIGINT) AS n,
               CAST((SELECT count(*) FROM pair WHERE q1 = q2) AS BIGINT)
                   AS d,
               CAST(sum(CAST(mk AS HUGEINT) * mk) AS HUGEINT) AS m2
        FROM marg
    )
    SELECT n AS n_customers, d AS n_agree,
           round(CAST(d AS DOUBLE) / n, 6) AS p_o,
           round(CAST(m2 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * n), 6)
               AS p_e_pooled,
           round((CAST(d AS DOUBLE) / n
                  - CAST(m2 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE) * n))
                 / (1 - CAST(m2 AS DOUBLE)
                        / (4.0 * CAST(n AS DOUBLE) * n)), 6) AS scott_pi,
           4 * CAST(n AS HUGEINT) * d > m2 AS agreement_above_chance
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_scott_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scott's π (1955) with the two half-histories as raters
    assigning each both-halves customer a spend QUINTILE (the
    customers_shorrocks_mobility discretization): observed agreement
    p_o = diagonal share, chance p_e = Σ((m_k)/(2n))² with m_k the
    POOLED marginal (row_k + col_k) — the historical midpoint
    between raw percent agreement and Cohen's kappa (which uses the
    PRODUCT of per-rater marginals; on asymmetric raters the two
    disagree, and π is the one matching Fleiss' multi-rater form at
    m = 2 — the docstring-level bridge between the shipped
    agg_cohen_kappa_wt and agg_fleiss_kappa). Marginals, diagonal,
    and n are EXACT integers; the verdict π > 0 clears to 4·n·D >
    Σm_k² (DECIMAL(38)/HUGEINT — no double in the decision);
    displays are fixed-order doubles of exact integers.

    Scale shape: the shorrocks frame — one keyed reduce per half,
    bounded per-half rank windows, one equi-join, a 5-key marginal
    reduce and a 1-row pivot."""
    o = tbl(spark, sf_dir, "orders")
    spend = o.groupBy(
        "o_custkey",
        F.when(
            F.col("o_orderdate") < F.lit("1998-01-01").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
    ).agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    both = (
        spend.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 2)
        .select("o_custkey")
    )
    rk = spend.join(both, "o_custkey").select(
        "o_custkey",
        "half",
        F.row_number()
        .over(Window.partitionBy("half").orderBy("cents", "o_custkey"))
        .cast("long")
        .alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("half"))
        .cast("long")
        .alias("n"),
    )
    dec = rk.select(
        "o_custkey", "half", F.expr("1 + (5 * (r - 1)) div n").alias("q")
    )
    a = dec.filter(F.col("half") == 1).select(
        "o_custkey", F.col("q").alias("q1")
    )
    b = dec.filter(F.col("half") == 2).select(
        "o_custkey", F.col("q").alias("q2")
    )
    pair = a.join(b, "o_custkey").select("q1", "q2")
    marg = (
        pair.groupBy(F.col("q1").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
        .unionAll(
            pair.groupBy(F.col("q2").alias("k")).agg(
                F.count(F.lit(1)).cast("long").alias("m")
            )
        )
        .groupBy("k")
        .agg(F.sum("m").cast("long").alias("mk"))
    )
    tot = pair.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(F.col("q1") == F.col("q2")).cast("long").alias("d"),
    )
    m2 = marg.agg(
        F.sum(F.col("mk").cast("decimal(38,0)") * F.col("mk")).alias("m2")
    )
    s = tot.crossJoin(F.broadcast(m2))
    n, dcol, m2c = F.col("n"), F.col("d"), F.col("m2")
    po = dcol.cast("double") / n
    pe = m2c.cast("double") / (4.0 * n.cast("double") * n)
    return s.select(
        n.alias("n_customers"),
        dcol.alias("n_agree"),
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e_pooled"),
        F.round((po - pe) / (1 - pe), 6).alias("scott_pi"),
        (4 * n.cast("decimal(38,0)") * dcol > m2c).alias(
            "agreement_above_chance"
        ),
    )
