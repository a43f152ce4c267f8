"""Distributed model fitting via exact aggregated moments (the
"sufficient statistics" pattern): OLS / ridge regression and
chi-square feature selection over the `documents` corpus.

Reference parity: the reference engine (SURVEY.md §0.2 — nil surface
beyond GeoParquet I/O) has no modeling layer; these queries are part
of the mandated LLM-training-pipeline extension surface (quality
modeling / feature selection before classifier-based filtering, the
step between heuristic gates and a learned quality model).

Why this shape wins at 100 TB: a linear model with k features needs
only the O(k^2) moment matrix (X'X, X'y) — ONE map-side-combinable
aggregation pass over the corpus, no gradient iterations, no driver
residency beyond a k x k solve. All moments accumulate as int64 /
DECIMAL(38,0) (exact, order-independent — the registry determinism
contract), so the normal-equation solve runs on bit-identical inputs
in Spark and the DuckDB oracle; the solve itself is a fixed-order
chain of IEEE +-*/ ops, textually shared between both engines via the
formula templates below, so every coefficient hash-matches at the
comparator's doubleToLongBits level.

Feature/target choice (documents table): y = n_chars, x1 = whitespace
token count, x2 = distinct token count — integers derived identically
in both engines (functions/text.py tokens() convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

# ---------------------------------------------------------------------------
# Shared formula templates: instantiated as Spark `F.expr` AND spliced
# into the DuckDB oracle SQL, so the double-precision op ORDER is
# textually identical on both sides (the bit-exactness contract).
# Inputs are double-cast moment columns named: nn sx1 sx2 sy c11 c12
# c22 s1y s2y syy (+ lam for ridge).
# ---------------------------------------------------------------------------

_DET = (
    "(nn * (c11 * c22 - c12 * c12) - sx1 * (sx1 * c22 - c12 * sx2)"
    " + sx2 * (sx1 * c12 - c11 * sx2))"
)
_DET0 = (
    "(sy * (c11 * c22 - c12 * c12) - sx1 * (s1y * c22 - c12 * s2y)"
    " + sx2 * (s1y * c12 - c11 * s2y))"
)
_DET1 = (
    "(nn * (s1y * c22 - c12 * s2y) - sy * (sx1 * c22 - c12 * sx2)"
    " + sx2 * (sx1 * s2y - s1y * sx2))"
)
_DET2 = (
    "(nn * (c11 * s2y - s1y * c12) - sx1 * (sx1 * s2y - s1y * sx2)"
    " + sy * (sx1 * c12 - c11 * sx2))"
)
_B0 = f"({_DET0} / {_DET})"
_B1 = f"({_DET1} / {_DET})"
_B2 = f"({_DET2} / {_DET})"
# SSE = y'y - b'X'y (exact OLS identity); SST about the mean.
_SSE = f"(syy - ({_B0} * sy + {_B1} * s1y + {_B2} * s2y))"
_SST = "(syy - sy * sy / nn)"
_R2 = f"(1.0 - {_SSE} / {_SST})"

# Ridge: penalize the two slope diagonals (not the intercept) —
# substitute c11 -> (c11 + lam), c22 -> (c22 + lam) everywhere.


def _ridge(expr: str) -> str:
    return expr.replace("c11", "(c11 + lam)").replace("c22", "(c22 + lam)")


# Single-feature (per-group) OLS on exact moments nn sx sy sxx sxy syy.
_SLOPE1 = "((nn * sxy - sx * sy) / (nn * sxx - sx * sx))"
_ICEPT1 = f"((sy - {_SLOPE1} * sx) / nn)"
_R2_1 = (
    "((nn * sxy - sx * sy) * (nn * sxy - sx * sy)"
    " / ((nn * sxx - sx * sx) * (nn * syy - sy * sy)))"
)

# DuckDB-side exact-moment CTEs (int64 + DECIMAL(38,0)) over a feats
# relation exposing (x1, x2, y) — parameterized so the logistic IRLS
# step below can run the same machinery on a transformed response.


def _sql_moments_cte(feats: str, mom: str = "mom", momd: str = "momd") -> str:
    return f"""
    {mom} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS BIGINT) AS sx1_i,
             CAST(SUM(x2) AS BIGINT) AS sx2_i,
             CAST(SUM(y) AS BIGINT) AS sy_i,
             CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x1) AS DECIMAL(38,0)) AS c11_i,
             CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS c12_i,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0)) AS c22_i,
             CAST(SUM(CAST(x1 AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS s1y_i,
             CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS s2y_i,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy_i
      FROM {feats}
    ),
    {momd} AS (
      SELECT n,
             CAST(n AS DOUBLE) AS nn,
             CAST(sx1_i AS DOUBLE) AS sx1, CAST(sx2_i AS DOUBLE) AS sx2,
             CAST(sy_i AS DOUBLE) AS sy,
             CAST(c11_i AS DOUBLE) AS c11, CAST(c12_i AS DOUBLE) AS c12,
             CAST(c22_i AS DOUBLE) AS c22,
             CAST(s1y_i AS DOUBLE) AS s1y, CAST(s2y_i AS DOUBLE) AS s2y,
             CAST(syy_i AS DOUBLE) AS syy
      FROM {mom}
    )"""


_SQL_DOC_FEATS = """
    feats AS (
      SELECT CAST(n_chars AS BIGINT) AS y,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2
      FROM documents
    )"""

_SQL_MOMENTS = _SQL_DOC_FEATS + "," + _sql_moments_cte("feats")


def _doc_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        F.col("n_chars").cast("bigint").alias("y"),
        F.size(toks).cast("bigint").alias("x1"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("x2"),
    )


def _moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-moment aggregation pass (Spark mirror of _SQL_MOMENTS):
    map-side partial aggregation does almost all the work; the shuffle
    moves one partial-moment row per task."""
    return _moments_from(_doc_feats(spark, sf_dir))


def _moments_from(feats: DataFrame) -> DataFrame:
    def dsum(a: str, b: str):
        return F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).cast(
            "decimal(38,0)"
        )

    mom = feats.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("sx1_i"),
        F.sum("x2").cast("bigint").alias("sx2_i"),
        F.sum("y").cast("bigint").alias("sy_i"),
        dsum("x1", "x1").alias("c11_i"),
        dsum("x1", "x2").alias("c12_i"),
        dsum("x2", "x2").alias("c22_i"),
        dsum("x1", "y").alias("s1y_i"),
        dsum("x2", "y").alias("s2y_i"),
        dsum("y", "y").alias("syy_i"),
    )
    return mom.select(
        "n",
        F.col("n").cast("double").alias("nn"),
        F.col("sx1_i").cast("double").alias("sx1"),
        F.col("sx2_i").cast("double").alias("sx2"),
        F.col("sy_i").cast("double").alias("sy"),
        F.col("c11_i").cast("double").alias("c11"),
        F.col("c12_i").cast("double").alias("c12"),
        F.col("c22_i").cast("double").alias("c22"),
        F.col("s1y_i").cast("double").alias("s1y"),
        F.col("s2y_i").cast("double").alias("s2y"),
        F.col("syy_i").cast("double").alias("syy"),
    )


@query(
    "q_quality_linear_model",
    oracle=f"""
    WITH {_SQL_MOMENTS}
    SELECT n AS n_docs,
           {_B0} AS beta0,
           {_B1} AS beta1,
           {_B2} AS beta2,
           {_R2} AS r2
    FROM momd
    """,
)
def q_quality_linear_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of n_chars on (token count, distinct token count) via
    normal equations on exact moments — the closed-form quality-model
    fit. Plan: ONE corpus aggregation (map-side combine to a 10-number
    moment vector per task, then a single-row reduce) + a constant-time
    Cramer solve expressed in SQL. At 100 TB the corpus pass is the
    entire cost and it is embarrassingly parallel; nothing downstream
    of the one-row moment frame ever sees the corpus again."""
    momd = _moments(spark, sf_dir)
    return momd.select(
        F.col("n").alias("n_docs"),
        F.expr(_B0).alias("beta0"),
        F.expr(_B1).alias("beta1"),
        F.expr(_B2).alias("beta2"),
        F.expr(_R2).alias("r2"),
    )


_LAMBDAS = [0.0, 100000.0, 1000000.0]


@query(
    "q_ridge_shrinkage_path",
    oracle=f"""
    WITH {_SQL_MOMENTS},
    lams AS (SELECT unnest([{", ".join(str(v) for v in _LAMBDAS)}]) AS lam)
    SELECT lam,
           {_ridge(_B0)} AS beta0,
           {_ridge(_B1)} AS beta1,
           {_ridge(_B2)} AS beta2
    FROM momd CROSS JOIN lams
    ORDER BY lam
    """,
)
def q_ridge_shrinkage_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regularization path (slope-diagonal penalty, intercept
    unpenalized) for three lambdas FROM THE SAME moment pass: the
    hyperparameter sweep costs zero additional corpus scans — the k x k
    moment matrix is re-solved per lambda on a one-row frame. This is
    the scale argument for moment-space model selection: at 100 TB you
    pay one pass for the whole lambda grid."""
    momd = _moments(spark, sf_dir)
    lams = momd.sparkSession.createDataFrame(
        [(v,) for v in _LAMBDAS], "lam double"
    )
    return (
        momd.crossJoin(broadcast_narrow(lams))
        .select(
            "lam",
            F.expr(_ridge(_B0)).alias("beta0"),
            F.expr(_ridge(_B1)).alias("beta1"),
            F.expr(_ridge(_B2)).alias("beta2"),
        )
        .orderBy("lam")
    )


_RESID = "(CAST(y AS DOUBLE) - (beta0 + beta1 * CAST(x1 AS DOUBLE) + beta2 * CAST(x2 AS DOUBLE)))"


@query(
    "q_model_residual_outliers",
    oracle=f"""
    WITH {_SQL_MOMENTS},
    model AS (
      SELECT {_B0} AS beta0, {_B1} AS beta1, {_B2} AS beta2 FROM momd
    ),
    feats2 AS (
      SELECT doc_id, lang,
             CAST(n_chars AS BIGINT) AS y,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2
      FROM documents
    )
    SELECT doc_id, lang, y AS n_chars_y, x1 AS n_tokens,
           {_RESID} AS residual,
           abs({_RESID}) AS abs_residual
    FROM feats2 CROSS JOIN model
    ORDER BY abs_residual DESC, doc_id
    LIMIT 20
    """,
)
def q_model_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model APPLY at corpus scale: broadcast the one-row fitted model
    onto every document, score residuals, keep the top-20 worst-fit
    docs (the classic "what does the quality model not explain" audit
    feeding manual review). Plan: the moment pass (one corpus scan) +
    a broadcast cross join (one-row frame of atomic doubles — safe at
    any scale) + TakeOrderedAndProject for the top-k; the second
    corpus scan is map-only."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    feats = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("y"),
        F.size(toks).cast("bigint").alias("x1"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("x2"),
    )
    model = _moments(spark, sf_dir).select(
        F.expr(_B0).alias("beta0"),
        F.expr(_B1).alias("beta1"),
        F.expr(_B2).alias("beta2"),
    )
    return (
        feats.crossJoin(broadcast_narrow(model))
        .select(
            "doc_id",
            "lang",
            F.col("y").alias("n_chars_y"),
            F.col("x1").alias("n_tokens"),
            F.expr(_RESID).alias("residual"),
            F.expr(f"abs({_RESID})").alias("abs_residual"),
        )
        .orderBy(F.col("abs_residual").desc(), "doc_id")
        .limit(20)
    )


@query(
    "q_per_lang_token_char_model",
    oracle=f"""
    WITH feats AS (
      SELECT lang,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS x,
             CAST(n_chars AS BIGINT) AS y
      FROM documents
    ),
    mom AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx_i,
             CAST(SUM(y) AS BIGINT) AS sy_i,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx_i,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy_i,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy_i
      FROM feats GROUP BY lang
    ),
    momd AS (
      SELECT lang, n, CAST(n AS DOUBLE) AS nn,
             CAST(sx_i AS DOUBLE) AS sx, CAST(sy_i AS DOUBLE) AS sy,
             CAST(sxx_i AS DOUBLE) AS sxx, CAST(sxy_i AS DOUBLE) AS sxy,
             CAST(syy_i AS DOUBLE) AS syy
      FROM mom
    )
    SELECT lang, n AS n_docs,
           {_SLOPE1} AS chars_per_token,
           {_ICEPT1} AS intercept,
           {_R2_1} AS r2
    FROM momd
    ORDER BY lang
    """,
)
def q_per_lang_token_char_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED closed-form OLS: an independent chars-per-token model
    per language from one grouped moment aggregation (the shape of
    per-domain / per-source calibration models at scale: the shuffle
    key is the group, the state per group is the O(1) moment vector,
    and group count — languages, sources — is bounded, so the reduce
    side is trivially small no matter the corpus size)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    feats = d.select(
        "lang",
        F.size(toks).cast("bigint").alias("x"),
        F.col("n_chars").cast("bigint").alias("y"),
    )

    def dsum(a: str, b: str):
        return F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).cast(
            "decimal(38,0)"
        )

    momd = (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx_i"),
            F.sum("y").cast("bigint").alias("sy_i"),
            dsum("x", "x").alias("sxx_i"),
            dsum("x", "y").alias("sxy_i"),
            dsum("y", "y").alias("syy_i"),
        )
        .select(
            "lang",
            "n",
            F.col("n").cast("double").alias("nn"),
            F.col("sx_i").cast("double").alias("sx"),
            F.col("sy_i").cast("double").alias("sy"),
            F.col("sxx_i").cast("double").alias("sxx"),
            F.col("sxy_i").cast("double").alias("sxy"),
            F.col("syy_i").cast("double").alias("syy"),
        )
    )
    return momd.select(
        "lang",
        F.col("n").alias("n_docs"),
        F.expr(_SLOPE1).alias("chars_per_token"),
        F.expr(_ICEPT1).alias("intercept"),
        F.expr(_R2_1).alias("r2"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# Chi-square term/label association (feature selection for a quality
# or language classifier): presence-based 2x2 contingency per term.
# ---------------------------------------------------------------------------

_MIN_DF = 20
_CHI2 = (
    "(tot * (a * d - b * c) / (a + b) * ((a * d - b * c) / (c + d))"
    " / (a + c) / (b + d))"
)


@query(
    "q_chi2_term_label_assoc",
    oracle=f"""
    WITH pres AS (
      SELECT DISTINCT doc_id,
             unnest(str_split(text, ' ')) AS term
      FROM documents
    ),
    lab AS (
      SELECT doc_id, CAST(lang = 'en' AS INTEGER) AS is_en FROM documents
    ),
    tot AS (
      SELECT CAST(SUM(is_en) AS BIGINT) AS n1,
             CAST(COUNT(*) - SUM(is_en) AS BIGINT) AS n0
      FROM lab
    ),
    cont AS (
      SELECT p.term,
             CAST(SUM(l.is_en) AS BIGINT) AS a_i,
             CAST(COUNT(*) - SUM(l.is_en) AS BIGINT) AS b_i
      FROM pres p JOIN lab l ON p.doc_id = l.doc_id
      GROUP BY p.term
      HAVING COUNT(*) >= {_MIN_DF}
    ),
    chi AS (
      SELECT term, a_i AS df_en, b_i AS df_rest,
             CAST(a_i AS DOUBLE) AS a, CAST(b_i AS DOUBLE) AS b,
             CAST(n1 - a_i AS DOUBLE) AS c, CAST(n0 - b_i AS DOUBLE) AS d,
             CAST(n1 + n0 AS DOUBLE) AS tot
      FROM cont CROSS JOIN tot
    )
    SELECT term, df_en, df_rest, {_CHI2} AS chi2
    FROM chi
    WHERE c + d > 0
    ORDER BY chi2 DESC, term
    LIMIT 30
    """,
)
def q_chi2_term_label_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square feature selection: which terms are most associated
    with the lang='en' label (presence-based 2x2 contingency per term,
    df >= 20 support floor; terms present in EVERY document carry no
    signal and would 0/0 — excluded by the c + d > 0 guard on both
    sides). The standard vocabulary-selection
    step before training a cheap quality/language classifier.

    Plan: one explode to distinct (doc, term) pairs, one term-keyed
    aggregation carrying the per-doc label (conditional count — no
    second join against the corpus), one two-number global total
    broadcast onto the vocab-sized frame, TakeOrderedAndProject for
    the top-k. Shuffle volume is the distinct doc-term pair set (the
    same pass TF-IDF pays) and the reduce side is vocab-bounded; the
    chi-square arithmetic mirrors the oracle's double op order
    exactly."""
    d = load_table(spark, sf_dir, "documents")
    lab = d.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("is_en")
    )
    pres = (
        d.select(
            "doc_id",
            (F.col("lang") == "en").cast("int").alias("is_en"),
            F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias(
                "term"
            ),
        )
    )
    tot = lab.agg(
        F.sum("is_en").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("is_en")).cast("bigint").alias("n0"),
    )
    cont = (
        pres.groupBy("term")
        .agg(
            F.sum("is_en").cast("bigint").alias("a_i"),
            (F.count(F.lit(1)) - F.sum("is_en")).cast("bigint").alias("b_i"),
        )
        .where(F.col("a_i") + F.col("b_i") >= _MIN_DF)
    )
    chi = cont.crossJoin(broadcast_narrow(tot)).select(
        "term",
        F.col("a_i").alias("df_en"),
        F.col("b_i").alias("df_rest"),
        F.col("a_i").cast("double").alias("a"),
        F.col("b_i").cast("double").alias("b"),
        (F.col("n1") - F.col("a_i")).cast("double").alias("c"),
        (F.col("n0") - F.col("b_i")).cast("double").alias("d"),
        (F.col("n1") + F.col("n0")).cast("double").alias("tot"),
    )
    return (
        chi.where(F.col("c") + F.col("d") > 0)
        .select("term", "df_en", "df_rest", F.expr(_CHI2).alias("chi2"))
        .orderBy(F.col("chi2").desc(), "term")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Logistic regression via two IRLS (iteratively reweighted least
# squares) steps — the actual quality-classifier trainer, still in
# moment space: each IRLS step is ONE weighted-moment corpus pass +
# a constant-time weighted Cramer solve.
#
# Cross-engine exactness strategy:
#   step 1 (from beta=0): eta=0 ⇒ mu=1/2, w=1/4 exactly, working
#     response z0 = 4y-2 ∈ {-2,+2} — an INTEGER, so step 1 is plain
#     OLS on exact integer moments (bit-exact by the same contract as
#     q_quality_linear_model).
#   step 2: mu = sigmoid(eta) is the one transcendental; it is rounded
#     to the 1e-6 grid immediately (the haversine precedent — a ≤1-ulp
#     libm disagreement flips the rounded value only within ~1e-16 of
#     a grid boundary) and clamped to [0.001, 0.999] (standard IRLS
#     weight clipping). Every per-row double after that is a fixed
#     IEEE op chain on (muq, eta, yv) — bit-identical — and each
#     weighted-moment TERM is floored onto a 1e-6 lattice int64 per
#     row, so the cross-partition SUM is exact integer arithmetic
#     (order-independent) on both engines. The estimator is thus
#     "IRLS with 1e-6-latticed weighted moments": deterministic and
#     engine-independent by construction, and within O(1e-6) of
#     textbook IRLS (test_logistic_close_to_sklearn_style_fit checks
#     against an unlatticed numpy IRLS).
# ---------------------------------------------------------------------------

_ETA = "((b0 + (b1 * x1d)) + (b2 * x2d))"
_MUQ = "least(greatest(round(1.0 / (1.0 + exp(-eta)), 6), 0.001), 0.999)"
_WT = "(muq * (1.0 - muq))"
_ZT = f"(eta + ((yv - muq) / {_WT}))"
_LAT = {
    "lw": f"CAST(floor({_WT} * 1000000.0) AS BIGINT)",
    "lwx1": f"CAST(floor(({_WT} * x1d) * 1000000.0) AS BIGINT)",
    "lwx2": f"CAST(floor(({_WT} * x2d) * 1000000.0) AS BIGINT)",
    "lw11": f"CAST(floor((({_WT} * x1d) * x1d) * 1000000.0) AS BIGINT)",
    "lw12": f"CAST(floor((({_WT} * x1d) * x2d) * 1000000.0) AS BIGINT)",
    "lw22": f"CAST(floor((({_WT} * x2d) * x2d) * 1000000.0) AS BIGINT)",
    "lwz": f"CAST(floor(({_WT} * {_ZT}) * 1000000.0) AS BIGINT)",
    "lwx1z": f"CAST(floor((({_WT} * x1d) * {_ZT}) * 1000000.0) AS BIGINT)",
    "lwx2z": f"CAST(floor((({_WT} * x2d) * {_ZT}) * 1000000.0) AS BIGINT)",
}
# Weighted-moment name mapping onto the shared Cramer templates: the
# uniform 1e-6 lattice factor multiplies every A entry AND every b
# entry, so it cancels out of beta = A^{-1} b identically on both
# sides — no rescale needed.
_WM_ALIAS = {
    "nn": "lw", "sx1": "lwx1", "sx2": "lwx2", "sy": "lwz",
    "c11": "lw11", "c12": "lw12", "c22": "lw22",
    "s1y": "lwx1z", "s2y": "lwx2z",
}

# Binary task: fr vs de — the corpus's two document-length extremes
# (a confusable-pair refiner, the second stage real lang-ID systems
# bolt onto a coarse classifier). en/es/zh sit mid-distribution, so a
# LINEAR model on length features cannot beat base rate for them —
# fr-vs-de is the pair where the linear signal actually exists.
_SQL_LOG_FEATS = """
    logfeats AS (
      SELECT CAST(lang = 'fr' AS BIGINT) AS y,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2
      FROM documents
      WHERE lang IN ('de', 'fr')
    )"""


def _log_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.where(F.col("lang").isin("de", "fr")).select(
        (F.col("lang") == "fr").cast("bigint").alias("y"),
        F.size(toks).cast("bigint").alias("x1"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("x2"),
    )


def _sql_irls2_chain(feats: str) -> str:
    """CTE chain fitting the 2-step IRLS on a relation ``feats``
    exposing (y, x1, x2): yields beta1 / mu2 / beta2 / scored CTEs.
    Spliced into every consumer's oracle so the double op order is
    textually identical to the Spark plan."""
    return f"""
    feats1 AS (
      SELECT x1, x2, CAST(4 * y - 2 AS BIGINT) AS y FROM {feats}
    ),
    {_sql_moments_cte("feats1")},
    beta1 AS (SELECT {_B0} AS b0, {_B1} AS b1, {_B2} AS b2 FROM momd),
    step2 AS (
      SELECT CAST(y AS DOUBLE) AS yv, CAST(x1 AS DOUBLE) AS x1d,
             CAST(x2 AS DOUBLE) AS x2d, b0, b1, b2
      FROM {feats} CROSS JOIN beta1
    ),
    eta2 AS (SELECT yv, x1d, x2d, {_ETA} AS eta FROM step2),
    mu2 AS (SELECT yv, x1d, x2d, eta, {_MUQ} AS muq FROM eta2),
    lat AS (
      SELECT {", ".join(f'{e} AS {k}' for k, e in _LAT.items())} FROM mu2
    ),
    wm AS (
      SELECT {", ".join(f'CAST(SUM({v}) AS DECIMAL(38,0)) AS s_{v}' for v in _LAT)}
      FROM lat
    ),
    wmd AS (
      SELECT {", ".join(f'CAST(s_{src} AS DOUBLE) AS {dst}' for dst, src in _WM_ALIAS.items())}
      FROM wm
    ),
    beta2 AS (SELECT {_B0} AS b0, {_B1} AS b1, {_B2} AS b2 FROM wmd),
    scored AS (
      SELECT yv, {_ETA} AS pred FROM mu2 CROSS JOIN beta2
    )"""


# Shared CTE chain through the fitted model (beta2) and the per-doc
# frame (mu2) — spliced into both logistic queries' oracles.
_SQL_LOGISTIC_PREFIX = (
    f"""
    WITH {_SQL_LOG_FEATS},"""
    + _sql_irls2_chain("logfeats")
)


def _irls2(feats: DataFrame):
    """(mu2, beta2, scored) Spark mirror of _sql_irls2_chain over a
    feats frame with (y, x1, x2)."""
    feats1 = feats.select(
        "x1", "x2", (F.lit(4) * F.col("y") - F.lit(2)).cast("bigint").alias("y")
    )
    beta1 = _moments_from(feats1).select(
        F.expr(_B0).alias("b0"), F.expr(_B1).alias("b1"), F.expr(_B2).alias("b2")
    )
    step2 = feats.crossJoin(broadcast_narrow(beta1)).select(
        F.col("y").cast("double").alias("yv"),
        F.col("x1").cast("double").alias("x1d"),
        F.col("x2").cast("double").alias("x2d"),
        "b0", "b1", "b2",
    )
    mu2 = (
        step2.select("yv", "x1d", "x2d", F.expr(_ETA).alias("eta"))
        .select("yv", "x1d", "x2d", "eta", F.expr(_MUQ).alias("muq"))
    )
    # mu2 feeds BOTH the weighted-moment pass and the scoring pass;
    # materialize so the sigmoid/feature pipeline runs once.
    mu2 = materialize(mu2)
    lat = mu2.select(*(F.expr(e).alias(k) for k, e in _LAT.items()))
    # Cast each lattice term to decimal(38,0) BEFORE the sum: per-row
    # terms reach ~1e11-1e13, so an int64 F.sum would wrap silently at
    # tens of millions of documents while the DuckDB oracle sums BIGINT
    # into HUGEINT — the per-row widening keeps both engines exact and
    # order-independent at any corpus size (the dsum pattern above).
    wm = lat.agg(
        *(
            F.sum(F.col(v).cast("decimal(38,0)")).alias(f"s_{v}")
            for v in _LAT
        )
    )
    wmd = wm.select(
        *(
            F.col(f"s_{src}").cast("double").alias(dst)
            for dst, src in _WM_ALIAS.items()
        )
    )
    beta2 = wmd.select(
        F.expr(_B0).alias("b0"), F.expr(_B1).alias("b1"), F.expr(_B2).alias("b2")
    )
    scored = mu2.crossJoin(broadcast_narrow(beta2)).select(
        "yv", F.expr(_ETA).alias("pred")
    )
    return mu2, beta2, scored


@query(
    "q_logistic_quality_model",
    oracle=f"""{_SQL_LOGISTIC_PREFIX},
    acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN (pred > 0.0) = (yv > 0.5)
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM scored
    )
    SELECT n AS n_docs, b0 AS beta0, b1 AS beta1, b2 AS beta2,
           (1000000 * c) // n AS acc_ppm
    FROM acc CROSS JOIN beta2
    """,
)
def q_logistic_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary classifier for the fr/de confusable pair (fr runs ~16%
    longer in this corpus — the one linearly separable language signal)
    trained by TWO IRLS steps on (token count, distinct token count) —
    the learned-filter step of a curation pipeline, expressed as three
    map-side-combinable corpus passes (step-1 integer moments, step-2
    latticed weighted moments, accuracy scoring) with constant-time
    solves between them. No gradient loops, no ML runtime, nothing
    driver-side beyond two 3x3 solves; at 100 TB each pass is an
    embarrassingly parallel aggregate with a one-row reduce, and the
    lambda/feature count k grows the moment vector as O(k^2), not the
    pass count. Exactness: see the module-section comment (step 1 is
    exact integer OLS; step 2 rounds the sigmoid to 1e-6 and lattices
    every weighted-moment term to int64, so both engines sum identical
    integers in any order)."""
    _, beta2, scored = _irls2(_log_feats(spark, sf_dir))
    acc = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr("CASE WHEN (pred > 0.0) = (yv > 0.5) THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("c"),
    )
    return acc.crossJoin(broadcast_narrow(beta2)).select(
        F.col("n").alias("n_docs"),
        F.col("b0").alias("beta0"),
        F.col("b1").alias("beta1"),
        F.col("b2").alias("beta2"),
        F.expr("(1000000 * c) DIV n").alias("acc_ppm"),
    )


@query(
    "q_logistic_score_auc",
    oracle=f"""{_SQL_LOGISTIC_PREFIX},
    per_x AS (
      SELECT pred, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CASE WHEN yv > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS pcnt
      FROM scored GROUP BY pred
    ),
    cum AS (
      SELECT pred, cnt, pcnt,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY pred
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cbefore
      FROM per_x
    ),
    tots AS (
      SELECT CAST(SUM(pcnt) AS BIGINT) AS n_pos,
             CAST(SUM(cnt) - SUM(pcnt) AS BIGINT) AS n_neg,
             CAST(SUM(CAST(pcnt AS HUGEINT) * (2 * cbefore + cnt + 1))
                  AS HUGEINT) AS r2_pos
      FROM cum
    )
    SELECT n_pos, n_neg,
           CAST((r2_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
                // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_ppm
    FROM tots
    """,
)
def q_logistic_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware Mann-Whitney AUC of the trained fr/de logistic
    SCORE against the true label — the evaluation half of the learned
    filter (train → score → rank-quality readout in one engine). The
    score eta is a bit-identical double per doc (fixed IEEE chain on
    exact inputs), so grouping/ordering by it is cross-engine exact,
    and the midrank statistic 2ΣR⁺ is pure int64 arithmetic on the
    distinct-score frame (the q_mannwhitney_auc_contam machinery
    pointed at a model score instead of a raw covariate). Scale: the
    corpus pass is the model pipeline; the ranking window runs on the
    DISTINCT-SCORE frame, bounded by the (token, distinct-token)
    feature grid — far smaller than the corpus."""
    _, _, scored = _irls2(_log_feats(spark, sf_dir))
    per_x = scored.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(F.expr("CASE WHEN yv > 0.5 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("pcnt"),
    )
    w = (
        Window.orderBy("pred")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = per_x.select(
        "pred",
        "cnt",
        "pcnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0))
        .cast("bigint")
        .alias("cbefore"),
    )
    # Midrank statistic and ppm division run in decimal(38,0) (Spark) /
    # HUGEINT (DuckDB): r2_pos ~ 2·n_pos·n and the ×1e6 scaling would
    # wrap int64 once n_pos·n exceeds ~4.6e12 — a few million positive
    # docs — and Spark's non-ANSI wrap is silent while DuckDB errors.
    tots = cum.agg(
        F.sum("pcnt").cast("bigint").alias("n_pos"),
        (F.sum("cnt") - F.sum("pcnt")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pcnt").cast("decimal(38,0)")
            * (2 * F.col("cbefore") + F.col("cnt") + 1)
        ).alias("r2_pos"),
    )
    return tots.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST((r2_pos - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1))"
            " * 1000000"
            " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# Split conformal prediction: distribution-free uncertainty bands for
# the OLS quality model. Proper three-way split (train / calibration /
# test on disjoint doc_id classes), absolute-residual score, the
# ceil(0.9·(n_cal+1))-th smallest calibration score as the band
# half-width, empirical coverage measured on the held-out test split.
# Everything after the (bit-exact) model fit is IEEE-exact per-row
# arithmetic + integer order statistics on the distinct-score frame —
# no new rounding contracts needed.
# ---------------------------------------------------------------------------

_TRAIN_PRED = "doc_id % 2 = 0"
_CAL_PRED = "doc_id % 4 = 1"
_TEST_PRED = "doc_id % 4 = 3"

_SQL_SPLIT_FEATS = """
    sfeats AS (
      SELECT doc_id,
             CAST(n_chars AS BIGINT) AS y,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2
      FROM documents
    )"""


@query(
    "q_conformal_interval_coverage",
    oracle=f"""
    WITH {_SQL_SPLIT_FEATS},
    feats AS (SELECT y, x1, x2 FROM sfeats WHERE {_TRAIN_PRED}),
    {_sql_moments_cte("feats")},
    model AS (
      SELECT {_B0} AS beta0, {_B1} AS beta1, {_B2} AS beta2 FROM momd
    ),
    cal AS (
      SELECT abs({_RESID}) AS ar
      FROM sfeats CROSS JOIN model WHERE {_CAL_PRED}
    ),
    per_x AS (
      SELECT ar, CAST(COUNT(*) AS BIGINT) AS cnt FROM cal GROUP BY ar
    ),
    cum AS (
      SELECT ar, CAST(SUM(cnt) OVER (ORDER BY ar
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS crun
      FROM per_x
    ),
    ncal AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_cal FROM per_x),
    qhat AS (
      SELECT MIN(ar) AS qhat, n_cal FROM cum CROSS JOIN ncal
      WHERE crun >= (9 * (n_cal + 1) + 9) // 10
      GROUP BY n_cal
    ),
    test AS (
      SELECT abs({_RESID}) AS ar
      FROM sfeats CROSS JOIN model WHERE {_TEST_PRED}
    ),
    cov AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN t.ar <= q.qhat THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_cov
      FROM test t CROSS JOIN qhat q
    )
    SELECT n_cal, n_test, qhat,
           (1000000 * n_cov) // n_test AS cov_ppm
    FROM cov CROSS JOIN qhat
    """,
)
def q_conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split conformal prediction band for the OLS quality model:
    fit on the even half, take the ceil(0.9·(n+1))-th smallest
    absolute calibration residual (doc_id%4=1) as the half-width qhat
    — the distribution-free 90% band — and report empirical coverage
    on the disjoint test split (doc_id%4=3). The model-QA primitive a
    data pipeline runs before trusting model-based filtering at scale.

    Scale shape: one moment pass on train; the calibration order
    statistic runs on the DISTINCT-|residual| frame (bounded by the
    integer feature grid) via the same per-value cumulative pattern as
    the AUC/threshold queries — never an unpartitioned corpus sort;
    the coverage pass is map-only with two one-row broadcasts. All
    doubles are fixed IEEE chains on exact inputs, and the order
    statistic / ppm arithmetic is pure int64."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sfeats = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("y"),
        F.size(toks).cast("bigint").alias("x1"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("x2"),
    )
    model = _moments_from(
        sfeats.where(F.expr(_TRAIN_PRED)).select("y", "x1", "x2")
    ).select(
        F.expr(_B0).alias("beta0"),
        F.expr(_B1).alias("beta1"),
        F.expr(_B2).alias("beta2"),
    )
    model = materialize(model)
    cal = (
        sfeats.where(F.expr(_CAL_PRED))
        .crossJoin(broadcast_narrow(model))
        .select(F.expr(f"abs({_RESID})").alias("ar"))
    )
    per_x = cal.groupBy("ar").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.orderBy("ar").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_x.select(
        "ar", F.sum("cnt").over(w).cast("bigint").alias("crun")
    )
    ncal = per_x.agg(F.sum("cnt").cast("bigint").alias("n_cal"))
    qhat = (
        cum.crossJoin(broadcast_narrow(ncal))
        .where(F.expr("crun >= (9 * (n_cal + 1) + 9) DIV 10"))
        .groupBy("n_cal")
        .agg(F.min("ar").alias("qhat"))
    )
    test = (
        sfeats.where(F.expr(_TEST_PRED))
        .crossJoin(broadcast_narrow(model))
        .select(F.expr(f"abs({_RESID})").alias("ar"))
    )
    cov = test.crossJoin(broadcast_narrow(qhat)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.expr("CASE WHEN ar <= qhat THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_cov"),
    )
    return cov.crossJoin(broadcast_narrow(qhat)).select(
        "n_cal",
        "n_test",
        "qhat",
        F.expr("(1000000 * n_cov) DIV n_test").alias("cov_ppm"),
    )


# ---------------------------------------------------------------------------
# One-step Huber robust regression: re-solve the normal equations with
# Huber weights w = min(1, k/|r|) computed from the OLS residuals,
# k = 2 × median |residual| (≈ the textbook 1.345σ with σ from the
# MAD-consistent median). Unlike the logistic step there is NO
# transcendental anywhere — w is a pure IEEE min/divide chain on exact
# inputs — so the only determinism device needed is the same 1e-6
# weighted-moment lattice.
# ---------------------------------------------------------------------------

_HW = "least(1.0, (k / abs(resid)))"
_HLAT = {
    "lw": f"CAST(floor({_HW} * 1000000.0) AS BIGINT)",
    "lwx1": f"CAST(floor(({_HW} * x1d) * 1000000.0) AS BIGINT)",
    "lwx2": f"CAST(floor(({_HW} * x2d) * 1000000.0) AS BIGINT)",
    "lw11": f"CAST(floor((({_HW} * x1d) * x1d) * 1000000.0) AS BIGINT)",
    "lw12": f"CAST(floor((({_HW} * x1d) * x2d) * 1000000.0) AS BIGINT)",
    "lw22": f"CAST(floor((({_HW} * x2d) * x2d) * 1000000.0) AS BIGINT)",
    "lwy": f"CAST(floor(({_HW} * yv) * 1000000.0) AS BIGINT)",
    "lwx1y": f"CAST(floor((({_HW} * x1d) * yv) * 1000000.0) AS BIGINT)",
    "lwx2y": f"CAST(floor((({_HW} * x2d) * yv) * 1000000.0) AS BIGINT)",
    "ldown": f"CASE WHEN {_HW} < 1.0 THEN 1 ELSE 0 END",
}
_HWM_ALIAS = {
    "nn": "lw", "sx1": "lwx1", "sx2": "lwx2", "sy": "lwy",
    "c11": "lw11", "c12": "lw12", "c22": "lw22",
    "s1y": "lwx1y", "s2y": "lwx2y",
}


@query(
    "q_huber_robust_model",
    oracle=f"""
    WITH {_SQL_MOMENTS},
    model AS (
      SELECT {_B0} AS beta0, {_B1} AS beta1, {_B2} AS beta2 FROM momd
    ),
    res AS (
      SELECT CAST(y AS DOUBLE) AS yv, CAST(x1 AS DOUBLE) AS x1d,
             CAST(x2 AS DOUBLE) AS x2d, {_RESID} AS resid
      FROM feats CROSS JOIN model
    ),
    per_a AS (
      SELECT abs(resid) AS ar, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM res GROUP BY abs(resid)
    ),
    cuma AS (
      SELECT ar, CAST(SUM(cnt) OVER (ORDER BY ar
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS crun
      FROM per_a
    ),
    na AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM per_a),
    kk AS (
      SELECT MIN(ar) * 2.0 AS k FROM cuma CROSS JOIN na
      WHERE crun >= (n + 1) // 2
    ),
    hlat AS (
      SELECT {", ".join(f'{e} AS {kname}' for kname, e in _HLAT.items())}
      FROM res CROSS JOIN kk
    ),
    hwm AS (
      SELECT {", ".join(f'CAST(SUM({v}) AS DECIMAL(38,0)) AS s_{v}' for v in _HLAT)}
      FROM hlat
    ),
    hwmd AS (
      SELECT {", ".join(f'CAST(s_{src} AS DOUBLE) AS {dst}' for dst, src in _HWM_ALIAS.items())},
             CAST(s_ldown AS BIGINT) AS n_down
      FROM hwm
    )
    SELECT {_B0} AS hbeta0, {_B1} AS hbeta1, {_B2} AS hbeta2,
           n_down AS n_downweighted, k
    FROM hwmd CROSS JOIN kk
    """,
)
def q_huber_robust_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step Huber robust regression: the OLS quality model
    re-solved with w = min(1, k/|r|) weights (k = 2 × the exact
    lower-median |residual| — the MAD-consistent data-driven
    threshold), downweighting exactly the heavy-tailed documents the
    residual-outlier query surfaces. The robust-statistics companion
    to Theil-Sen/MAD for the MULTIVARIATE fit. Three corpus passes
    (OLS moments, residual median via the distinct-|residual|
    cumulative pattern, Huber-weighted latticed moments) + two 3x3
    solves; every weight is a transcendental-free IEEE chain, so the
    lattice is the only determinism device and the result is
    bit-exact across engines and partitionings."""
    momd = _moments(spark, sf_dir)
    model = materialize(
        momd.select(
            F.expr(_B0).alias("beta0"),
            F.expr(_B1).alias("beta1"),
            F.expr(_B2).alias("beta2"),
        )
    )
    res = (
        _doc_feats(spark, sf_dir)
        .crossJoin(broadcast_narrow(model))
        .select(
            F.col("y").cast("double").alias("yv"),
            F.col("x1").cast("double").alias("x1d"),
            F.col("x2").cast("double").alias("x2d"),
            F.expr(_RESID).alias("resid"),
        )
    )
    res = materialize(res)
    per_a = res.groupBy(F.abs(F.col("resid")).alias("ar")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("ar").rowsBetween(Window.unboundedPreceding, 0)
    cuma = per_a.select(
        "ar", F.sum("cnt").over(w).cast("bigint").alias("crun")
    )
    na = per_a.agg(F.sum("cnt").cast("bigint").alias("n"))
    kk = (
        cuma.crossJoin(broadcast_narrow(na))
        .where(F.expr("crun >= (n + 1) DIV 2"))
        .agg((F.min("ar") * F.lit(2.0)).alias("k"))
    )
    hlat = res.crossJoin(broadcast_narrow(kk)).select(
        *(F.expr(e).alias(kname) for kname, e in _HLAT.items())
    )
    # Per-row decimal(38,0) widening before the sum — same overflow
    # rationale as _irls2's wm (int64 F.sum wraps silently at scale;
    # DuckDB's SUM(BIGINT) is HUGEINT-exact).
    hwm = hlat.agg(
        *(
            F.sum(F.col(v).cast("decimal(38,0)")).alias(f"s_{v}")
            for v in _HLAT
        )
    )
    hwmd = hwm.select(
        *(
            F.col(f"s_{src}").cast("double").alias(dst)
            for dst, src in _HWM_ALIAS.items()
        ),
        F.col("s_ldown").cast("bigint").alias("n_down"),
    )
    return hwmd.crossJoin(broadcast_narrow(kk)).select(
        F.expr(_B0).alias("hbeta0"),
        F.expr(_B1).alias("hbeta1"),
        F.expr(_B2).alias("hbeta2"),
        F.col("n_down").alias("n_downweighted"),
        "k",
    )
