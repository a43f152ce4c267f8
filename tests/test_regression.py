"""Closed-form regression / feature-selection operators
(operators/regression.py): semantic checks beyond the oracle gate —
the oracle proves Spark==DuckDB; these prove both equal the MATH
(numpy lstsq on the same features) and that the moment-space solve is
numerically sane.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geoparquet_python_spark.operators.regression import (
    q_chi2_term_label_assoc,
    q_logistic_quality_model,
    q_logistic_score_auc,
    q_model_residual_outliers,
    q_per_lang_token_char_model,
    q_quality_linear_model,
    q_ridge_shrinkage_path,
)


def _feats(duck):
    return duck.execute(
        """
        SELECT CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
               CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
        """
    ).df()


def test_linear_model_matches_numpy_lstsq(spark, duck, sf_dir):
    row = q_quality_linear_model(spark, sf_dir).collect()[0]
    f = _feats(duck)
    X = np.column_stack([np.ones(len(f)), f.x1.values, f.x2.values])
    beta, *_ = np.linalg.lstsq(X, f.y.values.astype(float), rcond=None)
    assert row.n_docs == len(f)
    np.testing.assert_allclose(
        [row.beta0, row.beta1, row.beta2], beta, rtol=1e-8
    )
    pred = X @ beta
    ss_res = float(((f.y.values - pred) ** 2).sum())
    ss_tot = float(((f.y.values - f.y.values.mean()) ** 2).sum())
    np.testing.assert_allclose(row.r2, 1 - ss_res / ss_tot, rtol=1e-6)
    assert 0.0 < row.r2 <= 1.0


def test_ridge_path_shrinks_toward_zero_slopes(spark, sf_dir):
    rows = q_ridge_shrinkage_path(spark, sf_dir).collect()
    assert [r.lam for r in rows] == [0.0, 100000.0, 1000000.0]
    # Slope magnitude is non-increasing along the penalty path.
    norms = [r.beta1 * r.beta1 + r.beta2 * r.beta2 for r in rows]
    assert norms[0] >= norms[1] >= norms[2]
    # lambda=0 row IS the OLS solution.
    ols = q_quality_linear_model(spark, sf_dir).collect()[0]
    assert rows[0].beta1 == ols.beta1 and rows[0].beta2 == ols.beta2


def test_residual_outliers_are_the_argmax_rows(spark, duck, sf_dir):
    out = q_model_residual_outliers(spark, sf_dir).toPandas()
    assert len(out) == 20
    assert (out.abs_residual.values[:-1] >= out.abs_residual.values[1:]).all()
    # Every reported residual really is y - X beta for the OLS fit.
    ols = q_quality_linear_model(spark, sf_dir).collect()[0]
    f = duck.execute(
        """
        SELECT doc_id,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS x1,
               CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT) AS x2,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
        """
    ).df().set_index("doc_id")
    for r in out.itertuples():
        fr = f.loc[r.doc_id]
        expect = fr.y - (ols.beta0 + ols.beta1 * fr.x1 + ols.beta2 * fr.x2)
        np.testing.assert_allclose(r.residual, expect, rtol=1e-9)


def test_per_lang_model_covers_all_langs(spark, duck, sf_dir):
    out = q_per_lang_token_char_model(spark, sf_dir).toPandas()
    langs = duck.execute(
        "SELECT DISTINCT lang FROM documents ORDER BY lang"
    ).df()["lang"].tolist()
    assert out.lang.tolist() == langs
    # Sanity: chars per token is positive and r2 in (0, 1].
    assert (out.chars_per_token > 0).all()
    assert ((out.r2 > 0) & (out.r2 <= 1.0)).all()


def test_chi2_terms_nonnegative_and_supported(spark, sf_dir):
    out = q_chi2_term_label_assoc(spark, sf_dir).toPandas()
    assert 0 < len(out) <= 30
    assert (out.chi2 >= 0).all() and np.isfinite(out.chi2.values).all()
    assert ((out.df_en + out.df_rest) >= 20).all()
    assert (out.chi2.values[:-1] >= out.chi2.values[1:]).all()


def test_logistic_close_to_sklearn_style_fit(spark, duck, sf_dir):
    """The latticed 2-step IRLS must track an UNLATTICED numpy IRLS of
    the same two steps to O(lattice) — proving the 1e-6 sigmoid grid /
    moment lattice is a determinism device, not a semantics change."""
    row = q_logistic_quality_model(spark, sf_dir).collect()[0]
    f = duck.execute(
        """
        SELECT CAST(lang = 'fr' AS INT) AS y,
               len(str_split(text, ' ')) AS x1,
               len(list_distinct(str_split(text, ' '))) AS x2
        FROM documents WHERE lang IN ('de', 'fr')
        """
    ).df()
    X = np.column_stack([np.ones(len(f)), f.x1.values, f.x2.values]).astype(
        float
    )
    y = f.y.values.astype(float)
    beta = np.zeros(3)
    for _ in range(2):
        eta = X @ beta
        mu = np.clip(1.0 / (1.0 + np.exp(-eta)), 0.001, 0.999)
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w
        A = (X * w[:, None]).T @ X
        b = (X * w[:, None]).T @ z
        beta = np.linalg.solve(A, b)
    assert row.n_docs == len(f)
    np.testing.assert_allclose(
        [row.beta0, row.beta1, row.beta2], beta, rtol=0, atol=5e-3
    )
    acc = float(((X @ beta > 0) == (y > 0.5)).mean())
    base = max(y.mean(), 1.0 - y.mean())
    assert abs(row.acc_ppm / 1e6 - acc) < 0.02
    # The pair was chosen BECAUSE the linear signal exists: lift > 0.
    assert row.acc_ppm / 1e6 > base


def test_logistic_auc_matches_rank_definition(spark, duck, sf_dir):
    """auc_ppm must equal the P(score_pos > score_neg) + ties/2 rank
    definition computed brute-force over all pos x neg pairs."""
    row = q_logistic_score_auc(spark, sf_dir).collect()[0]
    model = q_logistic_quality_model(spark, sf_dir).collect()[0]
    f = duck.execute(
        """
        SELECT CAST(lang = 'fr' AS INT) AS y,
               len(str_split(text, ' ')) AS x1,
               len(list_distinct(str_split(text, ' '))) AS x2
        FROM documents WHERE lang IN ('de', 'fr')
        """
    ).df()
    score = model.beta0 + model.beta1 * f.x1.values + model.beta2 * f.x2.values
    pos, neg = score[f.y.values == 1], score[f.y.values == 0]
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    auc = (gt + 0.5 * eq) / (len(pos) * len(neg))
    expected_ppm = int(np.floor(auc * 1_000_000))
    assert abs(row.auc_ppm - expected_ppm) <= 1
    assert row.auc_ppm > 500_000  # the learned score must beat chance


def test_chi2_matches_scipy_style_formula(spark, duck, sf_dir):
    out = q_chi2_term_label_assoc(spark, sf_dir).toPandas()
    tot = duck.execute(
        "SELECT SUM(CAST(lang='en' AS INT)) AS n1, COUNT(*) AS n FROM documents"
    ).df()
    n1, n = int(tot.n1[0]), int(tot.n[0])
    n0 = n - n1
    for r in out.head(5).itertuples():
        a, b = float(r.df_en), float(r.df_rest)
        c, d = float(n1 - r.df_en), float(n0 - r.df_rest)
        expect = n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
        np.testing.assert_allclose(r.chi2, expect, rtol=1e-9)


def test_conformal_qhat_is_exact_order_statistic(spark, duck, sf_dir):
    from geoparquet_python_spark.operators.regression import (
        q_conformal_interval_coverage,
    )

    row = q_conformal_interval_coverage(spark, sf_dir).collect()[0]
    f = duck.execute(
        """
        SELECT doc_id, CAST(n_chars AS BIGINT) AS y,
               len(str_split(text, ' ')) AS x1,
               len(list_distinct(str_split(text, ' '))) AS x2
        FROM documents
        """
    ).df()
    train = f[f.doc_id % 2 == 0]
    X = np.column_stack([np.ones(len(train)), train.x1, train.x2]).astype(float)
    beta, *_ = np.linalg.lstsq(X, train.y.values.astype(float), rcond=None)

    def absres(part):
        Xp = np.column_stack([np.ones(len(part)), part.x1, part.x2]).astype(
            float
        )
        return np.abs(part.y.values - Xp @ beta)

    cal = absres(f[f.doc_id % 4 == 1])
    k = -(-9 * (len(cal) + 1) // 10)  # ceil(0.9*(n+1))
    qhat = np.sort(cal)[k - 1]
    assert row.n_cal == len(cal)
    np.testing.assert_allclose(row.qhat, qhat, rtol=1e-9)
    test = absres(f[f.doc_id % 4 == 3])
    cov = (test <= qhat).mean()
    assert abs(row.cov_ppm / 1e6 - cov) < 0.02
    # The 90% band should cover roughly 90% out of sample.
    assert 0.8 < row.cov_ppm / 1e6 <= 1.0


def test_huber_matches_numpy_weighted_solve(spark, duck, sf_dir):
    from geoparquet_python_spark.operators.regression import (
        q_huber_robust_model,
    )

    row = q_huber_robust_model(spark, sf_dir).collect()[0]
    f = _feats(duck)
    X = np.column_stack([np.ones(len(f)), f.x1.values, f.x2.values]).astype(
        float
    )
    y = f.y.values.astype(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = np.abs(y - X @ beta)
    n = len(r)
    k = 2.0 * np.sort(r)[(n + 1) // 2 - 1]  # lower median x2
    np.testing.assert_allclose(row.k, k, rtol=1e-9)
    w = np.minimum(1.0, k / r)
    assert row.n_downweighted == int((w < 1.0).sum())
    A = (X * w[:, None]).T @ X
    b = (X * w[:, None]).T @ y
    hbeta = np.linalg.solve(A, b)
    np.testing.assert_allclose(
        [row.hbeta0, row.hbeta1, row.hbeta2], hbeta, rtol=0, atol=5e-3
    )
