"""Tests for the in-engine quality-classifier training (classify.py)."""

from pyspark.sql import functions as F

from dbt_extrica_spark.extensions import classify


def test_logreg_separates_planted_classes(spark):
    # y = 1 iff f_a > 0.5 — linearly separable; the trained scorer must
    # recover it with perfect training accuracy
    rows = [(i, (i % 10) / 10.0, 1 if (i % 10) / 10.0 > 0.5 else 0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, f_a DOUBLE, label INT")
    w = classify.logreg_train(df, ["f_a"], "label", lr=4.0, iters=60)
    scored = classify.logreg_score(df, ["f_a"], w)
    acc = scored.agg(F.avg(
        (F.col("score_pred").cast("int") == F.col("label"))
        .cast("double"))).collect()[0][0]
    assert acc == 1.0
    assert w[1] > 0  # positive feature weight for a positive relationship


def test_logreg_partitioning_independent(spark):
    rows = [(i, ((i * 7) % 13) / 13.0, ((i * 3) % 5) / 5.0, i % 2)
            for i in range(150)]
    df = spark.createDataFrame(
        rows, "id BIGINT, f_a DOUBLE, f_b DOUBLE, label INT")
    a = classify.logreg_train(df.repartition(2), ["f_a", "f_b"], "label",
                              lr=1.0, iters=8)
    b = classify.logreg_train(df.repartition(11), ["f_a", "f_b"], "label",
                              lr=1.0, iters=8)
    assert a == b


def test_logreg_null_rows_excluded_and_empty(spark):
    rows = [(1, 0.2, 1), (2, None, 0), (3, 0.8, None), (4, 0.9, 0)]
    df = spark.createDataFrame(rows, "id BIGINT, f_a DOUBLE, label INT")
    w = classify.logreg_train(df, ["f_a"], "label", lr=1.0, iters=3)
    assert len(w) == 2
    empty = df.where(F.lit(False))
    assert classify.logreg_train(empty, ["f_a"], "label") == [0.0, 0.0]


def test_logreg_score_null_feature_gives_null(spark):
    df = spark.createDataFrame([(1, None), (2, 0.5)],
                               "id BIGINT, f_a DOUBLE")
    got = {r.id: r for r in classify.logreg_score(
        df, ["f_a"], [0.0, 1.0]).collect()}
    assert got[1].score is None
    assert got[2].score is not None and 0.0 <= got[2].score <= 1.0
