"""Drift guard for the r12 SQL-string expression twins.

The round-12 optimization composes the hot builders' repetitive
expression trees as SQL strings (one JVM parse instead of one py4j
round trip per node — OPTIMIZATION_r12.md finding #1).  Every helper
keeps its Column form next to the `_sql` twin; this suite pins the
two spellings VALUE-EQUAL on adversarial inputs so an edit to one
side cannot silently desynchronize the other.  (The full value
oracles already prove the rewritten queries end-to-end; this is the
focused unit pin for the helpers themselves.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions.exact import (
    fround,
    fround_sql,
)
from geoscale_healthflow_etl_django_analytics_spark.functions.hashing import (
    md5_int32,
    md5_int32_sql,
    md5_int60,
    md5_int60_sql,
)
from geoscale_healthflow_etl_django_analytics_spark.functions.text import (
    tokens,
    tokens_sql,
    word_shingles,
    word_shingles_sql,
)
from geoscale_healthflow_etl_django_analytics_spark.functions.vectors import (
    dot,
    dot_sql,
    norm,
    norm_sql,
    normalized,
    normalized_sql,
)
from geoscale_healthflow_etl_django_analytics_spark.operators.splitting import (
    split_of_cluster,
    split_of_cluster_sql,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "  leading and   trailing   whitespace  ",
    "one",
    "",
    "a b",
    "Mixed CASE text WITH 42 numbers & punct!  tabs\tand runs",
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _pairs(df, col_form, sql_form):
    rows = df.select(
        col_form.alias("a"), F.expr(sql_form).alias("b")
    ).collect()
    return [(r["a"], r["b"]) for r in rows]


def test_tokens_twin(text_df):
    for a, b in _pairs(text_df, tokens(F.col("text")), tokens_sql("text")):
        assert a == b


def test_word_shingles_twin(text_df):
    for k in (2, 3):
        for a, b in _pairs(
            text_df,
            word_shingles(F.col("text"), k),
            word_shingles_sql("text", k),
        ):
            assert a == b


def test_md5_int_twins(text_df):
    for a, b in _pairs(text_df, md5_int32(F.col("text")), md5_int32_sql("text")):
        assert a == b
    for start in (1, 16):
        for a, b in _pairs(
            text_df,
            md5_int60(F.col("text"), start=start),
            md5_int60_sql("text", start=start),
        ):
            assert a == b


def test_fround_twin(spark):
    vals = [0.0, -0.0, 1.2345649, -1.2345651, 4.475, -4.475, 1e-9, -1e-9]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for d in (2, 6):
        for a, b in _pairs(df, fround(F.col("x"), d), fround_sql("x", d)):
            assert repr(a) == repr(b), (a, b, d)


def test_vector_twins(spark):
    df = spark.createDataFrame(
        [
            ([1.0, 2.0, 3.0, 4.0], [0.5, -0.25, 0.125, 2.0]),
            ([-1.5, 0.0, 2.5, -3.0], [1.0, 1.0, 1.0, 1.0]),
        ],
        "u array<double>, v array<double>",
    )
    for a, b in _pairs(df, dot(F.col("u"), F.col("v")), dot_sql("u", "v")):
        assert repr(a) == repr(b)
    for a, b in _pairs(df, norm(F.col("u")), norm_sql("u")):
        assert repr(a) == repr(b)
    for a, b in _pairs(df, normalized(F.col("u")), normalized_sql("u")):
        assert [repr(x) for x in a] == [repr(x) for x in b]


def test_split_of_cluster_twin(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(0, 2000, 7)], "cluster_id long"
    )
    for a, b in _pairs(
        df,
        split_of_cluster(F.col("cluster_id")),
        split_of_cluster_sql("cluster_id"),
    ):
        assert a == b
