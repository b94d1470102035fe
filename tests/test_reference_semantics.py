"""Property tests pinning the cleaning layer to the REFERENCE's exact
Python semantics: each property re-implements the reference function
(from helpers.py, transcribed from SURVEY.md §2.3 citations) in pure
Python and compares Spark's vectorized version over generated dirty
inputs."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from geoscale_healthflow_etl_django_analytics_spark.functions import cleaning as C

# ---- pure-Python re-implementations of the reference semantics ----


def ref_interpret_test_result(s):
    # helpers.py:212-226
    if s is None or not str(s).strip():
        return "Unknown"
    up = str(s).strip().upper()
    pos = ["POSITIVE", "POS", "+", "P.FALCIPARUM", "P.VIVAX", "MALARIA"]
    neg = ["NEGATIVE", "NEG", "-", "NO MALARIA", "CLEAN"]
    if any(k in up for k in pos):
        return "Positive"
    if any(k in up for k in neg):
        return "Negative"
    return "Inconclusive"


def ref_clean_gender(s):
    # helpers.py:159-168
    if s is None:
        return "Unknown"
    up = str(s).strip().upper()
    if up in ("M", "MALE", "MAN"):
        return "Male"
    if up in ("F", "FEMALE", "WOMAN"):
        return "Female"
    return "Unknown"


def ref_clean_age(s):
    # helpers.py:149-156 + data_transformer.py:59-61
    try:
        v = int(float(s))
    except (TypeError, ValueError):
        return 30
    if v < 0 or v > 120:
        return 30
    return v


_STATUS_ALPHABET = st.text(
    alphabet="POSITVENGAMLRC+-. abcdefxyz", min_size=0, max_size=24
)


def _run(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r.y for r in df.select(fn(F.col("x")).alias("y")).collect()]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(max_size=12) | st.none(), min_size=50, max_size=50))
def test_py_strip_matches_python_strip(spark, values):
    """The cleaning layer's py_strip must equal Python's bare
    ``str.strip()`` on ARBITRARY unicode — F.trim only strips ASCII
    spaces, which is how 'M\\r' once leaked through clean_gender."""
    got = _run(spark, values, C.py_strip)
    want = [None if v is None else str(v).strip() for v in values]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(_STATUS_ALPHABET | st.none(), min_size=50, max_size=50))
def test_interpret_test_result_matches_reference(spark, values):
    got = _run(spark, values, C.interpret_test_result)
    want = [ref_interpret_test_result(v) for v in values]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["M", "m", " male ", "MAN", "F", "fem", "WOMAN", "woman ", "", "x", None]
        )
        | st.text(max_size=8),
        min_size=50,
        max_size=50,
    )
)
def test_clean_gender_matches_reference(spark, values):
    got = _run(spark, values, C.clean_gender)
    want = [ref_clean_gender(v) for v in values]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-50, max_value=200).map(str),
            st.floats(
                min_value=-50, max_value=200, allow_nan=False, allow_infinity=False
            ).map(lambda f: f"{f:.3f}"),
            st.sampled_from(["", "x", "12abc", None]),
        ),
        min_size=50,
        max_size=50,
    )
)
def test_clean_age_matches_reference(spark, values):
    got = _run(spark, values, C.clean_age)
    want = [ref_clean_age(v) for v in values]
    assert got == want


def test_a13_approx_quantiles_scale_library_surface(spark):
    """The retired-from-registry sketch builder (r10 oracle hygiene)
    stays a working library surface: one row of monotone quantile
    sketches bracketing the exact percentiles within the GK bound."""
    from geoscale_healthflow_etl_django_analytics_spark.registry import (
        a13_approx_quantiles_scale,
    )

    row = a13_approx_quantiles_scale(spark, "/root/testdata/sf0.01").collect()
    assert len(row) == 1
    r = row[0]
    assert r.price_p25 <= r.price_p50 <= r.price_p75 <= r.price_p95
    assert r.approx_distinct_parts > 0
