"""k-anonymity / l-diversity (operators/privacy.py): hand-computed
group sizes and diversity counts, NULL semantics (quasi NULLs group,
sensitive NULLs add no diversity), report scalars, validation."""

from __future__ import annotations

import pytest

from tableone_pyspark_spark.operators.privacy import (
    k_anonymity,
    k_anonymity_report,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (zip, age_band, diagnosis)
        ("02139", "30-39", "flu"),
        ("02139", "30-39", "flu"),
        ("02139", "30-39", "cold"),
        ("02139", "40-49", "flu"),       # singleton group
        ("94110", "30-39", "flu"),
        ("94110", "30-39", None),        # NULL sensitive: no diversity
        (None, "30-39", "cold"),         # NULL quasi groups together
        (None, "30-39", "cold"),
    ]
    return spark.createDataFrame(
        rows, "zip string, age string, diagnosis string"
    )


def test_group_sizes_and_flags(people):
    rows = {
        (r["zip"], r["age"]): r
        for r in k_anonymity(
            people, ["zip", "age"], k=2, sensitive_col="diagnosis", l=2
        ).collect()
    }
    assert rows[("02139", "30-39")]["n"] == 3
    assert rows[("02139", "30-39")]["anonymous"] is True
    assert rows[("02139", "30-39")]["l_count"] == 2  # flu, cold
    assert rows[("02139", "30-39")]["diverse"] is True

    assert rows[("02139", "40-49")]["n"] == 1
    assert rows[("02139", "40-49")]["anonymous"] is False

    # NULL sensitive values add no diversity: 2 rows, 1 distinct
    assert rows[("94110", "30-39")]["l_count"] == 1
    assert rows[("94110", "30-39")]["diverse"] is False

    # NULL quasi value is its own (published) group
    assert rows[(None, "30-39")]["n"] == 2
    assert rows[(None, "30-39")]["l_count"] == 1  # cold only


def test_without_sensitive_col(people):
    cols = k_anonymity(people, ["zip"], k=3).columns
    assert cols == ["zip", "n", "anonymous"]


def test_report_scalars(people):
    rep = k_anonymity_report(
        people, ["zip", "age"], k=2, sensitive_col="diagnosis", l=2
    )
    assert rep["n_rows"] == 8
    assert rep["n_groups"] == 4
    assert rep["min_group"] == 1
    assert rep["n_risky_rows"] == 1          # the 40-49 singleton
    assert rep["risky_frac"] == 1 / 8
    assert rep["n_undiverse_groups"] == 3    # singleton + 94110 + NULL-zip


def test_empty_and_validation(spark, people):
    empty = spark.createDataFrame([], "zip string, age string")
    rep = k_anonymity_report(empty, ["zip"], k=2)
    assert rep["n_rows"] == 0 and rep["risky_frac"] == 0.0
    with pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity(people, [], k=2)
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(people, ["zip"], k=0)
    with pytest.raises(ValueError, match="l must be"):
        k_anonymity(people, ["zip"], k=2, sensitive_col="diagnosis", l=0)
