"""Unicode normalization kernel (functions/textnorm.py): idempotence and
cleanliness on arbitrary unicode, plus the Arrow column path."""

import re
import unicodedata

from hypothesis import given, settings
from hypothesis import strategies as st

from kickhouse_iti_graduate_project_kafka_spark_airflow_gcp_warehouse_powerbi_spark.functions.textnorm import (
    normalize_text,
    normalize_text_column,
)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_normalize_is_idempotent_and_clean(s):
    out = normalize_text(s)
    assert normalize_text(out) == out  # a fixpoint
    assert out == unicodedata.normalize("NFC", out)
    assert not re.search("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", out)
    assert "  " not in out and out == out.strip()


def test_normalize_examples():
    assert normalize_text("qu" + "e\u0301" + "ry") == "qu\u00e9ry"
    assert normalize_text("a\u00a0 b\u200b c  d\t\ne") == "a b c d e"
    assert normalize_text("\u0001\u00a0") == ""


def test_normalize_column_arrow_path(spark):
    df = spark.createDataFrame(
        [(1, "a\u00a0b"), (2, "e\u0301x"), (3, None)], "id long, text string"
    )
    got = {
        r.id: r.clean
        for r in normalize_text_column(df, "text", "clean").collect()
    }
    assert got == {1: "a b", 2: "\u00e9x", 3: None}
