"""Unicode text normalization — the first stage of every LLM ingest
pipeline: NFC-compose the code points, strip control characters, map
exotic whitespace (NBSP, zero-width) to plain spaces, collapse runs.

Spark has no built-in Unicode normalizer, so NFC runs as an Arrow-batched
``mapInPandas`` kernel over Python's ``unicodedata`` (the reference
implementation of the Unicode standard algorithm — deterministic, so the
DuckDB oracle's ``nfc_normalize`` produces byte-identical output). The
regex cleanup could live JVM-side, but keeping the whole normalization in
ONE kernel means one pass over the corpus bytes and one place where the
cleaning contract is defined.

Scale: embarrassingly parallel per document — no shuffle, no state; the
kernel is Arrow in/out so the only cost over a JVM expression is the
(batched) Python transfer, paid once per corpus scan.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: C0/C1 controls minus tab/newline/CR (those are whitespace, collapsed
#: below), plus DEL
_CTRL = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
#: exotic horizontal whitespace -> plain space (NBSP, en--hair spaces,
#: narrow NBSP, ideographic space, zero-width space, BOM)
_ODD_WS = re.compile("[\u00a0\u2000-\u200b\u202f\u3000\ufeff]")
_WS_RUN = re.compile(r"\s+")


def normalize_text(s: str) -> str:
    """NFC + control strip + whitespace canonicalization of one string
    (the pure function the kernel maps; exposed for tests/oracles)."""
    s = unicodedata.normalize("NFC", s)
    s = _CTRL.sub("", s)
    s = _ODD_WS.sub(" ", s)
    return _WS_RUN.sub(" ", s).strip()


def normalize_text_column(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Append ``out_col`` = normalized ``text_col`` via one Arrow kernel
    pass; all other columns ride through untouched."""
    fields = df.schema.fields + [T.StructField(out_col, T.StringType())]
    schema = T.StructType(fields)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                None if s is None else normalize_text(s) for s in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(_kernel, schema)


def fabricate_dirty_text(text_col: str = "text", id_col: str = "doc_id"):
    """Deterministically soil a clean ASCII column so normalization has
    real work (the multimodal fabricate-then-parse discipline): every 'e'
    decomposes to 'e' + COMBINING ACUTE (U+0301), every third doc's
    spaces become NBSP, and a control-character (U+0001) prefix is
    attached. Pure Column expression — replayable verbatim in the DuckDB
    oracle."""
    c = F.regexp_replace(F.col(text_col), "e", "e\u0301")
    c = F.when(
        F.col(id_col) % 3 == 0, F.regexp_replace(c, " ", "\u00a0")
    ).otherwise(c)
    return F.concat(F.lit("\u0001"), c)
