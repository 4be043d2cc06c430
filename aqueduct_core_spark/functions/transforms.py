"""Vectorized payload transforms for the ingest path (Arrow/pandas UDFs).

BASELINE.json mandates that row transforms in the engine run as vectorized
Arrow/pandas UDFs — never per-row Python. This module is that extension point:
a transform is a (DataFrame -> DataFrame) applied inside the micro-batch before
dedup/merge (the reference's payload is opaque; ours is structured text, so
normalization is the natural transform).

The pandas UDFs are built lazily (decorating at import time would require an
active SparkSession); each operates on whole pandas Series per Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _normalize_series(s: pd.Series) -> pd.Series:
    out = s.str.replace(r"[\t\r\n\f\v]", " ", regex=True)
    return out.str.replace(r" {2,}", " ", regex=True).str.strip()


def _redact_series(s: pd.Series) -> pd.Series:
    return s.str.replace(_EMAIL_RE, "<email>", regex=True)


def clean_text_udf():
    """Whitespace-collapse + strip + PII (email) scrub, vectorized over the
    whole Arrow batch with pandas string kernels."""

    @pandas_udf("string")
    def clean_text(s: pd.Series) -> pd.Series:
        return _redact_series(_normalize_series(s))

    return clean_text


def normalize_payload(batch_df: DataFrame, text_col: str = "text") -> DataFrame:
    """Default ingest transform: normalize + scrub the text payload. NULLs
    (tombstones) pass through untouched."""
    c = F.col(text_col)
    return batch_df.withColumn(
        text_col, F.when(c.isNull(), c).otherwise(clean_text_udf()(c))
    )
