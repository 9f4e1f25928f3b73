"""Deterministic, versioned html→text extraction (byte-stable).

The per-row invariant from BASELINE.json: extracted `text` per `url`
must be byte-identical to the reference pass-through — the distributed
analog of Miller's printrep preservation (a value never arithmetically
touched is written back byte-identically; reference /root/reference/
pkg/mlrval/mlrval_type.go:20-44, OriginalString at
pkg/mlrval/mlrval_output.go:40). The extractor therefore never
round-trips text through any lossy transform: it slices the raw bytes
between fixed markers and decodes utf-8 exactly once.

EXTRACTOR_VERSION participates in checkpoints so a changed extractor
invalidates cached lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACTOR_VERSION = "1.0.0"

_OPEN = "<p>"
_CLOSE = "</p><footer>"


def extract_text_expr(html_col: str):
    """JVM-side extraction: substring between the first <p> and the
    closing marker. decode(utf-8) happens once; no trim, no collapse —
    byte identity is the contract."""
    s = F.decode(F.col(html_col), "UTF-8")
    after = F.substring_index(s, _OPEN, -1)
    return F.substring_index(after, _CLOSE, 1)


def extract_text(df: DataFrame, html_col: str = "html", out: str = "extracted_text") -> DataFrame:
    return df.withColumn(out, extract_text_expr(html_col))


def verify_byte_identity(df: DataFrame, html_col: str = "html", text_col: str = "text") -> int:
    """Number of rows whose extracted text differs from `text` —
    must be 0. Compares the utf-8 BYTES (encode both sides), not just
    string equality, to honor the byte-identity contract."""
    ex = extract_text(df, html_col, "__ex")
    return ex.filter(
        F.encode(F.col("__ex"), "utf-8") != F.encode(F.col(text_col), "utf-8")
    ).count()
