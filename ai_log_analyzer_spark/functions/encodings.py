"""Encoding triage over raw crawl bytes: BOM sniff + UTF-8 validity.

The first decision a text pipeline makes about a fetched body is
"what encoding is this?" — misdecoded pages poison every downstream
stage (mojibake survives dedup, breaks tokenization, skews language
ID).  This stage classifies each ``binary`` body WITHOUT decoding it:

- **BOM sniff**: the 2-4 leading bytes name the encoding outright
  (UTF-8 ``EF BB BF``, UTF-16LE/BE ``FF FE``/``FE FF``, UTF-32LE/BE
  ``FF FE 00 00``/``00 00 FE FF``; UTF-32LE is checked BEFORE UTF-16LE
  because the former is a prefix-extension of the latter).
- **UTF-8 validity**: the complete structural UTF-8 grammar (RFC 3629
  — overlongs, surrogates ``ED A0..``, and > U+10FFFF all rejected)
  expressed as ONE anchored regex over the hex transcription of the
  bytes — two hex chars per byte, so byte-range checks become
  character-class checks.  The identical pattern runs in Spark and in
  the DuckDB oracle (shared-kernel contract); a pytest additionally
  cross-checks it against Spark's NATIVE ``is_valid_utf8`` (an
  independent JVM implementation), so the regex itself is verified
  against a second engine, not just mirrored.

Scale: pure codegen projection — hex doubles the bytes in flight for
the length of one expression, linear regex scan, no shuffle, no
Python.  At 100 TB this runs inside the scan stage; the hex blowup is
the documented cost of keeping the kernel engine-portable (the
upgrade path is ``is_valid_utf8`` alone once no oracle must follow).

No counterpart in the reference (log pipeline); task-spec extra for
the web-curation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# complete UTF-8 validation grammar over uppercase hex pairs
_UTF8_HEX_RE = (
    "^("
    "[0-7][0-9A-F]"                                   # 00-7F ASCII
    "|(C[2-9A-F]|D[0-9A-F])[89AB][0-9A-F]"            # C2-DF + cont
    "|E0[AB][0-9A-F][89AB][0-9A-F]"                   # E0 A0-BF + cont
    "|E[1-9A-C]([89AB][0-9A-F]){2}"                   # E1-EC + 2 cont
    "|ED[89][0-9A-F][89AB][0-9A-F]"                   # ED 80-9F (no surr)
    "|E[EF]([89AB][0-9A-F]){2}"                       # EE-EF + 2 cont
    "|F0[9AB][0-9A-F]([89AB][0-9A-F]){2}"             # F0 90-BF + 2 cont
    "|F[1-3]([89AB][0-9A-F]){3}"                      # F1-F3 + 3 cont
    "|F48[0-9A-F]([89AB][0-9A-F]){2}"                 # F4 80-8F + 2 cont
    ")*$")

# (hex prefix, label), longest-prefix first so UTF-32LE beats UTF-16LE
_BOMS = (
    ("0000FEFF", "utf32be"),
    ("FFFE0000", "utf32le"),
    ("EFBBBF", "utf8"),
    ("FEFF", "utf16be"),
    ("FFFE", "utf16le"),
)


def encoding_triage(df: DataFrame, bin_col: str = "body",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_bytes, bom, valid_utf8) per binary body.  ``bom`` is
    '' when no known BOM leads the bytes; ``valid_utf8`` is the
    structural RFC 3629 check over the WHOLE body (BOM included — the
    UTF-16/32 BOMs are themselves invalid UTF-8, which is the point:
    a BOM'd UTF-16 body must never be fed to a UTF-8 decoder)."""
    h = F.hex(F.col(bin_col))
    bom = F.lit("")
    for prefix, label in reversed(_BOMS):
        bom = F.when(h.startswith(prefix), F.lit(label)).otherwise(bom)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(bin_col)).cast("long").alias("n_bytes"),
        bom.alias("bom"),
        h.rlike(_UTF8_HEX_RE).alias("valid_utf8"))


def encoding_triage_sql(bin_table: str) -> str:
    """DuckDB projection over ``bin_table`` (doc_id, body BLOB);
    yields CTE ``triage``."""
    cases = " ".join(
        f"WHEN starts_with(h, '{p}') THEN '{l}'" for p, l in _BOMS)
    return f"""
hexed AS (
  SELECT doc_id, octet_length(body)::BIGINT AS n_bytes,
         upper(hex(body)) AS h
  FROM {bin_table}
),
triage AS (
  SELECT doc_id, n_bytes,
         CASE {cases} ELSE '' END AS bom,
         regexp_matches(h, '{_UTF8_HEX_RE}') AS valid_utf8
  FROM hexed
)"""
