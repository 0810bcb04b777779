"""PII detection and redaction over document text.

LLM-training corpora are scrubbed for personally identifiable
information before anything else touches them (reference analog: the
POS feed's fixed-width records carry customer-facing fields straight
into the mart -- `main.py:409-412` trusts the upstream; an analytics
engine at 100 TB cannot). This module provides the scale-correct
Spark shape for the three canonical structured-PII families:

* email addresses
* North-American-style dashed phone numbers
* dotted-quad IPv4 addresses

Everything is JVM-side regexp (`regexp_count` / `regexp_replace`
inside whole-stage codegen): no Python in the hot path, no shuffle at
all -- detection and redaction are pure row-local projections, so the
operator scales embarrassingly with executors and pushes the text
column scan down to parquet.

Determinism / oracle portability: the patterns below use only LITERAL
character classes (`[0-9]`, `[A-Za-z]`) -- never `\\d` / `\\w` / `\\s`,
whose class membership is engine- and unicode-table-sensitive (the
q131 lesson: three driver-red rounds traced to `\\s` boundary
semantics). With literal classes and space-separated match sites, Java
regex (Spark) and RE2 (DuckDB) find identical non-overlapping match
sets, so counts and redacted lengths replay bit-for-bit.

Redaction order is fixed (email, then phone, then IP). The three
counts are computed INDEPENDENTLY on the raw text and may overlap on
adversarial inputs (an email local part may itself contain a dashed
digit triple, e.g. `a-555-123-4567@x.com`, which PHONE_RE matches
inside the span EMAIL_RE redacts first) -- so `n_phone`/`n_ip` can
exceed what `red_len` reflects. The oracle mirrors the same
raw-text counting, so the contract is cross-engine exact either way;
on the registered fixture the match sites are space-separated and
genuinely disjoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Literal-class email matcher. Local part / domain / TLD >= 2 alpha.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"

#: NNN-NNN-NNNN dashed phone.
PHONE_RE = "[0-9][0-9][0-9]-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"

#: Dotted-quad IPv4 (1-3 digit octets; no anchoring -- corpus scrubber
#: semantics favor recall over octet-range validation).
IP_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

_MASKS = ((EMAIL_RE, "[EMAIL]"), (PHONE_RE, "[PHONE]"), (IP_RE, "[IP]"))


def pii_scrub_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document PII audit: match counts per family plus the exact
    character cost of masking them.

    Output: [id, n_email, n_phone, n_ip, orig_len, red_len] -- red_len
    is the length after replacing every match with its `[TYPE]` mask
    (the form a scrub stage would persist).

    Scale: one projection, zero shuffles; `regexp_count` and the three
    chained `regexp_replace`s run inside whole-stage codegen, and only
    `id_col` + `text_col` are read from the scan (column pruning).
    At 100 TB this is the cheapest possible plan shape: map-only, no
    exchange, no Python.
    """
    text = F.col(text_col)
    red = text
    for pat, mask in _MASKS:
        red = F.regexp_replace(red, pat, mask)
    return docs.select(
        F.col(id_col),
        F.regexp_count(text, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(text, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
        F.regexp_count(text, F.lit(IP_RE)).cast("long").alias("n_ip"),
        F.length(text).cast("long").alias("orig_len"),
        F.length(red).cast("long").alias("red_len"),
    )
