"""PII scrubbing — the masking stage of public-corpus pipelines (C4
strips lines by blocklist; Dolma and BigScience ROOTS mask emails /
phone numbers / IP addresses before release). Detection and redaction
are pure Catalyst regexp expressions (``regexp_count`` /
``regexp_replace``) — no Python, no shuffle, one projection over the
10^12-doc scan.

Pattern philosophy, stated honestly: these are the conservative,
high-precision patterns the public pipelines use (emails, IPv4, E.164-ish
phone numbers, long digit runs). Phone detection is inherently
FP-prone; the pattern here requires separators or a leading +country to
avoid eating ordinary numbers, and the pinned tests encode exactly what
does and does not match. Recall beyond this (names, addresses) needs an
NER model — out of scope for a regex stage and marked as such.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "pii_signals", "redact_pii", "scrub_pii"]

# Order matters for redaction: emails before phones (an email's digits
# must not be half-eaten by the phone pattern), IPs before phones
# (dotted quads contain digit groups a loose phone regex could claim).
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, regex, replacement token)
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
     r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
     "<IP>"),
    # +country or separated groups; demands 9+ digits total via shape,
    # so prices, years, zip codes stay untouched
    ("phone",
     r"(?:\+[0-9]{1,3}[ .-]?)?(?:\([0-9]{2,4}\)[ .-]?)?"
     r"[0-9]{2,4}[ .-][0-9]{2,4}[ .-][0-9]{2,6}",
     "<PHONE>"),
    # 13-19 digit unbroken runs (card/account shaped)
    ("digit_run",
     r"\b[0-9]{13,19}\b",
     "<NUMBER>"),
]


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Input columns + one ``n_<name>`` count per pattern +
    ``n_pii_total``. NULL text counts as 0 everywhere."""
    out = docs
    names = []
    for name, pat, _repl in PII_PATTERNS:
        col = f"n_{name}"
        out = out.withColumn(
            col, F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(pat)),
                F.lit(0)).cast("int"))
        names.append(col)
    total = names[0]
    expr = F.col(names[0])
    for c in names[1:]:
        expr = expr + F.col(c)
    return out.withColumn("n_pii_total", expr)


def redact_pii(docs: DataFrame, text_col: str = "text",
               out_col: str | None = None) -> DataFrame:
    """Replace every match with its type token, applying the patterns in
    ``PII_PATTERNS`` order (emails before phones before digit runs —
    see the ordering note above). Writes ``out_col`` (default:
    overwrite ``text_col``); NULL text passes through NULL."""
    target = out_col or text_col
    expr = F.col(text_col)
    for _name, pat, repl in PII_PATTERNS:
        expr = F.regexp_replace(expr, F.lit(pat), F.lit(repl))
    return docs.withColumn(target, expr)


def scrub_pii(docs: DataFrame, text_col: str = "text",
              drop_over: int | None = None) -> DataFrame:
    """The pipeline stage: redact in place, keep the per-type counts as
    audit columns, and optionally DROP documents whose total PII count
    exceeds ``drop_over`` (a page that is mostly contact data is a
    directory listing, not training text — C4 drops rather than
    shreds those)."""
    counted = pii_signals(docs, text_col)
    if drop_over is not None:
        counted = counted.filter(F.col("n_pii_total") <= drop_over)
    return redact_pii(counted, text_col)
