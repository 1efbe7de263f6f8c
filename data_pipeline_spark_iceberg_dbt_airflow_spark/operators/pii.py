"""PII detection and redaction over text columns.

The reference pipeline carries no free-text PII handling (its only string
work is renames/casts, /root/reference/README.md:368-384); this is part
of the training-data-pipeline extension set: before a corpus is shipped
to pretraining, personally-identifiable spans (emails, phone numbers,
IP addresses, national-id-shaped numbers) are detected, counted for
audit, and replaced with typed placeholder tags -- the standard
curation step (e.g. the BigCode/ROOTS-style regex pass).

Everything is built-in ``regexp_extract_all`` / ``regexp_replace`` --
pure JVM whole-stage codegen, zero Python, no shuffle: at 100 TB the
scan cost IS the operator cost, and the redacted text replaces the raw
text in-flight (no second materialization of the corpus).

Pattern portability: the same pattern strings run under Spark (Java
``java.util.regex``) and the DuckDB oracle (RE2). They use only the
shared dialect -- character classes, bounded quantifiers, ``\\b`` word
boundaries (both engines define word chars as ``[A-Za-z0-9_]``), no
lookaround -- so detection and redaction are engine-exact.

The synthetic test corpus is PII-free word salad, so ``synth_pii``
deterministically plants spans derived from ``doc_id`` (the same posture
as ``operators/multimodal.synth_media``: injection is clearly-labelled
synthesis; detection/redaction are the real operators and run unchanged
on a real corpus). Injection arithmetic is integer-only and mirrored
in ``synth_pii_sql`` so both engines build byte-identical text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, tag) -- ordered; redaction applies in this order.
#: Patterns are disjoint on any text (shapes can't overlap: an email
#: needs '@', a phone is d3-d3-d4, an SSN d3-d2-d4, an IP has dots
#: between 1-3 digit runs), so per-type counts are independent of order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
)


def pii_count(col: Column, name: str) -> Column:
    """Occurrence count of one PII type (NULL text -> NULL count)."""
    pat = dict((n, p) for n, p, _ in PII_PATTERNS)[name]
    # group index 0 = the whole match (Spark's default is group 1).
    return F.size(F.regexp_extract_all(col, F.lit(pat), 0))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its typed tag, in PII_PATTERNS order.

    Spark ``regexp_replace`` is global; tags contain no word characters
    adjacent to survivors that could create new ``\\b`` matches.
    """
    out = col
    for _, pat, tag in PII_PATTERNS:
        # regexp_replace treats `$` in the replacement as a group ref;
        # the fixed tags contain none.
        out = F.regexp_replace(out, F.lit(pat), F.lit(tag))
    return out


# -- deterministic synthesis (test corpus only) -------------------------

#: doc_id moduli choosing which docs receive which planted span.
SYNTH_MODS = {"email": 3, "phone": 5, "ip": 7, "ssn": 11}


def synth_pii(docs: DataFrame) -> DataFrame:
    """Plant deterministic PII spans into ``text`` as column ``ptext``.

    A doc receives an email iff doc_id % 3 == 0, a phone iff % 5 == 0,
    an IP iff % 7 == 0, an SSN iff % 11 == 0 (so some docs carry several
    types and most carry none, like a real crawl). All span content is
    integer arithmetic on doc_id, mirrored digit-for-digit in
    ``synth_pii_sql``. NULL text stays NULL (concat propagates).
    """
    d = F.col("doc_id")

    def piece(mod: int, *parts: Column) -> Column:
        return F.when(d % mod == 0, F.concat(*parts)).otherwise(F.lit(""))

    s = lambda c: c.cast("string")  # noqa: E731
    email = piece(
        SYNTH_MODS["email"],
        F.lit(" mail user"), s(d), F.lit("@example.com"),
    )
    phone = piece(
        SYNTH_MODS["phone"],
        F.lit(" call 555-"), s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000),
    )
    ip = piece(
        SYNTH_MODS["ip"],
        F.lit(" from 10."), s(d % 256), F.lit("."), s((d * 7) % 256),
        F.lit("."), s(d % 250 + 1),
    )
    ssn = piece(
        SYNTH_MODS["ssn"],
        F.lit(" ssn "), s(d % 900 + 100), F.lit("-"), s(d % 90 + 10),
        F.lit("-"), s(d % 9000 + 1000),
    )
    return docs.withColumn(
        "ptext", F.concat(F.col("text"), email, phone, ip, ssn)
    )


def synth_pii_sql(text: str = "text", doc_id: str = "doc_id") -> str:
    """DuckDB expression producing byte-identical ``ptext``."""
    d = doc_id

    def piece(mod: int, body: str) -> str:
        return f"CASE WHEN {d} % {mod} = 0 THEN {body} ELSE '' END"

    c = "CAST({} AS VARCHAR)".format
    email = piece(3, f"' mail user' || {c(d)} || '@example.com'")
    phone = piece(
        5,
        f"' call 555-' || {c(f'{d} % 900 + 100')} || '-' ||"
        f" {c(f'{d} % 9000 + 1000')}",
    )
    ip = piece(
        7,
        f"' from 10.' || {c(f'{d} % 256')} || '.' ||"
        f" {c(f'({d} * 7) % 256')} || '.' || {c(f'{d} % 250 + 1')}",
    )
    ssn = piece(
        11,
        f"' ssn ' || {c(f'{d} % 900 + 100')} || '-' ||"
        f" {c(f'{d} % 90 + 10')} || '-' || {c(f'{d} % 9000 + 1000')}",
    )
    return f"({text} || {email} || {phone} || {ip} || {ssn})"


def pii_count_sql(expr: str, name: str) -> str:
    pat = dict((n, p) for n, p, _ in PII_PATTERNS)[name]
    return f"len(regexp_extract_all({expr}, '{pat}'))"


def redact_pii_sql(expr: str) -> str:
    """DuckDB redaction chain, same order ('g' = global like Spark)."""
    out = expr
    for _, pat, tag in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{tag}', 'g')"
    return out
