"""PII scrubbing for training-data pipelines — replace e-mail
addresses, IPv4 addresses, US-SSN-shaped ids and phone-shaped number
runs with typed placeholder tokens, and count what was replaced.

Everything is ``regexp_replace`` / ``regexp_extract_all`` column
expressions — pure JVM, whole-stage-codegen'd, no Python in the row
path; a scrub of 100 TB is exactly one map-only pass (no shuffle at
all). Patterns deliberately use only the regex subset with identical
semantics in Java's engine and RE2 (character classes, bounded repeats,
``\\b`` ASCII word boundaries; no lookaround, no backreferences) so the
DuckDB contract twin matches byte-for-byte.

Scrub ORDER is part of the contract: email → ipv4 → ssn → phone, each
pattern counted on (and applied to) the text as left by the previous
step. The order resolves containment overlaps deterministically —
SSNs are consumed before the phone pass so an SSN can never be
mis-typed as a phone (the tightened phone shapes no longer overlap
SSN, but the ordering contract stays — it is what the counts mean);
dots break the phone pattern, so ipv4 before phone is belt and
braces. Counts are therefore "matches of pattern i after scrubs
1..i-1", the same number the replacement itself saw.

This is a SHAPE-BASED scrubber (the standard first pass of public
pipeline recipes — C4, Dolma, FineWeb all ship regex PII rules); it
neither validates (555-00-0000 is not a real SSN) nor catches free-text
PII (names, addresses) — a learned NER pass would slot in behind the
same column API as a Pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, replacement) — applied in list order; see module
# docstring for why the order matters.
PII_RULES: list[tuple[str, str, str]] = [
    ("email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
     "<EMAIL>"),
    ("ipv4",
     r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("ssn",
     r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
     "<SSN>"),
    # phone-LIKE shapes only, not bare digit runs: the earlier
    # any-8-chars-of-[0-9 ()-] rule matched year lists, scores and
    # numeric table rows ("in 2020 2021 2022" → "<PHONE>"), silently
    # corrupting non-PII numeric text. Precision-first alternation —
    # a match must carry explicit phone intent: a "+" country code,
    # a parenthesised area code, or hyphenated 3-4-digit grouping
    # (ISO dates 2020-01-15 and year ranges 2020-2021 stay untouched;
    # space-only ungrouped runs like "555 123 4567" are now a
    # documented recall loss, the public-pipeline precision tradeoff).
    ("phone",
     r"(?:\+[0-9]{1,3}[ -]?\(?[0-9]{1,4}\)?(?:[ -]?[0-9]{2,5}){1,4}"
     r"|\([0-9]{2,4}\)[ -]?[0-9]{2,4}(?:[ -]?[0-9]{2,5}){0,3}"
     r"|\b[0-9]{2,4}-[0-9]{3,4}-[0-9]{3,4}(?:-[0-9]{2,5})?"
     r"|\b[0-9]{3}-[0-9]{4})\b",
     "<PHONE>"),
]


def scrubbed_text_expr(text_col: Column) -> Column:
    """The scrub chain as a bare Column (for pipelines that only want
    the transformed text, not the counts) — same order contract."""
    cur = text_col
    for _, pat, repl in PII_RULES:
        cur = F.regexp_replace(cur, pat, repl)
    return cur


def scrub_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(id, clean_text, n_email, n_ipv4, n_ssn, n_phone) — one map-only
    projection; ``clean_text`` has every match replaced by its
    placeholder, ``n_<type>`` counts the replacements (matches seen at
    that step — see module docstring for the overlap contract)."""
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, repl in PII_RULES:
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
                      .cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(F.col(id_col), cur.alias("clean_text"), *counts)
