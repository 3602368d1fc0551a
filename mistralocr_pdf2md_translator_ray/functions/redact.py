"""PII redaction + n-gram repetition kernels (training-data filters).

Additions beyond the reference (SURVEY.md §2.8 note): the scrubbing and
repetition-quality passes a pretraining corpus pipeline runs before
training — PII masking (emails / phone numbers / IPv4) and the
Gopher-style duplicate-n-gram fractions used to drop boilerplate-heavy
documents. Deterministic, stdlib-only; regexes compile once at import
(per worker process), never per batch.
"""

from __future__ import annotations

import re

# Email before phone/IP: the local part may contain digits, and masking
# it first keeps a phone-looking local part from double-matching.
_EMAIL_RE = re.compile(
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
    r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*\.[A-Za-z]{2,}"
)
# IPv4 before phone: 4 dotted octets would otherwise part-match the
# phone pattern's digit groups. Octet values 0-255 enforced so version
# strings like 1.2.3.4000 don't match.
_OCTET = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
# boundary: no digit / dotted-digit continuation on either side, but a
# bare sentence-ending period after the last octet is fine ("see 8.8.8.8.")
_IPV4_RE = re.compile(rf"(?<!\d)(?<!\d\.)(?:{_OCTET}\.){{3}}{_OCTET}(?!\.?\d)")
# NANP-ish phone: optional +1 country code, 3-3-4 digit groups with
# consistent space/dot/dash separators or a parenthesized area code.
_PHONE_RE = re.compile(
    r"(?<![\dA-Za-z])"
    r"(?:\+?1[ .-])?"
    r"(?:\(\d{3}\)[ .-]?|\d{3}[ .-])"
    r"\d{3}[ .-]\d{4}"
    r"(?![\dA-Za-z])"
)

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(text: str) -> tuple[str, int, int, int]:
    """Mask emails / IPv4 addresses / phone numbers.

    Returns ``(redacted_text, n_emails, n_ips, n_phones)``. Replacement
    order (email -> IP -> phone) is part of the contract: each later
    pattern runs over the already-masked text, so a span can only be
    counted once.
    """
    if not text:
        return (text, 0, 0, 0)
    out, n_email = _EMAIL_RE.subn(EMAIL_TOKEN, text)
    out, n_ip = _IPV4_RE.subn(IP_TOKEN, out)
    out, n_phone = _PHONE_RE.subn(PHONE_TOKEN, out)
    return (out, n_email, n_ip, n_phone)


def dup_ngram_char_frac(toks: list[str], n: int) -> float:
    """Fraction of token characters covered by duplicated word n-grams.

    A token position is "covered" when it belongs to at least one
    occurrence of an n-gram whose total occurrence count in the document
    is > 1 (the Gopher `duplicate n-gram character fraction` family).
    Denominator is the summed length of all tokens; 0.0 when there are
    fewer than ``n`` tokens.
    """
    n_toks = len(toks)
    if n_toks < n:
        return 0.0
    counts: dict[tuple[str, ...], int] = {}
    grams = [tuple(toks[i:i + n]) for i in range(n_toks - n + 1)]
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    covered = bytearray(n_toks)
    for i, g in enumerate(grams):
        if counts[g] > 1:
            for j in range(i, i + n):
                covered[j] = 1
    total_chars = sum(len(t) for t in toks)
    if total_chars == 0:
        return 0.0
    dup_chars = sum(len(t) for t, c in zip(toks, covered) if c)
    return dup_chars / total_chars


def top_ngram_char_frac(toks: list[str], n: int) -> float:
    """Fraction of token characters inside occurrences of the single
    most frequent n-gram (Gopher `top n-gram character fraction`).

    Ties break on lexicographic n-gram order so the result is
    deterministic. Positions covered by overlapping occurrences of the
    winning n-gram count once.
    """
    n_toks = len(toks)
    if n_toks < n:
        return 0.0
    counts: dict[tuple[str, ...], int] = {}
    grams = [tuple(toks[i:i + n]) for i in range(n_toks - n + 1)]
    for g in grams:
        counts[g] = counts.get(g, 0) + 1
    top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    covered = bytearray(n_toks)
    for i, g in enumerate(grams):
        if g == top:
            for j in range(i, i + n):
                covered[j] = 1
    total_chars = sum(len(t) for t in toks)
    if total_chars == 0:
        return 0.0
    return sum(len(t) for t, c in zip(toks, covered) if c) / total_chars


def repetition_metrics(text: str) -> tuple[float, float, float]:
    """(dup_2gram_frac, dup_3gram_frac, top_2gram_frac) over
    whitespace tokens — the boilerplate/repetition quality gate."""
    toks = text.split() if text else []
    return (
        round(dup_ngram_char_frac(toks, 2), 6),
        round(dup_ngram_char_frac(toks, 3), 6),
        round(top_ngram_char_frac(toks, 2), 6),
    )
