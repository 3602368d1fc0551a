"""Text analysis kernels: tokenization, language ID, quality, fingerprint.

Additions beyond the reference (SURVEY.md §2.8 note): the scalar ops a
large-scale training-data pipeline needs over a ``documents``-style
table. All deterministic, stdlib+hashlib only.
"""

from __future__ import annotations

import hashlib
import re
import struct

# \S+ so the count is exactly SQL-checkable:
#   len(regexp_extract_all(text, '\S+')) in DuckDB.
_WS_TOKEN_RE = re.compile(r"\S+")
# BPE-ish: words (with inner '/’ apostrophes), numbers, or single
# non-space symbols — the tokenizer used for quality/fingerprint.
_TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\w\s]", re.UNICODE)
_CJK_RE = re.compile(r"[㐀-鿿豈-﫿]")
_CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
_PUNCT_RE = re.compile(r"[^\w\s]")

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
           "with", "as", "on", "this", "are", "be", "was", "not"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "mit", "von", "auf", "für", "im", "des", "sich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "des", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "avec"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "del",
           "que", "en", "por", "para", "con", "no", "se"},
}


_ALL_STOPWORDS = frozenset().union(*_STOPWORDS.values())


# Python str.split() treats U+001C-001F (FS/GS/RS/US) as whitespace;
# rust-regex \s is the Unicode White_Space set, which excludes exactly
# those four (differentially proven over every BMP codepoint in
# TestExplodeTfKernel). Vectorized polars tokenizers translate them
# before \S+ — gated on one cheap scan since real corpora lack them.
CTRL_WS_RE = "[\\x1c-\\x1f]"


def split_tokens_expr(pf, col: str = "text"):
    """Polars expression producing the Python ``text.split()`` token
    list for ``col`` (list[str]; null text -> null). ``pf`` is the
    polars DataFrame the expression will run against — needed for the
    control-separator presence scan."""
    import polars as pl

    text = pl.col(col)
    if pf[col].str.contains(CTRL_WS_RE).any():
        text = text.str.replace_all(CTRL_WS_RE, " ")
    return text.str.extract_all(r"\S+")


def token_count(text: str) -> int:
    """Whitespace token count — SQL-parity kernel.

    ``str.split()`` (no args) counts exactly the ``\\S+`` runs the SQL
    side extracts — both split on Unicode-whitespace runs — at ~2x the
    regex-findall speed (differential-tested incl. hypothesis text in
    TestTextStats)."""
    if not text:
        return 0
    return len(text.split())


def tokenize(text: str) -> list[str]:
    """BPE-ish lowercase tokens for quality scoring / fingerprints."""
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def lang_id(text: str) -> str:
    """Heuristic language ID: script detection first, then stopword
    hit-rate over the tiny profiles; 'und' when nothing matches."""
    if not text or not text.strip():
        return "und"
    if _CJK_RE.search(text):
        return "zh"
    if _CYRILLIC_RE.search(text):
        return "ru"
    words = set(re.findall(r"[a-zà-ÿ]+", text.lower()))
    best_lang, best_hits = "und", 0
    for lang in sorted(_STOPWORDS):
        hits = len(words & _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


def quality_score(text: str, toks: list[str] | None = None) -> float:
    """Composite quality in [0,1]: length, punctuation ratio, stopword
    ratio, mean word length — the usual cheap pretraining filters.
    ``toks`` lets a caller that already tokenized (the fused stats
    actor) skip re-tokenizing; result is identical."""
    if not text or not text.strip():
        return 0.0
    n = len(text)
    if toks is None:
        toks = tokenize(text)
    if not toks:
        return 0.0
    words = [t for t in toks if t[0].isalpha()]
    punct = len(_PUNCT_RE.findall(text))
    punct_ratio = punct / n
    word_ratio = len(words) / len(toks)
    mean_wlen = (sum(len(w) for w in words) / len(words)) if words else 0.0
    stop_ratio = (sum(1 for w in words if w in _ALL_STOPWORDS) / len(words)) if words else 0.0
    length_score = min(1.0, n / 500.0)
    wlen_score = 1.0 if 3.0 <= mean_wlen <= 10.0 else 0.5
    punct_score = 1.0 if punct_ratio <= 0.2 else max(0.0, 1.0 - (punct_ratio - 0.2) * 4)
    stop_score = min(1.0, stop_ratio / 0.2) if stop_ratio < 0.2 else 1.0
    score = (0.3 * length_score + 0.2 * wlen_score + 0.2 * punct_score
             + 0.2 * stop_score + 0.1 * word_ratio)
    return round(score, 6)


def fingerprint64(text: str, toks: list[str] | None = None) -> int:
    """64-bit document fingerprint: blake2b over the normalized token
    stream (rolling-hash analog, stable across whitespace changes)."""
    if toks is None:
        toks = tokenize(text)
    h = hashlib.blake2b(" ".join(toks).encode("utf-8"), digest_size=8)
    return struct.unpack("<q", h.digest())[0]


def content_hash(text: str) -> str:
    """Stable content hash for exact dedup / lineage (hex, 16 bytes)."""
    return hashlib.blake2b((text or "").encode("utf-8"), digest_size=16).hexdigest()
