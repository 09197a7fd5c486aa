"""German OCR post-processing (SURVEY B7) — one rule table, three backends.

Generalizes the reference's per-document "model output → clean text"
step (``german_ocr/ollama_backend.py:137`` strips whitespace; the
German-specific cleanup is the capability the north rule mandates:
umlaut/ß normalization, de-hyphenation at line breaks, Fraktur
confusion maps).

The rules are defined ONCE and rendered to:
  * a vectorized pandas kernel (``normalize_series``) — the pipeline's
    mapInPandas hot path, pure ``Series.str.replace`` (no per-row Python);
  * a Spark Column expression (``normalize_col``) — whole-stage-codegen
    JVM path for SQL-expressible uses;
  * a DuckDB SQL expression (``normalize_sql``) — the driver's oracle.

Regex dialect is restricted to the intersection of Java regex, RE2
(DuckDB) and Python ``re``: no lookaround, only capture groups, ``\\b``,
character classes and inline ``(?i)``. Global, left-to-right,
non-overlapping replacement has identical semantics in all three.
All rules are pure, deterministic and locale-independent — the
bitwise-reproducibility requirement of BASELINE.json.

``\\b`` semantics: Java (default) and RE2 both define the word class
ASCII-only (``[0-9A-Za-z_]``), while Python ``re`` is Unicode-aware —
``ßAe`` has a Java/RE2 boundary before the A but no Python one. The
shared dialect therefore pins ``\\b`` to the ASCII definition, and the
Python renderings translate it to explicit ASCII lookarounds
(``_py_pattern``) so all backends agree on non-ASCII neighbors too.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    pattern: str  # shared regex (Java ∩ RE2 ∩ Python)
    repl: str  # replacement with {1}/{2} group placeholders
    note: str = ""


_CONS = "bcdfghjklmnprstvwxzBCDFGHJKLMNPRSTVWXZ"

# Order matters; applied top to bottom.
RULES: tuple[Rule, ...] = (
    Rule(r"\r\n?", "\n", "normalize CR / CRLF line endings"),
    # Fraktur long-s: 'ſs' ligature-ish sequence → ß, then bare ſ → s.
    Rule(r"ſs", "ß", "long s + s → ß"),
    Rule(r"ſ", "s", "long s → round s"),
    # Fraktur f/s confusion: no German word contains 'fch'; OCR misreads
    # 'sch' as 'fch'. Safe global fix.
    Rule(r"fch", "sch", "f↔s confusion in 'sch'"),
    Rule(r"Fch", "Sch", "f↔s confusion, capitalized"),
    # u/n confusion: 'nnd' is not German; OCR misread of 'und'.
    Rule(r"\bnnd\b", "und", "u↔n confusion in 'und'"),
    Rule(r"\bNnd\b", "Und", "u↔n confusion, capitalized"),
    # De-hyphenation at line breaks: 'Versiche-\nrung' → 'Versicherung'.
    # Only joins when the continuation starts lowercase (keeps genuine
    # compounds like 'Nord-\nWest' intact as 'Nord-West' via later \n fold).
    Rule(r"([A-Za-zÄÖÜäöüß])-\n([a-zäöüß])", "{1}{2}", "de-hyphenate line break"),
    # Transliterated umlauts → umlauts. Word-initial and post-consonant
    # digraphs only: avoids 'neue', 'Quelle', 'aue' (vowel/q before the
    # digraph blocks the rewrite).
    Rule(r"\bAe", "Ä", "word-initial Ae"),
    Rule(r"\bOe", "Ö", "word-initial Oe"),
    Rule(r"\bUe", "Ü", "word-initial Ue"),
    Rule(rf"([{_CONS}])ae", "{1}ä", "post-consonant ae"),
    Rule(rf"([{_CONS}])oe", "{1}ö", "post-consonant oe"),
    Rule(rf"([{_CONS}])ue", "{1}ü", "post-consonant ue"),
    # Whitespace canonicalization (reference strips output whitespace,
    # ollama_backend.py:137).
    Rule(r"\n", " ", "fold line breaks"),
    Rule(r"[ \t]+", " ", "collapse runs of spaces"),
)


def _py_repl(repl: str) -> str:
    return repl.replace("{1}", "\\1").replace("{2}", "\\2")


_ASCII_W = "0-9A-Za-z_"


def _py_pattern(pat: str) -> str:
    """Render a shared-dialect pattern for Python ``re``: ``\\b`` becomes
    an explicit ASCII-word-class lookaround so Python matches exactly
    where Java/RE2 do (see module docstring). Left boundary when a word
    char follows, right boundary otherwise — all RULES use edge \\b."""
    out = []
    i = 0
    while i < len(pat):
        if pat[i : i + 2] == "\\b":
            follows_word = bool(re.match(r"[0-9A-Za-z_]", pat[i + 2 : i + 3]))
            out.append(
                f"(?<![{_ASCII_W}])" if follows_word else f"(?![{_ASCII_W}])"
            )
            i += 2
        else:
            out.append(pat[i])
            i += 1
    return "".join(out)


def _java_repl(repl: str) -> str:
    return repl.replace("{1}", "$1").replace("{2}", "$2")


def _duck_repl(repl: str) -> str:
    return repl.replace("{1}", "\\1").replace("{2}", "\\2")


# Precompiled for the pandas kernel (ASCII-\b translated).
_COMPILED: tuple[tuple[re.Pattern, str], ...] = tuple(
    (re.compile(_py_pattern(r.pattern)), _py_repl(r.repl)) for r in RULES
)


def normalize_text(s: str) -> str:
    """Scalar reference implementation (tests / golden oracle): the
    rule chain applied literally, one pass per rule."""
    if s is None:
        return None
    for pat, repl in _COMPILED:
        s = pat.sub(repl, s)
    return s.strip()


def _normalize_series_sequential(s):
    """Python-regex fallback: the RULES chain applied literally, one
    ``Series.str.replace`` pass per rule — identical to
    ``normalize_text`` by construction. (An earlier 5-pass "fused"
    fallback broke its own fusion proof once \\b became ASCII
    lookarounds: fusing the ſ-rules with the ``nnd`` rules lets the
    lookaround see the pre-ſ→s text, so ``Bünndſ`` diverged. The
    fallback only exists for pyarrow-less hosts, where correctness
    beats the ~2x pass saving — keep it literal.)"""
    out = s.fillna("")
    for pat, repl in _COMPILED:
        out = out.str.replace(pat, repl, regex=True)
    out = out.str.strip()
    return out.where(~s.isna(), None)


try:  # Arrow/RE2 fast path availability probe
    import pyarrow as _pa
    import pyarrow.compute as _pc

    _pc.replace_substring_regex
    _HAS_ARROW_RE2 = True
except Exception:  # pragma: no cover — pyarrow is baked into this env
    _HAS_ARROW_RE2 = False


def _normalize_series_arrow(s):
    """Arrow/RE2 kernel: the RULES chain applied rule-for-rule via
    ``pyarrow.compute.replace_substring_regex`` (C++ RE2, zero Python
    per match) — identical output BY CONSTRUCTION (same per-rule global
    replace; RE2's \\b is the shared dialect's ASCII definition).
    ~3.3x faster than the fused Python chain on corpus text, which
    directly raises extraction docs/s (normalization dominates the
    kernel profile)."""
    arr = _pa.array(s.fillna(""), type=_pa.string())
    for r in RULES:
        arr = _pc.replace_substring_regex(
            arr, pattern=r.pattern, replacement=_duck_repl(r.repl)
        )
    arr = _pc.utf8_trim_whitespace(arr)
    out = arr.to_pandas().astype(object)
    out.index = s.index
    return out.where(~s.isna(), None)


def normalize_series(s):
    """Vectorized pandas kernel: Series[str] → Series[str].

    Arrow/RE2 when available (the default in this environment),
    literal sequential Python-regex otherwise; both equal the rule
    chain (``normalize_text``) — asserted by the brute-force and
    hypothesis suites, which exercise BOTH paths explicitly. This is
    the 'ocr' kernel the pipeline runs inside mapInPandas (SURVEY
    B7/B16)."""
    if _HAS_ARROW_RE2:
        return _normalize_series_arrow(s)
    return _normalize_series_sequential(s)


def normalize_col(col: Column) -> Column:
    """Spark Column expression (JVM, whole-stage codegen)."""
    out = col
    for r in RULES:
        out = F.regexp_replace(out, r.pattern, _java_repl(r.repl))
    return F.trim(out)


def duck_lit(s: str) -> str:
    """DuckDB E-string literal: \\ doubled, quotes doubled, control chars escaped."""
    s = (
        s.replace("\\", "\\\\")
        .replace("'", "''")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return "E'" + s + "'"


def normalize_sql(expr: str) -> str:
    """DuckDB SQL expression string computing the same function.

    DuckDB regexp_replace needs the 'g' flag for global replacement and
    uses RE2 — every pattern in RULES is RE2-compatible by construction.
    """
    out = expr
    for r in RULES:
        out = (
            f"regexp_replace({out}, {duck_lit(r.pattern)}, "
            f"{duck_lit(_duck_repl(r.repl))}, 'g')"
        )
    return f"trim({out})"
