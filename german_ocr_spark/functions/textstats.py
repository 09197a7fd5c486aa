"""Text analysis for training-data pipelines — 3-way consistent.

Language-ID (stopword heuristic), quality scoring, token counting and
document fingerprinting over a text column. Each function exists as a
Spark Column expression (JVM, codegen) and a DuckDB SQL expression
(oracle); the arithmetic is written so both engines produce identical
values (integer counts, double division in the same order, floor-based
rounding to dodge HALF_UP vs HALF_EVEN differences).

These generalize the reference's only text metrics (``len(result.text)``
in ``examples/batch_processing.py:48``) into the quality/filtering
operators a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deliberately small, fixed stopword inventories — the heuristic is the
# operator; the lists are config.
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
EN_STOPWORDS = ("the", "and", "is", "not", "a", "with", "of", "to", "in", "that")

_DE_PAT = r"(?i)\b(" + "|".join(DE_STOPWORDS) + r")\b"
_EN_PAT = r"(?i)\b(" + "|".join(EN_STOPWORDS) + r")\b"
_WS = r"\s+"
_PUNCT = r"""[.,;:!?"'()\[\]-]"""


# ---------------------------------------------------------------- tokens
def token_count_col(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WS, -1))
    )


def token_count_sql(expr: str) -> str:
    return (
        f"case when length(trim({expr})) = 0 then 0 "
        f"else length(regexp_split_to_array(trim({expr}), '\\s+')) end"
    )


# ------------------------------------------------- regex occurrence count
def _count_col(col: Column, pat: str) -> Column:
    # occurrences = parts(split) - 1; identical in Spark (limit=-1) and
    # DuckDB regexp_split_to_array (keeps trailing empties).
    return F.size(F.split(col, pat, -1)) - F.lit(1)


def _count_sql(expr: str, pat: str) -> str:
    lit = pat.replace("\\", "\\\\").replace("'", "''")
    return f"(length(regexp_split_to_array({expr}, E'{lit}')) - 1)"


def stopword_count_col(col: Column, lang: str = "de") -> Column:
    return _count_col(col, _DE_PAT if lang == "de" else _EN_PAT)


def stopword_count_sql(expr: str, lang: str = "de") -> str:
    return _count_sql(expr, _DE_PAT if lang == "de" else _EN_PAT)


def _term_pat(terms) -> str:
    return r"(?i)\b(" + "|".join(terms) + r")\b"


def term_count_col(col: Column, terms) -> Column:
    """Word-boundary, case-insensitive occurrence count of any term in
    `terms` — the lexicon-scan primitive behind blocklist filters."""
    return _count_col(col, _term_pat(terms))


def term_count_sql(expr: str, terms) -> str:
    return _count_sql(expr, _term_pat(terms))


# ---------------------------------------------------------------- langid
def langid_col(col: Column) -> Column:
    """n-gram/stopword heuristic language id: 'de' | 'en' | 'unknown'."""
    de = stopword_count_col(col, "de")
    en = stopword_count_col(col, "en")
    return (
        F.when(de > en, F.lit("de"))
        .when(en > de, F.lit("en"))
        .otherwise(F.lit("unknown"))
    )


def langid_sql(expr: str) -> str:
    de = stopword_count_sql(expr, "de")
    en = stopword_count_sql(expr, "en")
    return (
        f"case when {de} > {en} then 'de' "
        f"when {en} > {de} then 'en' else 'unknown' end"
    )


# --------------------------------------------------------------- quality
def _floor4_col(c: Column) -> Column:
    return F.floor(c * 10000.0) / 10000.0


def _floor4_sql(e: str) -> str:
    return f"(floor(({e}) * 10000.0) / 10000.0)"


def punct_ratio_col(col: Column) -> Column:
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, _PUNCT, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _floor4_col((n - stripped) / n.cast("double"))
    )


def punct_ratio_sql(expr: str) -> str:
    lit = _PUNCT.replace("\\", "\\\\").replace("'", "''")
    n = f"length({expr})"
    stripped = f"length(regexp_replace({expr}, E'{lit}', '', 'g'))"
    return (
        f"case when {n} = 0 then 0.0 else "
        f"{_floor4_sql(f'({n} - {stripped}) / cast({n} as double)')} end"
    )


def stopword_ratio_col(col: Column) -> Column:
    tok = token_count_col(col)
    sw = stopword_count_col(col, "de") + stopword_count_col(col, "en")
    return F.when(tok == 0, F.lit(0.0)).otherwise(
        _floor4_col(sw / tok.cast("double"))
    )


def stopword_ratio_sql(expr: str) -> str:
    tok = token_count_sql(expr)
    sw = f"({stopword_count_sql(expr, 'de')} + {stopword_count_sql(expr, 'en')})"
    return (
        f"case when ({tok}) = 0 then 0.0 else "
        f"{_floor4_sql(f'{sw} / cast(({tok}) as double)')} end"
    )


def _quality_raw_col(col: Column) -> Column:
    n = F.length(col).cast("double")
    len_part = F.least(n, F.lit(2000.0)) / 2000.0 * 0.4
    sw = stopword_ratio_col(col)
    sw_part = F.least(sw, F.lit(0.4)) / 0.4 * 0.4
    pr = punct_ratio_col(col)
    punct_part = (F.lit(1.0) - F.least(pr, F.lit(0.25)) / 0.25) * 0.2
    return len_part + sw_part + punct_part


def _quality_raw_sql(expr: str) -> str:
    n = f"cast(length({expr}) as double)"
    len_part = f"(least({n}, 2000.0) / 2000.0 * 0.4)"
    sw_part = f"(least({stopword_ratio_sql(expr)}, 0.4) / 0.4 * 0.4)"
    punct_part = f"((1.0 - least({punct_ratio_sql(expr)}, 0.25) / 0.25) * 0.2)"
    return f"{len_part} + {sw_part} + {punct_part}"


def quality_score_col(col: Column) -> Column:
    """Composite quality in [0,1]: length + stopword presence - punct excess.

    score = floor4( min(len,2000)/2000 * 0.4 + min(sw_ratio,0.4)/0.4 * 0.4
                    + (1 - min(punct_ratio,0.25)/0.25) * 0.2 )
    """
    return _floor4_col(_quality_raw_col(col))


def quality_score_sql(expr: str) -> str:
    return _floor4_sql(_quality_raw_sql(expr))


def quality_score_e4_col(col: Column) -> Column:
    """quality_score as an exact integer in [0, 10000] — floor(raw*1e4)
    WITHOUT the divide-back-to-double step, so downstream arithmetic
    (means, Brier terms, calibration bins) stays in exact integers.
    floor(quality_score * 1e4) would NOT be safe: floor4's division by
    1e4 rounds to the nearest double, and multiplying back can land an
    ulp below the integer."""
    return F.floor(_quality_raw_col(col) * 10000.0).cast("bigint")


def quality_score_e4_sql(expr: str) -> str:
    return f"CAST(floor(({_quality_raw_sql(expr)}) * 10000.0) AS BIGINT)"


# ------------------------------------------------------------ fingerprint
def fingerprint_col(col: Column) -> Column:
    """Canonical-text md5 fingerprint: lower + whitespace-collapse + md5."""
    canon = F.trim(F.regexp_replace(F.lower(col), _WS, " "))
    return F.md5(canon)


def fingerprint_sql(expr: str) -> str:
    canon = f"trim(regexp_replace(lower({expr}), E'\\\\s+', ' ', 'g'))"
    return f"md5({canon})"
