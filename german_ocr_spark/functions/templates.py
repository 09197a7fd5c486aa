"""v2 structured-extraction templates as reusable Column builders.

The reference's v2 API (``/root/reference/README.md:241-274,321-322``:
``/v2/analyze`` synchronous premium extraction, ``/v2/models`` template
list) documents four templates — general / invoice / delivery-notes /
document-intelligence — as a contract only; no reference code ships.
This module holds the ONE spelling of each template's field patterns
and Spark Column builders, shared by:

- the oracle-checked registry queries (q91 / q233 / q235 run these
  builders over deterministic dual-engine fixtures), and
- the client facade's synchronous ``analyze_v2`` (the same builders
  over a real document's extracted text).

Patterns are in the RE2 ∩ Java ∩ Python dialect (functions/pii.py
conventions: no lookarounds, no ``\\b``) so the DuckDB oracles run them
verbatim. document-intelligence is not text-shaped — it lives in
``operators/docintel.py`` (per-block bounding boxes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# invoice (reference extract_invoice, extractor.py:225-243; fields per
# InvoiceData extractor.py:19-29). The amount pattern anchors on the
# ' EUR' suffix so digit distractors (Kundennr) can never match.
INV_NO_PAT = "RE-2024-[0-9]+"
INV_DATE_PAT = r"([0-9]{2})\.([0-9]{2})\.([0-9]{4})"
INV_AMT_PAT = "([0-9][0-9.]*),([0-9]{2}) EUR"

# delivery-notes (README.md:241-252: belegnummer/belegdatum/empfaenger/
# positionen). Quantities are single-token '<n>x Artikel' hits.
DN_NO_PAT = "LS-2024-[0-9]+"
DN_EMPF_PAT = "Empfaenger: (.+) Positionen:"
DN_POS_PAT = "([0-9]+)x Artikel"

# general (README.md:249 auto-detect): opening-token detection + the
# letter sender + any German IBAN anywhere in the text.
GEN_SENDER_PAT = "Absender: (.+) vom "
IBAN_PAT = "DE[0-9]{20}"


def _iso_date(txt: str) -> Column:
    """dd.mm.yyyy (first match in ``txt``) → ISO yyyy-mm-dd string."""
    return F.concat(
        F.regexp_extract(txt, INV_DATE_PAT, 3),
        F.lit("-"),
        F.regexp_extract(txt, INV_DATE_PAT, 2),
        F.lit("-"),
        F.regexp_extract(txt, INV_DATE_PAT, 1),
    )


def _amount_cents(txt: str) -> Column:
    """German-locale total ('1.234,56 EUR') → exact integer cents
    (NULL when absent — the reference parses totals into floats,
    extractor.py:28; cents keep results engine-stable)."""
    return F.regexp_replace(
        F.regexp_extract(txt, INV_AMT_PAT, 1), r"\.", ""
    ).cast("bigint") * 100 + F.regexp_extract(txt, INV_AMT_PAT, 2).cast(
        "bigint"
    )


def invoice_fields(txt: str = "txt") -> list[Column]:
    """Columns for the `invoice` template over a text column."""
    return [
        F.regexp_extract(txt, INV_NO_PAT, 0).alias("invoice_no"),
        _iso_date(txt).alias("invoice_date"),
        _amount_cents(txt).alias("amount_cents"),
    ]


def delivery_note_fields(txt: str = "txt") -> list[Column]:
    """Columns for the `delivery-notes` template: Beleg number, ISO
    date, receiver, and the positionen repeated group folded IN-ROW to
    exact count + total quantity (no explode, no shuffle)."""
    return [
        F.regexp_extract(txt, DN_NO_PAT, 0).alias("beleg_no"),
        _iso_date(txt).alias("beleg_date"),
        F.regexp_extract(txt, DN_EMPF_PAT, 1).alias("empfaenger"),
        F.expr(
            f"cast(size(regexp_extract_all({txt}, '{DN_POS_PAT}', 1))"
            " as bigint)"
        ).alias("n_positionen"),
        F.expr(
            f"aggregate(transform(regexp_extract_all({txt}, '{DN_POS_PAT}',"
            " 1), x -> cast(x as bigint)), cast(0 as bigint),"
            " (a, x) -> a + x)"
        ).alias("qty_total"),
    ]


# Detection looks at the TEXT, never at any construction arm — the
# documented auto-detect behavior. Shared verbatim by the q235 oracle.
GEN_DETECT_SQL = (
    "CASE WHEN {txt} LIKE 'Rechnung %' THEN 'invoice'"
    " WHEN {txt} LIKE 'Lieferschein %' THEN 'delivery-notes'"
    " ELSE 'general' END"
)
GEN_SENDER_SQL = (
    "CASE WHEN {txt} LIKE 'Lieferschein %'"
    " THEN regexp_extract({txt}, 'Empfaenger: (.+) Positionen:', 1)"
    " WHEN {txt} LIKE 'Schreiben %'"
    " THEN regexp_extract({txt}, 'Absender: (.+) vom ', 1)"
    " ELSE '' END"
)


def general_fields(txt: str = "txt") -> list[Column]:
    """Columns for the `general` auto-detect template."""
    return [
        F.expr(GEN_DETECT_SQL.format(txt=txt)).alias("document_type"),
        F.expr(GEN_SENDER_SQL.format(txt=txt)).alias("sender"),
        F.expr(
            f"CASE WHEN {txt} LIKE 'Rechnung %' THEN"
            f" cast(replace(regexp_extract({txt}, '{INV_AMT_PAT}', 1),"
            " '.', '') as bigint) * 100"
            f" + cast(regexp_extract({txt}, '{INV_AMT_PAT}', 2) as bigint)"
            " ELSE cast(null as bigint) END"
        ).alias("amount_cents"),
        F.regexp_extract(txt, IBAN_PAT, 0).alias("iban"),
        F.col(txt).alias("full_text"),
    ]


# /v2/models: the template catalog (a 4-row broadcast-cost dimension).
V2_TEMPLATES: dict[str, dict[str, str]] = {
    "general": {
        "description": "Auto-detect document type",
        "key_fields": "document_type, sender, amount_cents, iban, full_text",
    },
    "invoice": {
        "description": "German invoices",
        "key_fields": "invoice_no, invoice_date, amount_cents",
    },
    "delivery-notes": {
        "description": "Delivery notes",
        "key_fields": "beleg_no, beleg_date, empfaenger, n_positionen, qty_total",
    },
    "document-intelligence": {
        "description": "Bounding box extraction",
        "key_fields": "page, block_rank, x0, y0, x1, y1, text",
    },
}

TEMPLATE_FIELDS = {
    "general": general_fields,
    "invoice": invoice_fields,
    "delivery-notes": delivery_note_fields,
}
