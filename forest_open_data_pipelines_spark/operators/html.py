"""HTML → main-text extraction (SURVEY.md §2.D).

Spark twin of the reference's news-article parsing
(``datasets/noticias_agricolas/article_parser.py:1-127`` — h1.page-title
title, div.lead, div.materia paragraph blocks with CTA/boilerplate
paragraphs dropped, ws-normalized and joined with blank lines;
``text_cleanup.py:10-45`` — ``_CTA_LINE``, ``normalize_paragraph_text``,
``normalize_body_text``, ``first_useful_paragraph``).

The reference walks a BeautifulSoup DOM row-by-row in Python; here the
whole extraction is Catalyst regexp/array expressions (JVM, whole-stage
codegen, no Python in the path), which is what survives a 100 TB crawl
corpus: the operator is a pure projection — no shuffle, no UDF — so it
fuses into the scan stage.

Regex dialect note: every pattern must run identically under Java regex
(Spark) and RE2 (the DuckDB oracle) — no backreferences, no lookaround;
inline flags ``(?is)`` and lazy ``.*?`` only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# CTA/boilerplate paragraph filter — text_cleanup.py:9-13 (_CTA_LINE),
# re-derived with the same markers.
CTA_PATTERN = (
    r"(?i)^(receba|cadastre|whatsapp|newsletter|"
    r"clique aqui para receber|siga nosso canal|termo de privacidade)\b"
)

_P_BLOCK = r"(?is)<p[^>]*>(.*?)</p>"
_H1_BLOCK = r"(?is)<h1[^>]*>(.*?)</h1>"
_LEAD_BLOCK = r'(?is)<div class="lead"[^>]*>(.*?)</div>'
_MATERIA_BLOCK = r'(?is)<div class="materia"[^>]*>(.*?)</div>'


def strip_script_style(html: Column) -> Column:
    """Remove <script>/<style> blocks wholesale (two passes — RE2 has no
    backreferences, so ``</\\1>`` is off the table)."""
    out = F.regexp_replace(html, r"(?is)<script[^>]*>.*?</script>", " ")
    return F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")


def strip_tags(fragment: Column) -> Column:
    return F.regexp_replace(fragment, r"(?s)<[^>]*>", " ")


def normalize_ws(text: Column) -> Column:
    """normalize_paragraph_text twin: NBSP → space, collapse blanks, trim."""
    out = F.replace(text, F.lit("\u00a0"), F.lit(" "))
    return F.trim(F.regexp_replace(out, r"[ \t\r\f\v]+", " "))


def _clean_fragment(fragment: Column) -> Column:
    return normalize_ws(strip_tags(fragment))


def extract_article(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Parse an HTML column into (title, lead, body, n_paragraphs,
    first_paragraph) — the ArticleDetail fields that are pure text
    extraction (URL/date plumbing lives with the source, not the parser).

    body = div.materia paragraphs, ws-normalized, CTA paragraphs and
    empties dropped, joined with blank lines (normalize_body_text);
    first_paragraph = first block ≥40 chars, else first ≥15
    (first_useful_paragraph — CTA blocks are already gone).
    """
    html = strip_script_style(F.col(html_col))
    materia = F.regexp_extract(html, _MATERIA_BLOCK, 1)
    paragraphs = F.filter(
        F.transform(
            F.regexp_extract_all(materia, F.lit(_P_BLOCK), F.lit(1)),
            _clean_fragment,
        ),
        lambda p: (p != "") & ~p.rlike(CTA_PATTERN),
    )
    first_useful = F.coalesce(
        F.get(F.filter(paragraphs, lambda p: F.length(p) >= 40), 0),
        F.get(F.filter(paragraphs, lambda p: F.length(p) >= 15), 0),
    )
    return df.withColumns(
        {
            "title": _clean_fragment(F.regexp_extract(html, _H1_BLOCK, 1)),
            "lead": F.nullif(
                _clean_fragment(F.regexp_extract(html, _LEAD_BLOCK, 1)), F.lit("")
            ),
            "body": F.array_join(paragraphs, "\n\n"),
            "n_paragraphs": F.size(paragraphs).cast("long"),
            "first_paragraph": first_useful,
        }
    )


def wrap_documents_as_html(documents: DataFrame) -> DataFrame:
    """Deterministically wrap the synthetic documents table into article
    pages (title/lead/materia/CTA/script markup) so the extractor has
    real structure to strip — the same construction the DuckDB oracle
    performs, making the full wrap→extract round trip checkable."""
    text = F.col("text")
    page = F.concat(
        F.lit('<html><head><title>feed</title><style>p { margin: 0 }</style></head><body>'),
        F.lit('<h1 class="page-title"> '),
        F.col("source"),
        F.lit(" article "),
        F.col("doc_id").cast("string"),
        F.lit(" </h1>"),
        F.lit('<div class="datas">01/01/2024 10:30</div>'),
        F.lit('<div class="lead">'),
        F.substring(text, 1, 60),
        F.lit("</div>"),
        F.lit('<script type="text/javascript">var ads = "x < y";</script>'),
        F.lit('<div class="materia"><p>'),
        # paragraph boundaries at a frequent token so most docs become
        # multi-paragraph (both engines: plain string replace)
        F.replace(text, F.lit(" the "), F.lit("</p><p>")),
        F.lit("</p><p>Receba nossa newsletter diaria</p>"),
        F.lit("<p>WhatsApp: siga nosso canal</p></div>"),
        F.lit("</body></html>"),
    )
    return documents.select("doc_id", page.alias("html"))


def html_extract(documents: DataFrame) -> DataFrame:
    """Catalog query: wrap documents as article HTML, extract main text."""
    return (
        extract_article(wrap_documents_as_html(documents))
        .select(
            "doc_id",
            "title",
            "lead",
            F.substring("body", 1, 400).alias("body_prefix"),
            "n_paragraphs",
            "first_paragraph",
        )
        .orderBy("doc_id")
    )
