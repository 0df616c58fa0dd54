"""Markup extraction and encoding-repair operators — the step BEFORE
every other curation stage: web corpora arrive as HTML (WET/WARC
extractions) with entity-encoded text and, routinely, mojibake from
UTF-8 bytes mis-decoded as cp1252 somewhere upstream.

Both operators are pure JVM-side expression chains
(``regexp_replace`` / ``replace`` — whole-stage-codegen, no shuffle,
no Python), so at 100 TB they run as a single narrow scan stage and
fuse with whatever filter/projection follows. Cross-engine contract:
every regex avoids backreferences and lookarounds and carries its
flags INLINE (``(?is)``), the subset where Java regex (Spark) and RE2
(DuckDB) agree, so the DuckDB oracles replay the identical chain with
only the ``'g'`` option added.

The reference has no markup surface (its corpus arrives as plain rows,
``src/job.py``) — these extend the engine toward raw web input, the
north-star pipeline's actual head.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pattern, replacement) regexp stages, applied in ORDER. Order is
#: load-bearing: comments and container elements (script/style/noscript)
#: go first so their payloads never leak into text; block closers become
#: newlines BEFORE the generic tag strip (which would otherwise delete
#: the line structure); entities decode AFTER tag stripping so decoded
#: ``&lt;tags&gt;`` survive as literal text (the standard extractor
#: order); ``&amp;`` decodes LAST so ``&amp;lt;`` yields ``&lt;``, not
#: ``<``. Separate per-element patterns instead of ``</\1>`` — RE2 has
#: no backreferences.
_HTML_REGEX_STAGES: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", ""),
    (r"(?is)<script\b[^>]*>.*?</script\s*>", ""),
    (r"(?is)<style\b[^>]*>.*?</style\s*>", ""),
    (r"(?is)<noscript\b[^>]*>.*?</noscript\s*>", ""),
    # block-level boundaries -> newline (br, p/div/li/tr/h1-h6/title...)
    (
        r"(?i)<br\s*/?>|</(?:p|div|li|tr|h[1-6]|title|section|article"
        r"|blockquote|ul|ol|table)\s*>",
        "\n",
    ),
    (r"(?s)<[^>]*>", ""),  # every remaining tag
]

#: literal entity decodes, in order; ``&amp;`` last (see above).
#: ``&nbsp;`` decodes to U+00A0 (the HTML5-correct decode), NOT to an
#: ASCII space: NBSP is content to this pipeline (the same stance as
#: ``text.normalize_text``'s Zs handling), and — load-bearing for
#: :func:`clean_text` — an entity-encoded mojibake sequence like
#: ``Ã&nbsp;`` (the cp1252 mis-decode of 'à', whose second byte IS
#: U+00A0) must re-form the exact character pair ``fix_mojibake``
#: repairs. Decoding to ' ' silently destroyed that repair.
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", "\u00a0"),
    ("&amp;", "&"),
]

#: whitespace canonicalization after extraction: space/tab runs collapse
#: to one space, blank-ish lines disappear (newline runs with interior
#: spaces fold to one newline), leading/trailing whitespace trims.
#: Anchors ``^``/``$`` are whole-string in both engines (no (?m)).
_WS_STAGES: list[tuple[str, str]] = [
    (r"[ \t]+", " "),
    (r" ?\n[ \n]*", "\n"),
    (r"^[ \n]+|[ \n]+$", ""),
]


def strip_html(col: Column | str) -> Column:
    """Extract readable text from an HTML string: drop comments and
    script/style/noscript payloads, turn block boundaries into
    newlines, strip the remaining tags, decode the common named
    entities, and canonicalize whitespace. A deliberately naive
    single-pass extractor (no DOM): attribute values containing ``>``
    truncate their tag early — the standard trade every
    regex-extractor makes; a DOM parse would need Python per row.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _HTML_REGEX_STAGES:
        c = F.regexp_replace(c, F.lit(pat), F.lit(rep))
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, rep in _WS_STAGES:
        c = F.regexp_replace(c, F.lit(pat), F.lit(rep))
    return c


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame form of :func:`strip_html`: ``(id_col, text)`` with the
    markup column replaced by extracted text. Narrow projection — no
    shuffle at any scale."""
    return df.select(id_col, strip_html(html_col).alias("text"))


#: UTF-8-read-as-cp1252 repair table: each LHS is the exact character
#: sequence produced when the UTF-8 encoding of the RHS is decoded as
#: cp1252. Only sequences whose bytes are all *defined* in cp1252 are
#: listed (0x81/0x8D/0x8F/0x90/0x9D gaps — e.g. the bytes of U+201D —
#: mis-decode irrecoverably into C1 controls and are left to the
#: control-strip in :func:`text.normalize_text`). Three-byte
#: punctuation first, then two-byte Latin-1 letters; the families are
#: prefix-disjoint (``â`` U+00E2 / ``Ã`` U+00C3 / ``Â`` U+00C2) so
#: later replaces never see earlier outputs.
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€œ", "“"),  # â€œ -> “
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã ", "à"),  # Ã  -> à   (second byte NBSP)
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¯", "ï"),  # Ã¯ -> ï
    ("Â°", "°"),  # Â° -> °
    ("Â«", "«"),  # Â« -> «
    ("Â»", "»"),  # Â» -> »
    ("Â·", "·"),  # Â· -> ·
]


def fix_mojibake(col: Column | str) -> Column:
    """Repair the classic UTF-8-bytes-read-as-cp1252 corruption for the
    high-frequency punctuation + Latin-1 letter table above (the ftfy
    core case, as a pure literal-replace chain). Idempotent on any text
    that round-trips UTF-8→cp1252 exactly once (the repair outputs
    can only re-form a LHS sequence — e.g. ``“`` is also the third
    char of ``â€“`` — when the input held a truncated or DOUBLE-encoded
    fragment, which no single-pass table repairs fully; such fragments
    shrink but may leave residue like ``Ã‚°``). Safe to run
    unconditionally in a normalize stage."""
    c = F.col(col) if isinstance(col, str) else col
    for bad, good in MOJIBAKE_MAP:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def fix_mojibake_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame form of :func:`fix_mojibake`."""
    return df.select(id_col, fix_mojibake(text_col).alias("text"))


def clean_text(col: Column | str) -> Column:
    """The composed web-text cleaning stage, in the ONE order that is
    correct: ``strip_html`` → :func:`fix_mojibake` →
    ``text.normalize_text``.

    The order is load-bearing, which is why this composition exists as
    an operator instead of a docstring convention:

    - extraction BEFORE repair: markup routinely interrupts a mojibake
      byte pair (``voilÃ<!-- ad -->\\u00a0``), and the entity decode
      must re-form literal characters (``Ã&nbsp;`` → Ã+U+00A0, a
      repairable pair) before the repair table can see them. Repairing
      raw markup misses both.
    - repair BEFORE normalization: the repair table's irrecoverable
      gaps (cp1252-undefined bytes that surface as C1 controls, e.g.
      the 0x9D byte of a mis-decoded '”') are cleaned up by
      normalize's control strip — normalize is the residue sweeper,
      so it runs last. Running it first would also commit to NFC forms
      before the repair re-writes characters.

    ``tests/test_extraction.py`` pins both orderings with fixtures that
    FAIL if a stage is moved; the d101 registration hash-verifies the
    whole composition against a DuckDB replay.
    """
    from etl_example_spark.operators.text import normalize_text

    return normalize_text(fix_mojibake(strip_html(col)))


def clean_text_df(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """DataFrame form of :func:`clean_text`: (id_col, text)."""
    return df.select(id_col, clean_text(html_col).alias("text"))
