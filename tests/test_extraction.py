"""Markup extraction + mojibake repair (operators/extraction.py).

The mojibake table is validated MECHANICALLY: every (bad, good) pair
must satisfy ``good.encode('utf-8').decode('cp1252') == bad`` — the
table cannot silently contain a mistyped sequence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_example_spark.operators.extraction import (
    MOJIBAKE_MAP,
    fix_mojibake,
    html_extract,
    strip_html,
)


def _one(spark, value, expr_fn):
    df = spark.createDataFrame([(value,)], "s string")
    return df.select(expr_fn(F.col("s")).alias("out")).collect()[0]["out"]


# --- strip_html -----------------------------------------------------------


def test_strip_html_full_document(spark):
    html = (
        "<html><!-- secret comment --><head><title>My Title</title>"
        '<style>p { color: red; }</style>'
        '<script type="text/javascript">var x = "a < b && c > d";</script>'
        "</head><body><h1>Heading</h1>"
        "<p>first para</p>\n<p>second&nbsp;para</p>"
        "<div>footer &amp; &lt;raw&gt; &#39;q&#39;</div></body></html>"
    )
    out = _one(spark, html, strip_html)
    # &nbsp; decodes to U+00A0 (HTML5), not ASCII space — NBSP is
    # content here (and load-bearing for clean_text's mojibake repair)
    assert out == (
        "My Title\nHeading\nfirst para\nsecond\u00a0para"
        "\nfooter & <raw> 'q'"
    )


def test_strip_html_script_payload_with_angle_brackets_is_removed(spark):
    out = _one(
        spark,
        '<p>keep</p><script>if (a<b) { emit("<fake>tag</fake>") }</script>',
        strip_html,
    )
    assert out == "keep"


def test_strip_html_entity_decode_order_amp_last(spark):
    # '&amp;lt;' must decode to the literal text '&lt;', NOT to '<'
    out = _one(spark, "<p>x &amp;lt; y</p>", strip_html)
    assert out == "x &lt; y"


def test_strip_html_case_insensitive_tags(spark):
    out = _one(
        spark,
        "<P>one</P><SCRIPT>dead()</SCRIPT><BR><DIV>two</DIV>",
        strip_html,
    )
    assert out == "one\ntwo"


def test_strip_html_whitespace_collapse(spark):
    out = _one(
        spark, "<p>a   b\t c</p><p>  </p><p>d</p>", strip_html
    )
    assert out == "a b c\nd"


def test_strip_html_null_and_plain_text(spark):
    assert _one(spark, None, strip_html) is None
    assert _one(spark, "no markup at all", strip_html) == "no markup at all"


def test_html_extract_dataframe_form(spark):
    df = spark.createDataFrame(
        [(1, "<p>hello</p>"), (2, None)], ["doc_id", "html"]
    )
    rows = {
        r["doc_id"]: r["text"] for r in html_extract(df).collect()
    }
    assert rows == {1: "hello", 2: None}


# --- fix_mojibake ---------------------------------------------------------


def test_mojibake_map_is_the_cp1252_misdecode_law():
    for bad, good in MOJIBAKE_MAP:
        assert good.encode("utf-8").decode("cp1252") == bad, (bad, good)


def test_fix_mojibake_roundtrip(spark):
    # only chars whose UTF-8 bytes are all defined in cp1252 (no '”' —
    # its 0x9D byte is a cp1252 gap, the irrecoverable case the module
    # docstring documents)
    original = "café – “naïve“ … résumé 10° «ok» señor öü äç à"
    corrupted = original.encode("utf-8").decode("cp1252")
    assert corrupted != original
    out = _one(spark, corrupted, fix_mojibake)
    assert out == original


def test_fix_mojibake_idempotent_on_repaired_text(spark):
    original = "café – “naïve“ … 10° «ok»"
    corrupted = original.encode("utf-8").decode("cp1252")
    once = _one(spark, corrupted, fix_mojibake)
    twice = _one(spark, once, fix_mojibake)
    assert once == twice == original


def test_fix_mojibake_leaves_clean_ascii_alone(spark):
    s = "plain ascii text with & < > symbols"
    assert _one(spark, s, fix_mojibake) == s


# --- clean_text: the composition ORDER is the contract --------------------


def test_clean_text_repairs_entity_encoded_nbsp_mojibake(spark):
    # 'à' mis-decoded as cp1252 is 'Ã' + U+00A0; an HTML tool then
    # entity-encodes the NBSP. Only extract-BEFORE-repair re-forms the
    # literal pair the repair table matches.
    from etl_example_spark.operators.extraction import clean_text

    html = "<p>voilÃ&nbsp; fin</p>"
    assert _one(spark, html, clean_text) == "voilà fin"


def test_clean_text_repairs_markup_interrupted_mojibake(spark):
    from etl_example_spark.operators.extraction import clean_text

    html = "<p>voilÃ<!-- ad -->\u00a0 fin</p>"
    assert _one(spark, html, clean_text) == "voilà fin"


def test_clean_text_order_flip_fails(spark):
    """Running fix_mojibake BEFORE strip_html (the flipped order)
    leaves both fixture classes unrepaired — the regression this test
    exists to catch if anyone recomposes the stages."""
    from etl_example_spark.operators.extraction import clean_text
    from etl_example_spark.operators.text import normalize_text

    def flipped(c):
        return normalize_text(strip_html(fix_mojibake(c)))

    for html in (
        "<p>voilÃ&nbsp; fin</p>",
        "<p>voilÃ<!-- ad -->\u00a0 fin</p>",
    ):
        good = _one(spark, html, clean_text)
        bad = _one(spark, html, flipped)
        assert good == "voilà fin"
        assert bad != good and "Ã" in bad


def test_clean_text_normalize_sweeps_irreparable_residue(spark):
    # '”' (U+201D) mis-decodes through cp1252's 0x9D gap into a C1
    # control; the repair table can't fix it, normalize (LAST) strips
    # the control residue.
    from etl_example_spark.operators.extraction import clean_text

    # cp1252 has no 0x9D (strict decode raises); the mis-decode
    # surfaces it as the C1 control U+009D, which only normalize can
    # sweep — and only if it runs AFTER the repair table had its shot
    corrupted = "â€\x9d"
    out = _one(spark, f"<p>x {corrupted} y</p>", clean_text)
    assert "\x9d" not in out
