"""HTML -> text extraction and link harvest (functions/html.py):
hand-pinned extraction semantics, documented boundaries, and
never-raises fuzz over malformed markup."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from letarette_spark.functions.html import (
    doc_links,
    extract_links,
    host_doc_counts,
    html_to_text,
    url_host,
)


def _text_of(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(html_to_text("h").alias("t")).first()["t"]


def _links_of(spark, html: str) -> list[str]:
    df = spark.createDataFrame([(html,)], "h string")
    return df.select(extract_links("h").alias("l")).first()["l"]


def test_basic_structure(spark):
    t = _text_of(
        spark,
        "<html><body><h1>Title</h1><p>one <b>bold</b> two</p>"
        "<p>para2</p></body></html>",
    )
    # inline <b> joins text; adjacent block tags leave a paragraph break
    assert t == "Title\n\none bold two\n\npara2"


def test_script_style_comment_content_dropped(spark):
    t = _text_of(
        spark,
        '<style>p{color:red}</style><script a="1">if (a<b) x("</p>");'
        "</script><!-- hidden <p>text</p> --><p>kept</p>",
    )
    assert t == "kept"


def test_entity_decode_and_amp_last(spark):
    t = _text_of(spark, "<p>5 &lt; 6 &amp;&amp; x&nbsp;y &quot;q&quot; it&#39;s</p>")
    assert t == '5 < 6 && x y "q" it\'s'
    # the literal text "&amp;lt;" must decode to "&lt;", never "<"
    assert _text_of(spark, "<p>&amp;lt;</p>") == "&lt;"


def test_quoted_gt_inside_attribute(spark):
    assert _text_of(spark, '<p title="a>b">ok</p>') == "ok"
    assert _text_of(spark, "<p title='a>b'>ok</p>") == "ok"


def test_unquoted_gt_boundary_documented(spark):
    # documented fast-path boundary: unquoted '>' truncates the tag —
    # degrade, don't raise
    t = _text_of(spark, "<p title=a>b>ok</p>")
    assert isinstance(t, str) and "ok" in t


def test_whitespace_normalized(spark):
    t = _text_of(spark, "<p>  a   b  </p>\n\n\n<p>c</p><br><br><br><br>d")
    assert t == "a b\n\nc\n\nd"


def test_extract_links_order_and_quotes(spark):
    links = _links_of(
        spark,
        '<a href="http://a.com/1">x</a> <a href=\'http://b.com/2\'>y</a>'
        '<a HREF = "http://c.com/3">z</a><a href="">empty</a>',
    )
    assert links == ["http://a.com/1", "http://b.com/2", "http://c.com/3"]


def test_url_host_rules(spark):
    df = spark.createDataFrame(
        [
            ("https://WWW.Example.COM/path?q=1",),
            ("http://sub.host.org:8080/x",),
            ("/relative/only",),
            ("ftp://files.example.com/a",),
            ("mailto:user@example.com",),
        ],
        "u string",
    )
    hosts = [r["h"] for r in df.select(url_host("u").alias("h")).collect()]
    assert hosts == ["example.com", "sub.host.org", "", "", ""]


def test_doc_links_and_host_counts(spark):
    df = spark.createDataFrame(
        [
            (1, '<a href="http://a.com/x">1</a><a href="https://www.a.com/y">2</a>'),
            (2, '<a href="http://a.com/z">3</a><a href="/rel">4</a>'),
            (3, "<p>no links</p>"),
        ],
        "doc_id int, html string",
    )
    rows = doc_links(df).orderBy("doc_id", "pos").collect()
    assert [(r["doc_id"], r["pos"], r["host"]) for r in rows] == [
        (1, 0, "a.com"),
        (1, 1, "a.com"),
        (2, 0, "a.com"),
        (2, 1, ""),
    ]
    hc = host_doc_counts(df).collect()
    assert [(r["host"], r["n_links"], r["n_docs"]) for r in hc] == [
        ("a.com", 3, 2)
    ]


def test_null_and_empty_input(spark):
    df = spark.createDataFrame([(None,), ("",)], "h string")
    out = df.select(
        html_to_text("h").alias("t"), extract_links("h").alias("l")
    ).collect()
    assert out[0]["t"] is None and out[0]["l"] is None
    assert out[1]["t"] == "" and out[1]["l"] == []


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>&\"'/ab =!-\n\tpscript")),
        max_size=120,
    )
)
def test_never_raises_on_malformed_markup(spark, s):
    """Web corpora are full of broken markup: extraction is a total
    function — any input string yields a string and a link array."""
    df = spark.createDataFrame([(s,)], "h string")
    r = df.select(
        html_to_text("h").alias("t"), extract_links("h").alias("l")
    ).first()
    assert isinstance(r["t"], str)
    assert isinstance(r["l"], list)


def test_extract_anchors(spark):
    from letarette_spark.functions.html import extract_anchors

    html = (
        '<a href="http://a.com/1"><b>Bold</b> link &amp; more</a>'
        "<a href='http://b.com/2'></a>"          # empty anchor text kept
        '<a name="no-href">skip</a>'             # no href -> dropped
        '<a href="">empty href dropped</a>'
        '<a class="x" href="http://c.com/3" rel="nofollow">c</a>'
    )
    df = spark.createDataFrame([(html,)], "h string")
    rows = df.select(extract_anchors("h").alias("a")).first()["a"]
    assert [(r["href"], r["anchor"]) for r in rows] == [
        ("http://a.com/1", "Bold link & more"),
        ("http://b.com/2", ""),
        ("http://c.com/3", "c"),
    ]


def test_anchor_text_agg(spark):
    from letarette_spark.functions.html import anchor_text_agg

    df = spark.createDataFrame(
        [
            (1, '<a href="http://t.com/p">zeta</a><a href="http://t.com/p">alpha</a>'),
            (2, '<a href="http://t.com/p"></a><a href="http://u.com/q">u</a>'),
        ],
        "doc_id int, html string",
    )
    rows = {r["href"]: r for r in anchor_text_agg(df).collect()}
    t = rows["http://t.com/p"]
    assert (t["n_anchors"], t["n_docs"], t["sample_anchor"]) == (3, 2, "alpha")
    u = rows["http://u.com/q"]
    assert (u["n_anchors"], u["n_docs"], u["sample_anchor"]) == (1, 1, "u")


def test_numeric_character_references(spark):
    t = _text_of(
        spark,
        "<p>caf&#233; &#x2019;q&#X41; it&#8217;s &#1114112; &#x110000; "
        "&#8; &#xD800; &amp;#65;</p>",
    )
    # BMP decimal + hex decode (either x case); out-of-range, control,
    # and surrogate refs reconstructed; &amp;#65; stays a literal &#65;
    assert t == "café ’qA it’s &#1114112; &#x110000; &#8; &#xD800; &#65;"


def test_numeric_ref_at_string_edges(spark):
    assert _text_of(spark, "&#65;") == "A"
    assert _text_of(spark, "&#65;tail") == "Atail"
    assert _text_of(spark, "head&#65;") == "headA"
    assert _text_of(spark, "&#65;&#66;") == "AB"


def test_html_to_text_zero_shuffle_plan(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "h string")
    plan = (
        df.select(html_to_text("h").alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_duckdb_twin_parity_rowwise(spark):
    """html_to_text and its generated DuckDB twin must agree byte-for-
    byte on adversarial inputs — the precondition for the hash gates."""
    import duckdb

    from letarette_spark.functions.html import html_to_text_sql

    samples = [
        "<p>caf&#233; &#x2019;q&#X41; &#1114112; &amp;#65;</p>",
        '<style>p{}</style><script>if(a<b){}</script><h1>T</h1>ok',
        '<p title="a>b">q</p><a href="http://A.com/x">t &amp;&amp; u</a>',
        "plain text, no markup",
        "",
        "&#65;&#66;tail",
        "broken <a href= <p>deep</p",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "h string")
    got = [r["t"] for r in df.select(html_to_text("h").alias("t")).collect()]
    con = duckdb.connect()
    for s, g in zip(samples, got):
        lit = "'" + s.replace("'", "''") + "'"
        want = con.sql("SELECT " + html_to_text_sql(lit)).fetchone()[0]
        assert g == want, (s, g, want)
