"""HTML -> text extraction — the stage-1 operator of a web-corpus
training pipeline (WET-style main-text recovery: C4/CCNet/RefinedWeb all
start from an HTML-to-text pass before any quality gate or dedup runs).

Beyond-reference operator family: the reference engine indexes plain
text; a 100-TB web pipeline has to PRODUCE that plain text first, plus
the link graph (URL harvest + host normalization) that drives URL-level
dedup and host-level filtering (C4's blocklist, RefinedWeb's host
sampling).

Scale shape: every function here is a pure-JVM column expression —
chains of regexp_replace / regexp_extract_all inside whole-stage
codegen. One scan, zero shuffles, no Python anywhere; host_doc_counts
adds the one partial-agg shuffle a per-host rollup needs. The regexes
are RE2-compatible (no lookarounds/backrefs) so the exact same pattern
strings run in the DuckDB oracle twins — the patterns below are the
single source of truth for both engines (oracle_sql() builds its SQL
from these constants).

Extraction grade: this is the fast regex path (the same trade as WET
files / resiliparse's cheap mode), NOT a DOM parser. Documented
boundaries: attribute values containing an unescaped '>' inside an
UNQUOTED attribute can truncate a tag early (quoted attributes are
handled); numeric character references decode for BMP codepoints
(decimal + hex; astral/surrogate/control refs are left verbatim —
Spark has no full-unicode chr, BMP covers the web's overwhelming
majority); CDATA sections are treated as text. Malformed input never
raises — every step is a total string function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A full HTML tag: name then attributes where quoted values may contain
# '>' — (?:[^>"']|"[^"]*"|'[^']*')* walks attribute soup without ever
# crossing a real tag close. RE2-safe (regular, no backtracking traps).
_TAG_BODY = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"

# Script/style elements: drop CONTENT too, not just the tags (inline JS
# and CSS are not text). Non-greedy across newlines via (?is).
RE_SCRIPT = f"(?is)<script\\b{_TAG_BODY}>.*?</script\\s*>"
RE_STYLE = f"(?is)<style\\b{_TAG_BODY}>.*?</style\\s*>"
RE_COMMENT = "(?s)<!--.*?-->"

# Block-level elements become newlines (paragraph structure survives for
# downstream line-based ops: boilerplate_lines, quality gates); inline
# tags vanish so flowing text stays joined.
_BLOCK_NAMES = (
    "p|div|br|hr|li|ul|ol|tr|td|th|table|h1|h2|h3|h4|h5|h6|blockquote|"
    "pre|section|article|header|footer|nav|aside|form|dl|dt|dd|figure|"
    "figcaption|main|title"
)
RE_BLOCK_TAG = f"(?is)</?(?:{_BLOCK_NAMES})\\b{_TAG_BODY}>"
RE_ANY_TAG = f"(?s)<{_TAG_BODY}>"

# Entity decode order matters: named non-amp first, then NUMERIC
# character references, amp LAST, so the literal text "&amp;lt;"
# round-trips to "&lt;" (not "<") and "&amp;#65;" to "&#65;" (not "A").
ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# Numeric character references: decimal &#8217; and hex &#x2019;.
# Decoded for BMP codepoints 32..65535 excluding the surrogate range —
# Spark has no full-unicode chr(), but any BMP codepoint is exactly one
# UTF-16BE code unit, so hex -> unhex -> decode('UTF-16BE') is total.
# Out-of-range/astral refs are reconstructed verbatim (documented
# boundary; both engines apply the identical rule).
RE_NUMREF_DEC = "&#([0-9]{1,7});"
RE_NUMREF_HEX = "&#[xX]([0-9a-fA-F]{1,6});"

# Whitespace normalization: spaces/tabs collapse, newline-adjacent
# spaces trim, 3+ newlines squeeze to a paragraph break, outer trim.
RE_HSPACE = "[ \\t\\x0b\\f\\r]+"
RE_LINE_EDGE = " ?\\n ?"
RE_MANY_NL = "\\n{3,}"
# trim()/F.trim only strip spaces — newlines at the edges need a regex
RE_EDGE_NL = "^\\n+|\\n+$"

# Link harvest: href in single or double quotes (group 2 = the URL).
RE_HREF = "(?i)href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')"

# Full anchor element: href (group 2 double-quoted / group 3 single-
# quoted) + inner HTML (group 4). [^>]* in the attribute tail is the
# documented fast-path boundary (quoted '>' inside OTHER attributes of
# an <a> tag truncates); non-greedy inner never crosses a real </a>.
RE_ANCHOR = (
    "(?is)<a\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')[^>]*>"
    "(.*?)</a\\s*>"
)

# Host of an absolute http(s) URL (group 1); empty string for relative
# links. Lowercased; a leading www. is stripped for host rollups.
RE_URL_HOST = "(?i)^https?://([^/:?#]+)"


def _bmp_ok(code: Column) -> Column:
    """Decodable BMP codepoint: 32..65535, not a surrogate."""
    return (
        (code >= 32)
        & (code <= 65535)
        & ~((code >= 55296) & (code <= 57343))
    )


def _decode_numrefs(c: Column, pat: str, hex_: bool) -> Column:
    """Decode numeric character references matching *pat* (one capture
    group = the digits): split the string on the pattern, decode each
    match, interleave. split(limit=-1) keeps trailing empties, so
    len(segments) == len(codes) + 1 always."""
    segs = F.split(c, pat, -1)
    digits = F.regexp_extract_all(c, F.lit(pat), 1)
    n = F.size(digits)

    def dec(k: Column) -> Column:
        code = (
            F.conv(k, 16, 10).cast("long") if hex_ else k.cast("long")
        )
        rebuilt = F.concat(
            F.lit("&#x" if hex_ else "&#"), k, F.lit(";")
        )
        return F.when(
            _bmp_ok(code),
            F.decode(F.unhex(F.lpad(F.hex(code), 4, "0")), "UTF-16BE"),
        ).otherwise(rebuilt)

    return F.concat(
        F.aggregate(
            F.zip_with(
                F.slice(segs, 1, n), digits, lambda s, k: F.concat(s, dec(k))
            ),
            F.lit(""),
            lambda acc, x: F.concat(acc, x),
        ),
        F.element_at(segs, -1),
    )


def html_to_text(col) -> Column:
    """Plain text of an HTML column: script/style/comments dropped,
    block tags -> newline, inline tags removed, the six named entities
    + nbsp + numeric character references (BMP) decoded, whitespace
    normalized. Total function — never null on non-null input,
    malformed HTML degrades to best-effort text."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, RE_COMMENT, "")
    c = F.regexp_replace(c, RE_SCRIPT, " ")
    c = F.regexp_replace(c, RE_STYLE, " ")
    c = F.regexp_replace(c, RE_BLOCK_TAG, "\n")
    c = F.regexp_replace(c, RE_ANY_TAG, "")
    for ent, rep in ENTITIES[:-1]:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = _decode_numrefs(c, RE_NUMREF_HEX, hex_=True)
    c = _decode_numrefs(c, RE_NUMREF_DEC, hex_=False)
    c = F.replace(c, F.lit("&amp;"), F.lit("&"))  # amp LAST
    c = F.regexp_replace(c, RE_HSPACE, " ")
    c = F.regexp_replace(c, RE_LINE_EDGE, "\n")
    c = F.regexp_replace(c, RE_MANY_NL, "\n\n")
    c = F.regexp_replace(c, RE_EDGE_NL, "")
    return F.trim(c)


def extract_links(col) -> Column:
    """array<string> of href values (document order, duplicates kept —
    the raw link harvest; dedup is the caller's groupBy)."""
    c = F.col(col) if isinstance(col, str) else col
    # group 2 is the double-quoted body; when the quote was single,
    # group 2 is empty and group 3 holds the body — regexp_extract_all
    # takes ONE group index, so run both and pick per-match via filter
    dq = F.regexp_extract_all(c, F.lit(RE_HREF), 2)
    sq = F.regexp_extract_all(c, F.lit(RE_HREF), 3)
    return F.filter(
        F.zip_with(
            dq, sq, lambda a, b: F.when(a != "", a).otherwise(b)
        ),
        lambda x: x != "",
    )


def extract_anchors(col) -> Column:
    """array<struct<href,anchor>> of anchor elements in document order:
    href plus the PLAIN TEXT of the anchor body (inner tags stripped,
    entities decoded — the same html_to_text rule). Anchor text is the
    classic relevance/quality signal web pipelines aggregate per link
    target. Empty hrefs are dropped; empty anchor text is kept (image
    links legitimately have none)."""
    c = F.col(col) if isinstance(col, str) else col
    dq = F.regexp_extract_all(c, F.lit(RE_ANCHOR), 2)
    sq = F.regexp_extract_all(c, F.lit(RE_ANCHOR), 3)
    inner = F.regexp_extract_all(c, F.lit(RE_ANCHOR), 4)
    zipped = F.arrays_zip(
        dq.alias("dq"), sq.alias("sq"), inner.alias("inner")
    )
    return F.filter(
        F.transform(
            zipped,
            lambda z: F.struct(
                F.when(z["dq"] != "", z["dq"])
                .otherwise(z["sq"])
                .alias("href"),
                html_to_text(z["inner"]).alias("anchor"),
            ),
        ),
        lambda s: s["href"] != "",
    )


def doc_anchors(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, pos, href, anchor, host) — one row per anchor element.
    One scan + no shuffle (posexplode of a per-row expression)."""
    return df.select(
        F.col(id_col),
        F.posexplode(extract_anchors(html_col)).alias("pos", "a"),
    ).select(
        id_col,
        "pos",
        F.col("a.href").alias("href"),
        F.col("a.anchor").alias("anchor"),
        url_host(F.col("a.href")).alias("host"),
    )


def anchor_text_agg(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(href, n_anchors, n_docs, sample_anchor) per link target — the
    anchor-text rollup (incoming link text is a quality/relevance
    signal per URL). One partial-agg shuffle keyed by href;
    sample_anchor = lexicographic min non-empty anchor (deterministic)."""
    return (
        doc_anchors(df, id_col, html_col)
        .groupBy("href")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(F.when(F.col("anchor") != "", F.col("anchor"))).alias(
                "sample_anchor"
            ),
        )
    )


def url_host(col) -> Column:
    """Lowercased host of an absolute http(s) URL, leading 'www.'
    stripped; empty string for relative/other-scheme URLs. Regex-based
    (not parse_url) so the DuckDB twin runs the identical rule."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(c, RE_URL_HOST, 1))
    return F.regexp_replace(host, "^www\\.", "")


def doc_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, link, host) — one row per harvested href, document order
    within a doc via posexplode. One scan + no shuffle."""
    return df.select(
        F.col(id_col),
        F.posexplode(extract_links(html_col)).alias("pos", "link"),
    ).select(
        id_col, "pos", "link", url_host(F.col("link")).alias("host")
    )


def host_doc_counts(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(host, n_links, n_docs) per linked host — the host-level rollup
    URL filtering/sampling reads (C4 blocklists, RefinedWeb host caps).
    One partial-agg shuffle keyed by host; relative links (empty host)
    are excluded."""
    return (
        doc_links(df, id_col, html_col)
        .filter(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def _sql_pat(pat: str) -> str:
    """Pattern constant as a single-quoted SQL literal (DuckDB standard
    strings: backslashes are literal, only quotes need doubling)."""
    return "'" + pat.replace("'", "''") + "'"


def _decode_numrefs_sql(e: str, pat: str, hex_: bool) -> str:
    """DuckDB twin of _decode_numrefs. Lambda var __nri is deliberately
    obscure: this expression nests inside other list_transform lambdas
    (the anchors twin), and an `i` would be captured by the wrong
    scope."""
    p = _sql_pat(pat)
    segs = f"regexp_split_to_array({e}, {p})"
    ks = f"regexp_extract_all({e}, {p}, 1)"
    k = f"({ks})[__nri]"
    code = f"('0x' || lower({k}))::BIGINT" if hex_ else f"({k})::BIGINT"
    prefix = "'&#x'" if hex_ else "'&#'"
    # coalesce: DuckDB's array_to_string([], '') is NULL, not '' — a
    # no-match string must pass through; NULL INPUT still propagates
    # through the || with the (NULL) tail segment
    return (
        f"coalesce(array_to_string(list_transform(range(1, len({ks})+1), "
        f"__nri -> ({segs})[__nri] || "
        f"CASE WHEN ({code}) BETWEEN 32 AND 65535 "
        f"AND NOT (({code}) BETWEEN 55296 AND 57343) "
        f"THEN chr(({code})::INT) "
        f"ELSE {prefix} || {k} || ';' END), ''), '') "
        f"|| ({segs})[len({ks})+1]"
    )


def html_to_text_sql(expr: str) -> str:
    """DuckDB expression computing html_to_text(expr) with the SAME
    pattern constants — the oracle-twin generator (single source of
    truth: this module's RE_* / ENTITIES)."""
    c = f"regexp_replace({expr}, {_sql_pat(RE_COMMENT)}, '', 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_SCRIPT)}, ' ', 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_STYLE)}, ' ', 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_BLOCK_TAG)}, chr(10), 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_ANY_TAG)}, '', 'g')"
    for ent, rep in ENTITIES[:-1]:
        c = f"replace({c}, {_sql_pat(ent)}, {_sql_pat(rep)})"
    c = f"({_decode_numrefs_sql(c, RE_NUMREF_HEX, hex_=True)})"
    c = f"({_decode_numrefs_sql(c, RE_NUMREF_DEC, hex_=False)})"
    c = f"replace({c}, '&amp;', '&')"
    c = f"regexp_replace({c}, {_sql_pat(RE_HSPACE)}, ' ', 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_LINE_EDGE)}, chr(10), 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_MANY_NL)}, chr(10)||chr(10), 'g')"
    c = f"regexp_replace({c}, {_sql_pat(RE_EDGE_NL)}, '', 'g')"
    return f"trim({c})"


def url_host_sql(expr: str) -> str:
    """DuckDB twin of url_host()."""
    host = f"lower(regexp_extract({expr}, {_sql_pat(RE_URL_HOST)}, 1))"
    return f"regexp_replace({host}, '^www\\.', '', 'g')"


__all__ = [
    "html_to_text", "extract_links", "extract_anchors", "url_host",
    "doc_links", "doc_anchors", "anchor_text_agg", "host_doc_counts",
    "html_to_text_sql", "url_host_sql",
    "RE_HREF", "RE_ANCHOR",
]
