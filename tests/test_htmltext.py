"""HTML -> text extraction + boilerplate removal (operators/htmltext).

Covers: block segmentation, entity decoding, script/style/svg CDATA
skipping, link-density + min-words boilerplate rules, metadata
(title/lang/description/canonical), malformed-page recovery (missing
</head>, missing </title>, unclosed tags), and the Spark Arrow
fan-out including NULL html rows.
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators import htmltext as H

PAGE = """<html lang="en"><head><title>Doc 5 &amp; friends</title>
<style>p{color:red}</style><script>var x = 1 < 2; // <p>fake</p></script>
<meta name="description" content="about 5">
<link rel="canonical" href="http://example.com/5">
</head><body>
<h1>Heading 5</h1>
<p>Alpha &amp; beta <b>gamma</b>.</p>
<div><a href="/a">one</a> <a href="/b">two</a></div>
<ul><li>item A</li><li>item B</li></ul>
</body></html>"""


def test_blocks_and_density():
    blocks = H.extract_blocks(PAGE)
    texts = [b.text for b in blocks]
    assert texts == [
        "Heading 5",
        "Alpha & beta gamma.",
        "one two",
        "item A",
        "item B",
    ]
    nav = blocks[2]
    assert nav.link_chars == 6 and nav.n_chars == 7
    assert nav.link_density > 0.5
    assert all(b.link_density == 0.0 for b in blocks if b is not nav)


def test_script_style_cdata_skipped():
    # the fake </p> inside the script must not leak a block
    assert "fake" not in H.html_to_text(PAGE, drop_boilerplate=False)
    assert "color:red" not in H.html_to_text(PAGE, drop_boilerplate=False)


def test_boilerplate_drop_and_keep():
    clean = H.html_to_text(PAGE)
    assert clean == "Heading 5\nAlpha & beta gamma.\nitem A\nitem B"
    raw = H.html_to_text(PAGE, drop_boilerplate=False)
    assert "one two" in raw


def test_min_words_rule():
    txt = H.html_to_text(PAGE, min_words=2)
    # single-word-ish blocks survive at default; 2-word minimum drops
    # "Heading 5" is two words, "item A" is two words -> all kept; at
    # min_words=3 only the 3-word paragraph survives
    assert H.html_to_text(PAGE, min_words=3) == "Alpha & beta gamma."
    assert "item A" in txt


def test_meta_fields():
    m = H.html_meta(PAGE)
    assert m["title"] == "Doc 5 & friends"
    assert m["lang"] == "en"
    assert m["description"] == "about 5"
    assert m["canonical"] == "http://example.com/5"


def test_opengraph_and_jsonld():
    page = (
        '<html><head>'
        '<meta property="og:title" content="OG Title">'
        '<meta property="OG:TYPE" content="article">'
        '<meta property="og:title" content="duplicate ignored">'
        '<script type="application/ld+json">{"@type": "Article"}</script>'
        '<script>var notLd = 1;</script>'
        '<script type="application/ld+json"> {"a": 2} </script>'
        "</head><body><p>Body text.</p>"
        '<svg><script type="application/ld+json">{"ghost": 1}</script></svg>'
        "</body></html>"
    )
    m = H.html_meta(page)
    assert m["og"] == {"og:title": "OG Title", "og:type": "article"}
    assert m["jsonld"] == ['{"@type": "Article"}', '{"a": 2}']
    # JSON-LD content never leaks into visible text
    assert H.html_to_text(page) == "Body text."


def test_og_jsonld_in_spark_features(spark):
    page = (
        '<meta property="og:title" content="T"><meta property="og:type" '
        'content="video"><script type="application/ld+json">{}</script>'
        "<p>hello world</p>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "html": [page]})
    )
    r = H.html_text_features(df).collect()[0]
    assert r["og_title"] == "T" and r["og_type"] == "video"
    assert r["n_jsonld"] == 1


def test_missing_head_close_recovers():
    # crawled pages routinely omit </head>; body text must survive
    page = "<html><head><title>T</title><body><p>Visible text.</p>"
    assert H.html_to_text(page) == "Visible text."
    assert H.html_meta(page)["title"] == "T"


def test_missing_title_close_recovers():
    page = "<html><head><title>T<body><p>Visible text.</p>"
    assert H.html_meta(page)["title"] == "T"
    assert "Visible" in H.html_to_text(page)


def test_svg_title_is_not_document_title():
    page = "<html><body><svg><title>shape</title></svg><p>Hi there.</p>"
    assert H.html_meta(page)["title"] is None
    assert H.html_to_text(page) == "Hi there."


def test_nested_blocks_flush_separately():
    page = "<div>outer head<p>inner para</p>outer tail</div>"
    assert [b.text for b in H.extract_blocks(page)] == [
        "outer head",
        "inner para",
        "outer tail",
    ]


def test_br_is_space_and_void_tags_do_not_track_depth():
    page = "<p>line one<br>line two</p><p>after <img src=x> image</p>"
    assert H.html_to_text(page) == "line one line two\nafter image"


def test_anchor_inside_skip_not_counted():
    page = '<p>keep <svg><a href="x">ghost</a></svg> this</p>'
    (b,) = H.extract_blocks(page)
    assert b.text == "keep this" and b.link_chars == 0


def test_self_closing_anchor_does_not_steal_next_anchor_text():
    # review finding (r10): <a/> decremented the depth but left its
    # stack entry open, so the stale entry accumulated every later
    # anchor's text — /x was credited with /y's "hello"
    p = H._Extractor()
    p.feed('<a href="/x"/>plain <a href="/y">hello</a>')
    p.close()
    assert p.links == ["/x", "/y"]
    assert p.link_texts == ["", "hello"]


def test_empty_and_whitespace_pages():
    assert H.extract_blocks("") == []
    assert H.html_to_text("  \n\t ") == ""
    assert H.html_meta("")["title"] is None


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_arbitrary_input_never_raises(s):
    # crawled bytes are hostile; extraction must never kill a worker
    H.html_to_text(s)
    H.html_meta(s)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=1, max_size=20), max_size=6))
def test_paragraph_roundtrip_property(paras):
    # plain-text paragraphs wrapped in <p> come back normalized
    page = "".join(f"<p>{p}</p>" for p in paras)
    expect = [" ".join(p.split()) for p in paras]
    expect = [p for p in expect if p]
    assert H.html_to_text(page, drop_boilerplate=False) == "\n".join(expect)


def test_spark_features(spark):
    rows = [
        (1, PAGE),
        (2, None),
        (3, "<html lang='de'><body><p>Zwei Worte hier.</p>"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "html"]))
    out = {
        r["doc_id"]: r.asDict()
        for r in H.html_text_features(df).collect()
    }
    assert out[1]["title"] == "Doc 5 & friends"
    assert out[1]["html_lang"] == "en"
    assert out[1]["n_blocks"] == 5
    assert out[1]["n_boiler_blocks"] == 1
    assert out[1]["text"] == "Heading 5\nAlpha & beta gamma.\nitem A\nitem B"
    assert out[1]["n_text_chars"] == len(out[1]["text"])
    # NULL html -> NULL features, not empty strings
    assert out[2]["text"] is None and out[2]["n_blocks"] is None
    assert out[3]["html_lang"] == "de"
    assert out[3]["text"] == "Zwei Worte hier."
