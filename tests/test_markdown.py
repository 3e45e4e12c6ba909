"""HTML -> Markdown conversion (operators/markdown): construct
mapping, nesting, link/table edge cases, hostile-markup recovery, and
the distributed Arrow pass."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators.markdown import (
    html_markdown,
    html_to_markdown,
)


def test_headings_paragraphs_inline():
    md = html_to_markdown(
        "<h1>Title</h1><h3>Sub</h3>"
        "<p>Hello <b>world</b> &amp; <i>you</i> <code>x=1</code>.</p>"
    )
    assert md == (
        "# Title\n\n### Sub\n\nHello **world** & *you* `x=1`."
    )


def test_nested_lists_tight_and_unclosed_li():
    md = html_to_markdown(
        "<ul><li>one</li><li>two<ul><li>sub a<li>sub b</ul></li>"
        "<li>three</li></ul><p>after</p>"
    )
    assert md == (
        "- one\n- two\n  - sub a\n  - sub b\n- three\n\nafter"
    )
    assert html_to_markdown("<ol><li>first<li>second</ol>") == (
        "1. first\n2. second"
    )


def test_links_and_images():
    md = html_to_markdown(
        '<p>See <a href="https://x.y/z">the docs</a> and '
        '<a href="http://q"></a>; <img src="i.png" alt="pic"></p>'
    )
    assert "[the docs](https://x.y/z)" in md
    # empty anchor text falls back to the href
    assert "[http://q](http://q)" in md
    assert "![pic](i.png)" in md
    # anchor with no href: text passes through unchanged
    assert html_to_markdown("<a>no href</a> plain") == "no href plain"


def test_blockquote_nesting_and_pre_fencing():
    md = html_to_markdown(
        "<blockquote><p>quoted</p><blockquote><p>deeper</p>"
        "</blockquote></blockquote>"
    )
    assert md == "> quoted\n\n> > deeper"
    md = html_to_markdown("<pre>def f():\n    return 1</pre>")
    assert md == "```\ndef f():\n    return 1\n```"
    # a pre BODY containing a fence lengthens the fence
    md = html_to_markdown("<pre>```\ninner\n```</pre>")
    assert md.startswith("````\n") and md.endswith("\n````")


def test_table_with_header_and_pipe_escape():
    md = html_to_markdown(
        "<table><tr><th>a</th><th>b</th></tr>"
        "<tr><td>1</td><td>2|x</td></tr></table>"
    )
    assert md == "| a | b |\n| --- | --- |\n| 1 | 2\\|x |"
    # headerless table: no separator row
    md = html_to_markdown(
        "<table><tr><td>1</td></tr><tr><td>2</td></tr></table>"
    )
    assert md == "| 1 |\n| 2 |"


def test_hr_br_and_skip_subtrees():
    md = html_to_markdown(
        "<p>a</p><hr><p>b<br>c</p><script>var x=1;</script>"
        "<style>.a{}</style>"
    )
    assert md == "a\n\n---\n\nb\nc"
    assert "var x" not in md


def test_escape_mode():
    md = html_to_markdown("<p>2 * 3 [ref] #tag</p>", escape=True)
    assert md == r"2 \* 3 \[ref\] \#tag"
    assert html_to_markdown("<p>2 * 3</p>") == "2 * 3"


def test_hostile_markup_never_raises():
    for doc in [
        "<li></ul></blockquote><b>x",
        "</td></tr></table><td>y",
        "<pre><pre>z",
        "<a href='u'><a href='v'>w",
        "<" * 50,
        "&#xZZ; &amp",
    ]:
        out = html_to_markdown(doc)
        assert isinstance(out, str)


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/abip& ;\"'=h1lu")), max_size=80
    )
)
def test_fuzz_never_raises(doc):
    assert isinstance(html_to_markdown(doc), str)


def test_html_markdown_spark(spark):
    rows = [
        (1, "<h2>T</h2><p>body</p>"),
        (2, None),
        (3, "<ul><li>a</li></ul>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    got = {r["doc_id"]: r for r in html_markdown(df).collect()}
    assert got[1]["markdown"] == "## T\n\nbody"
    assert got[1]["n_md_chars"] == len("## T\n\nbody")
    assert got[2]["markdown"] is None and got[2]["n_md_chars"] is None
    assert got[3]["markdown"] == "- a"


def test_anchor_survives_block_flush_and_literal_brackets():
    # review findings: a block tag inside an anchor flushes the open
    # marker — the close must not chop characters or mis-split on a
    # literal '[' in the text
    md = html_to_markdown('<a href="/x"><p>para</p>tail</a>')
    assert "para" in md
    assert "tail" in md and "tai[" not in md
    assert "(/x)" in md
    md = html_to_markdown('<p><a href="/x">see [1]</a></p>')
    assert md == "[see [1]](/x)"


def test_unclosed_pre_at_eof_keeps_code():
    md = html_to_markdown("<p>intro</p><pre>def f():\n    pass")
    assert md == "intro\n\n```\ndef f():\n    pass\n```"


def test_loose_list_items_keep_markers():
    # review finding (r10): a block tag inside <li> flushed via the
    # plain path and every item marker vanished
    assert html_to_markdown("<ul><li><p>text</p></li></ul>") == "- text"
    assert html_to_markdown(
        "<ul><li><p>a</p><p>b</p></li><li><p>c</p></li></ul>"
    ) == "- a\n  b\n- c"
    assert html_to_markdown(
        "<ol><li><p>one</p><p>more</p></li></ol>"
    ) == "1. one\n   more"


def test_nested_list_indents_to_parent_content_column():
    # ADVICE (r10): '1. ' needs a 3-column child indent, not 2
    assert html_to_markdown(
        "<ol><li>first<ul><li>a</li></ul></li><li>second</li></ol>"
    ) == "1. first\n   - a\n2. second"


def test_br_inside_table_cell_stays_one_row():
    # review finding (r10): the hard-break sentinel emitted a literal
    # newline inside the pipe row — structurally invalid table
    md = html_to_markdown("<table><tr><td>a<br>b</td><td>c</td></tr></table>")
    assert md == "| a b | c |"


def test_nested_and_self_closing_pre():
    # review finding (r10): </pre> reset depth to 0 (inner close
    # truncated the outer block, tail leaked out of the fence) and
    # <pre/> emitted a spurious empty fence
    md = html_to_markdown("<pre>outer <pre>inner</pre> tail</pre><p>after</p>")
    assert md == "```\nouter inner tail\n```\n\nafter"
    assert html_to_markdown("<p>x</p><pre/><p>y</p>") == "x\n\ny"


def test_inline_code_with_backticks_lengthens_run():
    # ADVICE (r10): <code>a`b</code> emitted a broken span; CommonMark
    # wants a longer delimiter run, space-padded at backtick edges
    assert html_to_markdown("<p>a<code>x`y</code>b</p>") == "a``x`y``b"
    assert html_to_markdown("<p><code>`lead</code></p>") == "`` `lead ``"


def test_truncated_pre_inside_blockquote_is_quoted():
    # review finding (r10): the recovery path had drifted from the
    # normal close — it emitted the fence unquoted
    assert html_to_markdown("<blockquote><pre>code") == (
        "> ```\n> code\n> ```"
    )
