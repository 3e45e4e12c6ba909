"""Loadable merge-table BPE (operators/bpe.py, VERDICT r6 item 3):
algorithm correctness against hand-computed merges, the
piece-boundary semantics the SQL oracle cannot see, the closed-form
count identity the q51 'bpe' branch is scored on, and the Spark
counter/chunker wire-ins."""

from __future__ import annotations

import pytest

from timeseries_data_provider_spark.operators import bpe


def enc(text, merges, pattern=None):
    return bpe.Tokenizer(merges, pattern).encode(text)


def test_single_merge_hand_cases():
    m = [("a", "b")]
    assert enc("ab", m) == ["ab"]
    assert enc("aab", m) == ["a", "ab"]
    assert enc("abab", m) == ["ab", "ab"]
    assert enc("ba", m) == ["b", "a"]
    assert enc("", m) == []


def test_cascading_merges_follow_rank_order():
    m = [("a", "b"), ("ab", "c")]
    assert enc("abc", m) == ["abc"]
    assert enc("aabc", m) == ["a", "abc"]
    assert enc("abcb", m) == ["abc", "b"]
    # rank order matters: (ab,c) ranked FIRST can never fire before
    # (a,b) creates the 'ab' token, but once it exists it wins ties
    m2 = [("ab", "c"), ("a", "b")]
    assert enc("abc", m2) == ["abc"]


def test_lower_rank_merge_preempts():
    # "abc" with (b,c) ranked below (a,b): bc merges first, ab never
    m = [("b", "c"), ("a", "b")]
    assert enc("abc", m) == ["a", "bc"]


def test_merges_do_not_cross_piece_boundaries():
    # the property the SQL oracle cannot express: 'a' and '.' are
    # adjacent in the raw string but in different pre-split pieces, so
    # the merge must NOT fire
    m = [("a", ".")]
    assert enc("a.", m) == ["a", "."]
    # whereas the space prefixing a word IS part of the word's piece
    # (GPT-2's Ġ convention), so a (space, letter) merge CAN fire
    m2 = [(" ", "a")]
    assert enc("b a", m2) == ["b", " a"]


def test_pieces_partition_losslessly():
    t = bpe.Tokenizer([])
    for s in ("", "a", "hello world", "  x ", "a,b.c!", "héllo…",
              "tab\tand\nnewline", "123abc  7."):
        assert "".join(t.pieces(s)) == s
        # with no merges, token count == character count
        assert t.count(s) == len(s)


def test_count_identity_matches_oracle_formula():
    # the q51 'bpe' branch contract: under [(t,h),(th,e)],
    # tokens = chars − occ('th') − occ('the')
    import random

    rng = random.Random(8)
    tok = bpe.Tokenizer([("t", "h"), ("th", "e")])
    for _ in range(300):
        s = "".join(
            rng.choice("thex ." ) for _ in range(rng.randrange(0, 40))
        )
        want = len(s) - s.count("th") - s.count("the")
        assert tok.count(s) == want, s


def test_tokenizer_survives_pickle_with_empty_cache():
    import pickle

    tok = bpe.Tokenizer([("t", "h")])
    tok.encode("the the the")
    tok2 = pickle.loads(pickle.dumps(tok))
    assert tok2._cache == {}
    assert tok2.encode("tho") == ["th", "o"]


def test_bad_merge_table_raises():
    with pytest.raises(ValueError, match="not a pair"):
        bpe.Tokenizer([("a", "b", "c")])


def test_count_udf_and_counter_in_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "s", "the theme"), (2, "s", "tthhe"), (3, "s", None)],
        "doc_id long, source string, text string",
    )
    out = dict(
        df.select(
            "doc_id",
            bpe.count_udf([("t", "h"), ("th", "e")])(F.col("text"))
            .alias("n"),
        ).collect()
    )
    # "the theme": 9 chars − occ('th')=2 − occ('the')=2 = 5
    assert out[1] == 5
    assert out[2] == 4  # t,th,h,e — wait: tthhe = t+th+h+e
    assert out[3] is None


def test_pack_and_budget_accept_bpe_counter(spark):
    from timeseries_data_provider_spark.operators import pipeline

    df = spark.createDataFrame(
        [(i, "s", "the " * (i + 1), 4 * (i + 1)) for i in range(6)],
        "doc_id long, source string, text string, n_chars long",
    )
    cnt = bpe.counter([("t", "h"), ("th", "e")])
    # each "the " is 2 BPE tokens ('the', ' ') vs 1 whitespace token:
    # the BPE-denominated packing must see twice the tokens
    ws = pipeline.pack_sequences(df, budget=8)
    bp = pipeline.pack_sequences(df, budget=8, counter=cnt)
    assert (
        sum(r["bin_tokens"] for r in bp.collect())
        == 2 * sum(r["bin_tokens"] for r in ws.collect())
    )
    sel = pipeline.budget_select(df, token_budget=10**9, counter=cnt)
    got = {r["doc_id"]: r["n_tokens"] for r in sel.collect()}
    assert got[0] == 2 and got[5] == 12


def test_chunk_documents_bpe_reassembles_losslessly(spark):
    from timeseries_data_provider_spark.operators import pipeline

    texts = [
        (1, "s", "the quick brown fox the fox"),
        (2, "s", ""),
        (3, "t", "ththththe x"),
    ]
    df = spark.createDataFrame(
        texts, "doc_id long, source string, text string"
    )
    merges = [("t", "h"), ("th", "e")]
    rows = (
        bpe.chunk_documents_bpe(
            df, merges, chunk_tokens=4, keep_cols=("source",)
        )
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    # empty doc vanishes (chunk_documents contract)
    assert {r["doc_id"] for r in rows} == {1, 3}
    tok = bpe.Tokenizer(merges)
    for doc_id, _src, text in texts:
        mine = [r for r in rows if r["doc_id"] == doc_id]
        if not text:
            assert mine == []
            continue
        # chunks concatenate back to the exact original text
        assert "".join(r["chunk_text"] for r in mine) == text
        # every chunk is exactly 4 tokens except the remainder
        sizes = [r["n_chunk_tokens"] for r in mine]
        assert all(s == 4 for s in sizes[:-1]) and 1 <= sizes[-1] <= 4
        assert sum(sizes) == tok.count(text)
        # chunk token counts are REAL: re-encoding a chunk yields the
        # same count (boundaries never split a token)
        for r in mine:
            assert tok.count(r["chunk_text"]) == r["n_chunk_tokens"]


def test_train_bpe_learns_expected_merges(spark):
    # "the" dominates: both (h,e) and (t,h) tie at full count and the
    # lexicographic tie-break picks (h,e), then (t,he) completes the
    # word — hand-derived from the histogram, fully deterministic
    df = spark.createDataFrame(
        [(i, "the the the the zq zq") for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(df, n_merges=2)
    assert merges == [("h", "e"), ("t", "he")]
    # with more budget the space-prefixed form and filler follow, and
    # the learned table tokenizes "the" to ONE token
    merges4 = bpe.train_bpe(df, n_merges=4)
    assert merges4[:2] == [("h", "e"), ("t", "he")]
    assert merges4[2:] == [(" ", "the"), (" ", "z")]
    tok = bpe.Tokenizer(merges4)
    assert tok.encode("the") == ["the"]
    assert tok.encode("x the") == ["x", " the"]


def test_train_bpe_determinism_and_exhaustion(spark):
    df = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    a = bpe.train_bpe(df, n_merges=50)
    b = bpe.train_bpe(df, n_merges=50)
    assert a == b
    # the corpus exhausts: pieces 'ab' (x3) and ' ab' collapse to
    # single tokens after finitely many merges, then training stops
    assert len(a) < 50
    assert a[0] == ("a", "b")
    with pytest.raises(ValueError, match="n_merges"):
        bpe.train_bpe(df, n_merges=-1)


def test_train_bpe_feeds_counter_end_to_end(spark):
    df = spark.createDataFrame(
        [(i, "the quick the brown the fox") for i in range(8)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe(df, n_merges=6)
    n = df.select(
        bpe.count_udf(merges)(F_col("text")).alias("n")
    ).collect()[0]["n"]
    # learned merges must strictly beat the no-merge char count
    assert n < len("the quick the brown the fox")
    # and agree with the local tokenizer
    assert n == bpe.Tokenizer(merges).count("the quick the brown the fox")


from pyspark.sql.functions import col as F_col  # noqa: E402


# --- byte-level (r9: VERDICT r8 item 1) -----------------------------------


def test_bytes_to_unicode_is_the_public_table():
    e = bpe.bytes_to_unicode()
    assert len(e) == 256
    assert len(set(e.values())) == 256  # bijective
    # printable latin bytes map to themselves
    assert e[ord("a")] == "a" and e[ord("!")] == "!"
    # the canonical spot-checks every GPT-2 vocab file depends on
    assert e[ord(" ")] == "Ġ"  # Ġ
    assert e[ord("\n")] == "Ċ"  # Ċ
    assert e[0] == "Ā"


def test_byte_tokenizer_counts_bytes_not_chars():
    e = bpe.bytes_to_unicode()
    tb = bpe.ByteTokenizer([])
    tc = bpe.Tokenizer([])
    # é is 2 UTF-8 bytes: byte-level sees 3 symbols, char-level 2
    assert tb.count("hé") == 3 and tc.count("hé") == 2
    # a merge over é's two byte stand-ins collapses it back to one
    tb2 = bpe.ByteTokenizer([(e[0xC3], e[0xA9])])
    assert tb2.count("hé") == 2
    assert bpe.ByteTokenizer.decode_tokens(tb2.encode("hé")) == "hé"
    # hand-computed multi-byte merge cascade: € = E2 82 AC
    euro = "€".encode("utf-8")
    m = [(e[euro[0]], e[euro[1]]), (e[euro[0]] + e[euro[1]], e[euro[2]])]
    tb3 = bpe.ByteTokenizer(m)
    assert tb3.count("€€") == 2
    assert bpe.ByteTokenizer.decode_tokens(tb3.encode("x€y")) == "x€y"


def test_gpt2_pattern_contractions_and_classes():
    t = bpe.ByteTokenizer([])
    assert t.pieces("don't stop") == ["don", "'t", " stop"]
    assert t.pieces("I'll we've he's I'm you're it'd") == [
        "I", "'ll", " we", "'ve", " he", "'s", " I", "'m",
        " you", "'re", " it", "'d",
    ]
    # digits split from letters; underscore joins punctuation class
    assert t.pieces("abc123") == ["abc", "123"]
    assert t.pieces("a_b") == ["a", "_", "b"]
    # trailing-whitespace lookahead: the final space binds to the word
    assert t.pieces("a b") == ["a", " b"]
    assert t.pieces("a  b") == ["a", " ", " b"]
    # the 't contraction splits a th-adjacency the char pattern keeps:
    # byte pieces are "don","'t","h" so (t,h) cannot fire; char pieces
    # are "don","'","th" so it does
    m = [("t", "h")]
    assert bpe.ByteTokenizer(m).encode("don'th") == [
        "d", "o", "n", "'", "t", "h"
    ]
    assert bpe.Tokenizer(m).encode("don'th")[-1] == "th"


def test_gpt2_pattern_no_nl_numerics_classify_as_numbers():
    # review finding (r9): Python \w includes No/Nl numerics (½, Ⅻ)
    # that \p{L} excludes and \d excludes — the naive [^\W\d_]/\d
    # translation classified them as letters, diverging from a real
    # GPT-2 tokenizer's piece boundaries. The generated No/Nl class
    # restores \p{L}/\p{N} semantics exactly on these cases.
    t = bpe.ByteTokenizer([])
    assert t.pieces("a½ 2½") == ["a", "½", " 2½"]
    assert t.pieces("Ⅻ men") == ["Ⅻ", " men"]
    assert t.pieces("x1½y") == ["x", "1½", "y"]
    # superscript two is No; it must run WITH digits, not letters
    assert t.pieces("m²") == ["m", "²"]
    assert t.pieces("3² x") == ["3²", " x"]
    # lossless partition survives the class rewrite
    s = "héllo _wörld_ 3½ Ⅻ\t it's m²"
    assert "".join(t.pieces(s)) == s


def test_byte_pieces_partition_any_unicode():
    t = bpe.ByteTokenizer([])
    for s in ("", "héllo…", "日本語 テスト", "a b", "🎉 party",
              "mixed 日本 and ascii", "\t\n  x"):
        assert "".join(t.pieces(s)) == s
        # no merges: token count == UTF-8 byte count
        assert t.count(s) == len(s.encode("utf-8"))


def test_byte_equals_char_on_ascii_letter_table():
    # the q51 'bpeb' oracle contract: on ASCII text with no
    # apostrophes, byte-level count under a letter-pair table equals
    # the char-level closed form
    import random

    rng = random.Random(9)
    m = [("t", "h"), ("th", "e")]
    tb = bpe.ByteTokenizer(m)
    for _ in range(200):
        s = "".join(
            rng.choice("thex .a") for _ in range(rng.randrange(0, 50))
        )
        assert tb.count(s) == len(s) - s.count("th") - s.count("the")


def test_load_and_dump_merges_roundtrip(tmp_path):
    txt = "#version: 0.2\nt h\nth e\n\nĠ t\n"
    merges = bpe.load_merges(txt)
    assert merges == [("t", "h"), ("th", "e"), ("Ġ", "t")]
    # dump → load roundtrip
    assert bpe.load_merges(bpe.dump_merges(merges)) == merges
    # file variant
    p = tmp_path / "vocab.bpe"
    p.write_text(bpe.dump_merges(merges), encoding="utf-8")
    assert bpe.load_merges_file(str(p)) == merges
    # a real vocab.bpe line drives the byte tokenizer directly:
    # space-prefixed merges are Ġ-encoded, not ' '. Hand-derived:
    # " the" → Ġthe; (t,h) fires first → Ġ,th,e; (th,e) → Ġ,the;
    # (Ġ,t) can never fire ('t' was consumed)
    tok = bpe.ByteTokenizer(merges)
    assert tok.encode(" the") == ["Ġ", "the"]
    # whereas " tx" exercises the Ġ-merge: Ġ,t,x → Ġt,x
    assert tok.encode(" tx") == ["Ġt", "x"]
    with pytest.raises(ValueError, match="malformed"):
        bpe.load_merges("a b c")
    with pytest.raises(ValueError, match="space"):
        bpe.dump_merges([(" a", "b")])


def test_byte_tokenizer_pickles_and_caches():
    import pickle

    tok = bpe.ByteTokenizer([("t", "h")])
    tok.encode("the thé")
    tok2 = pickle.loads(pickle.dumps(tok))
    assert isinstance(tok2, bpe.ByteTokenizer)
    assert tok2._cache == {}
    assert tok2.encode("tho") == ["th", "o"]


def test_byte_count_udf_in_spark(spark):
    from pyspark.sql import functions as F

    e = bpe.bytes_to_unicode()
    df = spark.createDataFrame(
        [(1, "the theme"), (2, "hé"), (3, None)],
        "doc_id long, text string",
    )
    udf = bpe.count_udf(
        [("t", "h"), ("th", "e"), (e[0xC3], e[0xA9])], byte_level=True
    )
    out = dict(df.select("doc_id", udf(F.col("text")).alias("n")).collect())
    assert out[1] == 5  # same as char-level on ASCII
    assert out[2] == 2  # h + merged é bytes
    assert out[3] is None


def test_chunk_documents_bpe_byte_level_chunk_bytes(spark):
    # chunk boundaries fall mid-character: "ééé..." with no merges is
    # 2 byte-tokens per char, so chunk_tokens=3 splits every other é.
    # the chunk_bytes binary column keeps concatenation byte-lossless
    # (Arrow strings must be valid UTF-8, so chunk_text can't).
    text = "é" * 5
    df = spark.createDataFrame(
        [(1, "s", text)], "doc_id long, source string, text string"
    )
    rows = (
        bpe.chunk_documents_bpe(df, [], chunk_tokens=3, byte_level=True)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r["n_chunk_tokens"] for r in rows] == [3, 3, 3, 1]
    joined = b"".join(bytes(r["chunk_bytes"]) for r in rows)
    assert joined == text.encode("utf-8")
    # chunk_text is the replace-decode view; mid-char boundaries show
    # replacement chars but never raise
    assert all("�" in r["chunk_text"] for r in rows)
    # ascii chunking stays plain-lossless and token-count-real
    df2 = spark.createDataFrame(
        [(1, "s", "the quick brown fox the fox")],
        "doc_id long, source string, text string",
    )
    m = [("t", "h"), ("th", "e")]
    rows2 = (
        bpe.chunk_documents_bpe(df2, m, chunk_tokens=4, byte_level=True)
        .orderBy("chunk_id")
        .collect()
    )
    assert "".join(r["chunk_text"] for r in rows2) == (
        "the quick brown fox the fox"
    )
    tok = bpe.ByteTokenizer(m)
    assert sum(r["n_chunk_tokens"] for r in rows2) == tok.count(
        "the quick brown fox the fox"
    )


def test_train_bpe_byte_level_learns_standin_merges(spark):
    # non-ASCII corpus: byte-level training must learn merges over
    # byte STAND-INS (é = C3 A9 → "Ã©"), hand-derived: é's two bytes
    # are the most frequent adjacent pair
    e = bpe.bytes_to_unicode()
    df = spark.createDataFrame(
        [(i, "éé éé x") for i in range(10)], "doc_id long, text string"
    )
    merges = bpe.train_bpe(df, n_merges=1, byte_level=True)
    assert merges == [(e[0xC3], e[0xA9])]
    tok = bpe.ByteTokenizer(merges)
    assert tok.count("éé") == 2
    # and the table survives the vocab.bpe format roundtrip
    assert bpe.load_merges(bpe.dump_merges(merges)) == merges


# --- property tests -------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcth e.", max_size=60))
def test_property_lossless_and_formula(s):
    tok = bpe.Tokenizer([("t", "h"), ("th", "e")])
    assert "".join(tok.pieces(s)) == s
    assert tok.count(s) == len(s) - s.count("th") - s.count("the")


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abc ", max_size=30),
    st.permutations([("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]),
)
def test_property_encode_invariants(s, merges):
    toks = bpe.Tokenizer(merges).encode(s)
    # tokens concatenate back to the input exactly (losslessness is
    # what makes chunk reassembly sound)
    assert "".join(toks) == s
    # every token is either a single char or reachable by the table
    vocab = {"a", "b", "c", " ", "ab", "bc", "abc"}
    assert all(t in vocab for t in toks)
    # adding merges can only shrink the count (monotonicity)
    for k in range(len(merges) + 1):
        assert len(bpe.Tokenizer(merges[:k]).encode(s)) >= len(toks)
