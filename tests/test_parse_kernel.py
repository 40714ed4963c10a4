"""Parse-kernel golden tests: hand-derived span sequences from the reference
state machine (html_parse_manager.py:113-191,394-428) on crafted HTML, plus
unit tests of the text kernels the scalar columns depend on.

The span expectations below were traced BY HAND from the reference semantics
(tag states, admission gates, caps) — they anchor the kernel independently of
its own implementation.
"""

from __future__ import annotations

from genesis_spark.functions import parse as P
from genesis_spark.functions import text as TX

HOST = "http://testhostaaaa.onion"

PAGE = f"""<html><head><title>Hidden Market Index</title>
<meta name="description" content="the main hidden market index with secure service and private data records">
<meta name="keywords" content="market, hidden, market, index">
</head><body>
<h1>Welcome to the hidden market</h1>
<p>This is the main market index with many secure service listing entries available.</p>
<p>short</p>
<div>a b c d e f g h</div>
<a href="{HOST}/page1">p1</a>
<a href="/page2/">p2</a>
<a href="{HOST}/img/logo.png">logo</a>
<a href="http://othersitebbbb.onion/x">cross</a>
<a href="http://example.com/doc.pdf">pdf</a>
<img src="/banner.jpg">
</body></html>"""


def test_span_sequence_hand_derived():
    out = P.parse_page(HOST, PAGE)
    got = [(s["kind"], s["text"], s["media_ref"]) for s in out["spans"]]
    imp_strip = ("welcome to the hidden market this is the main market index "
                 "with many secure service listing entries available")
    meta_stream = ("the main hidden market index with secure service and "
                   "private data records")
    expected = [
        ("title", "Hidden Market Index", None),
        ("heading", "Welcome to the hidden market", None),
        ("text", "This is the main market index with many secure service "
                 "listing entries available.", None),
        ("text", "a b c d e f g h", None),
        ("link", None, f"{HOST}/page1"),
        ("link", None, f"{HOST}/page2"),
        ("image", None, f"{HOST}/img/logo.png"),
        ("document", None, "http://example.com/doc.pdf"),
        ("image", None, f"{HOST}/banner.jpg"),
        ("section", "this is the main market index with many secure service "
                    "listing entries available", None),
        ("section", "a b c d e f g h", None),
        ("section", imp_strip, None),
        ("section", meta_stream, None),
    ]
    assert got == expected
    assert [s["offset"] for s in out["spans"]] == list(range(len(expected)))


def test_scalar_columns_hand_derived():
    out = P.parse_page(HOST, PAGE)
    assert out["title"] == "hidden market index"
    assert out["meta_description"] == ("the main hidden market index with "
                                       "secure service and private data records")
    assert out["meta_keywords"] == "market hidden index"
    assert out["sub_url"] == [f"{HOST}/page1", f"{HOST}/page2"]
    assert out["images"] == [f"{HOST}/img/logo.png", f"{HOST}/banner.jpg"]
    assert out["documents"] == ["http://example.com/doc.pdf"]
    assert out["videos"] == [] and out["archives"] == []
    assert out["clearnet_links"] == ["http://example.com/doc.pdf"]
    assert out["names"] == [] and out["emails"] == [] and out["phone_numbers"] == []
    assert out["network"] == "onion"
    # pass-1 soup text is < 250 chars -> early-0 guard (reference :305-306)
    assert out["validity_score"] == 0


def test_cross_host_and_base_links_rejected():
    html = (f'<a href="{HOST}">self-base</a>'
            f'<a href="{HOST}/ok">ok</a>'
            '<a href="http://elsewherecccc.onion/p">other</a>'
            '<a href="#">frag</a>'
            '<a href="xx">tiny</a>')
    out = P.parse_page(HOST, html)
    assert out["sub_url"] == [f"{HOST}/ok"]
    # base-url link admitted nothing; '#'-terminated and len<=5 rejected


def test_media_caps_and_order():
    links = "".join(f'<a href="{HOST}/i{n:02d}.jpg">x</a>' for n in range(15))
    out = P.parse_page(HOST, links)
    # a-href media cap is 10 (html_parse_manager.py:81)
    assert out["images"] == [f"{HOST}/i{n:02d}.jpg" for n in range(10)]
    imgs = "".join(f'<img src="/m{n:02d}.png">' for n in range(40))
    out2 = P.parse_page(HOST, imgs)
    # img-src cap is 35 (:121)
    assert len(out2["images"]) == 35


def test_doc_sub_url_truncation_to_10():
    links = "".join(f'<a href="{HOST}/p{n:02d}">x</a>' for n in range(25))
    out = P.parse_page(HOST, links)
    assert out["sub_url"] == [f"{HOST}/p{n:02d}" for n in range(10)]
    # but all 25 admitted links appear as spans, in order
    link_spans = [s for s in out["spans"] if s["kind"] == "link"]
    assert len(link_spans) == 25


def test_near_duplicate_paragraph_suppressed():
    html = ("<p>the market service provides secure hidden data records</p>"
            "<p>the market service provides secure hidden data record</p>"
            "<p>completely different words appear in this last paragraph</p>")
    out = P.parse_page(HOST, html)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    # 2nd is >0.85 SequenceMatcher-similar to the 1st (reference :227-229)
    assert texts == ["the market service provides secure hidden data records",
                     "completely different words appear in this last paragraph"]


def test_irrelevant_and_short_text_rejected():
    html = ("<p>please accept all cookies now</p>"
            "<p>click here to continue reading this</p>"
            "<p>ab</p><p>one two</p>")
    out = P.parse_page(HOST, html)
    assert [s for s in out["spans"] if s["kind"] == "text"] == []


def test_span_inside_paragraph_not_captured():
    # span state only set when paragraph depth == 0 (:136-137)
    html = ("<p><span>w1 w2 w3 w4 w5 w6 w7 w8</span></p>"
            "<span>a1 a2 a3 a4 a5 a6 a7 a8</span>")
    out = P.parse_page(HOST, html)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    assert texts == ["a1 a2 a3 a4 a5 a6 a7 a8"]


def test_br_continuation_keeps_state():
    html = "<p>first half of the paragraph<br>and the second half keeps going</p>"
    out = P.parse_page(HOST, html)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    assert texts == ["first half of the paragraph",
                     "and the second half keeps going"]


def test_anchor_resets_text_state():
    # after <a>, state is none (:166-167) -> anchor text and tail lost
    html = '<p>lead text of paragraph one <a href="/x">anchor words here</a> tail words lost</p>'
    out = P.parse_page(HOST, html)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    assert texts == ["lead text of paragraph one"]


def test_title_first_chunk_only():
    html = "<title>First Title Here</title><title>Second Title Gone</title>"
    out = P.parse_page(HOST, html)
    titles = [s for s in out["spans"] if s["kind"] == "title"]
    assert len(titles) == 1 and titles[0]["text"] == "First Title Here"


def test_sections_div_with_disallowed_inner_tag_skipped():
    html = ("<div>plain div with market service data words</div>"
            "<div>outer words <p>inner paragraph market service data here</p></div>"
            "<div>allowed <b>bold market</b> service data words inside</div>")
    out = P.parse_page(HOST, html)
    secs = [s["text"] for s in out["spans"] if s["kind"] == "section"]
    # div #2 contains <p> (disallowed) -> skipped as a div, but its inner <p>
    # is picked up by the p/div walk itself (:402-409)
    assert "plain div with market service data words" in secs
    assert "inner paragraph market service data here" in secs
    assert "allowed bold market service data words inside" in secs
    assert not any("outer words" in s for s in secs)


def test_emails_phones():
    html = ("<p>contact us at admin@example.com or sales@example.org now ok</p>"
            "<p>call +12025550123 or the invalid 12345 one</p>")
    out = P.parse_page(HOST, html)
    assert out["emails"] == ["admin@example.com", "sales@example.org"]
    assert out["phone_numbers"] == ["+12025550123"]


def test_validity_score_components_direct():
    # hand-built args: content>=250, 4 sections, rich page -> positive score
    score = P.validity_score(
        content_p1="x" * 300,
        sections=["s1", "s2", "s3", "s4"],
        sub_url_full=["u1", "u2", "u3", "u4"],      # >3 -> +10
        emails=["e@x.com"], phones=["+12345678901"],  # +5 +5
        archives=[], videos=[], images=["i1", "i2"], docs=[],  # +2
        important_content="y" * 250,                 # >200 -> +20
        title_raw="a good title here",               # 16 chars -> +10
        meta_desc_stream="d" * 100,                  # 20<100<=150 -> +10
        important_raw=["p1", "p2", "p3"],            # unique ratio 1.0 -> +10
    )
    # +20+10+10+2+10+5+5+min(4,5)+10+10(content-type) = 86
    assert score == 86
    # early-0 guards
    assert P.validity_score(
        content_p1="x" * 100, sections=["a"] * 10, sub_url_full=["u"],
        emails=[], phones=[], archives=[], videos=[], images=[], docs=[],
        important_content="", title_raw="", meta_desc_stream="",
        important_raw=[]) == 0


def test_clean_text_vs_raw_dedup():
    # 1st 'alpha' dropped (appears in its right 5-context); 2nd survives
    # (left context is the *emitted* stream, which lacks it) — :257-266
    assert TX.dedup_words("alpha beta alpha gamma") == "beta alpha gamma"
    assert TX.dedup_words("a b c d e f a b c d e f g") == "a b c d e f g"
    out = TX.clean_text_vs_raw("The Market IS open", [])
    assert out == "the market is open"


def test_clean_paragraph_sentence_gate():
    good = "the market service is secure."
    bad = "zzqx wvut kjhg plmn."
    kept = TX.clean_paragraph(f"{good} {bad}")
    assert kept == good
    both = TX.clean_paragraph(f"{good} {good}")
    assert both == f"{good} - {good}"


def _lcs_dp(a: str, b: str) -> int:
    """Classic O(n*m) DP oracle for LCS length."""
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb
                       else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def test_fuzz_ratio_is_exact_indel_similarity():
    """T13 parity: fuzz_ratio = round(200*LCS/lensum), thefuzz/rapidfuzz's
    normalized indel similarity — not difflib's greedy approximation."""
    # the canonical thefuzz README pair: 2*14/29 -> 96.55 -> 97
    assert TX.fuzz_ratio("this is a test", "this is a test!") == 97
    assert TX.fuzz_ratio("", "") == 100
    assert TX.fuzz_ratio("abc", "") == 0
    assert TX.fuzz_ratio("abc", "abc") == 100
    # difflib divergence case: greedy matching undercounts ("q" junk-ish
    # prefix splits the match); exact LCS("qabxcd","abycdf") = 4
    assert TX._lcs_len("qabxcd", "abycdf") == 4
    assert TX.fuzz_ratio("qabxcd", "abycdf") == round(200 * 4 / 12)


def test_lcs_bitparallel_matches_dp():
    from hypothesis import given, settings, strategies as st
    alphabet = st.sampled_from("ab cde")

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet, max_size=40), st.text(alphabet, max_size=40))
    def check(a, b):
        assert TX._lcs_len(a, b) == _lcs_dp(a, b)

    check()
    # long-string sanity (bigint path past one machine word)
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown cat leaps over a lazy dog! " * 5
    assert TX._lcs_len(a, b) == _lcs_dp(a, b)


def test_stopwords_injectable(tmp_path):
    """T10 injection point: a file-backed stopword set threads through
    clean_paragraph exactly like the T9 dictionary."""
    assert TX.load_stopwords(None) is TX.STOPWORDS
    p = tmp_path / "stop.txt"
    p.write_text("zzqx wvut kjhg plmn\n")
    custom = TX.load_stopwords(str(p))
    assert custom == {"zzqx", "wvut", "kjhg", "plmn"}
    gibberish = "zzqx wvut kjhg plmn."
    assert TX.clean_paragraph(gibberish) == ""                   # default: rejected
    assert TX.clean_paragraph(gibberish, stopwords=custom) == gibberish
