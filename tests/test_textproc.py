"""Unit tests for the deterministic extractor/tokenizer (SURVEY.md §5.2)."""

from semantic_search_engine_spark.textproc import (
    doc_bucket,
    doc_id_for_url,
    extract_html,
    extract_text,
    resolve_text,
    tokenize,
)


def test_strips_script_style_head_nav():
    html = (b"<html><head><title>T</title><style>b{}</style>"
            b"<script>var s='SECRET';</script></head>"
            b"<body><p>keep me</p><nav>drop nav</nav><p>and me</p></body></html>")
    title, body = extract_html(html)
    assert title == "T"
    assert body == "keep me and me"
    assert "SECRET" not in body and "nav" not in body


def test_entities_decoded_deterministically():
    html = (b"<html><body><p>fish &amp; chips &lt;x&gt; don&#8217;t"
            b"&nbsp;stop</p></body></html>")
    _, body = extract_html(html)
    assert body == "fish & chips <x> don’t stop".replace(" ", " ") or True
    # nbsp collapses under the whitespace policy
    assert body == "fish & chips <x> don’t stop"


def test_void_tags_are_word_boundaries():
    _, body = extract_html(b"<html><body>a<br>b</body></html>")
    assert body == "a b"


def test_empty_and_malformed():
    assert extract_html(b"") == ("", "")
    assert extract_html(None) == ("", "")
    # malformed markup should not raise
    extract_html(b"<html><body><p>unclosed <b<b>< p")


def test_extraction_is_byte_deterministic():
    html = ("<html><body><p>straße München 日本語 "
            "\U0001f600 naïve</p></body></html>").encode()
    a = extract_text(html).encode("utf-8")
    b = extract_text(html).encode("utf-8")
    assert a == b
    assert "München".encode() in a


def test_tokenize_rules():
    assert tokenize("Fish & CHIPS don't stop 4K!") == [
        "fish", "chips", "don", "t", "stop", "4k"]
    assert tokenize("") == []
    assert tokenize(None) == []
    assert tokenize("x" * 100) == []  # exceeds max token len
    assert tokenize("a-b_c") == ["a", "b", "c"]


def test_resolve_text_policy():
    assert resolve_text("provided", b"<p>html</p>") == "provided"
    assert resolve_text(None, b"<html><body>from html</body></html>") == "from html"
    assert resolve_text(None, b"") is None
    assert resolve_text(None, None) is None
    assert resolve_text("", b"<p>x</p>") == ""  # empty string is still provided


def test_doc_id_stable_and_60bit():
    a = doc_id_for_url("https://a.example/x")
    assert a == doc_id_for_url("https://a.example/x")
    assert 0 <= a < (1 << 60)
    assert a != doc_id_for_url("https://a.example/y")


def test_doc_bucket_range_partitioning_preserves_order():
    ids = sorted(doc_id_for_url(f"u{i}") for i in range(500))
    buckets = [doc_bucket(d, 32) for d in ids]
    assert buckets == sorted(buckets)  # monotone in doc_id
    assert all(0 <= b < 32 for b in buckets)


def test_fast_extractor_matches_reference_on_corpus():
    """The find/regex fast extractor must agree byte-for-byte with the
    streaming HTMLParser reference on the whole synthetic corpus (incl.
    every edge fixture) and on adversarial snippets."""
    from semantic_search_engine_spark.corpus import generate_rows
    from semantic_search_engine_spark.textproc import extract_html_reference

    for r in generate_rows(300):
        if r["html"]:
            assert extract_html(r["html"]) == \
                extract_html_reference(r["html"]), r["url"]
    for snippet in [
        b"<svg width='1'/>visible<svg>hidden</svg>tail",
        b"<SCRIPT>a</SCRIPT>ok",
        b"<script>unclosed",
        b"<nav>x</nav>y<nav>z</nav>w",
        b"<head><title>T</title><meta x=1></head>body",
        b"<scripty>not a script</scripty>keep",
        b"a<script",
        b"<style>.x{}</style><p>Z</p>",
        b"<!-- c --><p>k</p><!-- tail",
        # adversarial title handling (ADVICE r1): duplicates, outside
        # <head>, svg tooltip, unterminated-at-EOF, markup inside title
        b"<title>A</title>x<title>B</title>",
        b"<html><head><title>T1</title></head><title>T2</title>body</html>",
        b"<svg><title>tooltip</title></svg>body",
        b"<p>pre</p><title>unclosed rest",
        b"<title>A</title> stuff <title>unclosed rest",
        b"<title><b>Bold</b> title</title>body",
        b"a<title",
        # title openers hidden in comments / script CDATA are NOT titles
        b"<!-- <title> -->body text",
        b"<title>Real</title><!-- <title>Ad</title> -->body",
        b'<script>var s = "<title>";</script>body here',
        b"<noscript><title>NT</title></noscript>after",
        b"<style>.a{}</style><title>T</title>b",
        # '</head>' inside script CDATA is not an end tag (CDATA-first
        # strip order): head must extend to its real closer
        b"<head><script>if(a</head>b){}</script><meta x=1></head>visible",
    ]:
        assert extract_html(snippet) == extract_html_reference(snippet), snippet


def test_accepted_divergences_are_pinned():
    """The two divergences accepted for the ~10x fast path (documented at
    the _SKIP_TAGS_FAST definition) stay exactly as documented — each
    extractor's output is pinned so a silent behavior change fails here."""
    from semantic_search_engine_spark.textproc import extract_html_reference

    # 1. '</script>' hidden inside an HTML comment: fast strips comments
    #    first (≈ HTML5 escaped script data); HTMLParser ends the CDATA
    #    block at the commented closer.
    s = b"<script>var x; <!-- </script> --> alert(1)</script>after"
    assert extract_html(s) == ("", "after")
    assert extract_html_reference(s) == ("", "--> alert(1) after")

    # 2. '>' inside a quoted attribute value: fast's tag strip ends at the
    #    first '>', leaking the attribute tail; HTMLParser parses it.
    a = b'<p title="a>b">text</p>'
    assert extract_html(a) == ("", 'b">text')
    assert extract_html_reference(a) == ("", "text")


def test_normalize_ws_equivalence():
    """The split/join fast form of _normalize_ws must equal the original
    regex form on adversarial unicode whitespace — SRE's \\s and
    str.split() both use Py_UNICODE_ISSPACE, which this test pins."""
    import random
    import re

    from semantic_search_engine_spark.textproc import _normalize_ws

    ws_re = re.compile(r"\s+")
    chars = [" ", "\t", "\n", "\r", "\x0b", "\x0c", "\x1c", "\x1d",
             "\x1e", "\x1f", "\x85", "\xa0", " ", " ",
             "　", "a", "b", "<", ">", "é"]
    rng = random.Random(7)
    for _ in range(5000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 30)))
        assert _normalize_ws(s) == ws_re.sub(" ", s).strip(), repr(s)


def test_tokenize_overlong_fast_path():
    """tokenize()'s unfiltered fast path (no overlong run present) must
    equal the filtering form for every (min, max) combination, including
    runs straddling the 64-char default cap."""
    import random

    from semantic_search_engine_spark.textproc import TOKEN_RE

    def ref(text, mx=64, mn=1):
        return [t for t in TOKEN_RE.findall(text.lower())
                if mn <= len(t) <= mx]

    rng = random.Random(3)
    cases = ["A" * 70, "a" * 64, "a" * 65, "x " + "b" * 200 + " y", "",
             "ü" * 70, "a1" * 40, "a1" * 33]
    for _ in range(3000):
        cases.append("".join(rng.choice("ab0 .A-Z")
                             for _ in range(rng.randint(0, 120))))
    for c in cases:
        assert tokenize(c) == ref(c), repr(c[:80])
        assert tokenize(c, 10, 2) == ref(c, 10, 2), repr(c[:80])
        assert tokenize(c, 100, 1) == ref(c, 100, 1), repr(c[:80])
