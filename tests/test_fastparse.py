"""Differential tests: fast tokenizer == stdlib-html.parser block
builder over the whole corpus domain + handcrafted edge cases.

(The clara-tests.c pattern: an independent implementation checked
against an oracle over an exhaustive input sweep.)
"""

from __future__ import annotations

import pytest

from clara_ocr_spark.domparse import parse_blocks
from clara_ocr_spark.fastparse import parse_blocks_fast
from clara_ocr_spark.sources.corpus import gen_page


def _key(b):
    # n_runs is run-splitting-dependent bookkeeping; every field that
    # feeds classification/assembly must match exactly
    return (b.pos, b.zone, b.tag_path, b.depth, b.text, b.link_text_len)


def assert_same(html: bytes):
    slow = [_key(b) for b in parse_blocks(html)]
    fast = [_key(b) for b in parse_blocks_fast(html)]
    assert fast == slow, html[:200]


@pytest.mark.parametrize("seed", [42, 7, 99])
def test_differential_corpus(seed):
    for i in range(400):
        assert_same(gen_page(i, seed)["html"])


EDGES = [
    b"",
    b"plain text only",
    b"<p>a &amp; b &#65; &copy; &unknown; c</p>",
    b"<p>unterminated <b>bold",
    b"<div><p>a<p>b</div>after",
    b"<script>if (a < b && c > d) { x = '<p>'; }</script><p>real</p>",
    b"<style>p > a { color: red }</style><p>real</p>",
    b"<!-- comment with <p>fake</p> --><p>real</p>",
    # html.parser closes comments on the REGEX --\s*> (not literal
    # -->): whitespace-padded closes, nested opens, the degenerate
    # <!--> / <!---> forms, and unterminated comments at EOF
    b"<!--<!-- >",
    b"<!--<!-- > more",
    b"<!--a--   >x",
    b"<!--a--\t>x",
    b"<!--a-- -->x",
    b"<!-->",
    b"<!--->",
    b"<!---->",
    b"<!-- unterminated",
    b"<p>a<!-- c --\f>b</p>",
    b"<!DOCTYPE html><?xml pi?><p>x</p>",
    b"<p class='q\"z' title=\"a>b\">attr quoting</p>",
    b"<br><br/><hr/><p>voids</p>",
    b"<P>UPPER case TAGS</P><DIV>d</DIV>",
    b'<div data-zone="3"><p>zoned</p></div>',
    b"<div data-zone='2'><p>q</p></div><div data-zone=1><p>r</p></div>",
    b"<a href='/x'>link <b>bold link</b></a> tail",
    b"<p>self-close <span/>span after</p>",
    b"< notatag <p>real</p>",
    b"<p>a</p>\n\n  \t<p>b</p>",
    b"<ul><li>one<li>two<li>three</ul>",
    b"<table><tr><td>c1<td>c2<tr><td>c3</table>",
    b"<p>trailing open <",
    b"<p>entity at end &amp",
    "á<p>café</p>".encode("latin-1"),
    "<p>café straße</p>".encode("utf-8"),
    b"<div><div><div><div><p>deep</p></div></div></div></div>",
    b"</div></p><p>stray closers</p>",
    b"<p>text</p><script>x</script><p>more</p>",
    b"<noscript><p>hidden</p></noscript><p>shown</p>",
]


@pytest.mark.parametrize("html", EDGES)
def test_differential_edges(html):
    assert_same(html)


def test_fast_is_faster():
    """min-of-3 interleaved timings: a single-sample comparison flakes
    when another process (e.g. a concurrent Spark session) steals CPU
    mid-measurement; min rejects the contended samples and the
    margin (< 1.2×) only requires fast to not be slower."""
    import time

    docs = [gen_page(i)["html"] for i in range(300)]
    for fn in (parse_blocks, parse_blocks_fast):  # warm
        for h in docs[:50]:
            fn(h)

    def once(fn) -> float:
        t0 = time.perf_counter()
        for h in docs:
            fn(h)
        return time.perf_counter() - t0

    slow = min(once(parse_blocks) for _ in range(3))
    fast = min(once(parse_blocks_fast) for _ in range(3))
    assert fast < slow * 1.2, (fast, slow)


# -- hypothesis fuzz: random tag soup must parse identically ---------
from hypothesis import given, settings
from hypothesis import strategies as st

_soup_piece = st.one_of(
    st.text(alphabet="ab <>&/=\"'!-;#pdivscriptyle\n\t", max_size=20),
    st.sampled_from(
        ["<p>", "</p>", "<div>", "</div>", "<a href='x'>", "</a>",
         "<br>", "<script>", "</script>", "<!--", "-->", "&amp;",
         "&#65;", "<b>", "</b>", "<li>", "<td>", "<span/>",
         "<div data-zone=2>", "café", "<P >", "</ P>"]
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_soup_piece, max_size=30))
def test_differential_fuzz(pieces):
    assert_same("".join(pieces).encode("utf-8"))


def test_large_document_linear():
    """Multi-MB documents (they exist at corpus scale) parse linearly
    and identically on both paths."""
    import time

    def doc(n):
        return (
            b"<html><body>"
            + b"".join(
                b'<div><p>para %d tokens here <a href="/x%d">link</a></p></div>'
                % (i, i)
                for i in range(n)
            )
            + b"</body></html>"
        )

    big = doc(20000)  # ~1.7 MB
    t0 = time.time()
    fast = parse_blocks_fast(big)
    t1 = time.time() - t0
    slow = parse_blocks(big)
    assert [_key(b) for b in fast] == [_key(b) for b in slow]
    assert len(fast) == 20000
    t0 = time.time()
    parse_blocks_fast(doc(80000))  # 4× the bytes
    t4 = time.time() - t0
    assert t4 < 10 * t1 + 1.0, (t1, t4)  # superlinear blowup guard
