"""Property-based tests (hypothesis): the extractor must be total,
deterministic and idempotent on arbitrary byte blobs — the per-row
invariant cannot rely on well-formed input at web scale."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cpg_ray.normalize import char_to_byte_offsets, collapse_ws, norm_name
from cpg_ray.stages.extract import MentionDetector, extract_text

html_ish = st.one_of(
    st.binary(max_size=2000),
    st.text(max_size=2000).map(lambda s: s.encode("utf-8", "ignore")),
    st.builds(
        lambda parts: ("<html><body>" + "".join(parts)).encode(),
        st.lists(
            st.sampled_from(
                ["<p>", "</p>", "<h1>", "</h1>", "<nav>", "</nav>",
                 "text & more", "<title>t</title>", "<script>x<y</script>",
                 "ünïcödé ", "<p", ">", "<!--", "-->"]
            ),
            max_size=30,
        ),
    ),
)


@given(html_ish)
@settings(max_examples=200, deadline=None)
def test_extract_total_and_deterministic(blob):
    t1, p1 = extract_text(blob)
    t2, p2 = extract_text(blob)
    assert isinstance(t1, str)
    assert (t1, p1) == (t2, p2)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_byte_offsets_prefix_sum(s):
    off = char_to_byte_offsets(s)
    assert off[0] == 0
    assert off[-1] == len(s.encode("utf-8"))
    assert all(b <= a for b, a in zip(off, off[1:]))  # monotone... reversed
    assert all(a <= b for a, b in zip(off, off[1:]))


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_norm_name_idempotent(s):
    n = norm_name(s)
    assert norm_name(n) == n
    assert collapse_ws(collapse_ws(s)) == collapse_ws(s)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=591),
               max_size=400))
@settings(max_examples=100, deadline=None)
def test_mention_detection_spans_valid(text):
    det = MentionDetector(["Ada Verne", "Acme Labs Inc.", "Freedonia"])
    for m in det.detect(text):
        assert 0 <= m.start < m.end <= len(text)
        assert text[m.start:m.end] == m.surface
    # non-overlap and sorted
    ms = det.detect(text)
    for a, b in zip(ms, ms[1:]):
        assert a.end <= b.start
