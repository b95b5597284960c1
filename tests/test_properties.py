"""Property-based tests (hypothesis) for the pure kernels.

The reference's strongest tests are invariants (segment reconstruction,
segmentation-invariance of the mention set — tests/testthat/test-segment.R);
here they run over generated inputs instead of two fixtures.
"""

from hypothesis import example, given, settings, strategies as st

from kgspark.automaton import build_automaton, find_word_bounded
from kgspark.extract import extract_text_from_html
from kgspark.segment import segment_document, segment_string
from kgspark.synth import build_html

WORDS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=30, max_size=300
)
PATTERNS = ["ab", "abc", "cd", "ab cd", "f"]


@settings(max_examples=40, deadline=None)
@given(WORDS, st.integers(80, 400), st.integers(10, 60))
@example(
    words=['a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'd',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'aa',
     'ac',
     'a',
     'ae',
     'af',
     'cc',
     'a',
     'db',
     'dd',
     'de',
     'aa',
     'aa',
     'aa',
     'cfb',
     'daa',
     'ede',
     'efb',
     'afab',
     'bbab',
     'daef',
     'dbad',
     'febf',
     'ffaf',
     'cafad',
     'cbafa',
     'ccada',
     'dfbbc',
     'ecdbe',
     'ffddd',
     'bbefbd',
     'bdddfb',
     'cdaebe',
     'fcdcbf',
     'fdeabb',
     'acdaaba',
     'afdcaec',
     'bfacfbf',
     'ccfcfef',
     'dbffaba',
     'aaadcbbc',
     'aaccbcec',
     'adbfaccc',
     'aedecdcf',
     'aefdccfe',
     'aefeffff',
     'afaccded',
     'bcdcfeae',
     'beaeeffc',
     'bffecabc',
     'cbaeeaaf',
     'cbdfeeae',
     'cddfccae',
     'daaefccc',
     'dafaaeef',
     'dafcbbfc',
     'ddbecfdc',
     'eaadcbfc',
     'eaaffacf',
     'ebfecfde',
     'eccfdbfa',
     'effafbcf',
     'faaecaec',
     'faffbbbc',
     'feadafde',
     'febceecd',
     'feddadef',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'a',
     'bb',
     'be',
     'aa',
     'aa',
     'ca',
     'ce',
     'a',
     'aa',
     'aa',
     'aad',
     'aed',
     'cbb',
     'cea',
     'dcd',
     'fab',
     'fcb',
     'fcf',
     'acda',
     'bbba',
     'caae',
     'cfea',
     'dcbe',
     'eadc',
     'ebaf',
     'efda',
     'fceb',
     'fefb',
     'bbbfb',
     'deeaf',
     'eceec',
     'efdec',
     'faace',
     'fbafa',
     'aadccd',
     'accefe',
     'caaeae',
     'ccecdf',
     'edabec',
     'efcedd',
     'faaefc',
     'cdadaad',
     'eaccabd',
     'fbdeaba',
     'fefebdc',
     'abfeebfb',
     'acdabded',
     'adabbceb',
     'bdaadedc',
     'becfedae',
     'bfcbaffa',
     'cabaafab',
     'cadecbdf',
     'cbbdebca',
     'ccddbdaa',
     'cdadacad',
     'cddcedef',
     'daadfbef',
     'daedcaca',
     'dcdcbbbc',
     'eaccdddd',
     'ebebbaeb',
     'ecbcadbb',
     'aaaaaaaa',
     'aaaaaaaa',
     'aaaaaaaa',
     'aaaaaaaa',
     'aaaaaaaa',
     'aaaaaaaa'],
    max_len=80,
    overlap=10,
).via('discovered failure')
def test_segment_reconstruction_property(words, max_len, overlap):
    if overlap >= max_len:
        overlap = max_len // 2
    x = " ".join(words)
    segs = segment_string(x, max_len=max_len, overlap=overlap)
    covered = set()
    for off, seg in segs:
        assert x[off - 1 : off - 1 + len(seg)] == seg
        covered.update(range(off - 1, off - 1 + len(seg)))
    assert covered == set(range(len(x)))


@settings(max_examples=30, deadline=None)
@given(WORDS, st.integers(100, 300))
def test_segmented_spotting_equals_direct(words, max_len):
    x = " ".join(words)
    ac = build_automaton(PATTERNS)
    direct = {(i + 1, p) for i, p in find_word_bounded(ac, x)}
    via = set()
    for seg in segment_document(x, max_len=max_len, overlap=max_len // 4):
        for off0, p in find_word_bounded(ac, seg["seg_text"]):
            s = seg["seg_off"] + off0
            if seg["keep_from"] <= s < seg["keep_to"]:
                via.add((s, p))
    assert via == direct


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet="abc <>&\n.x", min_size=0, max_size=200))
def test_extract_roundtrip_property(text):
    # normalize to what the generator guarantees: no leading/trailing or
    # repeated whitespace within paragraphs, no empty paragraphs
    pars = [" ".join(p.split()) for p in text.split("\n")]
    norm = "\n".join(p for p in pars if p)
    assert extract_text_from_html(build_html(norm, "k")) == norm
