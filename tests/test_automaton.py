"""Aho-Corasick correctness vs a brute-force scan (property-style)."""

import numpy as np

from kgspark.automaton import build_automaton, find_word_bounded


def brute_matches(patterns, text):
    out = []
    for p in patterns:
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            out.append((i, p))
            start = i + 1
    return sorted(out)


def brute_word_bounded(patterns, text):
    def alnum(c):
        return c.isascii() and c.isalnum()

    out = []
    for i, p in brute_matches(patterns, text):
        j = i + len(p)
        if i > 0 and alnum(text[i - 1]):
            continue
        if j < len(text) and alnum(text[j]):
            continue
        out.append((i, p))
    return sorted(out)


PATTERNS = ["ab", "abc", "bc", "c", "abcd", "b a", "aa"]


def test_matches_equal_bruteforce_random_strings():
    rng = np.random.RandomState(1)
    alphabet = "abcd "
    for trial in range(30):
        text = "".join(alphabet[k] for k in rng.randint(0, len(alphabet), size=200))
        ac = build_automaton(PATTERNS)
        got = sorted(ac.iter_matches(text))
        assert got == brute_matches(PATTERNS, text), f"trial {trial}"


def test_word_bounded_equal_bruteforce():
    rng = np.random.RandomState(2)
    alphabet = "abcd .,"
    for trial in range(30):
        text = "".join(alphabet[k] for k in rng.randint(0, len(alphabet), size=300))
        ac = build_automaton(PATTERNS)
        assert find_word_bounded(ac, text) == brute_word_bounded(PATTERNS, text)


def test_nested_and_overlapping_patterns_all_reported():
    ac = build_automaton(["sort merge join", "sort merge", "merge join", "merge", "join"])
    text = "a sort merge join b"
    got = {(s, p) for s, p in find_word_bounded(ac, text)}
    assert got == {
        (2, "sort merge join"),
        (2, "sort merge"),
        (7, "merge join"),
        (7, "merge"),
        (13, "join"),
    }


def test_boundary_rejections():
    ac = build_automaton(["spark"])
    assert find_word_bounded(ac, "sparkx") == []
    assert find_word_bounded(ac, "xspark") == []
    assert find_word_bounded(ac, "spark.") == [(0, "spark")]
    assert find_word_bounded(ac, "(spark)") == [(1, "spark")]
