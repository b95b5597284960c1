"""Aho-Corasick multi-pattern matcher for surface-form spotting.

Native replacement for the mention-detection half of the DBpedia Spotlight
service the reference delegates to over HTTP (``R/dbpedia.R:471-485``).
Spotlight's spotter is a lexicon FSA (Mendes et al. 2011 §4.1); we build the
same thing: a broadcast automaton over the ``surface_form`` column of the
lexicon, applied inside a vectorized pandas UDF (see ``kgspark.spot``).

Pure-Python implementation (flat lists, BFS failure links) so the object
pickles cheaply into a Spark broadcast. On a real cluster, swap in the C
extension ``pyahocorasick`` when available — ``build_automaton`` gates on the
import and both implementations expose the same ``iter_matches`` contract.
Matches are emitted for *every* dictionary occurrence (including nested and
overlapping ones); overlap resolution is a downstream, relational concern
(``kgspark.overlaps``).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Iterator


class AhoCorasick:
    """Classic Aho-Corasick automaton over unicode code points.

    ``iter_matches(text)`` yields ``(start0, pattern)`` for every occurrence
    of every pattern, 0-based, in increasing end-position order.
    """

    __slots__ = ("goto", "fail", "out", "patterns")

    def __init__(self, patterns: Iterable[str]):
        self.patterns: list[str] = sorted(set(p for p in patterns if p))
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[list[int]] = [[]]
        for pid, pat in enumerate(self.patterns):
            state = 0
            for ch in pat:
                nxt = self.goto[state].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[state][ch] = nxt
                state = nxt
            self.out[state].append(pid)
        # BFS failure links; merge output links so nested suffix patterns
        # (e.g. "merge join" inside "sort merge join") are all reported.
        self.fail = [0] * len(self.goto)
        queue: deque[int] = deque()
        for child in self.goto[0].values():
            queue.append(child)
        while queue:
            state = queue.popleft()
            for ch, child in self.goto[state].items():
                queue.append(child)
                f = self.fail[state]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(ch, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                self.out[child] = self.out[child] + self.out[self.fail[child]]

    def iter_matches(self, text: str) -> Iterator[tuple[int, str]]:
        state = 0
        goto, fail, out, patterns = self.goto, self.fail, self.out, self.patterns
        for i, ch in enumerate(text):
            while state and ch not in goto[state]:
                state = fail[state]
            state = goto[state].get(ch, 0)
            if out[state]:
                for pid in out[state]:
                    pat = patterns[pid]
                    yield (i - len(pat) + 1, pat)


def _is_word_char(ch: str) -> bool:
    # ASCII alnum boundary definition — mirrored exactly by the DuckDB
    # oracle regex class [0-9A-Za-z] so both engines agree on boundaries.
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z") or ("0" <= ch <= "9")


def find_word_bounded(automaton: AhoCorasick, text: str) -> list[tuple[int, str]]:
    """All dictionary matches that start and end on a word boundary.

    Spotlight spots token-aligned surface forms; we approximate token
    alignment with ASCII word boundaries, which is deterministic and
    SQL-mirrorable. Returns 0-based ``(start0, surface_form)`` sorted by
    ``(start0, len)`` for reproducibility.
    """
    n = len(text)
    hits = []
    for start0, pat in automaton.iter_matches(text):
        end0 = start0 + len(pat)  # exclusive
        if start0 > 0 and _is_word_char(text[start0 - 1]):
            continue
        if end0 < n and _is_word_char(text[end0]):
            continue
        hits.append((start0, pat))
    hits.sort(key=lambda h: (h[0], len(h[1]), h[1]))
    return hits


class CAhoCorasick:
    """pyahocorasick-backed adapter, same ``iter_matches`` contract.

    The C trie builds ~100× faster and uses ~10× less memory than the
    pure-Python automaton — at a 10⁶–10⁷-surface-form Spotlight lexicon
    this is the difference between seconds and minutes per worker. Kept
    behind the import gate because the container image has no compiler;
    ``test_automaton.py::test_c_adapter_matches_pure`` exercises it
    wherever the wheel is present.
    """

    __slots__ = ("_auto", "patterns")

    def __init__(self, patterns: Iterable[str]):
        import ahocorasick

        self.patterns: list[str] = sorted(set(p for p in patterns if p))
        self._auto = ahocorasick.Automaton()
        for pat in self.patterns:
            self._auto.add_word(pat, pat)
        self._auto.make_automaton()

    def iter_matches(self, text: str) -> Iterator[tuple[int, str]]:
        for end_idx, pat in self._auto.iter(text):
            yield (end_idx - len(pat) + 1, pat)


def build_automaton(patterns: Iterable[str], prefer_c: bool = True):
    """Build the spotting automaton — C implementation when available,
    pure-Python (the portable correctness reference) otherwise."""
    if prefer_c:
        try:
            import ahocorasick  # noqa: F401

            return CAhoCorasick(patterns)
        except ImportError:
            pass
    return AhoCorasick(patterns)


# ---------------------------------------------------------------------------
# Artifact path: build the automaton ON THE EXECUTORS from a parquet
# artifact of surface forms, once per worker process, instead of
# collect()-ing the lexicon to the driver and shipping a pickled automaton
# through a broadcast. At a real Spotlight lexicon (10^6-10^7 forms) the
# pickled pure-Python trie is GBs and the driver build takes minutes; the
# artifact is ~100 MB of compressed parquet and each worker builds the trie
# locally (C-speed with pyahocorasick), amortized by worker reuse.
_PROCESS_CACHE: dict[str, object] = {}


def write_lexicon_artifact(lexicon, path: str) -> str:
    """Distributed write of the distinct surface forms (no driver collect).
    ``path`` must be reachable by every executor (shared FS on a cluster;
    any local dir under local[*])."""
    lexicon.select("surface_form").distinct().write.mode("overwrite").parquet(path)
    return path


def load_automaton_from_artifact(path: str):
    """Executor-side: read the artifact with pyarrow and build the
    automaton once per python worker process (module-level cache; hits on
    every subsequent batch while spark.python.worker.reuse holds)."""
    auto = _PROCESS_CACHE.get(path)
    if auto is None:
        import glob
        import os

        import pyarrow.parquet as pq

        forms: list[str] = []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            forms.extend(pq.read_table(f, columns=["surface_form"]).column(0).to_pylist())
        auto = build_automaton(forms)
        _PROCESS_CACHE[path] = auto
    return auto
