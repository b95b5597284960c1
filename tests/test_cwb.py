"""Native CWB binary ingestion (kgspark.cwb).

The reference reads on-disk Corpus Workbench corpora via RcppCWB
(R/dbpedia.R:798-811); these tests round-trip the canonical uncompressed
binary layout through the distributed byte-range reader.
"""

import numpy as np
import pytest

from kgspark.cwb import (
    cwb_documents,
    cwb_token_table,
    read_lexicon,
    read_region_values,
    read_regions,
    write_cwb_corpus,
)

DOCS = [
    ["the", "quick", "brown", "fox"],
    ["jumps", "over", "the", "lazy", "dog"],
    ["the", "end"],
]


@pytest.fixture()
def corpus_dir(tmp_path):
    return write_cwb_corpus(
        str(tmp_path / "cwb"), DOCS, id_values=["d0", "d1", "d2"]
    )


def test_lexicon_and_regions_roundtrip(corpus_dir):
    lex = read_lexicon(corpus_dir)
    # insertion-ordered type ids; "the" appears once despite 3 occurrences
    assert lex[:4] == ["the", "quick", "brown", "fox"]
    assert len(lex) == len({w for d in DOCS for w in d})
    rng = read_regions(corpus_dir)
    assert rng.tolist() == [[0, 3], [4, 8], [9, 10]]
    assert read_region_values(corpus_dir, "text", "id") == {
        0: "d0", 1: "d1", 2: "d2"
    }


def test_token_table_decode(spark, corpus_dir):
    rows = cwb_token_table(spark, corpus_dir, parts=3).collect()
    got = sorted((r["doc_id"], r["cpos"], r["word"]) for r in rows)
    want = []
    cpos = 0
    for did, toks in enumerate(DOCS):
        for w in toks:
            want.append((did, cpos, w))
            cpos += 1
    assert got == want


def test_documents_reassembly_and_stoplist(spark, corpus_dir):
    docs = {
        r["doc_id"]: (r["id"], r["text"])
        for r in cwb_documents(spark, corpus_dir, id_value="id").collect()
    }
    assert docs == {
        0: ("d0", "the quick brown fox"),
        1: ("d1", "jumps over the lazy dog"),
        2: ("d2", "the end"),
    }
    nostop = {
        r["doc_id"]: r["text"]
        for r in cwb_documents(spark, corpus_dir, stoplist=["the"]).collect()
    }
    assert nostop[0] == "quick brown fox"
    assert nostop[2] == "end"


def test_distributed_slicing_matches_single_partition(spark, tmp_path):
    """A larger corpus decoded at parts=7 (byte-range slices that do not
    align with document boundaries) must equal the parts=1 decode."""
    rng = np.random.RandomState(7)
    docs = [
        [f"w{rng.randint(50)}" for _ in range(int(rng.randint(3, 40)))]
        for _ in range(60)
    ]
    d = write_cwb_corpus(str(tmp_path / "big"), docs)
    one = sorted(map(tuple, cwb_token_table(spark, d, parts=1).collect()))
    many = sorted(map(tuple, cwb_token_table(spark, d, parts=7).collect()))
    assert one == many
    assert len(one) == sum(len(x) for x in docs)


def test_compressed_corpus_matches_uncompressed(spark, tmp_path):
    """Huffcode triple (.hcd/.huf/.huf.syn, no .corpus) decodes to the
    identical token table as the uncompressed layout — the reference path
    R/dbpedia.R:798-811 covered natively with no cwb-decompress step."""
    rng = np.random.RandomState(11)
    docs = [
        [f"w{rng.zipf(1.6) % 40}" for _ in range(int(rng.randint(3, 50)))]
        for _ in range(40)
    ]
    plain = write_cwb_corpus(str(tmp_path / "plain"), docs)
    comp = write_cwb_corpus(str(tmp_path / "comp"), docs, compressed=True)
    import os

    assert not os.path.exists(os.path.join(comp, "word.corpus"))
    assert os.path.exists(os.path.join(comp, "word.huf"))
    a = sorted(map(tuple, cwb_token_table(spark, plain, parts=3).collect()))
    b = sorted(map(tuple, cwb_token_table(spark, comp, parts=3).collect()))
    assert a == b
    # sync-block splits need not align with doc boundaries either
    b5 = sorted(map(tuple, cwb_token_table(spark, comp, parts=5).collect()))
    assert a == b5


def test_compressed_documents_end_to_end(spark, tmp_path):
    d = write_cwb_corpus(
        str(tmp_path / "cz"), DOCS, id_values=["d0", "d1", "d2"],
        compressed=True,
    )
    got = {
        r["doc_id"]: (r["id"], r["text"])
        for r in cwb_documents(spark, d, id_value="id").collect()
    }
    assert got == {
        0: ("d0", "the quick brown fox"),
        1: ("d1", "jumps over the lazy dog"),
        2: ("d2", "the end"),
    }
