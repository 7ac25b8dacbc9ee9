"""BPE trainer semantics: both engines vs the published algorithm.

The parity sweep already proves Spark == DuckDB for ``bpe_train_merges``;
this test proves they both equal Sennrich et al. 2016 Algorithm 1 — an
independent pure-Python reimplementation (dict-of-tuples vocabulary,
Counter pair statistics, greedy left-to-right merge) run over the same
sf0.001 documents tokens. Any shared mistake in the fold lambda (wrong
overlap handling, wrong tie-break) would pass parity but fail here.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from skyline_spark.catalog import QUERIES
from skyline_spark.catalog.crawl_queries import BPE_TRAIN_ROUNDS
from skyline_spark.functions import text as X

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: Counter, rounds: int):
    """Sennrich Algorithm 1 over a {symbol-tuple: freq} vocabulary."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rnd in range(1, rounds + 1):
        stats: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += f
        if not stats:
            break
        # tie-break identical to both engines: freq DESC, then (l, r) ASC
        (l, r), freq = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, l, r, l + r, freq))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus_words():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.sql(
        f"SELECT t, count(*)::BIGINT FROM documents, "
        f"unnest({X.tokens_sql('text')}) AS u(t) GROUP BY t"
    ).fetchall()
    con.close()
    from skyline_spark.catalog.crawl_queries import BPE_EOW

    return Counter({w + BPE_EOW: int(f) for w, f in rows})


def test_trainer_matches_published_algorithm(spark, corpus_words):
    expected = _reference_bpe(corpus_words, BPE_TRAIN_ROUNDS)
    got = [
        (r.merge_round, r.left_sym, r.right_sym, r.merged, r.freq)
        for r in QUERIES["bpe_train_merges"].build(spark, SF_DIR).collect()
    ]
    assert got == expected


def test_reference_greedy_overlap():
    # the left-to-right non-overlap rule on 'aaaa': ONE round of (a,a)
    # merges positions (1,2) and (3,4) — never the overlapping (2,3)
    merges = _reference_bpe(Counter({("a", "a", "a", "a"): 1}), 1)
    # freq counts every adjacent occurrence (3), the merge is greedy
    assert merges == [(1, "a", "a", "aa", 3)]


def test_pair_exhaustion_keeps_vocab(spark, tmp_path):
    # a corpus with ONE distinct token: round 1 merges (a, EOW) and every
    # word is then a single symbol — rounds 2..6 have no pairs. The empty
    # best frame must KEEP the vocab (left join on true), not annihilate
    # it: the trainer emits exactly one merge row and fertility reads the
    # fully-merged single-symbol words (fertility exactly 1.0)
    import pandas as pd

    sf_dir = str(tmp_path)
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a a a", "a a"],
            "lang": ["eng", "eng"],
            "source": ["s", "s"],
            "n_chars": [5, 3],
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")
    merges = QUERIES["bpe_train_merges"].build(spark, sf_dir).collect()
    assert [(m.merge_round, m.merged, m.freq) for m in merges] == [(1, "a▁", 5)]
    fert = QUERIES["bpe_tokenize_fertility"].build(spark, sf_dir).collect()
    assert [(r.lang, r.n_words, r.n_subwords, r.fertility) for r in fert] == [
        ("eng", 5, 5, 1.0)
    ]
