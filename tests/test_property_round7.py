"""Property-based parity for the round-7 tokenizer operators: the
Spark plans vs pure-Python models of the pinned semantics, on random
tiny corpora (the test_property_parity.py recipe). The generator
includes all-single-char corpora deliberately — the class that exposed
the pair-less-round vocabulary wipe fixed alongside these tests."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import given, settings, strategies as st

from capstone_etl_spark.operators.textstats import (
    BPE_MERGES,
    UNI_MAX_PIECE_LEN,
    UNI_MAX_WORD_LEN,
    UNI_MIN_PIECE_FREQ,
    UNI_SCALE,
    bpe_encode,
    unigram_tokenizer,
)

WORD = st.text(alphabet="ab", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=1, max_size=6).map(" ".join)
CORPUS = st.lists(
    st.tuples(DOC, st.sampled_from(["web", "books"])), min_size=1, max_size=6
)


def _write(tmp_path_factory, corpus):
    import pandas as pd

    d = tmp_path_factory.mktemp("prop")
    rows = [
        (i, text, "en", source, len(text))
        for i, (text, source) in enumerate(corpus)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).astype({"doc_id": "int64", "n_chars": "int64"}).to_parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _tokens(text):
    return re.sub(r"[^a-zA-Z0-9 ]", "", text).lower().split()


def _model_bpe(corpus):
    stf = Counter()
    for text, source in corpus:
        for w in _tokens(text):
            stf[(source, w)] += 1
    tf = Counter()
    for (_, w), c in stf.items():
        tf[w] += c
    reprs = {w: w for w in tf}
    for k in range(BPE_MERGES):
        pairs = Counter()
        for w, c in tf.items():
            r = reprs[w]
            for i in range(len(r) - 1):
                pairs[r[i : i + 2]] += c
        if pairs:
            pair = min(pairs, key=lambda p: (-pairs[p], p))
            sym = chr(ord("A") + k)
            reprs = {w: r.replace(pair, sym) for w, r in reprs.items()}
    out = {}
    for (source, w), c in stf.items():
        s = out.setdefault(source, [0, 0, 0])
        s[0] += c
        s[1] += c * len(w)
        s[2] += c * len(reprs[w])
    return {
        source: (
            n_words,
            n_chars,
            n_bpe,
            round(n_bpe / n_words, 6),
            round(n_chars / n_bpe, 6),
        )
        for source, (n_words, n_chars, n_bpe) in out.items()
    }


def _model_unigram(corpus):
    tf = Counter()
    for text, _ in corpus:
        for w in _tokens(text):
            if len(w) <= UNI_MAX_WORD_LEN:
                tf[w] += 1
    pieces = Counter()
    for w, c in tf.items():
        for i in range(len(w)):
            for l in range(1, min(UNI_MAX_PIECE_LEN, len(w) - i) + 1):
                pieces[w[i : i + l]] += c
    kept = {p: f for p, f in pieces.items() if len(p) == 1 or f >= UNI_MIN_PIECE_FREQ}
    total = sum(kept.values())
    cost = {
        p: math.floor(math.log(total / f) * UNI_SCALE + 0.5) for p, f in kept.items()
    }
    cells = {}
    for w, c in tf.items():
        L = len(w)
        dp = [0] + [None] * L
        for j in range(1, L + 1):
            best = None
            for i in range(max(0, j - UNI_MAX_PIECE_LEN), j):
                piece = w[i:j]
                if dp[i] is not None and piece in cost:
                    v = dp[i] + cost[piece] * 64 + 1
                    best = v if best is None else min(best, v)
            dp[j] = best
        v = dp[L]
        key = (L, v & 63)
        cell = cells.setdefault(key, [0, 0, None, None, 0])
        cell[0] += 1
        cell[1] += c
        fp = v >> 6
        cell[2] = fp if cell[2] is None else min(cell[2], fp)
        cell[3] = fp if cell[3] is None else max(cell[3], fp)
        cell[4] += c * fp
    return {
        k: (c[0], c[1], c[2], c[3], c[4] / UNI_SCALE) for k, c in cells.items()
    }


@settings(max_examples=5, deadline=None)
@given(CORPUS)
def test_bpe_encode_matches_python_model(spark, tmp_path_factory, corpus):
    sf = _write(tmp_path_factory, corpus)
    got = {
        r.source: (r.n_words, r.n_chars, r.n_bpe_tokens, r.fertility, r.chars_per_bpe_token)
        for r in bpe_encode(spark, sf).collect()
    }
    want = _model_bpe(corpus)
    assert set(got) == set(want)
    for source in want:
        g, w = got[source], want[source]
        assert g[:3] == w[:3], (source, g, w)
        assert abs(g[3] - w[3]) < 1e-9 and abs(g[4] - w[4]) < 1e-9, (source, g, w)


@settings(max_examples=5, deadline=None)
@given(CORPUS)
def test_unigram_tokenizer_matches_python_model(spark, tmp_path_factory, corpus):
    sf = _write(tmp_path_factory, corpus)
    got = {
        (r.word_len, r.n_pieces): (
            r.n_words,
            r.sum_tf,
            r.min_cost_fp,
            r.max_cost_fp,
            r.weighted_cost,
        )
        for r in unigram_tokenizer(spark, sf).collect()
    }
    want = _model_unigram(corpus)
    assert set(got) == set(want)
    for key in want:
        g, w = got[key], want[key]
        assert g[:4] == w[:4], (key, g, w)
        assert abs(g[4] - w[4]) < 1e-6, (key, g, w)
