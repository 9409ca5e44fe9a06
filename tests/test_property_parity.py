"""Property-based parity: Spark column expressions vs pure-Python
models of the reference semantics (clean/lower/split, main.go:245-297;
dense ids, main.go:137-153). Each example ships a BATCH of generated
strings through one Spark job to keep the suite fast."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from capstone_etl_spark.functions.text import count_substring, tokenize
from capstone_etl_spark.operators.vocab import with_dense_ids

# printable ascii + some unicode/whitespace torture
TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
        max_size=60,
    ),
    min_size=1,
    max_size=24,
)


def _model_tokens(s: str) -> list[str]:
    """The reference semantics: DELETE every char outside [a-zA-Z0-9 ],
    lowercase, split on space runs, drop empties (main.go:245-297)."""
    cleaned = re.sub(r"[^a-zA-Z0-9 ]", "", s)
    return cleaned.lower().split()


@settings(max_examples=12, deadline=None)
@given(TEXTS)
def test_tokenize_matches_python_model(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = {r.i: r.toks for r in df.select("i", tokenize("s").alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _model_tokens(t), repr(t)


@settings(max_examples=12, deadline=None)
@given(TEXTS, st.sampled_from(["a", "ab", "x y", "0"]))
def test_count_substring_matches_str_count(spark, texts, needle):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = {
        r.i: r.n
        for r in df.select("i", count_substring("s", needle).alias("n")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t.count(needle), (repr(t), needle)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=200, unique=True))
def test_dense_ids_are_sorted_permutation(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(4)
    rows = with_dense_ids(df, "k", id_name="rank").collect()
    got = {r.k: r.rank for r in rows}
    for rank, k in enumerate(sorted(keys)):
        assert got[k] == rank


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)),
    min_size=1,
    max_size=20,
)


def _model_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find reference: node -> min node id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=6, deadline=None)
@given(EDGES)
def test_connected_components_matches_union_find(spark, pairs):
    from capstone_etl_spark.operators.dedup import connected_components

    p = spark.createDataFrame(pairs, "a long, b long")
    edges = p.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        p.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    got = {r.doc_id: r.label for r in connected_components(edges).collect()}
    assert got == _model_components(pairs)


COUNTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(1, 400)),  # (shard, n_tokens)
    min_size=1,
    max_size=40,
)


def _model_greedy(ns: list[int], budget: int) -> list[int]:
    """Pure-Python first-fit-sequential reference."""
    out, fill, pack = [], 0, 0
    for n in ns:
        if out and fill + n > budget:
            pack += 1
            fill = 0
        fill += n
        out.append(pack)
    return out


@settings(max_examples=10, deadline=None)
@given(COUNTS)
def test_greedy_pack_matches_python_model(spark, counts):
    from capstone_etl_spark.operators.packing import SEQ_LEN, _greedy_pack

    rows = [("s", shard, i, n) for i, (shard, n) in enumerate(counts)]
    df = spark.createDataFrame(
        rows, "source string, shard long, doc_id long, n_tokens long"
    )
    got = _greedy_pack(df, ["doc_id"]).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(got, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        expected = _model_greedy([r.n_tokens for r in rs], SEQ_LEN)
        assert [r.pack_id for r in rs] == expected, (shard, rs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60).flatmap(
        lambda chars: st.tuples(
            st.just(chars),
            st.lists(
                st.integers(min_value=0, max_value=max(len(chars) - 2, 0)),
                min_size=max(len(chars) - 1, 0),
                max_size=max(len(chars) - 1, 0),
            ),
        )
    )
)
def test_subtree_rollup_matches_python_model(spark, data):
    """Pointer doubling on RANDOM forests: node i's parent is any node
    < i (guaranteeing a forest of arbitrary shape/depth up to 59), and
    the result must equal the straightforward Python ancestor walk."""
    chars, raw_parents = data
    n = len(chars)
    parents = {i + 1: min(p, i) for i, p in enumerate(raw_parents)}

    from pyspark.sql import functions as F

    from capstone_etl_spark.operators.text_pipeline import subtree_rollup
    from capstone_etl_spark.session import release_caches

    nodes = spark.createDataFrame(
        [(i, c) for i, c in enumerate(chars)], "doc_id long, n_chars long"
    )
    pdf = spark.createDataFrame(
        [(c, p) for c, p in parents.items()] or [(None, None)],
        "doc_id long, j long",
    ).filter(F.col("doc_id").isNotNull())
    rounds = 6  # depth < 64 ≥ any 60-node tree
    try:
        got = {
            r.doc_id: (r.depth, r.subtree_docs, r.subtree_chars)
            for r in subtree_rollup(nodes, pdf, rounds=rounds).collect()
        }
    finally:
        release_caches()

    # python model
    import collections

    depth = {}
    for i in range(n):
        d, cur = 0, i
        while cur in parents:
            cur = parents[cur]
            d += 1
        depth[i] = d
    sub_docs = collections.Counter()
    sub_chars = collections.Counter()
    for i in range(n):
        cur = i
        sub_docs[cur] += 1
        sub_chars[cur] += chars[i]
        while cur in parents:
            cur = parents[cur]
            sub_docs[cur] += 1
            sub_chars[cur] += chars[i]
    want = {i: (depth[i], sub_docs[i], sub_chars[i]) for i in range(n)}
    assert got == want


# --- round-6: template_shape invariances ------------------------------------
#
# The structural-template skeleton must be INVARIANT to exactly the
# variance it claims to mask: digit-run values, letter case, and
# whitespace shape. A Python model mirrors the two-stage definition.


def _model_shape(s: str, k: int = 8) -> str:
    """dedup.template_shape's semantics in pure Python: content mask
    (lower, digit runs -> '#', ASCII-ws runs -> ' '), then tokenize
    (delete non-[a-zA-Z0-9 ], split) and join the first k token
    lengths. The ws class is EXPLICIT (Java's \\s) — Python's \\s is
    Unicode-wide (\\xa0 etc.) and would diverge from both engines."""
    masked = re.sub(r"[ \t\n\r\f\x0b]+", " ", re.sub(r"[0-9]+", "#", s.lower())).strip(" ")
    cleaned = re.sub(r"[^a-zA-Z0-9 ]", "", masked).strip(" ")
    toks = [t for t in re.split(r" +", cleaned) if t]
    return "-".join(str(len(t)) for t in toks[:k])


@settings(max_examples=10, deadline=None)
@given(TEXTS)
def test_template_shape_matches_python_model(spark, texts):
    from capstone_etl_spark.operators.dedup import template_shape

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, s string")
    got = {r.i: r.shape for r in df.select("i", template_shape("s").alias("shape")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _model_shape(t), repr(t)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdefgh ", min_size=1, max_size=40), min_size=1, max_size=8
    ),
    st.integers(min_value=0, max_value=10**9),
)
def test_template_shape_invariant_to_digits_case_ws(spark, texts, num):
    """Replacing any digit run's VALUE, flipping case, or reshaping
    whitespace must not change the skeleton."""
    from capstone_etl_spark.operators.dedup import template_shape

    variants = []
    for i, t in enumerate(texts):
        base = f"page {num} of 99 {t}"
        variants.append((i, 0, base))
        variants.append((i, 1, f"PAGE {num + 1} OF 5 {t.upper()}"))
        variants.append((i, 2, f"  page\t{num * 7 + 1}   of  123456 {t} "))
    df = spark.createDataFrame(variants, "i long, v long, s string")
    got = {}
    for r in df.select("i", "v", template_shape("s").alias("shape")).collect():
        got.setdefault(r.i, set()).add(r.shape)
    for i, shapes in got.items():
        assert len(shapes) == 1, (texts[i], shapes)
