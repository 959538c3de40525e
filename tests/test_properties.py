"""Property-based tests (SURVEY §5.4, hypothesis): name
canonicalization is total/idempotent/identifier-safe; normalize is
total over arbitrary column-name sets."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from poet_cloud_cost_etl_spark.operators.normalize import canonical_name
from poet_cloud_cost_etl_spark.diagnostics import path_to_table_name

NAME = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
    min_size=1,
    max_size=40,
)


@given(NAME)
@settings(max_examples=300, deadline=None)
def test_canonical_name_is_identifier_safe(raw):
    out = canonical_name(raw)
    assert re.fullmatch(r"[a-z0-9_]*", out), (raw, out)
    assert not out or not out[0].isdigit()


@given(NAME)
@settings(max_examples=300, deadline=None)
def test_canonical_name_idempotent(raw):
    once = canonical_name(raw)
    assert canonical_name(once) == once


@given(st.lists(NAME, min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_path_to_table_name_total(segments):
    path = "/".join(segments)
    out = path_to_table_name(path)
    assert re.fullmatch(r"[a-z0-9_]+", out), (path, out)


# ---- round-7 operators vs independent Python references ----------
#
# Each example runs a real Spark job, so example counts are small;
# the value is the INDEPENDENT reference implementation (hashlib +
# plain Python), not example volume — any divergence in hash
# arithmetic, ordering, or integer-division convention fails loudly.

import hashlib


def _uh(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)


@given(
    st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=25),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=8, deadline=None)
def test_mixture_budget_sample_matches_python_reference(
    spark, token_counts, budget
):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        mixture_budget_sample,
    )

    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(token_counts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in mixture_budget_sample(df, "doc_id", "text", "source", budget).collect()
    )

    # reference: single group's budget = (budget * ws) // ws = budget
    order = sorted(range(len(token_counts)), key=lambda i: (_uh(i), i))
    want, cum = [], 0
    for i in order:
        cum += token_counts[i]
        if cum <= budget:
            want.append((i, cum))
        else:
            break
    assert got == sorted(want)


@given(st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_training_order_shuffle_matches_python_reference(
    spark, ids
):
    from poet_cloud_cost_etl_spark.operators.sampling import (
        training_order_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in training_order_shuffle(df, "doc_id", n_shards=4, epoch=2).collect()
    }

    def h(i):
        return int(hashlib.md5(f"2|{i}".encode()).hexdigest()[:8], 16)

    want = {}
    by_shard: dict[int, list[int]] = {}
    for i in ids:
        by_shard.setdefault(h(i) % 4, []).append(i)
    for shard, members in by_shard.items():
        for pos, i in enumerate(sorted(members, key=lambda x: (h(x), x)), 1):
            want[i] = (shard, pos)
    assert got == want


# ---- round-8b operators vs independent Python references ----------


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_bpe_merges_match_python_reference(spark, words, min_count):
    """X57 vs a plain-python pair counter: identical counts, ranking,
    min_count pruning, and lexicographic tie-break."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        bpe_merge_candidates,
    )

    df = spark.createDataFrame(
        [(i, " ".join(words)) for i in range(2)], ["doc_id", "text"]
    )
    got = [(r["rank"], r["pair"], r["pair_count"]) for r in
           bpe_merge_candidates(df, "text", k=50, min_count=min_count).collect()]

    counts: dict[str, int] = {}
    for w in words:
        for i in range(len(w) - 1):
            counts[w[i:i + 2]] = counts.get(w[i:i + 2], 0) + 2  # 2 docs
    want_pairs = sorted(
        ((p, c) for p, c in counts.items() if c >= min_count),
        key=lambda pc: (-pc[1], pc[0]),
    )[:50]
    want = [(r + 1, p, c) for r, (p, c) in enumerate(want_pairs)]
    assert got == want


@given(
    st.sets(
        st.text(alphabet="abcdefgh", min_size=1, max_size=8),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=8),
)
@settings(max_examples=8, deadline=None)
def test_kmv_estimate_matches_hashlib_reference(spark, vocab, k):
    """X62 vs hashlib: identical k-th hash and integer estimator,
    including the exact-count fallback below k."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        kmv_distinct_estimate,
    )

    df = spark.createDataFrame(
        [(1, "S", " ".join(sorted(vocab)))], ["doc_id", "source", "text"]
    )
    r = kmv_distinct_estimate(df, "source", "text", k=k).collect()[0]
    hashes = sorted({_uh(t) for t in vocab})
    kept = hashes[:k]
    want_est = (
        len(kept) if len(kept) < k else ((k - 1) * 4294967296) // kept[-1]
    )
    assert r["sketch_size"] == len(kept)
    assert r["kth_hash"] == kept[-1]
    assert r["est_distinct"] == want_est


@given(st.text(alphabet="abc ", min_size=0, max_size=30))
@settings(max_examples=10, deadline=None)
def test_compressibility_matches_python_reference(spark, text):
    """X58 vs plain python bigram sets, including the <2-char
    degenerate rows."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        compressibility_profile,
    )

    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = compressibility_profile(df, "doc_id", "text").collect()[0]
    bi = [text[i:i + 2] for i in range(len(text) - 1)]
    assert r["n_bigrams"] == len(bi)
    assert r["distinct_bigrams"] == len(set(bi))
    want_ttr = (1000000 * len(set(bi))) // max(len(bi), 1) / 1000000.0
    assert r["bigram_ttr"] == want_ttr


# ---- round-8c operators vs independent Python references ----------


@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=3),
)
@settings(max_examples=8, deadline=None)
def test_substring_dup_coverage_matches_python_reference(
    spark, docs, min_count
):
    """X66 vs a plain-python position counter: per-doc flagged
    positions under corpus-wide 3-gram occurrence counting."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        substring_dup_coverage,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_positions"], r["dup_positions"]) for r in
           substring_dup_coverage(df, "doc_id", "text",
                                  min_count=min_count).collect()}

    # reference: tokenization of " ".join(toks) may produce [""] for
    # the empty doc — mirror the engine's split semantics
    toksed = [(" ".join(t)).split(" ") if t else [""] for t in docs]
    corpus: dict[tuple, int] = {}
    for t in toksed:
        for i in range(max(len(t) - 2, 0)):
            g = tuple(t[i:i + 3])
            corpus[g] = corpus.get(g, 0) + 1
    want = {}
    for i, t in enumerate(toksed):
        n_pos = max(len(t) - 2, 0)
        dup = sum(
            1 for k in range(n_pos)
            if corpus[tuple(t[k:k + 3])] >= min_count
        )
        want[i] = (n_pos, dup)
    assert got == want


@given(
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=20),
    st.sets(st.integers(min_value=0, max_value=60), min_size=1, max_size=10),
    st.integers(min_value=16, max_value=256),
)
@settings(max_examples=8, deadline=None)
def test_bloom_gate_matches_hashlib_reference(spark, hist_ids, inc_ids, m):
    """X67 vs hashlib: identical bit positions, hit counts, and
    exact-membership grading."""
    from poet_cloud_cost_etl_spark.operators.dedup import bloom_gate_eval

    hist = spark.createDataFrame(
        [(i, f"text number {i}") for i in sorted(hist_ids)],
        ["doc_id", "text"],
    )
    inc = spark.createDataFrame(
        [(1000 + i, f"text number {i}") for i in sorted(inc_ids)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["bloom_hits"], r["bloom_maybe_dup"],
                         r["exact_dup"], r["false_positive"])
           for r in bloom_gate_eval(hist, inc, "doc_id", "text",
                                    m_bits=m, n_hashes=4).collect()}

    def fp(i):
        canon = f"text number {i}"
        return hashlib.md5(canon.encode()).hexdigest()

    def positions(f):
        return [
            int(hashlib.md5(f"{j}|{f}".encode()).hexdigest()[:8], 16) % m
            for j in range(4)
        ]

    bits = {p for i in hist_ids for p in positions(fp(i))}
    hist_fps = {fp(i) for i in hist_ids}
    want = {}
    for i in sorted(inc_ids):
        hits = sum(1 for p in positions(fp(i)) if p in bits)
        maybe = hits == 4
        exact = fp(i) in hist_fps
        want[1000 + i] = (hits, maybe, exact, maybe and not exact)
    assert got == want


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.sampled_from("abcde"),
        min_size=0,
        max_size=12,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.sampled_from("abcde"),
        min_size=0,
        max_size=12,
    ),
)
@settings(max_examples=10, deadline=None)
def test_snapshot_diff_matches_python_reference(spark, old_map, new_map):
    """X70 vs a plain-python diff over (id -> content) maps."""
    from poet_cloud_cost_etl_spark.operators.dedup import snapshot_diff

    if not old_map and not new_map:
        return
    old = spark.createDataFrame(
        [(i, f"content {c}") for i, c in sorted(old_map.items())],
        ["doc_id", "text"],
    ) if old_map else spark.createDataFrame([], "doc_id long, text string")
    new = spark.createDataFrame(
        [(i, f"content {c}") for i, c in sorted(new_map.items())],
        ["doc_id", "text"],
    ) if new_map else spark.createDataFrame([], "doc_id long, text string")
    got = {r["doc_id"]: (r["status"], r["content_elsewhere"]) for r in
           snapshot_diff(old, new, "doc_id", "text").collect()}

    old_contents, new_contents = set(old_map.values()), set(new_map.values())
    want = {}
    for i in set(old_map) | set(new_map):
        if i not in old_map:
            want[i] = ("added", new_map[i] in old_contents)
        elif i not in new_map:
            want[i] = ("removed", old_map[i] in new_contents)
        elif old_map[i] == new_map[i]:
            want[i] = ("unchanged", False)
        else:
            want[i] = ("changed", new_map[i] in old_contents)
    assert got == want


@given(
    st.lists(
        st.sets(st.sampled_from(["a b c", "b c d", "c d e", "d e f",
                                 "e f g", "f g h"]),
                min_size=1, max_size=4),
        min_size=2,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)
def test_bbit_minhash_matches_hashlib_reference(spark, shingle_sets):
    """X74 vs hashlib: per-pair collision counts and the clamped ppm
    estimator, from the raw md5 arithmetic up."""
    from poet_cloud_cost_etl_spark.operators.dedup import (
        bbit_minhash_eval,
    )

    k, mod = 8, 4
    rows = [(i, " ".join(sorted(s))) for i, s in enumerate(shingle_sets)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): (r["n_collisions"], r["est_jaccard"])
           for r in bbit_minhash_eval(df, "doc_id", "text", k=k,
                                      b=2).collect()}

    # reference: the doc's 3-gram shingles of its own token stream
    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    def bits(s):
        out = []
        for j in range(1, k + 1):
            mh = min(hashlib.md5(f"{j}|{x}".encode()).hexdigest()
                     for x in s)
            out.append(int(mh[31], 16) % mod)
        return out

    docs = {i: sh(t) for i, t in rows}
    want = {}
    for a in docs:
        for b in docs:
            if a < b and docs[a] & docs[b]:
                c = sum(1 for x, y in zip(bits(docs[a]), bits(docs[b]))
                        if x == y)
                est = max(0, ((c * mod - k) * 1000000) // (k * (mod - 1)))
                want[(a, b)] = (c, est / 1e6)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-20000, max_value=20000),  # logit
            st.integers(min_value=1, max_value=50),          # n_tokens
            st.integers(min_value=0, max_value=1),           # label
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_calibration_brier_matches_python_reference(spark, rows):
    """X126 against an independent pure-Python fold: the affine clamp,
    decile binning, per-bin integer means, Brier and ECE."""
    from poet_cloud_cost_etl_spark.operators.textstats import (
        calibration_brier,
    )

    df = spark.createDataFrame(
        [(i, lo, n, y) for i, (lo, n, y) in enumerate(rows)],
        ["doc_id", "logit", "n_tokens", "label"],
    )
    got = {
        r["bin"]: r for r in calibration_brier(df, "label").collect()
    }

    def p_ppm(lo, n):
        m = -((1000 * -lo) // n) if lo < 0 else (1000 * lo) // n
        return min(1_000_000, max(0, 500_000 + m))

    bins: dict[int, list[tuple[int, int]]] = {}
    for lo, n, y in rows:
        p = p_ppm(lo, n)
        bins.setdefault(min(p, 999_999) // 100_000, []).append((p, y))
    total_n = len(rows)
    total_sq = sum((p - 1_000_000 * y) ** 2 for b in bins.values() for p, y in b)
    gaps = {
        k: abs(sum(p for p, _ in v) // len(v)
               - (1_000_000 * sum(y for _, y in v)) // len(v))
        for k, v in bins.items()
    }
    want_brier = total_sq // (total_n * 1_000_000)
    want_ece = sum(len(v) * gaps[k] for k, v in bins.items()) // total_n

    assert set(got) == set(bins)
    for k, v in bins.items():
        assert got[k]["n_docs"] == len(v)
        assert int(round(got[k]["mean_pred"] * 1e6)) == sum(p for p, _ in v) // len(v)
        assert int(round(got[k]["gap"] * 1e6)) == gaps[k]
    any_row = next(iter(got.values()))
    assert int(round(any_row["brier"] * 1e6)) == want_brier
    assert int(round(any_row["ece"] * 1e6)) == want_ece


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=40),
    st.integers(min_value=2, max_value=7),
)
@settings(max_examples=8, deadline=None)
def test_group_kfold_matches_python_reference(spark, ids, k):
    """X127 against the hashlib unit-hash reference: fold membership,
    naive-leak counts, exact shares."""
    from poet_cloud_cost_etl_spark.operators.sampling import group_kfold_plan

    rows = [(i, i % 3) for i in sorted(set(ids))]
    df = spark.createDataFrame(rows, ["doc_id", "cluster_id"])
    got = {r["fold"]: r for r in group_kfold_plan(df, "doc_id", "cluster_id", k=k).collect()}

    per: dict[int, list[tuple[int, int]]] = {}
    for d, c in rows:
        per.setdefault(_uh(c) % k, []).append((d, c))
    assert set(got) == set(per)
    for f, v in per.items():
        assert got[f]["n_docs"] == len(v)
        assert got[f]["n_clusters"] == len({c for _, c in v})
        assert got[f]["n_leaked_naive"] == sum(
            1 for d, c in v if _uh(d) % k != f
        )
        assert int(round(got[f]["docs_share"] * 1e6)) == (
            1_000_000 * len(v)
        ) // len(rows)
