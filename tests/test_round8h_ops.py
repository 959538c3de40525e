"""Round-8h operator tests: X115+ (constraint suite, Poisson
bootstrap CI, Heaps-law fit)."""

from __future__ import annotations


def test_constraint_suite_semantics(spark):
    """X115: pass/fail verdicts, NULL bounds unbounded, ppm metrics
    exact, deliberate failures detected."""
    from poet_cloud_cost_etl_spark.operators.aggregates import constraint_suite

    df = spark.createDataFrame(
        [
            (1, "en", "hello", 5),
            (2, "de", None, 0),
            (3, "xx!", "welt", 4),
            (3, "en", "dup id", 6),
        ],
        ["id", "lang", "text", "n"],
    )
    out = {
        r["check"]: r
        for r in constraint_suite(
            df,
            [
                {"name": "rows", "kind": "row_count", "lo": 1, "hi": 10},
                {"name": "text_comp", "kind": "completeness", "col": "text",
                 "lo": 1000000},
                {"name": "id_uniq", "kind": "distinctness", "col": "id",
                 "lo": 1000000},
                {"name": "lang_iso", "kind": "match", "col": "lang",
                 "pattern": "^[a-z][a-z]$", "lo": 1000000},
                {"name": "lang_set", "kind": "in_set", "col": "lang",
                 "allowed": ["en", "de"], "lo": 750000},
                {"name": "n_min", "kind": "min", "col": "n", "lo": 0},
                {"name": "n_max", "kind": "max", "col": "n", "hi": 5},
            ],
        ).collect()
    }
    assert out["rows"]["metric"] == 4 and out["rows"]["status"] == "pass"
    # 3 of 4 texts non-null -> 750000 ppm, fails the 1e6 floor
    assert out["text_comp"]["metric"] == 750000
    assert out["text_comp"]["status"] == "fail"
    # 3 distinct of 4 rows
    assert out["id_uniq"]["metric"] == 750000
    assert out["id_uniq"]["status"] == "fail"
    # 'xx!' fails the anchored iso-2 pattern: 3/4 match
    assert out["lang_iso"]["metric"] == 750000
    assert out["lang_iso"]["status"] == "fail"
    # exactly 3/4 in {en, de} meets the 750000 floor
    assert out["lang_set"]["metric"] == 750000
    assert out["lang_set"]["status"] == "pass"
    assert out["n_min"]["metric"] == 0 and out["n_min"]["status"] == "pass"
    assert out["n_max"]["metric"] == 6 and out["n_max"]["status"] == "fail"


def test_constraint_suite_empty_input(spark):
    """X115: empty input -> ppm metrics 0 (clamped division), NULL
    extrema pass vacuous bound checks, row_count-with-lo fails."""
    from poet_cloud_cost_etl_spark.operators.aggregates import constraint_suite

    df = spark.createDataFrame([], "id INT, lang STRING")
    out = {
        r["check"]: r
        for r in constraint_suite(
            df,
            [
                {"name": "rows", "kind": "row_count", "lo": 1},
                {"name": "comp", "kind": "completeness", "col": "lang",
                 "lo": 1000000},
                {"name": "mn", "kind": "min", "col": "id", "lo": 0},
            ],
        ).collect()
    }
    assert out["rows"]["metric"] == 0 and out["rows"]["status"] == "fail"
    assert out["comp"]["metric"] == 0 and out["comp"]["status"] == "fail"
    assert out["mn"]["metric"] is None and out["mn"]["status"] == "pass"


def test_constraint_suite_single_scan(spark):
    """X115 is ONE corpus scan: exactly one parquet scan node in the
    executed plan even with 7 checks incl. an exact distinct."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    plan = (
        QUERIES["documents_constraint_suite"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1


def _pois1_weight(key: str) -> int:
    """Independent Python reference for the deterministic Poisson(1)
    draw: md5 unit hash inverted through the same hardcoded CDF."""
    import hashlib

    u = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    ts = [1580030168, 3160060337, 3950075421, 4213413783, 4279248373,
          4292415291, 4294609777, 4294923276, 4294962463]
    for k, t in enumerate(ts):
        if u < t:
            return k
    return 9


def test_poisson_bootstrap_ci_hashlib_reference(spark):
    """X116 equals an independent hashlib + pure-Python bootstrap on
    a two-group fixture (exact integer convention throughout)."""
    from poet_cloud_cost_etl_spark.operators.sampling import poisson_bootstrap_ci

    rows = [(i, "a" if i % 2 == 0 else "b", 10 + 7 * i) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = {
        r["grp"]: r
        for r in poisson_bootstrap_ci(
            df, "doc_id", "n_chars", "source", b_reps=16
        ).collect()
    }

    for grp in ("a", "b"):
        members = [(i, v) for i, s, v in rows if s == grp]
        reps = []
        for b in range(16):
            sw = swx = 0
            for i, v in members:
                w = _pois1_weight(f"{i}|{b}")
                sw += w
                swx += w * v
            if sw > 0:
                reps.append((1000000 * swx) // sw)
        reps.sort()
        n = len(members)
        mean_e6 = (1000000 * sum(v for _, v in members)) // n
        lo = reps[(25 * len(reps) + 999) // 1000 - 1]
        hi = reps[(975 * len(reps) + 999) // 1000 - 1]
        r = got[grp]
        assert r["n"] == n and r["mean_e6"] == mean_e6
        assert r["boot_lo_e6"] == lo and r["boot_hi_e6"] == hi
        assert r["reps_valid"] == len(reps)
        # the interval brackets the point estimate
        assert r["boot_lo_e6"] <= r["mean_e6"] <= r["boot_hi_e6"]


def test_poisson_bootstrap_single_scan_no_explode(spark):
    """X116 keeps replicates in aggregate columns: one parquet scan,
    no Generate (explode) node anywhere in the plan."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    plan = (
        QUERIES["source_mean_bootstrap_ci"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Generate" not in plan


def test_heaps_law_fit_python_reference(spark):
    """X117 equals an independent pure-Python pipeline (tokenize,
    shingle, bucket, scaled-ln least squares) on a small corpus."""
    import math
    import re

    from poet_cloud_cost_etl_spark.operators.textstats import heaps_law_fit

    texts = {
        i: " ".join(
            f"w{(i * 31 + j * 7) % (10 + 3 * i)}" for j in range(30)
        )
        for i in range(20)
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = heaps_law_fit(df, "doc_id", "text", n_buckets=5).collect()[0]

    def sh(t):
        toks = re.sub(r"[^a-z0-9 ]", "", t.lower()).strip().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()

    lo, hi = 0, 19
    occ, first = {}, {}
    for i, t in texts.items():
        b = ((i - lo) * 5) // (hi - lo + 1)
        s = sh(t)
        occ[b] = occ.get(b, 0) + len(s)
        for g in s:
            if g not in first or i < first[g]:
                first[g] = i
    newv = {}
    for g, i in first.items():
        b = ((i - lo) * 5) // (hi - lo + 1)
        newv[b] = newv.get(b, 0) + 1
    pts, cn, cv = [], 0, 0
    for b in sorted(occ):
        cn += occ[b]
        cv += newv.get(b, 0)
        if cn > 0 and cv > 0:
            pts.append(
                (round(math.log(cn) * 1e6), round(math.log(cv) * 1e6))
            )
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num, den = m * sxy - sx * sy, m * sxx - sx * sx
    assert got["m_points"] == m and got["n_units"] == cn
    assert got["vocab"] == cv
    assert got["beta_e6"] == round(1000000 * num / den)
    assert got["lnk_e6"] == round((sy - num / den * sx) / m)
    # a Heaps exponent is in (0, 1] on any organic corpus
    assert 0 < got["beta_e6"] <= 1000000


def test_heaps_law_fit_saturated_corpus(spark):
    """X117: a corpus whose vocabulary is exhausted in bucket 0
    (every doc identical) fits beta = 0 with r2 NULL (zero
    y-variance is degenerate only in r2's denominator guard... the
    y-variance IS zero, so r2 is NULL and beta is exactly 0)."""
    from poet_cloud_cost_etl_spark.operators.textstats import heaps_law_fit

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in range(12)],
        ["doc_id", "text"],
    )
    r = heaps_law_fit(df, "doc_id", "text", n_buckets=4).collect()[0]
    assert r["vocab"] == 3  # three 3-gram shingles, fixed vocabulary
    assert r["beta_e6"] == 0
    assert r["r2_e6"] is None


def test_heaps_law_fit_bounded_windows(spark):
    """X117's windows and fit run on bucket-bounded rows: the only
    corpus-sized work is the two shingle aggregates (plan has no
    window over an unbounded partition before aggregation)."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    plan = (
        QUERIES["heaps_law_fit"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # two corpus scans (occurrence counts + first-occurrence minima
    # branch from the exploded source) and two column-pruned
    # doc_id-only scans for the broadcast id-range row
    assert plan.count("Scan parquet") <= 4


def test_mann_whitney_u_python_reference(spark):
    """X118 equals a pure-Python tie-corrected Mann-Whitney on a
    mixed fixture (exact integers; z checked at e6)."""
    import math

    from poet_cloud_cost_etl_spark.operators.aggregates import mann_whitney_u

    a = [5, 7, 7, 9, 12, 12, 12, 20]
    b = [4, 5, 7, 8, 8, 10]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]

    allv = sorted(a + b)
    # doubled average rank per value
    d2 = {}
    for v in set(allv):
        less = sum(1 for x in allv if x < v)
        t = allv.count(v)
        d2[v] = 2 * less + t + 1
    r2a = sum(d2[v] for v in a)
    na, nb, n = len(a), len(b), len(a) + len(b)
    u2a = r2a - na * (na + 1)
    ties3 = sum(
        allv.count(v) ** 3 - allv.count(v) for v in set(allv)
    )
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["u2_a"] == u2a and r["u2_b"] == 2 * na * nb - u2a
    assert r["auc_ppm"] == (1000000 * u2a) // (2 * na * nb)
    var = na * nb * ((n + 1) * n * (n - 1) - ties3) / (12 * n * (n - 1))
    z = (u2a - na * nb) / (2 * math.sqrt(var))
    assert abs(r["z_e6"] - round(1e6 * z)) <= 1


def test_mann_whitney_u_identical_distributions(spark):
    """X118: the same values in both groups -> AUC exactly 500000
    ppm and z exactly 0."""
    from poet_cloud_cost_etl_spark.operators.aggregates import mann_whitney_u

    vals = [3, 5, 5, 8, 13]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["auc_ppm"] == 500000 and r["z_e6"] == 0


def test_mann_whitney_u_complete_separation(spark):
    """X118: every a above every b -> U2_b = 0, AUC = 1e6 ppm."""
    from poet_cloud_cost_etl_spark.operators.aggregates import mann_whitney_u

    rows = [("a", v) for v in (10, 11, 12)] + [("b", v) for v in (1, 2)]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["u2_b"] == 0 and r["auc_ppm"] == 1000000


def test_mann_whitney_u_all_tied_degenerate(spark):
    """X118: every value identical -> zero variance -> z NULL, AUC
    exactly 500000 (pure ties)."""
    from poet_cloud_cost_etl_spark.operators.aggregates import mann_whitney_u

    rows = [("a", 7), ("a", 7), ("b", 7), ("b", 7), ("b", 7)]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    assert r["z_e6"] is None and r["auc_ppm"] == 500000


def test_ks_two_sample_python_reference(spark):
    """X119 equals a pure-Python exact KS on a mixed fixture."""
    import math

    from poet_cloud_cost_etl_spark.operators.aggregates import ks_two_sample

    a = [1, 3, 3, 5, 9, 14, 14]
    b = [2, 3, 6, 6, 10]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]

    na, nb = len(a), len(b)
    lattice = sorted(set(a + b))
    best, at, sign = -1, None, 0
    for v in lattice:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        diff = ca * nb - cb * na
        if abs(diff) > best:
            best, at, sign = abs(diff), v, (diff > 0) - (diff < 0)
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["d_num"] == best and r["d_at_value"] == at
    assert r["d_sign"] == sign
    assert r["d_ppm"] == (1000000 * best) // (na * nb)
    lam = 1e6 * best / (na * nb) * math.sqrt(na * nb / (na + nb))
    assert abs(r["lambda_e6"] - round(lam)) <= 1


def test_ks_two_sample_identical_and_disjoint(spark):
    """X119: identical samples -> D = 0 (sign 0 at the smallest
    value); disjoint supports -> d_ppm = 1e6 exactly."""
    from poet_cloud_cost_etl_spark.operators.aggregates import ks_two_sample

    same = [("a", v) for v in (2, 4, 6)] + [("b", v) for v in (2, 4, 6)]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(same)], ["g", "v", "i"]
    )
    r = ks_two_sample(df, "g", "v", "a", "b").collect()[0]
    assert r["d_num"] == 0 and r["d_at_value"] == 2 and r["d_sign"] == 0

    dis = [("a", v) for v in (1, 2)] + [("b", v) for v in (8, 9, 10)]
    df2 = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(dis)], ["g", "v", "i"]
    )
    r2 = ks_two_sample(df2, "g", "v", "a", "b").collect()[0]
    assert r2["d_ppm"] == 1000000 and r2["d_at_value"] == 2
    assert r2["d_sign"] == 1


def test_wav_header_info_stdlib_wave_reference(spark):
    """X121 parses a REAL WAV produced by Python's stdlib wave
    module (independent byte-layout implementation)."""
    import io
    import wave

    from poet_cloud_cost_etl_spark.operators.multimodal import wav_header_info

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)  # 16-bit
        w.setframerate(44100)
        w.writeframes(b"\x00\x01\x02\x03" * 441)  # 441 frames
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"not a wav at all......."))],
        "id LONG, payload BINARY",
    )
    out = {r["id"]: r for r in wav_header_info(df, "id", "payload").collect()}
    r = out[1]
    assert r["is_wav"] and r["is_canonical_wav"]
    assert r["channels"] == 2
    assert r["sample_rate_hz"] == 44100
    assert r["bits_per_sample"] == 16
    assert r["n_frames"] == 441
    assert r["duration_ms"] == (8000 * 441 * 4) // (44100 * 2 * 16)
    r2 = out[2]
    assert not r2["is_wav"] and r2["channels"] is None


def test_wav_header_info_rejects_extended_fmt(spark):
    """X121: a WAVE whose fmt chunk is not the canonical 16-byte PCM
    layout is flagged is_wav but NOT canonical (params NULL, never
    misread)."""
    import struct

    from poet_cloud_cost_etl_spark.operators.multimodal import wav_header_info

    # fmt size 18 (extended) shifts 'data'; parser must refuse
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8) + b"\x00\x00"
    payload = (
        b"RIFF" + struct.pack("<I", 40 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    df = spark.createDataFrame([(1, bytearray(payload))], "id LONG, payload BINARY")
    r = wav_header_info(df, "id", "payload").collect()[0]
    assert r["is_wav"] and not r["is_canonical_wav"]
    assert r["sample_rate_hz"] is None


def test_wav_header_info_zero_shuffle(spark):
    """X121 is one narrow projection: no Exchange before the (query-
    level) orderBy; the operator itself plans shuffle-free."""
    from poet_cloud_cost_etl_spark.catalog import table
    from poet_cloud_cost_etl_spark.operators.multimodal import wav_header_info

    d = table(spark, "/root/testdata/sf0.001", "documents").selectExpr(
        "doc_id", "CAST(text AS BINARY) AS payload"
    )
    plan = (
        wav_header_info(d, "doc_id", "payload")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_merge_spans_semantics(spark):
    """X122: overlap, adjacency-within-gap, distinct islands,
    inverted-span drop, containment."""
    from poet_cloud_cost_etl_spark.operators.scrub import merge_spans

    df = spark.createDataFrame(
        [
            # doc 1: [0,5) + [3,9) overlap; [11,14) within gap 2 of 9;
            # [20,25) separate island; [21,22) contained
            (1, 0, 5), (1, 3, 9), (1, 11, 14), (1, 20, 25), (1, 21, 22),
            # doc 2: inverted span dropped entirely
            (2, 7, 7), (2, 1, 4),
        ],
        ["doc", "s", "e"],
    )
    out = [
        (r["id"], r["span_start"], r["span_end"], r["n_merged"])
        for r in merge_spans(df, "doc", "s", "e", gap=2).collect()
    ]
    assert out == [(1, 0, 14, 3), (1, 20, 25, 2), (2, 1, 4, 1)]


def test_merge_spans_gap_zero_touching(spark):
    """X122: with gap 0, [0,5) and [5,8) merge (half-open adjacency)
    but [0,5) and [6,8) do not."""
    from poet_cloud_cost_etl_spark.operators.scrub import merge_spans

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 5, 8), (2, 0, 5), (2, 6, 8)], ["doc", "s", "e"]
    )
    out = {
        (r["id"], r["span_start"]): r["span_end"]
        for r in merge_spans(df, "doc", "s", "e", gap=0).collect()
    }
    assert out == {(1, 0): 8, (2, 0): 5, (2, 6): 8}


def test_merge_spans_one_exchange(spark):
    """X122's two windows + interval aggregate share the doc-key
    partitioning: exactly one hash Exchange before the display sort."""
    from poet_cloud_cost_etl_spark.operators.scrub import merge_spans

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 3, 9)], ["doc", "s", "e"]
    )
    plan = (
        merge_spans(df, "doc", "s", "e")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_mmr_select_python_reference(spark):
    """X120 equals a pure-Python greedy MMR (round-6 cosine, e6
    integers, x10 score, id tie-break) on a deterministic set."""
    import math

    from poet_cloud_cost_etl_spark.operators.similarity import mmr_select

    vecs = {
        i: [math.sin(i * 3 + d) for d in range(8)] for i in range(1, 13)
    }
    probe = [math.sin(d) for d in range(8)]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return round(round(num / (da * db), 6) * 1e6)

    df = spark.createDataFrame(
        [(i, v, probe) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>, __probe ARRAY<DOUBLE>",
    )
    got = [
        (r["rank"], r["id"], r["score_x10_e6"])
        for r in mmr_select(
            df, "vec_id", "embedding", "__probe", k=4, shortlist=8
        ).collect()
    ]

    rel = {i: cos(v, probe) for i, v in vecs.items()}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:8]
    maxsim = {i: None for i in cand}
    exp = []
    for rank in range(1, 5):
        def sc(i):
            return (
                10 * rel[i]
                if maxsim[i] is None
                else 7 * rel[i] - 3 * maxsim[i]
            )
        pick = min((i for i in maxsim), key=lambda i: (-sc(i), i))
        exp.append((rank, pick, sc(pick)))
        del maxsim[pick]
        for i in maxsim:
            s = cos(vecs[i], vecs[pick])
            maxsim[i] = s if maxsim[i] is None else max(maxsim[i], s)
    assert got == exp


def test_mmr_select_breaks_up_duplicate_cluster(spark):
    """X120: three exact copies of the most relevant vector — pure
    top-3 would return all three; MMR's diversity penalty (sim =
    1e6 to a selected copy) must pick the orthogonal vector second."""
    from poet_cloud_cost_etl_spark.operators.similarity import mmr_select

    best = [1.0, 0.0, 0.0, 0.0]
    orth = [0.0, 1.0, 0.0, 0.1]
    rows = [(1, best), (2, best), (3, best), (4, orth)]
    df = spark.createDataFrame(
        [(i, v, [1.0, 0.05, 0.0, 0.0]) for i, v in rows],
        "vec_id LONG, embedding ARRAY<DOUBLE>, __probe ARRAY<DOUBLE>",
    )
    got = [
        r["id"]
        for r in mmr_select(
            df, "vec_id", "embedding", "__probe", k=2, shortlist=4,
            lambda_x10=3,
        ).collect()
    ]
    assert got == [1, 4]


def test_mmr_select_shortlist_take_ordered(spark):
    """X120's distributed phase: the relevance shortlist compiles to
    TakeOrderedAndProject (each partition forwards only its top-C
    rows — the O3 discipline), and the checkpointed unroll keeps
    the plan linear: no Window node anywhere."""
    from poet_cloud_cost_etl_spark.queries import QUERIES

    plan = (
        QUERIES["embedding_mmr_select"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_conformal_threshold_python_reference(spark):
    """X123 equals the textbook split-conformal quantile on a known
    calibration set (n=9, alpha=0.1 -> rank ceil(10*0.9)=9 -> the
    9th smallest = max; n=4 -> rank ceil(4.5)=5 > 4 -> NULL)."""
    from poet_cloud_cost_etl_spark.operators.aggregates import conformal_threshold

    a = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0]
    b = [1.0, 2.0, 3.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    out = {
        r["grp"]: r
        for r in conformal_threshold(df, "g", "v", alpha_ppm=100000).collect()
    }
    ra = out["a"]
    assert ra["n"] == 9 and ra["rank_needed"] == 9
    assert ra["q_hat"] == 9.0 and ra["achieved_ppm"] == 1000000
    rb = out["b"]
    assert rb["n"] == 4 and rb["rank_needed"] == 5
    assert rb["q_hat"] is None and rb["achieved_ppm"] is None


def test_conformal_threshold_tie_landing(spark):
    """X123: duplicated scores — the rank lands inside a tie run and
    q_hat is that value with the FULL run counted in coverage."""
    from poet_cloud_cost_etl_spark.operators.aggregates import conformal_threshold

    # n=19, alpha=0.2 -> rank ceil(20*0.8)=16; values: 10 ones then
    # 9 twos -> cum(1)=10 < 16, cum(2)=19 >= 16 -> q_hat=2,
    # achieved = 19/19 = 1e6
    rows = [("g", 1.0)] * 10 + [("g", 2.0)] * 9
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], ["g", "v", "i"]
    )
    r = conformal_threshold(df, "g", "v", alpha_ppm=200000).collect()[0]
    assert r["rank_needed"] == 16 and r["q_hat"] == 2.0
    assert r["achieved_ppm"] == 1000000


def test_modularity_python_reference(spark):
    """X124 equals the textbook Q on a hand-built two-community
    graph (two triangles + one bridge edge)."""
    from poet_cloud_cost_etl_spark.operators.graph import modularity

    edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    clusters = [(i, 1) for i in (1, 2, 3)] + [(i, 2) for i in (4, 5, 6)]
    e = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    c = spark.createDataFrame(clusters, ["doc_id", "cluster_id"])
    r = modularity(c, e).collect()[0]

    m = len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    lab = dict(clusters)
    ec = {}
    dc = {}
    for a, b in edges:
        if lab[a] == lab[b]:
            ec[lab[a]] = ec.get(lab[a], 0) + 1
    for i, d in deg.items():
        dc[lab[i]] = dc.get(lab[i], 0) + d
    obs = (1000000 * sum(ec.values())) // m
    exp = (1000000 * sum(v * v for v in dc.values())) // (4 * m * m)
    assert r["n_edges"] == m and r["n_clusters"] == 2
    assert r["obs_within_ppm"] == obs
    assert r["exp_within_ppm"] == exp
    assert r["modularity_ppm"] == obs - exp
    # textbook check: Q = 6/7 - (7^2 + 7^2)/(4*49) = 0.357142...
    assert abs(r["modularity_ppm"] - 357143) <= 2


def test_modularity_single_hairball_is_zero(spark):
    """X124: everything in ONE cluster -> obs = 1e6 and exp = 1e6
    (all degree mass in one term), so Q = 0 — the 'partition
    explains nothing' reading."""
    from poet_cloud_cost_etl_spark.operators.graph import modularity

    edges = [(1, 2), (2, 3), (3, 4)]
    clusters = [(i, 1) for i in (1, 2, 3, 4)]
    e = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    c = spark.createDataFrame(clusters, ["doc_id", "cluster_id"])
    r = modularity(c, e).collect()[0]
    assert r["obs_within_ppm"] == 1000000
    assert r["exp_within_ppm"] == 1000000
    assert r["modularity_ppm"] == 0
