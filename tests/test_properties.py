"""Property-based tests (hypothesis): invariants that must hold for
ALL inputs, not just the corpus — codec roundtrips mirror the
reference's serde contract (`/root/reference/pubsub_pipeline.py:27-28,
55-57`: encode(decode(x)) == x for JSON payloads), and skew salting
must be a pure distribution change at every salt count.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.operators.skew import salted_agg, salted_join
from py_pubsub_pipeline_spark.pipeline import byte_encode_json, byte_load_json

# JSON value lattice, nested (the reference's test corpus nests objects).
json_vals = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=40),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=10), children, max_size=4),
    max_leaves=12,
)


@given(json_vals)
@settings(max_examples=200, deadline=None)
def test_json_codec_roundtrip(payload):
    assert byte_load_json(byte_encode_json(payload)) == payload


rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # skewed key: 4 values
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=0, max_value=10**6),  # row discriminator
    ),
    min_size=1,
    max_size=40,
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(data=rows, n_salts=st.integers(min_value=1, max_value=5))
@settings(max_examples=15, deadline=None)
def test_salted_agg_equals_plain_agg(sp, data, n_salts):
    df = sp.createDataFrame(data, "k int, v long, rid long")
    plain = {
        (r.k, r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k, r.n, r.s)
        for r in salted_agg(
            df,
            keys=["k"],
            aggs=[F.count("*").alias("pn"), F.sum("v").alias("ps")],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            n_salts=n_salts,
        ).collect()
    }
    assert salted == plain


@given(data=rows, n_salts=st.integers(min_value=1, max_value=5))
@settings(max_examples=15, deadline=None)
def test_salted_join_equals_plain_join(sp, data, n_salts):
    big = sp.createDataFrame(data, "k int, v long, rid long")
    dim = sp.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "dk int, tag string")
    plain = {
        (r.k, r.v, r.rid, r.tag)
        for r in big.join(dim, big.k == dim.dk).select("k", "v", "rid", "tag").collect()
    }
    salted = {
        (r.k, r.v, r.rid, r.tag)
        for r in salted_join(big, dim, "k", "dk", n_salts=n_salts, salt_from=["rid"])
        .select("k", "v", "rid", "tag")
        .collect()
    }
    assert salted == plain


def test_df_cap_defuses_boilerplate_blowup(spark, tmp_path):
    """Adversarial corpus: DF_CAP+10 docs share one boilerplate sentence but
    have unique content. Uncapped ngram Jaccard must pair-join every
    boilerplate co-occurrence; the capped variant (df > DF_CAP
    shingles dropped) both (a) produces no spurious near-dup pairs —
    boilerplate-only overlap is not similarity — and (b) still finds
    the one genuinely duplicated document pair."""
    import os

    from py_pubsub_pipeline_spark.queries.dedup import (
        DF_CAP,
        dedup_ngram_capped,
        dedup_ngram_jaccard,
    )

    n_docs = DF_CAP + 10  # boilerplate df must exceed the cap
    boiler = "all rights reserved contact us for terms of service apply"
    docs = [
        (i, f"{boiler} unique content {i} alpha{i} beta{i} gamma{i} "
            f"delta{i} epsilon{i} zeta{i}")
        for i in range(n_docs)
    ]
    docs.append((100, docs[7][1]))  # a true duplicate of doc 7
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(sf, "documents.parquet")
    )

    capped = {(r.a_id, r.b_id) for r in dedup_ngram_capped(spark, sf).collect()}
    assert capped == {(7, 100)}, capped

    uncapped = {
        (r.a_id, r.b_id) for r in dedup_ngram_jaccard(spark, sf).collect()
    }
    assert (7, 100) in uncapped


# ------------------------------------------------------------- y4m

frames_strat = st.tuples(
    st.integers(min_value=1, max_value=4),   # width
    st.integers(min_value=1, max_value=4),   # height
    st.integers(min_value=1, max_value=6),   # n_frames
    st.integers(min_value=1, max_value=3),   # sample every
    st.randoms(use_true_random=False),
)


@given(frames_strat)
@settings(max_examples=100, deadline=None)
def test_y4m_decode_recovers_synthesis_for_all_geometries(args):
    from py_pubsub_pipeline_spark.multimodal import (
        decode_y4m_sample,
        encode_y4m,
    )

    w, h, n, every, rng = args
    fsize = 3 * w * h
    frames = [
        bytes(rng.randrange(256) for _ in range(fsize)) for _ in range(n)
    ]
    exp_sampled = [f for i, f in enumerate(frames) if i % every == 0]
    got = decode_y4m_sample(encode_y4m(w, h, frames), every=every)
    assert got == (
        w, h, n, len(exp_sampled), sum(sum(f) for f in exp_sampled),
    )


# --------------------------------------------- sketch invariants

token_lists = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=1, max_size=6,
    ),
    min_size=1, max_size=60,
)


@given(token_lists)
@settings(max_examples=50, deadline=None)
def test_countmin_never_underestimates(tokens):
    # The CMS guarantee the oracle's exact-regime equality rests on:
    # est = min over rows of the counter is >= the true count for
    # EVERY key, at any width/collision level. Pure-Python mirror of
    # the query's md5 arithmetic (width shrunk to force collisions).
    import hashlib
    from collections import Counter

    depth, width = 4, 8  # deliberately tiny -> collisions guaranteed
    grid = [Counter() for _ in range(depth)]

    def pos(r, tok):
        h = hashlib.md5(f"{r}{tok}".encode()).hexdigest()[:8]
        return int(h, 16) % width

    for t in tokens:
        for r in range(depth):
            grid[r][pos(r, t)] += 1
    true = Counter(tokens)
    for t, c in true.items():
        est = min(grid[r][pos(r, t)] for r in range(depth))
        assert est >= c


key_sets = st.tuples(
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=1,
            max_size=50),
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
             max_size=50),
)


@given(key_sets)
@settings(max_examples=50, deadline=None)
def test_bloom_has_no_false_negatives(args):
    # join_bloom_prefilter's correctness rests on this: a key folded
    # into the bitmap ALWAYS tests positive (false positives are fine
    # — the exact semi join removes them). Pure-Python mirror of the
    # query's two-hash md5 arithmetic at a tiny width.
    import hashlib

    build, probe = args
    bits_n = 256

    def positions(k):
        out = []
        for salt in ("b0", "b1"):
            h = hashlib.md5(f"{salt}{k}".encode()).hexdigest()[:8]
            out.append(int(h, 16) % bits_n)
        return out

    bitmap = 0
    for k in build:
        for p in positions(k):
            bitmap |= 1 << p
    for k in build:
        assert all((bitmap >> p) & 1 for p in positions(k))
    for k in probe:
        if k in build:
            assert all((bitmap >> p) & 1 for p in positions(k))


# --------------------------------------------------------- psi

half_counts = st.tuples(
    st.lists(st.integers(min_value=0, max_value=100), min_size=10,
             max_size=10),
    st.lists(st.integers(min_value=0, max_value=100), min_size=10,
             max_size=10),
)


def _psi(ref, cur):
    import math

    tr, tc = sum(ref), sum(cur)
    out = 0.0
    for r, c in zip(ref, cur):
        pr = (r + 1.0) / (tr + 10)
        pc = (c + 1.0) / (tc + 10)
        out += (pc - pr) * math.log(pc / pr)
    return out


@given(half_counts)
@settings(max_examples=100, deadline=None)
def test_psi_is_nonnegative_and_zero_iff_identical(args):
    # The invariants dq_drift_psi's alerting semantics rest on:
    # each term (pc-pr)*ln(pc/pr) has matching signs -> PSI >= 0,
    # with equality exactly when the smoothed distributions agree.
    ref, cur = args
    psi = _psi(ref, cur)
    assert psi >= -1e-12
    assert abs(_psi(ref, ref)) < 1e-12
    # symmetry of the smoothed form
    assert abs(psi - _psi(cur, ref)) < 1e-9


# --- CUSUM prefix identity (ts_cusum) ------------------------------------
# The engine computes Page's recursion S_t = max(0, S_{t-1} + d_t) as
# S_t = P_t - min(0, min_{s<=t} P_s) with P the prefix sum of d — two
# window passes instead of a sequential fold. The identity must hold
# for EVERY deviation sequence, not just the corpus.


@given(st.lists(st.integers(min_value=-50, max_value=50), min_size=1,
                max_size=200))
@settings(max_examples=300, deadline=None)
def test_cusum_prefix_identity_matches_sequential_recursion(devs):
    s, seq = 0, []
    for d in devs:
        s = max(0, s + d)
        seq.append(s)
    p, running_min, pre = 0, 0, []
    for d in devs:
        p += d
        pre.append(p - min(0, running_min := min(running_min, p)))
    assert pre == seq


# --- Luhn checksum (fn_luhn_checksum) ------------------------------------
# The digit-fold must agree with the reference algorithm for every
# numeric string, and appending the correct check digit must validate.


def _luhn_sum(pan: str) -> int:
    total = 0
    for i, ch in enumerate(pan):  # i is 0-based from the LEFT
        d = int(ch)
        if (len(pan) - i) % 2 == 0:  # even position from the right
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total


@given(st.integers(min_value=0, max_value=10**15 - 1))
@settings(max_examples=300, deadline=None)
def test_luhn_check_digit_construction_validates(body):
    pan15 = f"{body:015d}"
    # check digit for a 16-digit PAN whose first 15 digits are pan15:
    # doubling pattern of the 16-digit layout applies to the body.
    partial = _luhn_sum(pan15 + "0")
    check = (10 - partial % 10) % 10
    assert _luhn_sum(pan15 + str(check)) % 10 == 0
    # and any OTHER final digit must fail
    for wrong in range(10):
        if wrong != check:
            assert _luhn_sum(pan15 + str(wrong)) % 10 != 0


# --- water-filling allocation invariants (round 8) -----------------------

domains_strat = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),   # tok
        st.integers(min_value=1, max_value=4),       # cap epochs
    ),
    min_size=1,
    max_size=8,
)


@given(doms=domains_strat, budget_mult_milli=st.integers(500, 4000))
@settings(max_examples=15, deadline=None)
def test_water_fill_invariants_on_random_domains(sp, doms, budget_mult_milli):
    """Implementation-independent KKT-style checks of the exact
    integer sweep, for arbitrary domains (the oracle only checks the
    corpus's): feasibility, cap compliance, a common level across
    unsaturated domains, and near-exhaustion of the budget whenever
    any domain is unsaturated."""
    import math

    from pyspark.sql import functions as F  # noqa: F811

    from py_pubsub_pipeline_spark.queries.rag import water_fill

    rows = [
        (f"s{i}", tok, cap_e * tok,
         math.floor(math.sqrt(float(tok)) * 1e6 + 0.5))
        for i, (tok, cap_e) in enumerate(doms)
    ]
    w = sp.createDataFrame(rows, "source string, tok long, cap long, wq long")
    budget = sum(t for _, t, _, _ in rows) * budget_mult_milli // 1000
    tt = sp.createDataFrame([(budget,)], "budget long")
    out = {r["source"]: r for r in water_fill(w, tt).collect()}
    assert set(out) == {s for s, _, _, _ in rows}
    total = sum(r["alloc"] for r in out.values())
    assert total <= budget
    wq = {s: q for s, _, _, q in rows}
    unsat = [r for r in out.values() if r["alloc"] < r["cap"]]
    for r in out.values():
        assert 0 <= r["alloc"] <= r["cap"]
        assert r["epochs_milli"] == r["alloc"] * 1000 // r["tok"]
    if unsat:
        # every unsaturated domain sits at ONE level lambda (integer
        # milli): alloc = lambda * wq / 1e9 exactly for a shared lambda
        lams = {r["alloc"] * 10**9 // wq[r["source"]] for r in unsat}
        # integer floors can make the recovered lambda differ by the
        # quantization grain only
        assert max(lams) - min(lams) <= 10**9 // min(
            wq[r["source"]] for r in unsat
        ) + 1
        # the budget is exhausted up to the milli-lambda grain: one
        # more lambda step would overshoot
        slack = budget - total
        assert slack * 10**9 <= sum(wq[r["source"]] for r in unsat) * 10**6 \
            + 10**9 * len(out)


# --- greedy-MMR kernel invariants (round 8) -------------------------------

pools_strat = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),        # qid (2 queries max)
        st.integers(min_value=-10**6, max_value=10**6),  # rel
    ),
    min_size=2,
    max_size=12,
)


@given(pool_rows=pools_strat, sims=st.data())
@settings(max_examples=10, deadline=None)
def test_mmr_greedy_matches_reference_on_random_pools(sp, pool_rows, sims):
    """Replay the greedy argmax in python on arbitrary integer pools:
    the kernel must pick, at every step, the exact
    wrel*rel - wpen*max-sim argmax (cid tie-break) — for ALL inputs,
    not just cosine-derived corpus scores."""
    from py_pubsub_pipeline_spark.queries.rag import mmr_greedy

    K, WREL, WPEN = 3, 7, 3
    pool = {}
    for i, (qid, rel) in enumerate(pool_rows):
        pool[(qid, i)] = rel  # cid = index -> unique per qid
    prs = {}
    by_q: dict[int, list] = {}
    for (qid, cid) in pool:
        by_q.setdefault(qid, []).append(cid)
    for qid, cids in by_q.items():
        for a in cids:
            for b in cids:
                if a != b:
                    prs[(qid, a, b)] = sims.draw(
                        st.integers(min_value=-10**6, max_value=10**6)
                    )
    pool_df = sp.createDataFrame(
        [(q, c, r) for (q, c), r in pool.items()],
        "qid long, cid long, rel long",
    )
    pr_df = sp.createDataFrame(
        [(q, a, b, s) for (q, a, b), s in prs.items()],
        "qid long, a long, b long, sim long",
    )
    got: dict[tuple, tuple] = {}
    for r in mmr_greedy(pool_df, pr_df, k=K, wrel=WREL, wpen=WPEN).collect():
        got[(r["query_id"], r["mmr_rank"])] = (r["vec_id"], r["score"])
    for qid, cids in by_q.items():
        selected: list[int] = []
        for t in range(1, min(K, len(cids)) + 1):
            best = None
            for c in sorted(cids):
                if c in selected:
                    continue
                pen = max(
                    (prs[(qid, s, c)] for s in selected), default=0
                ) if selected else 0
                score = WREL * pool[(qid, c)] - (WPEN * pen if selected else 0)
                if best is None or score > best[1]:
                    best = (c, score)
            selected.append(best[0])
            assert got[(qid, t)] == best, (qid, t, got.get((qid, t)), best)


def test_bpe_apply_matches_textbook_python_bpe(spark):
    """ml_bpe_apply (round 14: the iterative form) must equal a
    pure-Python TEXTBOOK BPE trainer on the identical weighted vocab:
    per round, count adjacent symbol pairs weighted by word frequency,
    merge the (count DESC, left, right) argmax everywhere
    (leftmost-nonoverlapping), repeat — multi-character symbols
    compose.  Pins the round-14 contract that the registered key runs
    the REAL loop, not the retired single-count stand-in."""
    import re
    from collections import Counter

    from py_pubsub_pipeline_spark.queries.tokenizer import (
        _BPE_MERGES, _BPE_WORDS, _WORD_RE, ml_bpe_apply,
    )
    from py_pubsub_pipeline_spark.tables import table

    from conftest import SF_SMALL

    docs = table(spark, SF_SMALL, "documents").select("text").collect()
    freq: Counter = Counter()
    for r in docs:
        for t in r["text"].split(" "):
            if len(t) >= 2 and re.match(_WORD_RE, t):
                freq[t] += 1
    segs = {w: list(w) for w in freq}
    for _ in range(_BPE_MERGES):
        pc: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        (best_l, best_r), _n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best_l
                        and syms[i + 1] == best_r):
                    out.append(best_l + best_r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    top = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_BPE_WORDS]
    want = {w: (" ".join(segs[w]), len(segs[w])) for w, _f in top}

    got = {r["w"]: (r["tokens"], r["n_tokens"])
           for r in ml_bpe_apply(spark, SF_SMALL).collect()}
    assert got == want


def test_bpe_trainer_composes_multichar_symbols(spark):
    """On a vocabulary engineered so composition must fire (runs of
    'a' dominate), the factored trainer must learn a+a -> aa then
    aa+aa -> aaaa — pair counting over SYMBOLS of the current
    segmentation, not character bigrams of the raw word (the retired
    single-count scheme can never produce a merge whose sides are
    multi-character)."""
    from py_pubsub_pipeline_spark.queries.tokenizer import (
        _bpe_train_segment,
    )

    from collections import Counter

    vocab = [("aaaaaaaa", 100), ("aaaaab", 30), ("bcbc", 5)]
    segs_py = {w: list(w) for w, _f in vocab}
    freq = dict(vocab)
    merges = []
    for _ in range(3):
        pc: Counter = Counter()
        for w, syms in segs_py.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += freq[w]
        (bl, br), _n = min(pc.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((bl, br))
        for w, syms in segs_py.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == bl
                        and syms[i + 1] == br):
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs_py[w] = out
    # composition provably fired: a learned merge has multi-char sides
    assert any(len(l) > 1 and len(r) > 1 for l, r in merges), merges

    words = spark.createDataFrame(vocab, "w STRING, freq LONG")
    segs = {r["w"]: r["s"].strip().split("  ")
            for r in _bpe_train_segment(words, n_merges=3).collect()}
    assert segs == segs_py
