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
