"""Real byte-level BPE token counting (functions/bpe.py) and its
Spark plumbing (token_counts(tokenizer="bpe"),
pack_token_shards(counter="bpe")).

The committed fixture models/bpe_merges_512.txt is trained on the
driver's sf0.001 documents corpus by scripts/make_bpe_fixture.py; the
equivalence oracle here is an INDEPENDENT BPE formulation (sequential
rank-order merge application, the fast-tokenizer style) vs the
production lowest-rank-first loop — equal on any well-formed trained
merge table.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from edgar_finance_ontology_spark.functions.bpe import (
    DEFAULT_MERGES, PRETOKEN_RE, count_tokens, encode, load_merges,
    merge_word, train_merges,
)

SF0001 = "/root/testdata/sf0.001"


def rank_order_encode(word: bytes, merges_list) -> list[bytes]:
    """Independent oracle: apply every merge once, in rank order,
    left-to-right — instead of repeatedly scanning for the globally
    lowest-rank adjacent pair. The two formulations agree on trained
    tables (a merge consuming token T always ranks after the merge
    that creates T, so lower-rank pairs are never created by applying
    higher-rank merges)."""
    parts = [word[i:i + 1] for i in range(len(word))]
    for a, b in merges_list:
        out: list[bytes] = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


@pytest.fixture(scope="module")
def corpus():
    return pq.read_table(
        f"{SF0001}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()


@pytest.fixture(scope="module")
def ranks():
    return load_merges(DEFAULT_MERGES)


def test_fixture_reproducible(corpus, ranks):
    """Re-training on the same deterministic corpus reproduces the
    committed merge table bit-for-bit."""
    again = train_merges(corpus, n_merges=512)
    assert again == list(ranks.keys())


def test_pieces_roundtrip_and_bounds(corpus):
    for text in corpus[:50]:
        pretokens = [m.group(0) for m in PRETOKEN_RE.finditer(text)]
        pieces = encode(text)
        # lossless within pretokens
        assert b"".join(pieces) == "".join(pretokens).encode("utf-8")
        # piece count bounded: >= one piece per pretoken, <= raw bytes
        n = count_tokens(text)
        assert n == len(pieces)
        assert len(pretokens) <= n <= sum(
            len(p.encode("utf-8")) for p in pretokens
        )


def test_merges_actually_fire(corpus):
    """On its own training corpus the table must compress: real BPE
    count strictly below the byte count and (for this corpus) below
    the pretoken-piece ceiling would be vacuous — check aggregate
    compression vs the no-merge (per-byte) segmentation."""
    total_bpe = sum(count_tokens(t) for t in corpus[:100])
    total_bytes = sum(
        len(m.group(0).encode("utf-8"))
        for t in corpus[:100] for m in PRETOKEN_RE.finditer(t)
    )
    assert total_bpe < 0.6 * total_bytes


@settings(max_examples=300, deadline=None)
@given(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=122),
    min_size=0, max_size=40,
))
def test_min_rank_loop_equals_rank_order(ranks, s):
    merges_list = list(ranks.keys())
    for m in PRETOKEN_RE.finditer(s):
        w = m.group(0).encode("utf-8")
        assert merge_word(w, ranks) == rank_order_encode(w, merges_list)


def test_unknown_tokenizer_rejected(spark):
    from edgar_finance_ontology_spark.operators.textops import token_counts

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        token_counts(df, tokenizer="nope")
    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards,
    )
    with pytest.raises(ValueError):
        pack_token_shards(df, 10, counter="nope")


def test_token_counts_bpe_matches_driver(spark):
    """Spark mapInPandas path == pure-driver counting, row for row."""
    from edgar_finance_ontology_spark.operators.textops import token_counts

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(40)
    got = {
        r["id"]: (r["ws_tokens"], r["bpe_tokens"])
        for r in token_counts(docs, tokenizer="bpe").collect()
    }
    for row in docs.select("doc_id", "text").collect():
        want_bpe = count_tokens(row["text"])
        assert got[row["doc_id"]][1] == want_bpe
    # proxy and bpe share a schema (interchangeable downstream)
    proxy = token_counts(docs)
    assert [f.name for f in proxy.schema.fields] == [
        f.name for f in token_counts(docs, tokenizer="bpe").schema.fields
    ]


def test_pack_token_shards_bpe_budget(spark):
    """counter="bpe" packs against real piece counts: cumulative
    budget arithmetic holds and n_tokens per doc equals the driver
    count."""
    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(60)
    rows = sorted(
        pack_token_shards(docs, shard_tokens=500, counter="bpe").collect(),
        key=lambda r: r["id"],
    )
    driver = {
        r["doc_id"]: count_tokens(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    run = 0
    for r in rows:
        assert r["n_tokens"] == driver[r["id"]]
        run += r["n_tokens"]
        assert r["cum_tokens"] == run
        assert r["shard_id"] == (run - 1) // 500


def test_distributed_trainer_matches_committed_fixture(spark):
    """Vocabulary induction as a Spark job reproduces the committed
    in-memory-trained merge table bit-for-bit (first 16 merges on the
    same sf0.001 corpus), independent of physical partitioning."""
    from edgar_finance_ontology_spark.functions.bpe import (
        DEFAULT_MERGES, load_merges, train_merges_distributed,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = [p for p, i in sorted(
        load_merges(DEFAULT_MERGES).items(), key=lambda kv: kv[1])][:16]
    assert train_merges_distributed(df, n_merges=16) == want
    # the argmax/tie-break/fuse chain is partition-independent
    assert train_merges_distributed(
        df.repartition(7), n_merges=16) == want
