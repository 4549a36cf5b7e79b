"""Unit semantics for the round-2 training-data ops: repetition
scoring, cross-source decontamination, PII scrubbing."""

import pytest
from pyspark.sql import functions as F


def test_repetition_scores_semantics(spark):
    from edgar_finance_ontology_spark.operators.textops import (
        repetition_scores,
    )

    docs = [
        # "a b c d e" repeated 4x -> heavy 5-gram duplication
        ("rep", " ".join(["a b c d e"] * 4)),
        # all-distinct words -> zero duplication, top frac = 1/10
        ("uniq", "q w e r t y u i o p"),
        # one dominant token
        ("top", "x x x x x x x x y z"),
        ("short", "one two"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: r for r in repetition_scores(df).collect()}
    assert got["uniq"]["dup_ngram_frac"] == 0.0
    assert got["uniq"]["top_word_frac"] == 0.1
    # 20 words -> 16 5-grams, 5 distinct (period-5 cycle): 1 - 5/16
    assert got["rep"]["dup_ngram_frac"] == 0.6875
    assert got["top"]["top_word_frac"] == 0.8
    # doc shorter than the n-gram: metric undefined, not fabricated
    assert got["short"]["dup_ngram_frac"] is None
    assert got["short"]["n_words"] == 2


def test_cross_source_overlap_semantics(spark):
    from edgar_finance_ontology_spark.operators.textops import (
        cross_source_overlap,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [
        ("t1", shared + " extra tail words here", "test"),
        ("t2", "totally different held out content with many words", "test"),
        ("tr1", "prefix words " + shared, "train"),
        ("tr2", shared + " another continuation", "train"),
        ("tr3", "unrelated training document with its own words", "train"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string, source string")
    got = {r["test_id"]: r for r in
           cross_source_overlap(df, "test").collect()}
    # t1 shares the 8-gram with both tr1 and tr2; t2 is clean
    assert got["t1"]["n_train_matches"] == 2
    assert got["t1"]["max_shared_grams"] >= 1
    assert "t2" not in got


def test_pii_scrub_masks_and_preserves(spark):
    from edgar_finance_ontology_spark.operators.textops import pii_scrub

    docs = [
        ("a", "contact jane.doe+spam@example.co.uk for details"),
        ("b", "ssn 123-45-6789 and phone +1 415-555-0199 on file"),
        ("c", "server at 192.168.10.250 responded"),
        ("d", "no pii in this perfectly ordinary sentence"),
        # numeric tables / year lists MUST survive (filings are full of
        # adjacent numeric tokens a naive digit-run pattern destroys)
        ("e", "revenue 1000000 2000000 3000000 total 6000000"),
        ("f", "years 2020 2021 2022 2023 show steady growth"),
        ("g", "call (02) 123 4567 or 650-253-0000 anytime"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got["a"]["text_scrubbed"] == "contact <EMAIL> for details"
    assert "<SSN>" in got["b"]["text_scrubbed"]
    assert "<PHONE>" in got["b"]["text_scrubbed"]
    assert "123-45-6789" not in got["b"]["text_scrubbed"]
    assert got["c"]["text_scrubbed"] == "server at <IP> responded"
    assert got["d"]["text_scrubbed"] == got["d"]["text"]
    assert got["d"]["pii_removed_chars"] == 0
    assert got["a"]["pii_removed_chars"] > 0
    assert got["e"]["text_scrubbed"] == got["e"]["text"]
    assert got["f"]["text_scrubbed"] == got["f"]["text"]
    assert got["g"]["text_scrubbed"] == "call <PHONE> or <PHONE> anytime"


def test_pii_scrub_cards_ibans_addresses(spark):
    from edgar_finance_ontology_spark.operators.textops import pii_scrub

    docs = [
        ("card", "pay with 4111-1111-1111-1111 today"),
        ("amex", "amex 3782-822463-10005 on record"),
        # hyphen-grouped card must be eaten WHOLE, not leak 4-4-4
        # fragments to <PHONE>
        ("leak", "num 5500-0000-0000-0004."),
        ("iban", "wire to GB29NWBK60161331926819 by friday"),
        ("addr1", "ship to 123 Main Street promptly"),
        ("addr2", "office at 1600 Pennsylvania Avenue today"),
        ("addr3", "hq moved to 45 Wall St recently"),
        # precision doctrine: year lists shaped like spaced card
        # groups, fiscal-year tokens shaped like spaced IBAN prefixes,
        # and bare digit runs all survive the scrubber
        ("years", "results 2020 2021 2022 2023 improved"),
        ("fy", "guidance FY24 2023 2024 reiterated"),
        ("bare", "order id 4111111111111111 logged"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert got["card"]["text_scrubbed"] == "pay with <CARD> today"
    assert got["amex"]["text_scrubbed"] == "amex <CARD> on record"
    assert got["leak"]["text_scrubbed"] == "num <CARD>."
    assert got["iban"]["text_scrubbed"] == "wire to <IBAN> by friday"
    assert got["addr1"]["text_scrubbed"] == "ship to <ADDR> promptly"
    assert got["addr2"]["text_scrubbed"] == "office at <ADDR> today"
    assert got["addr3"]["text_scrubbed"] == "hq moved to <ADDR> recently"
    for clean in ("years", "fy", "bare"):
        assert got[clean]["text_scrubbed"] == got[clean]["text"], clean


def test_pii_card_stats_luhn(spark):
    """The detector flags Luhn-valid 13-19-digit runs (separated or
    bare) without touching the text; invalid checksums and short runs
    are counted as candidates only / not at all."""
    from edgar_finance_ontology_spark.operators.textops import (
        pii_card_stats,
    )

    docs = [
        ("valid_bare", "card 4111111111111111 charged"),
        ("valid_sep", "card 4111 1111 1111 1111 charged"),
        ("invalid", "ref 4111111111111112 logged"),
        ("short", "code 123456789012 ok"),         # 12 digits: no cand
        ("none", "perfectly ordinary sentence"),
        ("amex", "amex 378282246310005 works"),     # 15-digit Luhn-valid
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: (r["card_candidates"], r["luhn_valid"])
           for r in pii_card_stats(df).collect()}
    assert got["valid_bare"] == (1, 1)
    assert got["valid_sep"] == (1, 1)
    assert got["invalid"] == (1, 0)
    assert got["short"] == (0, 0)
    assert got["none"] == (0, 0)
    assert got["amex"] == (1, 1)


def test_pii_card_stats_duckdb_twin(spark):
    """Spark column-native Luhn == the DuckDB list-lambda replay on the
    same rows (the 0-based vs 1-based transform-index trap is exactly
    what this pins)."""
    import duckdb
    import pandas as pd

    from edgar_finance_ontology_spark.operators.textops import (
        pii_card_stats,
    )
    from edgar_finance_ontology_spark.queries import SQL_PII_CARDS

    rows = [
        (1, "pay 4111-1111-1111-1111 and 378282246310005 now"),
        (2, "bad 1234567890123456 run"),
        (3, "nothing numeric"),
        (4, "edge 4111 1111 1111 1111 spaced"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ours = (
        pii_card_stats(df).groupBy().agg(
            F.count("*").alias("n_docs"),
            F.sum("card_candidates").cast("long").alias("total_candidates"),
            F.sum("luhn_valid").cast("long").alias("total_luhn_valid"),
        ).first()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    ref = con.execute(SQL_PII_CARDS).fetchone()
    assert (ours["n_docs"], ours["total_candidates"],
            ours["total_luhn_valid"]) == ref


def test_remove_boilerplate_lines(spark):
    """The C4-style line scrub: a banner shared by >= min_df docs
    vanishes everywhere, unique lines survive in order, blank lines
    are structural (kept, never counted toward boilerplate), and a
    doc made entirely of boilerplate collapses to empty text but
    keeps its row."""
    from edgar_finance_ontology_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    banner = "ACCEPT COOKIES TO CONTINUE"
    docs = [
        (1, f"{banner}\nunique first line\n\nunique second line"),
        (2, f"intro text\n{banner}\ntrailing thought"),
        (3, f"{banner}\nmore original content here"),
        (4, banner),                       # all-boilerplate doc
        (5, "totally original document"),  # untouched
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in
           remove_boilerplate_lines(df, min_df=3).collect()}
    assert got[1]["clean_text"] == "unique first line\n\nunique second line"
    assert got[2]["clean_text"] == "intro text\ntrailing thought"
    assert got[3]["clean_text"] == "more original content here"
    assert got[4]["clean_text"] == "" and got[4]["kept_lines"] == 0
    assert got[5]["clean_text"] == "totally original document"
    assert got[1]["total_lines"] == 4 and got[1]["kept_lines"] == 3
    # below the df bar nothing is removed
    loose = {r["id"]: r["clean_text"] for r in
             remove_boilerplate_lines(df, min_df=5).collect()}
    assert loose[1] == docs[0][1]


def test_boilerplate_shuffle_route_past_broadcast_cap(spark):
    """Boundedness guard (round-4 verdict watch item): when the
    boilerplate set exceeds broadcast_cap_rows it must route to a
    plain shuffled anti join — identical output, and the executed
    plan carries NO broadcast exchange on the anti-join leg."""
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.textops import (
        remove_boilerplate_lines,
    )

    # 300 distinct boilerplate lines, each shared by 6 docs, plus one
    # unique line per doc — a "large" boilerplate set relative to cap=0
    rows = []
    for b in range(300):
        for d in range(6):
            rows.append((b * 10 + d, f"SHARED BANNER {b}\nunique {b}-{d}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    want = sorted(map(tuple, remove_boilerplate_lines(
        df, min_df=5).collect()))
    # with the hint suppressed past the cap, whether to broadcast
    # becomes a RUNTIME size decision (AQE / autoBroadcastJoinThreshold)
    # — on the fixture's 300-row set AQE still converts, which is the
    # point of the guard; disable auto-broadcast to observe the
    # worst-case shuffle route the cap exists for
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuffled = remove_boilerplate_lines(
            df, min_df=5, broadcast_cap_rows=0)
        got = sorted(map(tuple, shuffled.collect()))
        assert got == want
        assert all(t[1].startswith("unique ") for t in got)
        # plan audit: no broadcast exchange on the anti-join leg
        plan = shuffled._jdf.queryExecution().executedPlan().toString()
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and all("Broadcast" not in ln for ln in anti)
        # the default (under-cap) route broadcasts even with the
        # threshold off — the explicit hint carries it
        bplan = remove_boilerplate_lines(df, min_df=5) \
            ._jdf.queryExecution().executedPlan().toString()
        banti = [ln for ln in bplan.splitlines() if "LeftAnti" in ln]
        assert banti and any("Broadcast" in ln for ln in banti)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_dedup_keep_best_picks_quality_representative(spark):
    """Within a near-dup cluster the longest/cleanest variant wins;
    tie on quantized quality falls to the lowest id; singletons are
    not reported (implicitly kept)."""
    from edgar_finance_ontology_spark.operators.canonicalize import (
        dedup_keep_best,
    )

    base = ("the quarterly report of the company shows revenue and "
            "profit growth across all segments of the business this year")
    docs = [
        (1, base + " with additional detail " * 20),  # long, clean -> best
        (2, base),                                    # near-dup, shorter
        (3, base + " x"),                             # near-dup
        (9, "a completely different standalone document about other "
            "topics entirely with its own words and phrasing"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = dedup_keep_best(df, threshold=0.2, max_df=None).collect()
    assert len(got) == 1
    r = got[0]
    assert r["cluster_id"] == 1 and r["n_members"] == 3
    assert r["kept_id"] == 1  # highest quality (len>=200 band)


def test_compression_ratio_ordering(spark):
    """The signal's contract: repeated boilerplate compresses far
    below prose, random hex soup compresses worst; empty text yields
    NULL ratio rather than a division blowup."""
    import random

    from edgar_finance_ontology_spark.operators.textops import (
        compression_ratios,
    )

    rng = random.Random(3)
    prose = ("the quarterly report shows revenue growth across the "
             "segments while operating costs remained stable overall ") * 5
    repeated = "na " * 250
    noise = " ".join(f"{rng.getrandbits(64):016x}" for _ in range(60))
    df = spark.createDataFrame(
        [(1, repeated), (2, prose), (3, noise), (4, "")],
        "doc_id long, text string")
    got = {r["id"]: r for r in compression_ratios(df).collect()}
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] \
        < got[3]["compression_ratio"]
    assert got[3]["compression_ratio"] > 0.5
    assert got[4]["compression_ratio"] is None
    assert got[2]["n_bytes"] == len(prose.encode())


def test_mix_to_token_budgets(spark):
    """Per-source keep-rates derive from token budgets; selection is
    the reproducible hash rule; unbudgeted sources obey default_rate."""
    from edgar_finance_ontology_spark.operators.textops import (
        mix_to_token_budgets,
    )

    docs = (
        [(i, "w " * 100, "en", "big", 0) for i in range(50)]       # 5000 tok
        + [(100 + i, "w " * 10, "en", "small", 0) for i in range(5)]  # 50
        + [(200 + i, "x", "en", "other", 0) for i in range(5)]
    )
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    kept = mix_to_token_budgets(
        df, {"big": 1000, "small": 10_000}, default_rate=0.0
    )
    rows = kept.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # small's budget exceeds its total -> rate 1.0, everything kept
    assert sorted(by_src["small"]) == [100 + i for i in range(5)]
    # unbudgeted source dropped entirely
    assert "other" not in by_src
    # big is down-sampled to ~1000/5000 = 20% of docs (hash-uniform)
    assert 3 <= len(by_src["big"]) <= 20
    # reproducible: second run keeps the identical documents
    again = sorted(
        r["doc_id"] for r in mix_to_token_budgets(
            df, {"big": 1000, "small": 10_000}, default_rate=0.0
        ).collect() if r["source"] == "big"
    )
    assert again == sorted(by_src["big"])


def test_unigram_surprisal_semantics(spark):
    """Rare-token soup must out-score boilerplate; the vocab cap makes
    tail tokens OOV with a deterministic one-bit-past-rarest cost."""
    from edgar_finance_ontology_spark.operators.textops import (
        unigram_surprisal_scores,
    )

    common = "the quick brown fox jumps over the lazy dog the the the"
    docs = (
        [(i, common) for i in range(8)]
        + [(100, "zqxv kjhw pflm wvnb xrtk")]  # five singletons
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in unigram_surprisal_scores(df).collect()}
    assert got[100]["mean_surprisal_bits"] > got[0]["mean_surprisal_bits"]
    assert got[0]["oov_tokens"] == 0
    # with vocab capped below the distinct-token count, the rarest
    # tokens fall out and get charged the fixed OOV cost
    capped = {r["id"]: r
              for r in unigram_surprisal_scores(df, vocab_size=5).collect()}
    assert capped[100]["oov_tokens"] == 5
    total = sum(r["n_tokens"] for r in got.values())
    oov_bits = total.bit_length()
    assert capped[100]["sum_surprisal_bits"] == 5 * oov_bits
    # deterministic across repeated fits
    again = {r["id"]: r["sum_surprisal_bits"]
             for r in unigram_surprisal_scores(df, vocab_size=5).collect()}
    assert again == {k: v["sum_surprisal_bits"] for k, v in capped.items()}


def test_pack_sequences_invariants(spark):
    """Fixed-length packing: every sequence but the last is exactly
    full; slices partition each doc's token range contiguously;
    in-sequence offsets are consistent; partitioning never moves a
    cut point."""
    from edgar_finance_ontology_spark.operators.textops import (
        pack_sequences,
    )

    docs = [(i, " ".join(f"w{i}t{j}" for j in range((i * 7) % 23 + 1)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    L = 16
    rows = pack_sequences(df, L).collect()

    by_seq: dict = {}
    by_doc: dict = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
        by_doc.setdefault(r["id"], []).append(r)

    n_total = sum((i * 7) % 23 + 1 for i in range(40))
    assert max(by_seq) == (n_total - 1) // L
    for sid, slices in by_seq.items():
        width = sum(r["doc_to"] - r["doc_from"] for r in slices)
        assert width == (L if sid < max(by_seq) else n_total - sid * L)
        # offsets tile the sequence: sorted by seq_off, each slice
        # starts where the previous ended
        slices.sort(key=lambda r: r["seq_off"])
        pos = 0
        for r in slices:
            assert r["seq_off"] == pos, (sid, r)
            pos += r["doc_to"] - r["doc_from"]

    for i, slices in by_doc.items():
        n = (i * 7) % 23 + 1
        slices.sort(key=lambda r: r["seq_id"])
        # contiguous partition of [0, n): starts at 0, ends at n,
        # each slice resumes where the previous stopped, consecutive
        # sequence ids
        assert slices[0]["doc_from"] == 0
        assert slices[-1]["doc_to"] == n
        for a, b in zip(slices, slices[1:]):
            assert b["doc_from"] == a["doc_to"]
            assert b["seq_id"] == a["seq_id"] + 1

    # partition invariance: the cut points are a pure function of the
    # deterministic doc order, not of physical layout
    alt = pack_sequences(df.repartition(7), L).collect()
    key = lambda r: (r["seq_id"], r["id"])  # noqa: E731
    assert sorted(map(tuple, alt)) == sorted(map(tuple, rows))

    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def _py_bigram_bits(corpus, vocab_size=50_000, bigram_size=200_000):
    """Independent pure-Python replay of bigram_lm_scores' contract."""
    import math
    from collections import Counter

    toks = {i: [t for t in text.lower().strip().split() if t]
            for i, text in corpus}
    uni = Counter(t for ts in toks.values() for t in ts)
    total = sum(uni.values())
    vocab = dict(sorted(
        uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size])
    big = Counter(
        (ts[i], ts[i + 1])
        for ts in toks.values() for i in range(len(ts) - 1))
    big = dict(sorted(
        big.items(), key=lambda kv: (-kv[1], kv[0]))[:bigram_size])
    oov_bits = total.bit_length()
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        bits = []
        for k, cur in enumerate(ts):
            c_cur = vocab.get(cur)
            if c_cur is None:
                bits.append(oov_bits)
                continue
            prev = ts[k - 1] if k else None
            c_prev = vocab.get(prev) if prev is not None else None
            if c_prev is None:
                p = c_cur / total
            else:
                p = (big.get((prev, cur), 0) / c_prev
                     + c_cur / total) / 2
            bits.append(math.floor(-math.log2(p)))
        out[i] = {"n_tokens": len(ts), "sum_bits": sum(bits)}
    return out


def test_bigram_lm_semantics(spark):
    """Shuffled-word soup keeps its unigram mass but loses every
    bigram hit — the perplexity gate's added signal; exact sums match
    an independent pure-Python model replay."""
    from edgar_finance_ontology_spark.operators.textops import (
        bigram_lm_scores,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    # same multiset of words, order scrambled (fixed permutation)
    soup = "mat the on dog and sat rug cat the sat the on the"
    docs = [(i, fluent) for i in range(6)] + [(50, soup)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r for r in bigram_lm_scores(df).collect()}
    # identical unigram content, so the bigram term is the only mover:
    # the soup's self-contributed singleton bigrams are "hits" too
    # (the model is corpus-fit), but carry 6x less mass each
    assert got[50]["n_tokens"] == got[0]["n_tokens"]
    assert got[50]["mean_bits"] > got[0]["mean_bits"]
    assert got[0]["oov_tokens"] == 0
    # capping the bigram model to the head keeps the fluent doc's
    # (count-6) bigrams and drops the soup's singletons
    head = {r["id"]: r
            for r in bigram_lm_scores(df, bigram_size=10).collect()}
    assert head[50]["bigram_hits"] < head[0]["bigram_hits"]
    ref_head = _py_bigram_bits(docs, bigram_size=10)
    for i, r in head.items():
        assert r["sum_bits"] == ref_head[i]["sum_bits"], i

    # exact agreement with the independent replay, doc by doc
    ref = _py_bigram_bits(docs)
    for i, r in got.items():
        assert r["sum_bits"] == ref[i]["sum_bits"], i
        assert r["n_tokens"] == ref[i]["n_tokens"], i

    # vocab cap: rare tokens go OOV at the fixed cost; deterministic
    capped = {r["id"]: r
              for r in bigram_lm_scores(df, vocab_size=3).collect()}
    total = sum(r["n_tokens"] for r in got.values())
    assert capped[50]["oov_tokens"] > 0
    again = {r["id"]: r["sum_bits"]
             for r in bigram_lm_scores(df, vocab_size=3).collect()}
    assert again == {k: v["sum_bits"] for k, v in capped.items()}

    # bigram cap of 0 models nothing: every non-first in-vocab token
    # pays exactly one extra bit over the op's own unigram branch
    # (p halves, and floor commutes with the integer shift)
    nobi = {r["id"]: r
            for r in bigram_lm_scores(df, bigram_size=0).collect()}
    ref_nobi = _py_bigram_bits(docs, bigram_size=0)
    for i, r in nobi.items():
        assert r["bigram_hits"] == 0
        assert r["sum_bits"] == ref_nobi[i]["sum_bits"], i


def test_perplexity_buckets_semantics(spark):
    """Head/middle/tail split is monotone in mean_bits; fluent
    repeated prose lands in head, OOV soup in tail."""
    from edgar_finance_ontology_spark.operators.textops import (
        perplexity_buckets,
    )

    fluent = "the cat sat on the mat and the dog sat on the rug"
    docs = (
        [(i, fluent) for i in range(8)]
        + [(40 + i, f"one two three four five alpha{i} beta{i}")
           for i in range(4)]
        + [(90 + i, f"zzq{i} wvx{i} kjh{i} pfl{i} xrt{i} mnb{i}")
           for i in range(4)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = perplexity_buckets(df).collect()
    assert len(rows) == len(docs)
    by_bucket: dict = {}
    for r in rows:
        assert r["ppx_bucket"] in ("head", "middle", "tail")
        by_bucket.setdefault(r["ppx_bucket"], []).append(r["mean_bits"])
    # monotone: every head score <= every middle score <= every tail
    if "head" in by_bucket and "middle" in by_bucket:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if "middle" in by_bucket and "tail" in by_bucket:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    got = {r["id"]: r["ppx_bucket"] for r in rows}
    assert got[0] == "head"          # fluent, repeated 8x
    assert got[90] == "tail"         # rare-token soup
    # empty corpus: typed empty frame, no driver blow-up
    empty = perplexity_buckets(df.limit(0))
    assert empty.count() == 0
    assert [f.name for f in empty.schema] == [
        "id", "mean_bits", "ppx_bucket"]


def test_cross_source_overlap_df_cap_bounds_pairs(spark):
    """A gram shared by every doc must not join quadratically when the
    df cap is active."""
    from edgar_finance_ontology_spark.operators.textops import (
        cross_source_overlap,
    )

    boiler = "common boiler plate phrase appears in every document here"
    docs = [(f"t{i}", boiler, "test") for i in range(10)]
    docs += [(f"r{i}", boiler, "train") for i in range(100)]
    df = spark.createDataFrame(docs, "doc_id string, text string, source string")
    capped = cross_source_overlap(df, "test", max_df=50)
    assert capped.count() == 0  # boiler grams dropped by the cap
    uncapped = cross_source_overlap(df, "test", max_df=None)
    assert uncapped.count() == 10  # every test doc matches


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    from pyspark.sql import functions as F

    from edgar_finance_ontology_spark.operators.textops import (
        stratified_sample,
    )

    rows = [(i, f"doc {i}", "en", "srcA" if i % 2 else "srcB", 10)
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    kept1 = {r["doc_id"] for r in stratified_sample(
        df, {"srcA": 0.2, "srcB": 0.8}).collect()}
    kept2 = {r["doc_id"] for r in stratified_sample(
        df, {"srcA": 0.2, "srcB": 0.8}).collect()}
    # pure function of the key: identical corpus on re-run
    assert kept1 == kept2
    a = sum(1 for d in kept1 if d % 2 == 1)
    b = sum(1 for d in kept1 if d % 2 == 0)
    assert 0.12 < a / 1000 < 0.28   # ~20%
    assert 0.72 < b / 1000 < 0.88   # ~80%
    # no shuffle: the plan is a narrow filter
    plan = stratified_sample(df, {"srcA": 0.2})._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_quality_funnel_monotone_and_counts(spark):
    from edgar_finance_ontology_spark.operators.textops import quality_funnel

    docs = [
        (1, "the good document " * 10, "en", "s", 0),
        (2, "zu kurz", "de", "s", 0),                  # fails length
        (3, "x " * 100, "zh", "s", 0),                 # fails lang
        (4, "dup\ndup\ndup\ndup\nuniq " + "y " * 50, "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = {r["stage"]: r["n_docs"] for r in quality_funnel(
        df, allowed_langs=("en", "de"), min_chars=20,
        max_dup_line_frac=0.5).collect()}
    assert out["ingested"] == 4
    assert out["after_lang_gate"] == 3         # drops zh
    assert out["after_length_gate"] == 2       # drops the short de doc
    assert out["after_dup_line_gate"] == 1     # drops the dup-line doc
    vals = [out["ingested"], out["after_lang_gate"],
            out["after_length_gate"], out["after_dup_line_gate"]]
    assert vals == sorted(vals, reverse=True)  # funnel is monotone


def test_pack_token_shards_budget_and_order(spark):
    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards,
    )

    docs = [(i, " ".join(["w"] * (10 + i)), "en", "s", 0)
            for i in range(20)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = sorted(
        (r["id"], r["n_tokens"], r["cum_tokens"], r["shard_id"])
        for r in pack_token_shards(df, shard_tokens=60).collect()
    )
    # cumulative total equals the running sum in id order
    running = 0
    for i, (doc, n, cum, shard) in enumerate(out):
        assert doc == i and n == 10 + i
        running += n
        assert cum == running
        assert shard == (cum - 1) // 60
    # every shard except possibly the last overflows its budget by at
    # most one document (greedy boundary semantics)
    by_shard = {}
    for _, n, _, s in out:
        by_shard.setdefault(s, []).append(n)
    for s, toks in sorted(by_shard.items())[:-1]:
        assert sum(toks) >= 60 - max(toks)


def test_pack_token_shards_is_distributed(spark):
    """The global running sum must NOT plan as Exchange
    SinglePartition (the whole corpus through one task) — it is a
    two-phase prefix sum over a range partitioning."""
    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards,
    )

    df = spark.createDataFrame(
        [(i, "w " * 5, "en", "s", 0) for i in range(500)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    p = pack_token_shards(df, 100)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_mix_by_temperature_rates(spark):
    """alpha=1 gives every source the SAME keep-rate (natural
    proportions); alpha=0.5 favors smaller sources (higher rate than a
    bigger source); decisions are the deterministic hash rule."""
    from edgar_finance_ontology_spark.operators.textops import (
        mix_by_temperature,
    )

    rows = []
    for i in range(40):
        rows.append((i, "tok " * 50, "big"))
    for i in range(40, 50):
        rows.append((i, "tok " * 50, "small"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    def kept_frac(alpha):
        kept = mix_by_temperature(df, target_tokens=1500, alpha=alpha)
        c = {r["source"]: r["n"] for r in
             kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        return c.get("big", 0) / 40, c.get("small", 0) / 10

    big1, small1 = kept_frac(1.0)
    # same rate -> kept fractions agree up to hash-rule granularity
    assert abs(big1 - small1) < 0.25
    big5, small5 = kept_frac(0.5)
    assert small5 > big5  # temperature flattens toward uniform
    # deterministic: same call twice -> identical kept set
    a = sorted(r["doc_id"] for r in
               mix_by_temperature(df, 1500, 0.5).collect())
    b = sorted(r["doc_id"] for r in
               mix_by_temperature(df, 1500, 0.5).collect())
    assert a == b


def test_substring_dup_stats_semantics(spark):
    """A verbatim 15-token span shared across docs is counted; a
    window repeated only WITHIN one doc is not; short docs are
    excluded; exact duplicates hit frac 1.0."""
    from edgar_finance_ontology_spark.operators.textops import (
        substring_dup_stats,
    )

    span = " ".join(f"w{i}" for i in range(15))
    rows = [
        (1, span + " tail one extra words here"),
        (2, "lead in words " + span),
        (3, "totally different content " + " ".join(
            f"x{i}" for i in range(20))),
        (4, span),                       # exact window, shared
        (5, (span + " ") * 2 + "uniquetail" + " ".join(
            f"z{i}" for i in range(15))),  # self-repeat + shared
        (6, "short doc"),                # < 15 tokens -> excluded
        (7, " ".join(f"y{i}" for i in range(30))),
        (8, " ".join(f"y{i}" for i in range(30))),  # exact dup of 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in substring_dup_stats(
        df, window_tokens=15).collect()}
    assert 6 not in got
    assert got[4]["n_windows"] == 1 and got[4]["n_dup_windows"] == 1
    assert got[1]["n_dup_windows"] >= 1 and got[2]["n_dup_windows"] >= 1
    assert got[3]["n_dup_windows"] == 0
    # exact duplicates: every window shared
    assert got[7]["dup_window_frac"] == 1.0
    assert got[8]["dup_window_frac"] == 1.0
    # windows unique to doc 5 (its self-repeated tail region) are NOT
    # dup-counted by the within-doc repeat alone
    assert got[5]["n_dup_windows"] < got[5]["n_windows"]


def test_trim_dup_spans_semantics(spark):
    """The owner (lowest id sharing the span) keeps its text; every
    other doc loses exactly the covered tokens; overlapping windows
    merge; untouched docs round-trip token-normalized."""
    from edgar_finance_ontology_spark.operators.textops import (
        trim_dup_spans,
    )

    span = " ".join(f"w{i}" for i in range(15))
    rows = [
        (1, "intro " + span + " outro"),         # owner (lowest id)
        (2, "lead " + span + " tail words"),     # loses the span
        (3, span),                               # loses everything
        (4, "no duplication in this document at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in trim_dup_spans(
        df, window_tokens=15).collect()}
    assert got[1]["clean_text"] == "intro " + span + " outro"
    assert got[1]["removed_tokens"] == 0
    assert got[2]["clean_text"] == "lead tail words"
    assert got[2]["removed_tokens"] == 15
    assert got[3]["clean_text"] == "" and got[3]["removed_tokens"] == 15
    assert got[4]["clean_text"] == rows[3][1]
    # overlapping duplicated windows: doc 5 shares a 16-token run with
    # the owner -> TWO overlapping windows whose union is 16 tokens
    ext = span + " w15"
    df2 = spark.createDataFrame(
        rows + [(5, "x " + ext + " y")], "doc_id long, text string")
    got2 = {r["id"]: r for r in trim_dup_spans(
        df2, window_tokens=15).collect()}
    # doc 5's w0..w15 tokens are covered (owner of 'span' windows is
    # still doc 1; the ext window's owner is doc 5 itself unless
    # another doc carries it)
    assert got2[5]["removed_tokens"] == 15  # the 15 owned-by-1 tokens
    assert got2[5]["clean_text"] == "x w15 y"


def test_write_jsonl_shards(spark, tmp_path):
    """JSONL emission: every line parses, carries the requested meta,
    shard membership matches pack_token_shards, and bytes are
    reproducible run-to-run (sorted within shard)."""
    import json
    import pathlib

    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards, write_jsonl_shards,
    )

    docs = [(i, " ".join(f"t{i}w{j}" for j in range(10)), f"src{i % 2}")
            for i in range(30)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string")
    out = str(tmp_path / "jsonl")
    meta = write_jsonl_shards(df, out, shard_tokens=100,
                              meta_cols=("source",))
    assert meta["n_docs"] == 30
    assert meta["n_shards"] == 3  # 300 ws tokens / 100

    want = {r["id"]: r["shard_id"] for r in pack_token_shards(
        df, 100).collect()}
    seen = {}
    for p in sorted(pathlib.Path(out).glob("shard_id=*/*.txt")):
        sid = int(p.parent.name.split("=")[1])
        ids_in_order = []
        for ln in p.read_text().splitlines():
            obj = json.loads(ln)
            assert obj["n_tokens"] == 10
            assert obj["source"] == f"src{obj['id'] % 2}"
            ids_in_order.append(obj["id"])
            seen[obj["id"]] = sid
        assert ids_in_order == sorted(ids_in_order)
    assert seen == want

    # reproducible bytes per shard (part-file names carry write
    # UUIDs; the emitted content must not)
    def shard_bytes():
        return {
            d.name: b"".join(p.read_bytes()
                             for p in sorted(d.glob("*.txt")))
            for d in pathlib.Path(out).glob("shard_id=*")
        }

    first = shard_bytes()
    write_jsonl_shards(df, out, shard_tokens=100,
                       meta_cols=("source",))
    assert shard_bytes() == first


def test_write_token_shards_layout(spark, tmp_path):
    """The packed corpus lands one parquet directory per shard; a
    shard-id filter prunes partitions; read-back content equals the
    lazy packing; shard token totals respect the budget shape."""
    from edgar_finance_ontology_spark.operators.textops import (
        pack_token_shards, write_token_shards,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "shards")
    meta = write_token_shards(d, out, shard_tokens=5000)
    assert meta["n_docs"] == d.count()
    assert meta["n_shards"] >= 2

    import os

    dirs = [x for x in os.listdir(out) if x.startswith("shard_id=")]
    assert len(dirs) == meta["n_shards"]

    back = spark.read.parquet(out)
    want = {(r["id"], r["shard_id"]) for r in
            pack_token_shards(d, 5000).select("id", "shard_id").collect()}
    got = {(r["id"], r["shard_id"]) for r in
           back.select("id", "shard_id").collect()}
    assert got == want

    # partition pruning on the shard filter
    q = back.where(F.col("shard_id") == 0)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard_id" in plan
    # greedy packing: every non-last shard fills to within one document
    # of the budget (the documented off-by-one-document trade)
    max_doc = back.agg(F.max("n_tokens")).first()[0]
    totals = sorted(
        (r["shard_id"], r["t"]) for r in
        back.groupBy("shard_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    for sid, t in totals[:-1]:
        assert t >= 5000 - max_doc, (sid, t, max_doc)


def test_gopher_rules_semantics(spark):
    from edgar_finance_ontology_spark.operators.textops import gopher_rules

    prose = ("The results have to be read with care and that is why we "
             "describe each of the checks in detail below so the reader "
             "can follow every step of the argument without any doubt "
             "about what was measured and how it was aggregated here and "
             "why the same checks then also hold for the larger corpus.")
    assert len(prose.split()) >= 50
    docs = [
        ("ok", prose),
        ("short", "the be of and that have with to"),       # < 50 words
        ("symbols", " ".join(["# word"] * 30)),             # 30 '#' / 60 words
        ("bullets", "\n".join(["- item %d" % i for i in range(10)])),
        ("ellipsis", "\n".join(["this trails off..."] * 10)),
        ("numeric", " ".join(str(i) for i in range(60))),   # no alpha words
        ("nostop", " ".join(["lorem ipsum dolor sit amet"] * 12)),
        ("longwords", " ".join(["x" * 40] * 60)),           # mwl > 10
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: r.asDict() for r in gopher_rules(df).collect()}

    assert got["ok"]["gopher_pass"] == 1
    assert all(v == 1 for k, v in got["ok"].items() if k.startswith("r_"))
    assert got["short"]["r_word_count"] == 0
    assert got["symbols"]["r_symbol_ratio"] == 0      # 10*30 > 60
    assert got["bullets"]["r_bullet_lines"] == 0      # 100% bullet lines
    assert got["ellipsis"]["r_ellipsis_lines"] == 0   # 100% > 30%
    assert got["numeric"]["r_alpha_words"] == 0
    assert got["nostop"]["r_stopwords"] == 0
    assert got["longwords"]["r_mean_word_len"] == 0
    for k in ("short", "symbols", "bullets", "ellipsis", "numeric",
              "nostop", "longwords"):
        assert got[k]["gopher_pass"] == 0, k

    # integer cross-multiplication boundary: exactly 10% symbols passes
    edge = spark.createDataFrame(
        [("edge", "# " + " ".join(["w"] * 9))], "doc_id string, text string"
    )
    row = gopher_rules(edge, min_words=1).collect()[0]
    assert row["r_symbol_ratio"] == 1 and row["n_words"] == 10


def test_gopher_rules_is_a_pure_map(spark):
    """The whole rule set must evaluate inside the scan stage — zero
    Exchange in the executed plan (the 100-TB claim in the docstring,
    asserted)."""
    from edgar_finance_ontology_spark.operators.textops import gopher_rules

    df = spark.createDataFrame([("a", "some text here")],
                               "doc_id string, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_c4_clean_semantics(spark):
    from edgar_finance_ontology_spark.operators.textops import c4_clean

    good = ("This line has enough words to be kept fine.\n"
            "Another proper sentence with more than five words!\n"
            "And a third full sentence right here for the count?")
    docs = [
        ("keep", good),
        ("short_lines", "too few words.\nalso tiny line.\nnope again."),
        ("no_punct", "this line has plenty of words but no terminal mark\n"
                     "same story on the second line of this page"),
        ("js", good + "\nPlease enable javascript to view this content."),
        ("lorem", good + " lorem ipsum"),
        ("brace", good + " function() {"),
        ("two_sent", "Only one proper sentence lives on this page today."),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["id"]: r.asDict() for r in c4_clean(df).collect()}

    assert got["keep"]["c4_keep"] == 1
    assert got["keep"]["n_lines_kept"] == 3
    assert got["keep"]["n_sentences"] == 3
    assert got["keep"]["text_clean"] == good

    assert got["short_lines"]["n_lines_kept"] == 0
    assert got["short_lines"]["text_clean"] == ""
    assert got["no_punct"]["n_lines_kept"] == 0
    # the javascript line is dropped but the page survives on the rest
    assert got["js"]["n_lines_kept"] == 3 and got["js"]["c4_keep"] == 1
    assert "javascript" not in got["js"]["text_clean"]
    assert got["lorem"]["has_lorem_ipsum"] == 1 and got["lorem"]["c4_keep"] == 0
    assert got["brace"]["has_curly_brace"] == 1 and got["brace"]["c4_keep"] == 0
    assert got["two_sent"]["n_sentences"] == 1
    assert got["two_sent"]["c4_keep"] == 0


def test_winnowing_guarantee_and_pairs(spark):
    """Schleimer et al. 2003 detection guarantee: two documents that
    share any substring of length >= t = w + k - 1 share at least one
    winnowing fingerprint; disjoint-alphabet documents share none."""
    from edgar_finance_ontology_spark.operators.textops import (
        winnow_fingerprints, winnow_shared_pairs,
    )

    k, w = 8, 4
    shared = "the quick brown fox jumps over"   # len 30 >= t = 11
    docs = [
        ("a", "prefix alpha " + shared + " suffix one"),
        ("b", "other beginning " + shared + " different tail"),
        ("c", "zzzz qqqq vvvv xxxx yyyy wwww uuuu completely apart"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")

    fp = winnow_fingerprints(df, k=k, w=w)
    by_id = {
        i: {r["fp"] for r in rows}
        for i, rows in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r["id"]),
            key=lambda r: r["id"])
    }
    assert by_id["a"] & by_id["b"], "guaranteed shared fingerprint missing"
    assert not (by_id["a"] & by_id["c"])
    assert not (by_id["b"] & by_id["c"])

    # density contract: per doc, far fewer fingerprints than k-grams
    n_grams = len(docs[0][1]) - k + 1
    assert 0 < len(by_id["a"]) < n_grams

    pairs = winnow_shared_pairs(df, k=k, w=w, max_df=8, min_shared=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {("a", "b")}


def test_window_hash_arrow_equals_hof(spark):
    """The Arrow window-hash kernel must emit exactly the HOF form's
    rows for both substring_dup_stats (empties kept, no pos) and
    trim_dup_spans (empties dropped, with pos), across whitespace and
    short-doc edge cases."""
    from edgar_finance_ontology_spark.operators.textops import (
        substring_dup_stats,
        trim_dup_spans,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        ("a", base + " one two three"),
        ("b", base + " one two three"),           # duplicate span
        ("c", "short doc"),                        # under the window
        ("d", "\t" + base + "  double  gap " + base),  # tabs/empties
        ("e", None),
        ("f", ""),
        ("g", base.upper()),                       # lowercasing
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for w in (3, 5):
        a = {tuple(r) for r in substring_dup_stats(
            df, w, impl="arrow").collect()}
        h = {tuple(r) for r in substring_dup_stats(
            df, w, impl="hof").collect()}
        assert a == h, (w, a ^ h)
        at = {tuple(r) for r in trim_dup_spans(
            df, w, impl="arrow").collect()}
        ht = {tuple(r) for r in trim_dup_spans(
            df, w, impl="hof").collect()}
        assert at == ht, (w, at ^ ht)


def test_char_gram_fingerprints_arrow_equals_hof(spark):
    """Arrow char-gram md5 kernels must emit exactly the HOF rows:
    global-min fingerprint and winnowing window minima, across short/
    empty/null/unicode texts (substr counts code points both sides)."""
    from edgar_finance_ontology_spark.operators.textops import (
        fingerprints,
        winnow_fingerprints,
    )

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "short"),                    # shorter than k
        ("c", ""),                         # empty -> md5('')
        ("d", None),                       # null text
        ("e", "café touché résumé naïve"),
        ("f", "aaaaaaaaaaaaaaaaaaaa"),     # degenerate repeats
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    for k, w in ((8, 4), (3, 2)):
        fa = {tuple(r) for r in fingerprints(df, k=k,
                                             impl="arrow").collect()}
        fh = {tuple(r) for r in fingerprints(df, k=k,
                                             impl="hof").collect()}
        assert fa == fh, (k, fa ^ fh)
        wa = {tuple(r) for r in winnow_fingerprints(
            df, k=k, w=w, impl="arrow").collect()}
        wh = {tuple(r) for r in winnow_fingerprints(
            df, k=k, w=w, impl="hof").collect()}
        assert wa == wh, (k, w, wa ^ wh)
