"""Pure-Python byte-level BPE (GPT-2-family algorithm) for REAL token
counting — no external tokenizer package required.

The committed fixture vocabulary (models/bpe_merges_512.txt, trained by
scripts/make_bpe_fixture.py on the synthetic documents corpus) makes
token budgets real instead of regex-proxy approximations: shard packing
(operators.textops.pack_token_shards(counter="bpe")) and
token_counts(tokenizer="bpe") consume it through an Arrow-batched
mapInPandas with the merge table loaded ONCE per executor and a
per-word memo (natural-language corpora repeat words heavily, so the
memo turns the merge loop into a dict hit for ~95%+ of occurrences).

Pre-tokenization uses the SAME split as the regex proxy
(`[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]`), so proxy counts are exactly
"pieces if no merge ever fires below the pretoken level"; real BPE
counts are >= pretoken counts and <= byte counts, a tested invariant.

Merges-file format: one merge per line, `hexA hexB` (hex of the two
byte sequences to fuse), rank = line order.
"""

from __future__ import annotations

import os
import re
from typing import Iterable

PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

DEFAULT_MERGES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "models", "bpe_merges_512.txt",
)

# merge tables + word memos loaded once per (executor) process
_RANKS_CACHE: dict[str, dict] = {}
_MEMO_CACHE: dict[str, dict] = {}


def save_merges(merges: Iterable[tuple[bytes, bytes]], path: str) -> None:
    with open(path, "w", encoding="ascii") as f:
        for a, b in merges:
            f.write(f"{a.hex()} {b.hex()}\n")


def load_merges(path: str) -> dict[tuple[bytes, bytes], int]:
    ranks: dict[tuple[bytes, bytes], int] = {}
    with open(path, encoding="ascii") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            a, b = line.split(" ")
            ranks[(bytes.fromhex(a), bytes.fromhex(b))] = i
    return ranks


def _ranks(path: str) -> dict:
    if path not in _RANKS_CACHE:
        _RANKS_CACHE[path] = load_merges(path)
        _MEMO_CACHE[path] = {}
    return _RANKS_CACHE[path]


def merge_word(word: bytes, ranks: dict) -> list[bytes]:
    """Apply merges to one pretoken's byte sequence, lowest rank first
    (the canonical BPE loop)."""
    parts = [word[i:i + 1] for i in range(len(word))]
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            return parts
        a, b = best_pair
        fused = a + b
        out: list[bytes] = []
        i = 0
        while i < len(parts):
            if (i + 1 < len(parts) and parts[i] == a
                    and parts[i + 1] == b):
                out.append(fused)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def count_tokens(text: str, merges_path: str = DEFAULT_MERGES) -> int:
    """Number of BPE pieces in `text` under the given merge table."""
    ranks = _ranks(merges_path)
    memo = _MEMO_CACHE[merges_path]
    total = 0
    for m in PRETOKEN_RE.finditer(text or ""):
        w = m.group(0)
        n = memo.get(w)
        if n is None:
            n = len(merge_word(w.encode("utf-8"), ranks))
            if len(memo) < 1_000_000:  # bound executor memory
                memo[w] = n
        total += n
    return total


def encode(text: str, merges_path: str = DEFAULT_MERGES) -> list[bytes]:
    """Full piece sequence (tests / debugging; counting is the hot
    path and skips materializing pieces)."""
    ranks = _ranks(merges_path)
    out: list[bytes] = []
    for m in PRETOKEN_RE.finditer(text or ""):
        out.extend(merge_word(m.group(0).encode("utf-8"), ranks))
    return out


def train_merges(texts: Iterable[str],
                 n_merges: int = 512) -> list[tuple[bytes, bytes]]:
    """Classic BPE training: count pretoken frequencies once, then
    repeatedly fuse the most frequent adjacent pair (ties broken
    lexicographically for determinism). Pure Python — sized for
    fixture-scale corpora, not 100 TB (vocabulary induction is a
    one-off driver/offline job even in production pipelines; the
    DISTRIBUTED hot path is counting, above)."""
    from collections import Counter

    word_freq: Counter = Counter()
    for t in texts:
        for m in PRETOKEN_RE.finditer(t or ""):
            word_freq[m.group(0).encode("utf-8")] += 1
    words = {w: [w[i:i + 1] for i in range(len(w))]
             for w in word_freq}
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for w, parts in words.items():
            f = word_freq[w]
            for pair in zip(parts, parts[1:]):
                pair_freq[pair] += f
        if not pair_freq:
            break
        best = max(pair_freq.items(),
                   key=lambda kv: (kv[1], [-b for b in kv[0][0]],
                                   [-b for b in kv[0][1]]))
        (a, b), freq = best
        if freq < 2:
            break
        merges.append((a, b))
        fused = a + b
        for w, parts in words.items():
            if len(parts) < 2:
                continue
            out = []
            i = 0
            changed = False
            while i < len(parts):
                if (i + 1 < len(parts) and parts[i] == a
                        and parts[i + 1] == b):
                    out.append(fused)
                    i += 2
                    changed = True
                else:
                    out.append(parts[i])
                    i += 1
            if changed:
                words[w] = out
    return merges


def train_merges_distributed(df, text_col: str = "text",
                             n_merges: int = 512) -> list:
    """BPE vocabulary induction as a Spark job, bit-identical to
    `train_merges` (equality-tested against the committed fixture):
    the corpus collapses to the DISTINCT-pretoken frequency table in
    one map-side-combined aggregation — the only pass that ever reads
    the 10^12-document corpus — and every merge round is then ONE
    aggregation over that vocab-sized table (pair counts from
    arrays_zip of adjacent slices, weighted by word frequency), the
    same one-agg-per-iteration shape as the k-means fit.

    Driver state per round: the max pair count plus the tied pairs at
    that count (a handful), to which the EXACT tie-break key of the
    in-memory trainer is applied — max frequency, then the
    byte-complement sequence order Python's `max` induces (which
    prefers the lexicographically smaller pair but the LONGER one on
    prefix ties; replicating it driver-side on the tied subset is
    exact by construction, where an engine ORDER BY would have to
    re-encode that corner). Parts are lowercase-hex byte strings
    (fixed two chars per byte, so hex string order == byte order and
    fusion is plain string concat); the greedy left-to-right fuse is a
    per-word array fold — equivalent to the imperative scan because a
    just-fused element `a+b` can never equal `a` again (b non-empty).
    Each round localCheckpoints the rewritten vocab table, keeping
    lineage flat across hundreds of rounds."""
    from pyspark.sql import functions as F

    words = (
        df.select(F.explode(F.regexp_extract_all(
            F.col(text_col), F.lit(PRETOKEN_RE.pattern), 0)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("freq"))
        .select(
            F.regexp_extract_all(
                F.lower(F.hex(F.encode(F.col("w"), "UTF-8"))),
                F.lit(".."), 0,
            ).alias("parts"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs = (
            words.where(F.size("parts") > 1)
            .select("freq", F.explode(F.arrays_zip(
                F.slice("parts", 1, F.size("parts") - 1).alias("a"),
                F.slice("parts", 2, F.size("parts") - 1).alias("b"),
            )).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .localCheckpoint(eager=True)
        )
        mx = pairs.agg(F.max("n").alias("m")).first()["m"]
        if mx is None or mx < 2:
            break
        ties = pairs.where(F.col("n") == mx).collect()
        best = max(ties, key=lambda r: (
            [-bb for bb in bytes.fromhex(r["a"])],
            [-bb for bb in bytes.fromhex(r["b"])],
        ))
        a, b = best["a"], best["b"]
        merges.append((bytes.fromhex(a), bytes.fromhex(b)))
        A, B, AB = F.lit(a), F.lit(b), F.lit(a + b)
        words = words.select(
            F.when(
                F.size("parts") < 2, F.col("parts")
            ).otherwise(F.aggregate(
                F.slice("parts", 2, F.size("parts") - 1),
                F.slice("parts", 1, 1),
                lambda acc, p: F.when(
                    (F.element_at(acc, -1) == A) & (p == B),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1),
                             F.array(AB)),
                ).otherwise(F.concat(acc, F.array(p))),
            )).alias("parts"),
            "freq",
        ).localCheckpoint(eager=True)
    return merges
