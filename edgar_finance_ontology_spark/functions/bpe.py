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
