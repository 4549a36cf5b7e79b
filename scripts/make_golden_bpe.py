#!/usr/bin/env python3
"""Materialize the golden oracle for the `token_counts_bpe` driver
query: per-document REAL byte-level BPE piece counts over the sf0.01
documents table, computed by an INDEPENDENT BPE formulation
(sequential rank-order merge application, the fast-tokenizer style)
rather than the production lowest-rank-first loop in
edgar_finance_ontology_spark/functions/bpe.py — the two agree on any
well-formed trained merge table (tests/test_bpe.py proves the
equivalence by hypothesis fuzz), so a Spark-side plumbing or counting
defect shows up as a hash mismatch instead of being replayed.

Output (committed): tests/golden/token_counts_bpe.parquet
Usage: python scripts/make_golden_bpe.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
WS_RE = re.compile(r"\s+")


def rank_order_encode(word: bytes, merges_list) -> int:
    parts = [word[i:i + 1] for i in range(len(word))]
    for a, b in merges_list:
        out, i = [], 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return len(parts)


def main() -> None:
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from edgar_finance_ontology_spark.functions.bpe import load_merges

    # the 16-merge table, NOT the full 512: the synthetic corpus's
    # vocabulary is small enough that the full table fuses every word
    # to one piece (bpe == ws exactly), which would make the oracle
    # unable to distinguish real BPE counting from whitespace counting
    # — under the truncated table the three counts all differ.
    merges_path = os.path.join(
        REPO, "edgar_finance_ontology_spark", "models",
        "bpe_merges_16.txt",
    )
    merges_list = list(load_merges(merges_path).keys())
    t = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"),
        columns=["doc_id", "text"],
    ).to_pandas().sort_values("doc_id")

    ids, ws, bpe = [], [], []
    for doc_id, text in zip(t["doc_id"], t["text"]):
        ids.append(doc_id)
        # same whitespace tokenization as operators.dedup.tokens_col
        ws.append(len(WS_RE.split((text or "").strip().lower())))
        bpe.append(sum(
            rank_order_encode(m.group(0).encode("utf-8"), merges_list)
            for m in PRETOKEN_RE.finditer(text or "")
        ))

    out = os.path.join(REPO, "tests", "golden", "token_counts_bpe.parquet")
    pd.DataFrame({
        "id": np.asarray(ids, dtype="int64"),
        "ws_tokens": np.asarray(ws, dtype="int32"),
        "bpe_tokens": np.asarray(bpe, dtype="int32"),
    }).to_parquet(out, index=False)
    print(f"wrote {out}: {len(ids)} docs, "
          f"{sum(bpe)} bpe pieces / {sum(ws)} ws tokens")


if __name__ == "__main__":
    main()
