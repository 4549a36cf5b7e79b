#!/usr/bin/env python3
"""Train and commit the tiny BPE vocabulary fixture:

  edgar_finance_ontology_spark/models/bpe_merges_512.txt

Corpus: the driver-generated synthetic documents table at sf0.001
(deterministic), so regeneration reproduces identical merges.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edgar_finance_ontology_spark.functions.bpe import (  # noqa: E402
    save_merges, train_merges,
)


def main():
    import pyarrow.parquet as pq

    sf_dir = os.environ.get("SPARK_GRAFT_TRAIN_SF", "/root/testdata/sf0.001")
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).column("text").to_pylist()
    merges = train_merges(texts, n_merges=512)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "edgar_finance_ontology_spark", "models",
                        "bpe_merges_512.txt")
    save_merges(merges, path)
    print(f"wrote {path}: {len(merges)} merges from {len(texts)} docs")


if __name__ == "__main__":
    main()
