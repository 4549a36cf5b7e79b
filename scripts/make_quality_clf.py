#!/usr/bin/env python3
"""Train the committed hashed-feature quality classifier fixture
(models/quality_clf_256.npz) — a REAL trained linear model, not a
stand-in: fastText-style document quality classifiers are trained on
heuristic/source labels (CCNet's "looks like Wikipedia"); here the
teacher is the repo's own quality rubric (operators/textops.py
quality_scores >= 0.75) distilled over the sf0.001 documents table
into logistic-regression weights on 256 hashed unigram-presence
features.

Deterministic end to end: md5 bucket hashing (the engine-portable
hash used across the repo), full-batch gradient descent, fixed
iteration count, float64 — rerunning this script reproduces the .npz
bit-for-bit. No Spark needed (duckdb reads the parquet; the label
rubric is re-expressed in SQL identical to the Spark rubric).

Usage: python scripts/make_quality_clf.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import re
import sys

import duckdb
import numpy as np

D = 256
ITERS = 400
LR = 0.5

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = "edgar_finance_ontology_spark/models/quality_clf_256.npz"

# the quality_scores rubric, re-expressed (labels only — a 1-ulp
# disagreement on a ratio boundary would just flip one training label,
# not break determinism of the committed weights)
LABEL_SQL = f"""
WITH t AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         list_filter(string_split(trim(lower(text)), ' '),
                     x -> x <> '') AS toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
           AS n_punct
  FROM read_parquet('{SF}/documents.parquet')),
m AS (
  SELECT doc_id, text, n_chars, len(toks) AS n_tokens,
         CASE WHEN n_chars > 0
              THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0 END AS punct_ratio,
         CASE WHEN len(toks) > 0 THEN
           CAST(len(list_filter(toks, x -> x IN
             ('the','a','of','and','is','to','in'))) AS DOUBLE)/len(toks)
           ELSE 0 END AS stop_ratio,
         CASE WHEN len(toks) > 0 THEN
           CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / len(toks) ELSE 0 END AS mwl
  FROM t)
SELECT doc_id, text,
       (CASE WHEN n_chars >= 200 THEN 0.25
             WHEN n_chars >= 50 THEN 0.15 ELSE 0 END
        + CASE WHEN punct_ratio <= 0.1 THEN 0.25 ELSE 0 END
        + CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0 END
        + CASE WHEN mwl BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0 END
       ) >= 0.75 AS label
FROM m ORDER BY doc_id
"""


def bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % D


def main():
    rows = duckdb.sql(LABEL_SQL).fetchall()
    X = np.zeros((len(rows), D))
    y = np.zeros(len(rows))
    for i, (_did, text, label) in enumerate(rows):
        toks = {t for t in re.split(r"\s+", text.strip().lower()) if t}
        for t in toks:
            X[i, bucket(t)] = 1.0
        y[i] = 1.0 if label else 0.0
    w = np.zeros(D)
    b = 0.0
    n = len(rows)
    for _ in range(ITERS):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (X.T @ g) / n
        b -= LR * float(g.sum()) / n
    pred = (X @ w + b) > 0
    acc = float((pred == (y > 0.5)).mean())
    np.savez(OUT, w=w, b=np.float64(b), d=np.int64(D))
    with open(OUT.replace(".npz", ".txt"), "w") as f:
        f.write(f"# trained on {SF}, iters={ITERS}, lr={LR}, "
                f"train_acc={acc:.4f}, pos_rate={y.mean():.4f}\n")
        f.write(f"bias\t{b!r}\n")
        for i, wi in enumerate(w):
            f.write(f"{i}\t{wi!r}\n")
    print({"n": n, "pos_rate": round(float(y.mean()), 4),
           "train_acc": round(acc, 4)})


if __name__ == "__main__":
    main()
