"""Generate a REALISTIC-DUPLICATION documents fixture for the minhash
verify-prune A/B (r14 verdict task 1).

Why this exists: tools/gen_sf.py scales by keyspace-sharded COPYING —
every document appears K times verbatim (under distinct ids), so at
sf1/sf10 ~every doc is an LSH candidate (27.12M of 27.15M pairs verify
at sf10). That is the pathological-duplication regime: a verify-side
prune (drop docs that appear in no candidate pair before the verify
joins — guide §3.4) measures NOTHING there because nothing can be
pruned. Real corpora sit at a few percent near-dup involvement; this
tool builds that regime at any size.

Shape: ``n_docs`` documents over a 10k-word synthetic vocabulary.
* unique docs: 40-79 tokens drawn from the vocab by a deterministic
  per-run RNG (numpy PCG64(seed)) — two independent draws share a
  3-shingle with probability ~1e-9, so uniques are never candidates.
* duplicated docs: ``dup_rate`` of all docs are involved in a dup
  RELATION — half are bases (also counted unique above), half are
  copies: 25% of copies verbatim (exact dups — the resolve path's
  exact-collapse sees them), 75% near-copies with ~8% of token
  positions re-drawn (expected Jaccard ~0.75-0.85, above the default
  0.5 verify threshold).

Schema matches /root/testdata/*/documents.parquet:
(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
 n_chars BIGINT). Deterministic for a given (n_docs, dup_rate, seed).

Usage:
    python tools/gen_realdup.py /tmp/spark_graft_rd1 50000
    python tools/gen_realdup.py /tmp/spark_graft_rd10 500000 [dup_rate] [seed]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "zh", "de", "fr", "es"]
SOURCES = [f"src{i}" for i in range(8)]


def main(out_dir: str, n_docs: int, dup_rate: float = 0.04, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(10_000)])

    n_pairs = int(n_docs * dup_rate / 2)
    n_unique = n_docs - n_pairs  # bases live in the unique range

    lens = rng.integers(40, 80, size=n_unique)
    flat = rng.integers(0, len(vocab), size=int(lens.sum()))
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(vocab[flat[offs[i]:offs[i + 1]]]) for i in range(n_unique)]

    # copies: base docs are the first n_pairs uniques; 25% verbatim,
    # 75% with ~8% of positions re-drawn
    exact_mask = rng.random(n_pairs) < 0.25
    for i in range(n_pairs):
        toks = flat[offs[i]:offs[i + 1]].copy()
        if not exact_mask[i]:
            k = max(1, int(len(toks) * 0.08))
            pos = rng.choice(len(toks), size=k, replace=False)
            toks[pos] = rng.integers(0, len(vocab), size=k)
        texts.append(" ".join(vocab[toks]))

    doc_id = np.arange(n_docs, dtype=np.int64)
    lang = [LANGS[i % len(LANGS)] for i in range(n_docs)]
    source = [SOURCES[i % len(SOURCES)] for i in range(n_docs)]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)

    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(table, path, compression="zstd")
    print(
        f"wrote {path}: {n_docs} docs, {n_pairs} dup pairs "
        f"({int(exact_mask.sum())} exact, {n_pairs - int(exact_mask.sum())} near), "
        f"dup involvement {2 * n_pairs / n_docs:.1%}"
    )


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]),
        float(sys.argv[3]) if len(sys.argv) > 3 else 0.04,
        int(sys.argv[4]) if len(sys.argv) > 4 else 42,
    )
