#!/usr/bin/env python
"""Clustered-embedding recall fixture (r11 verdict #6).

The synthetic `embeddings` table is ISOTROPIC (uniform random vectors),
so IVF recall there simply tracks probed mass — nprobe=2 of 645 cells
can only ever see ~0.3% of the corpus and recall@10 lands wherever the
probed fraction lands. Real embedding corpora are CLUSTERED: a query's
true neighbors live in its own few cells, which is the entire premise
of inverted-file indexes. This tool plants that regime deterministically:

- ``--n-clusters`` Gaussian mixture components in the same 64-dim
  float32 / 10-label schema as the driver fixtures;
- centers drawn from N(0, I) (seeded), pairwise separation >> the
  within-cluster std, so each vector's true cosine top-k is
  overwhelmingly intra-cluster;
- cluster sizes follow a mild Zipf so cell balance is realistic rather
  than uniform.

Output: ``<dst>/embeddings.parquet`` readable by sources/tables.py —
run ``tools/ann_recall.py --sf-dir <dst>`` against it.

Usage:
    python tools/gen_clustered_emb.py --dst .benchdata/emb_gmm \
        --n 20000 --n-clusters 64 --noise 0.15 --seed 7
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def generate(
    n: int, n_clusters: int, dim: int, noise: float, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Return (vectors float32 [n, dim], cluster assignment int64 [n])."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    # mild Zipf over cluster sizes: rank r gets weight 1/sqrt(r)
    w = 1.0 / np.sqrt(np.arange(1, n_clusters + 1))
    probs = w / w.sum()
    assign = rng.choice(n_clusters, size=n, p=probs)
    vecs = centers[assign] + noise * rng.standard_normal((n, dim))
    return vecs.astype(np.float32), assign.astype(np.int64)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", required=True)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--n-clusters", type=int, default=64)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    vecs, assign = generate(
        args.n, args.n_clusters, args.dim, args.noise, args.seed
    )
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(args.n, dtype=np.int64)),
            "embedding": pa.array(
                list(vecs), type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                (assign % 10).astype(np.int32), type=pa.int32()
            ),
        }
    )
    os.makedirs(args.dst, exist_ok=True)
    pq.write_table(table, os.path.join(args.dst, "embeddings.parquet"))
    print(
        {
            "dst": args.dst,
            "n": args.n,
            "n_clusters": args.n_clusters,
            "dim": args.dim,
            "noise": args.noise,
            "seed": args.seed,
        }
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
