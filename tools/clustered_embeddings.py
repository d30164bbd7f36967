#!/usr/bin/env python3
"""Clustered embedding corpus — the ANN accuracy story's missing evidence.

Every recall number in the repo through r10 was measured on the driver's
uniform synthetic embeddings, where PLANS.md §ivf-dial concedes recall ~
scanned fraction: with no cluster structure, NO index can beat reading
nprobe/nlists of the corpus, so a3/a14/a17/a18 graded the corpus, not the
index. This generates the corpus the IVF family exists for: a mixture of
`k` Gaussians on the unit sphere (FAISS/SIFT-style clusterable data), same
schema and scales as the driver's embeddings table, fully deterministic.

Construction (seeded, no I/O order dependence):
  - k cluster centers: seeded standard normals, L2-normalized (random
    64-dim unit vectors are near-orthogonal: pairwise cosine ~ N(0, 1/64),
    so inter-cluster similarity ~ +-0.125)
  - vector i belongs to cluster i % k; v = center + sigma * g with
    |g| ~ 1, so intra-cluster cosine ~ 1/(1+sigma^2) (~0.89 at the 0.35
    default) — top-10 true neighbors are same-cluster with high margin
  - label = cluster % 10 (the a10 metadata-filter shape preserved)
  - vec_id 0..n-1; because cluster = vec_id % k, the deterministic coarse
    rule "centroids = vec_id < nlists" picks one member of nlists DISTINCT
    clusters — at nlists=k the deterministic quantizer is aligned with the
    true mixture (the well-chosen-centroids regime), while at nlists<k it
    under-covers and k-means (a4/a18) gets room to beat it: both regimes
    are measurable from one corpus.
  - row groups sized for ~64-group scans (the r10 scan-parallelism rule;
    2048-row floor)

Usage: python3 tools/clustered_embeddings.py [n] [dst_dir] [k] [sigma] [dim]
       defaults: 2000 ./testdata_clustered/sf0.1 64 0.35 64
Schema matches Tables.Pinned: vec_id BIGINT, embedding FLOAT[dim], label INT.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    dst = sys.argv[2] if len(sys.argv) > 2 else "./testdata_clustered/sf0.1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    sigma = float(sys.argv[4]) if len(sys.argv) > 4 else 0.35
    dim = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    os.makedirs(dst, exist_ok=True)

    rng = np.random.default_rng(20260814)
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n) % k
    noise = rng.standard_normal((n, dim)) / np.sqrt(dim)
    vecs = (centers[cluster] + sigma * noise).astype(np.float32)

    table = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64), type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array((cluster % 10).astype(np.int32), type=pa.int32()),
    })
    rgs = max(2048, (n // 64 // 2048) * 2048)
    pq.write_table(table, f"{dst}/embeddings.parquet", row_group_size=rgs)

    # sanity: intra vs inter cluster cosine separation on a sample
    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    intra = cos(vecs[0], vecs[k]) if n > k else float("nan")
    inter = cos(vecs[0], vecs[1])
    print(f"[clustered] n={n} k={k} sigma={sigma} dim={dim} "
          f"row_group={rgs} intra~{intra:.3f} inter~{inter:.3f} -> {dst}")


if __name__ == "__main__":
    main()
