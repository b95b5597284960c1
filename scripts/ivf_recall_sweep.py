#!/usr/bin/env python
"""Recall sweep for the IVF coarse quantizer (round-4 verdict item 4).

Mirrors `kgspark.similarity.ivf_topk`'s exact semantics in numpy (same
`lloyd_kmeans` codebook, 6dp rounding, first-tie argmin cell, (d, cell)
probe order, (-sim, neighbor_id) ranking) and sweeps
(n_centroids, nprobe) against exact brute-force cosine top-k, so the
operating point shipped in `__spark_entry__.q_ann_ivf` is measured, not
guessed. Writes BENCH/IVF_RECALL.json.

Usage: python scripts/ivf_recall_sweep.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgspark.similarity import lloyd_kmeans  # noqa: E402


def exact_topk(X: np.ndarray, ids: np.ndarray, qi: int, k: int) -> list[int]:
    q = X[qi]
    sims = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q) + 1e-300)
    sims = np.round(sims, 6)
    order = sorted(
        (i for i in range(len(X)) if ids[i] != ids[qi]),
        key=lambda i: (-sims[i], ids[i]),
    )
    return [int(ids[i]) for i in order[:k]]


def ivf_recall(
    X: np.ndarray,
    ids: np.ndarray,
    queries: list[int],
    n_centroids: int,
    nprobe: int,
    k: int,
    sample: int,
    iters: int = 10,
) -> tuple[float, float]:
    """Returns (recall@k, mean fraction of corpus scanned per query)."""
    order = np.argsort(ids)
    Xs = X[order][:sample]
    C = np.array(lloyd_kmeans(Xs.astype(np.float64), n_centroids, iters, seed=42))
    d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
    cell = d2.argmin(axis=1)  # first-tie argmin, same as array_position
    hits, total, scanned = 0, 0, 0.0
    id_to_row = {int(v): i for i, v in enumerate(ids)}
    for qid in queries:
        qi = id_to_row[qid]
        probe_order = sorted(range(n_centroids), key=lambda j: (d2[qi, j], j))
        probes = set(probe_order[:nprobe])
        cand = [i for i in range(len(X)) if cell[i] in probes and ids[i] != qid]
        scanned += len(cand) / len(X)
        q = X[qi]
        sims = np.round(
            X[cand] @ q / (np.linalg.norm(X[cand], axis=1) * np.linalg.norm(q)), 6
        )
        ranked = sorted(zip(-sims, ids[cand].tolist()))[:k]
        got = {int(nid) for _, nid in ranked}
        truth = set(exact_topk(X, ids, qi, k))
        hits += len(got & truth)
        total += k
    return hits / total, scanned / len(queries)


def clustered_embeddings(
    n: int = 5000, dim: int = 64, n_clusters: int = 32, seed: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic mixture-of-Gaussians — the data shape IVF is FOR
    (real text/image embedding spaces are strongly clustered; the
    star-schema synthetic embeddings are near-uniform on the sphere,
    the adversarial case)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 4.0
    assign = rng.randint(0, n_clusters, size=n)
    X = centers[assign] + rng.randn(n, dim)
    return np.arange(n, dtype=np.int64), X


def sweep(X: np.ndarray, ids: np.ndarray, queries, k: int) -> list[dict]:
    grid = []
    for n_c in (8, 16, 32, 64):
        for nprobe in (1, 2, 4, 8, 16, 32):
            if nprobe > n_c:
                continue
            r, frac = ivf_recall(X, ids, queries, n_c, nprobe, k, sample=4096)
            grid.append(
                {
                    "n_centroids": n_c,
                    "nprobe": nprobe,
                    "recall_at_k": round(r, 4),
                    "scan_frac": round(frac, 4),
                }
            )
            print(
                f"C={n_c:3d} nprobe={nprobe:3d} recall@{k}={r:.3f} "
                f"scan={frac:.3f}",
                file=sys.stderr,
            )
    return grid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", type=int, nargs="*", default=[0, 1, 2, 3, 4])
    args = ap.parse_args()

    import duckdb

    rel = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{args.sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rel], dtype=np.int64)
    X = np.array([r[1] for r in rel], dtype=np.float64)

    print(f"--- synthetic star-schema embeddings ({len(X)} vecs) ---",
          file=sys.stderr)
    out = {
        "sf_dir": args.sf_dir,
        "k": args.k,
        "n_vectors": len(X),
        "grid": sweep(X, ids, args.queries, args.k),
    }
    print("--- clustered (mixture-of-Gaussians) embeddings ---", file=sys.stderr)
    cids, CX = clustered_embeddings()
    out["clustered"] = {
        "n_vectors": len(CX),
        "generator": "32-cluster MoG, dim 64, sigma 1, centers 4sigma, seed 3",
        "grid": sweep(CX, cids, args.queries, args.k),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/IVF_RECALL.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
