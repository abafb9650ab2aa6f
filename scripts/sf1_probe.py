"""sf1 scale probe for the approximate tiers (VERDICT r2 #2).

Both r2 recall bugs (LSH fixed-planes, IVF fixed-nprobe) were invisible
at sf0.01 and real at sf0.1 — this probe checks the NEXT decade. The
driver testdata stops at sf0.1, so the probe synthesizes a 10× corpus
into /tmp/sf1_synth with the SAME structure, estimated from the real
sf0.1 tables (never modifying /root/testdata):

  - embeddings: 20,000 64-dim float32 vectors from the 10-cluster
    model fitted to sf0.1 (per-label centroid + per-dim residual std),
    seeded. Preserves the cluster geometry that makes ANN non-trivial.
  - documents: 50,000 word-salad docs over the sf0.1 vocabulary with
    matched length distribution, ~5% near-dup pairs (base doc with 10%
    words mutated) and ~0.2% exact duplicates, seeded.

Then measures, at sf0.1 and sf1:
  - LSH and IVF recall@5 against an exact numpy ground truth (chunked
    20k×20k matmul — the driver-side oracle for the probe only), plus
    wall time.
  - wall time of the document-pipeline headliners (near-dup, simhash,
    winnowing, jaccard, chunking) for the 10× scaling exponent.

Usage: python scripts/sf1_probe.py [--regen]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SF1 = "/tmp/sf1_synth"
SRC = "/root/testdata/sf0.1"


def generate(seed: int = 20260814) -> None:
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    os.makedirs(SF1, exist_ok=True)

    # --- embeddings: fit per-label gaussian on sf0.1, sample 10x ---
    rows = duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, list] = {}
    for _, emb, lab in rows:
        by_label.setdefault(lab, []).append(np.asarray(emb, dtype=np.float64))
    labels = sorted(by_label)
    cent = {l: np.mean(by_label[l], axis=0) for l in labels}
    std = {l: np.std(np.stack(by_label[l]) - cent[l], axis=0) for l in labels}

    n_vec = 10 * len(rows)
    labs = rng.integers(0, len(labels), size=n_vec)
    dim = len(cent[labels[0]])
    mat = np.empty((n_vec, dim), dtype=np.float32)
    for l in labels:
        m = labs == l
        mat[m] = (
            cent[l] + rng.standard_normal((m.sum(), dim)) * std[l]
        ).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vec), pa.int64()),
                "embedding": pa.array(
                    [v for v in mat.tolist()], pa.list_(pa.float32())
                ),
                "label": pa.array(labs.astype("int32"), pa.int32()),
            }
        ),
        f"{SF1}/embeddings.parquet",
    )

    # --- documents: vocabulary + length distribution from sf0.1 ---
    texts = [
        t[0]
        for t in duckdb.sql(f"SELECT text FROM '{SRC}/documents.parquet'").fetchall()
    ]
    vocab = sorted({w for t in texts for w in t.split()})
    lengths = np.array([len(t.split()) for t in texts])
    langs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT lang FROM '{SRC}/documents.parquet'"
        ).fetchall()
    ]
    n_doc = 10 * len(texts)
    docs: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:  # exact duplicate
            docs.append(docs[rng.integers(0, i)])
        elif i > 10 and r < 0.05:  # near duplicate: mutate 10% of words
            base = docs[rng.integers(0, i)].split()
            k = max(1, len(base) // 10)
            for p in rng.choice(len(base), size=k, replace=False):
                base[p] = vocab[rng.integers(0, len(vocab))]
            docs.append(" ".join(base))
        else:
            n_w = int(lengths[rng.integers(0, len(lengths))])
            docs.append(
                " ".join(
                    vocab[j] for j in rng.integers(0, len(vocab), size=n_w)
                )
            )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_doc), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(
                    [langs[int(j)] for j in rng.integers(0, len(langs), n_doc)],
                    pa.string(),
                ),
                "source": pa.array(
                    [f"src{int(j)}" for j in rng.integers(0, 40, n_doc)],
                    pa.string(),
                ),
                "n_chars": pa.array([len(d) for d in docs], pa.int64()),
            }
        ),
        f"{SF1}/documents.parquet",
    )
    print(f"generated {n_vec} vectors, {n_doc} docs -> {SF1}", flush=True)


def exact_topk_numpy(path: str, k: int = 5) -> set[tuple[int, int]]:
    """Exact cosine top-k ground truth, chunked numpy matmul."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{path}/embeddings.parquet'"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    keep = norms > 0
    ids, mat = ids[keep], mat[keep] / norms[keep][:, None]
    n = len(ids)
    truth: set[tuple[int, int]] = set()
    for s in range(0, n, 2048):
        block = mat[s : s + 2048] @ mat.T  # (b, n)
        for bi in range(block.shape[0]):
            i = s + bi
            block[bi, i] = -np.inf  # exclude self
            # ties: cosine desc then neighbor id asc — lexsort on (-cos, id)
            order = np.lexsort((ids, -block[bi]))[:k]
            truth.update((int(ids[i]), int(ids[j])) for j in order)
    return truth


def probe(sf_dir: str, spark, out: dict) -> None:
    from udacity_capstone_data_engineering_spark.operators.ivf import ivf_topk
    from udacity_capstone_data_engineering_spark.operators.similarity import (
        lsh_topk,
    )
    from udacity_capstone_data_engineering_spark.queries import queries

    tag = os.path.basename(sf_dir.rstrip("/"))
    truth = exact_topk_numpy(sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    for name, fn in {
        "lsh": lambda: lsh_topk(emb, "vec_id", "embedding", dim=64, k=5),
        "ivf": lambda: ivf_topk(emb, "vec_id", "embedding", k=5),
    }.items():
        t0 = time.monotonic()
        got = {(r.query_id, r.neighbor_id) for r in fn().collect()}
        dt = time.monotonic() - t0
        rec = len(truth & got) / len(truth)
        out[f"{tag}:{name}"] = {"recall@5": round(rec, 4), "sec": round(dt, 2)}
        print(json.dumps({tag: name, "recall@5": round(rec, 4), "sec": round(dt, 2)}), flush=True)

    qs = queries()
    for qname in [
        "near_dup_minhash_lsh",
        "near_dup_collapsed",
        "simhash_docs",
        "winnow_fingerprints_docs",
        "ngram_jaccard_pairs",
        "doc_chunks_overlap",
        "exact_dedup_docs",
        "doc_token_stats",
    ]:
        t0 = time.monotonic()
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        out[f"{tag}:{qname}"] = {"sec": round(dt, 2)}
        print(json.dumps({tag: qname, "sec": round(dt, 2)}), flush=True)


def main() -> None:
    if "--regen" in sys.argv or not os.path.exists(f"{SF1}/documents.parquet"):
        generate()
    from udacity_capstone_data_engineering_spark import get_spark

    spark = get_spark(shuffle_partitions=32)
    out: dict = {}
    for sf_dir in [SRC, SF1]:
        probe(sf_dir, spark, out)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
