"""ANN quality evaluation harness: recall@k and latency for the three
approximate tiers vs exact brute-force top-k, swept across their
accuracy knobs — at ONE OR MORE corpus sizes in a single table.

The ○-status ANN bench entries prove plumbing and plan shape; this
harness is the QUALITY evidence: mean recall@10 over a panel of query
anchors (single-anchor recall is too noisy to pin), per setting, with
the wall time of the probe. The committed table is the tuning guide a
user reads to pick num_planes/probe_hamming/nprobe; the pinned floors
live in tests/test_dedup_similarity.py::test_ann_recall_floors_panel.

Passing several fixture dirs (r10 verdict ask #7) adds a recall/probe
column pair per size, showing whether each setting HOLDS as the corpus
grows — cell occupancy changes recall, not just latency, so a floor
pinned at one size is a hypothesis at the next.

Usage: python tools/ann_eval.py [sf_dir ...] [--anchors 16] [--k 10]
       [--md ANN_EVAL.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_lakehouse_spark.catalog import Catalog  # noqa: E402
from data_lakehouse_spark.operators import similarity  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402


def run_sweep(
    spark, sf_dir: str, n_anchors: int, k: int
) -> tuple[int, float, list[tuple[str, str, float, float]]]:
    """(n_vectors, exact s/query, [(tier, setting, recall, probe_s)])
    for one fixture dir — settings held FIXED across sizes so columns
    compare like for like."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vecs = emb.count()
    anchors = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(n_anchors).collect()
    ]
    exact_sets = {}
    for aid, qv in anchors:
        exact_sets[aid] = {
            r["vec_id"]
            for r in similarity.cosine_topk(emb, qv, k=k)
            .select("vec_id").collect()
        }

    cat = Catalog(spark, os.path.join(tempfile.mkdtemp(), "annidx"))

    def panel(fn) -> tuple[float, float]:
        recalls, secs = [], []
        for aid, qv in anchors:
            t0 = time.time()
            got = {
                r["vec_id"] for r in fn(qv).select("vec_id").collect()
            }
            secs.append(time.time() - t0)
            e = exact_sets[aid]
            recalls.append(len(got & e) / max(len(e), 1))
        return sum(recalls) / len(recalls), sum(secs) / len(secs)

    rows = []

    def note(tier, setting, r, s):
        rows.append((tier, setting, r, s))
        print(f"[{sf_dir}] {tier} {setting}: recall {r:.2f} {s:.2f}s",
              file=sys.stderr)

    for planes in (6, 8, 10):
        for ph in (0, 1, 2):
            r, s = panel(
                lambda qv: similarity.ann_lsh_topk(
                    emb, qv, k=k, num_planes=planes, probe_hamming=ph
                )
            )
            note("lsh", f"planes={planes} probe={ph}", r, s)

    # distance-weighted multi-probe x multi-table (the recommended LSH
    # configuration; see similarity.ann_lsh_topk)
    for planes, n_probe, ntab in (
        (6, 16, 1),
        (6, 32, 1),
        (6, 16, 2),
        (6, 16, 3),
        (6, 8, 5),
    ):
        r, s = panel(
            lambda qv: similarity.ann_lsh_topk(
                emb, qv, k=k, num_planes=planes,
                n_probe=n_probe, num_tables=ntab,
            )
        )
        note("lsh-mp", f"planes={planes} n_probe={n_probe} L={ntab}", r, s)

    for planes in (4, 6, 8):
        for ph in (1, 2):
            r, s = panel(
                lambda qv: similarity.ann_ivf_topk(
                    emb, qv, k=k, num_planes=planes, probe_hamming=ph
                )
            )
            note("ivf", f"planes={planes} probe={ph}", r, s)

    similarity.build_kmeans_ivf_index(cat, emb, "kivf", k=8, seed=7)
    for nprobe in (1, 2, 3, 4, 8):
        r, s = panel(
            lambda qv: similarity.ann_kmeans_ivf_topk(
                cat, "kivf", qv, k=k, nprobe=nprobe
            )
        )
        note("kmeans-ivf", f"cells=8 nprobe={nprobe}", r, s)

    # IVF-PQ (FAISS IVFx,PQ8 shape): code-only index + ADC; with and
    # without the exact refine stage
    similarity.build_ivf_pq_index(cat, emb, "pq", k=16, m=8, nbits=8)
    for nprobe in (2, 4, 6):
        r, s = panel(
            lambda qv: similarity.ann_ivf_pq_topk(
                cat, "pq", qv, k=k, nprobe=nprobe
            )
        )
        note("ivf-pq", f"m=8 nbits=8 nprobe={nprobe} adc", r, s)
        r, s = panel(
            lambda qv: similarity.ann_ivf_pq_topk(
                cat, "pq", qv, k=k, nprobe=nprobe,
                refine_with=emb, refine_factor=8,
            )
        )
        note("ivf-pq", f"m=8 nbits=8 nprobe={nprobe} refine=8", r, s)

    t0 = time.time()
    for aid, qv in anchors:
        similarity.cosine_topk(emb, qv, k=k).collect()
    exact_s = (time.time() - t0) / len(anchors)
    emb.unpersist()
    return n_vecs, exact_s, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "sf_dirs", nargs="*", default=["/root/testdata/sf0.01"]
    )
    ap.add_argument("--anchors", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--md", default="ANN_EVAL.md")
    args = ap.parse_args()

    spark = get_spark("ann-eval")
    results = []  # (sf_dir, n_vecs, exact_s, {(tier, setting): (r, s)})
    order: list[tuple[str, str]] = []
    for sf_dir in args.sf_dirs:
        n_vecs, exact_s, rows = run_sweep(
            spark, sf_dir, args.anchors, args.k
        )
        results.append(
            (sf_dir, n_vecs, exact_s,
             {(t, st): (r, s) for t, st, r, s in rows})
        )
        if not order:
            order = [(t, st) for t, st, _, _ in rows]

    sizes = " / ".join(
        f"{n} vectors ({d}; exact scan {e:.2f} s/query)"
        for d, n, e, _ in results
    )
    hdr_cols = "".join(
        f" recall@{args.k} ({n}v) | probe sec ({n}v) |"
        for _, n, _, _ in results
    )
    lines = [
        "# ANN quality evaluation",
        "",
        f"Recall@{args.k} (mean over {args.anchors} query anchors) vs "
        f"exact brute-force cosine top-{args.k}; corpus sizes: "
        f"{sizes}. Settings held fixed across sizes — a recall column "
        "that decays with corpus growth means the setting does NOT "
        "hold at scale (cell occupancy, not latency).",
        "",
        f"| tier | setting |{hdr_cols}",
        "|---|---|" + "---|---|" * len(results),
    ]
    for key in order:
        tier, setting = key
        cells = "".join(
            f" {by[key][0]:.2f} | {by[key][1]:.2f} |"
            for _, _, _, by in results
        )
        lines.append(f"| {tier} | {setting} |{cells}")
    lines += [
        "",
        "Reading the table: recall rises with probe width "
        "(probe_hamming / nprobe) at linear cost in partitions read; "
        "at scale the indexed variants read only the probed partitions "
        "(partition-pruned; see tests/test_plans.py), so probe sec here "
        "— full-scan local mode — overstates the big-data probe cost.",
        "",
        "The `lsh-mp` tier is distance-weighted multi-probe (Lv et "
        "al. 2007) × multi-table: buckets ranked by the summed margins "
        "of their flipped planes, the `n_probe` most-likely probed per "
        "table, candidates OR-ed across `L` independent tables in ONE "
        "scan. Recommended LSH setting: `planes=6 n_probe=16 L=3` "
        "(floor 0.75 pinned in tests/test_dedup_similarity.py); "
        "kmeans-ivf remains the best recall/latency tier when an index "
        "build is acceptable.",
        "",
        "`ivf-pq` is the quantized tier (FAISS IVFx,PQ8 shape): the "
        "index stores 8 byte-codes per vector instead of 64 floats, so "
        "probes stay in memory at corpus scales where even IVF-Flat "
        "cells don't fit; `adc` rows rank by the asymmetric distance "
        "table alone, `refine=8` re-ranks the top 8·k candidates "
        "exactly against the source vectors (the standard FAISS refine "
        "stage — recommended; recall floor 0.75 pinned in "
        "tests/test_dedup_similarity.py).",
    ]
    with open(args.md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "anchors": args.anchors,
        "k": args.k,
        "corpora": [
            {"sf_dir": d, "n_vecs": n, "exact_s": round(e, 3)}
            for d, n, e, _ in results
        ],
        "settings": len(order),
        "best_recall": [
            max(r for r, _ in by.values()) for _, _, _, by in results
        ],
        "md": args.md,
    }))


if __name__ == "__main__":
    main()
