"""ANN quality evaluation harness: recall@k and latency for the three
approximate tiers vs exact brute-force top-k, swept across their
accuracy knobs. Writes a markdown table (default ANN_EVAL.md).

The ○-status ANN bench entries prove plumbing and plan shape; this
harness is the QUALITY evidence: mean recall@10 over a panel of query
anchors (single-anchor recall is too noisy to pin), per setting, with
the wall time of the probe. The committed table is the tuning guide a
user reads to pick num_planes/probe_hamming/nprobe; the pinned floors
live in tests/test_dedup_similarity.py::test_ann_recall_floors_panel.

Usage: python tools/ann_eval.py [sf_dir] [--anchors 16] [--k 10]
       [--md ANN_EVAL.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_lakehouse_spark.catalog import Catalog  # noqa: E402
from data_lakehouse_spark.operators import similarity  # noqa: E402
from data_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--anchors", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--md", default="ANN_EVAL.md")
    args = ap.parse_args()

    spark = get_spark("ann-eval")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet").cache()
    n_vecs = emb.count()
    anchors = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(args.anchors).collect()
    ]
    exact_sets = {}
    for aid, qv in anchors:
        exact_sets[aid] = {
            r["vec_id"]
            for r in similarity.cosine_topk(emb, qv, k=args.k)
            .select("vec_id").collect()
        }

    import tempfile

    cat = Catalog(spark, os.path.join(tempfile.mkdtemp(), "annidx"))

    def panel(fn) -> tuple[float, float]:
        """(mean recall@k, mean probe seconds) over the anchor panel."""
        recalls, secs = [], []
        for aid, qv in anchors:
            t0 = time.time()
            got = {
                r["vec_id"]
                for r in fn(qv).select("vec_id").collect()
            }
            secs.append(time.time() - t0)
            e = exact_sets[aid]
            recalls.append(len(got & e) / max(len(e), 1))
        return (
            sum(recalls) / len(recalls),
            sum(secs) / len(secs),
        )

    rows = []

    for planes in (6, 8, 10):
        for ph in (0, 1, 2):
            r, s = panel(
                lambda qv: similarity.ann_lsh_topk(
                    emb, qv, k=args.k, num_planes=planes, probe_hamming=ph
                )
            )
            rows.append(("lsh", f"planes={planes} probe={ph}", r, s))
            print(f"lsh planes={planes} probe={ph}: recall {r:.2f} "
                  f"{s:.2f}s", file=sys.stderr)

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
                emb, qv, k=args.k, num_planes=planes,
                n_probe=n_probe, num_tables=ntab,
            )
        )
        rows.append(
            ("lsh-mp", f"planes={planes} n_probe={n_probe} L={ntab}", r, s)
        )
        print(
            f"lsh-mp planes={planes} n_probe={n_probe} L={ntab}: "
            f"recall {r:.2f} {s:.2f}s",
            file=sys.stderr,
        )

    for planes in (4, 6, 8):
        for ph in (1, 2):
            r, s = panel(
                lambda qv: similarity.ann_ivf_topk(
                    emb, qv, k=args.k, num_planes=planes, probe_hamming=ph
                )
            )
            rows.append(("ivf", f"planes={planes} probe={ph}", r, s))
            print(f"ivf planes={planes} probe={ph}: recall {r:.2f} "
                  f"{s:.2f}s", file=sys.stderr)

    similarity.build_kmeans_ivf_index(cat, emb, "kivf", k=8, seed=7)
    for nprobe in (1, 2, 3, 4, 8):
        r, s = panel(
            lambda qv: similarity.ann_kmeans_ivf_topk(
                cat, "kivf", qv, k=args.k, nprobe=nprobe
            )
        )
        rows.append(("kmeans-ivf", f"cells=8 nprobe={nprobe}", r, s))
        print(f"kmeans-ivf nprobe={nprobe}: recall {r:.2f} {s:.2f}s",
              file=sys.stderr)

    # IVF-PQ (FAISS IVFx,PQ8 shape): code-only index + ADC; with and
    # without the exact refine stage
    similarity.build_ivf_pq_index(cat, emb, "pq", k=16, m=8, nbits=8)
    for nprobe in (2, 4, 6):
        r, s = panel(
            lambda qv: similarity.ann_ivf_pq_topk(
                cat, "pq", qv, k=args.k, nprobe=nprobe
            )
        )
        rows.append(("ivf-pq", f"m=8 nbits=8 nprobe={nprobe} adc", r, s))
        print(f"ivf-pq nprobe={nprobe} adc: recall {r:.2f} {s:.2f}s",
              file=sys.stderr)
        r, s = panel(
            lambda qv: similarity.ann_ivf_pq_topk(
                cat, "pq", qv, k=args.k, nprobe=nprobe,
                refine_with=emb, refine_factor=8,
            )
        )
        rows.append(
            ("ivf-pq", f"m=8 nbits=8 nprobe={nprobe} refine=8", r, s)
        )
        print(f"ivf-pq nprobe={nprobe} refined: recall {r:.2f} {s:.2f}s",
              file=sys.stderr)

    t0 = time.time()
    for aid, qv in anchors:
        similarity.cosine_topk(emb, qv, k=args.k).collect()
    exact_s = (time.time() - t0) / len(anchors)

    lines = [
        "# ANN quality evaluation",
        "",
        f"Recall@{args.k} (mean over {len(anchors)} query anchors) vs "
        f"exact brute-force cosine top-{args.k}; {n_vecs} vectors "
        f"({args.sf_dir}). Exact scan baseline: {exact_s:.2f} s/query.",
        "",
        "| tier | setting | recall@10 | probe sec |",
        "|---|---|---|---|",
    ]
    for tier, setting, r, s in rows:
        lines.append(f"| {tier} | {setting} | {r:.2f} | {s:.2f} |")
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
        "anchors": len(anchors),
        "k": args.k,
        "settings": len(rows),
        "best_recall": max(r for _, _, r, _ in rows),
        "md": args.md,
    }))


if __name__ == "__main__":
    main()
