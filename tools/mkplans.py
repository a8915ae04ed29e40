#!/usr/bin/env python3
"""Rebuild PLANS.md from `sbt "runMain graft.Plans"` output.

Usage: python3 tools/mkplans.py /tmp/plans_raw.txt > PLANS.md

Keeps each section's one-line header comment from the existing PLANS.md
(matched by query name); new queries need an entry in NEW_HEADERS below.
"""
import re
import sys

RAW = sys.argv[1]
OLD = "PLANS.md"

NEW_HEADERS = {
    "st_incremental_ann_ivf":
        "ST28 batch twin: the trained-cell directional pair join "
        "(home cell of the earlier vector among the later arrival's "
        "probed cells) reduced to arrival-order verdicts, left-joined "
        "over the corpus (round 19; dumped round 20)",
    "sim_knn_graph_recall":
        "kNN-graph recall audit: one prepared corpus threaded through "
        "nine checkpointed builds, a driver-collected panel truth "
        "re-broadcast as a local relation, per-build left-semi hit "
        "joins unioned over the in-plan truth denominators (round 20)",
    "sim_knn_graph_ivf_hier":
        "hierarchical-k-means bounded-load kNN graph: the V24 serving "
        "tail over the TRAINED fine table (per-coarse grouped Lloyd, "
        "checkpointed away) — zero-shuffle compiled two-level "
        "assignment, packed (coarse<<32)+fine cell ids, shared "
        "within-probed-cell candidate join and pruned top-k rollup "
        "(round 20)",
    "sim_knn_graph_hier_fine_round":
        "one grouped fine-Lloyd round (un-materialized): broadcast "
        "per-coarse sub-quantizer argmin assignment within the home "
        "coarse cell, slim exploded (c2, f, idx, decimal) mean update "
        "with map-side partials, dense per-coarse re-index window "
        "(round 20)",
    "sim_knn_graph_ivf_scaled":
        "trained-coarse bounded-load IVF-cell kNN graph: zero-shuffle "
        "compiled two-level assignment (pq_argmin_k over the trained "
        "coarse array, LEFT broadcast sub-quantizer joins per coarse "
        "rank), shared within-probed-cell candidate join and pruned "
        "top-k rollup (round 20)",
    "sim_knn_graph_nnd_round":
        "one NN-Descent refinement round (un-materialized): K'-capped "
        "undirected adjacency with vectors riding it, co-neighbor "
        "self-join on the shared endpoint scoring cosines in-task, "
        "slim max-dedup union with incumbents, one pruned top-K' "
        "re-rank (round 20)",
    "sim_knn_graph_ivf":
        "IVF-cell kNN graph: zero-shuffle broadcast-argmin cell pass "
        "(pq_argmin_k over ~K hash-residue-sampled centroids), ONE "
        "within-probed-cell candidate equi-join (no dedup stage), one "
        "WindowGroupLimit-pruned top-k rollup (round 19)",
    "sim_knn_graph_ivf_kmeans":
        "Lloyd-trained-cell kNN graph: the shared trained quantizer "
        "(hash-residue init, 3 Lloyd rounds) feeding the same "
        "cell-graph serving tail as sim_knn_graph_ivf (round 19)",
    "st_incremental_ann_auto":
        "ST27b batch twin at the scale-safe substrate: the auto-width "
        "sign-LSH pair join (bits derived in-plan) reduced to "
        "arrival-order verdicts, left-joined over the corpus (round 18)",
    "sim_lsh_topk_auto":
        "bounded-cost auto-width serving LSH: 1-row broadcast width "
        "scalar, 4 per-table bucket equi-joins over one shared corpus, "
        "multi-table hits collapsed by a (query, neighbor) max before "
        "one WindowGroupLimit-pruned top-k rollup (round 18)",
    "st_incremental_ann":
        "ST27 batch twin: the scaled-width sign-LSH pair join reduced "
        "to arrival-order verdicts (min earlier ball-mate per vector), "
        "left-joined over the corpus (round 17)",
    "sim_ivf_topk_auto":
        "count-derived IVF serving: 1-row broadcast width scalar "
        "(K=ceil(sqrt n), nprobe=ceil(sqrt K)), broadcast centroid "
        "argmin, equi-join candidate restriction, one "
        "WindowGroupLimit-pruned top-k rollup (round 17)",
    "sim_ivf_kmeans_topk_auto":
        "Lloyd-trained IVF at the count-derived K: k-agnostic training "
        "rounds over a count-thresholded init set, serving identical "
        "to the fixed-K row with nprobe a column (round 17)",
    "sim_index_recall":
        "recall@k audit: exact truth for the 5-query panel only (one "
        "broadcast-query corpus scan, the shared brute-force builder), "
        "left-semi hit join against each index's own top-k (fixed IVF, "
        "auto IVF, sign-LSH), full scaffold left join (round 17b)",
    "mm_resize_plan":
        "letterbox resize geometry: zero-shuffle narrow pass over the "
        "stub-decoded dims (major axis pinned to 224, minor floored, "
        "centered pads) pipelined into the documents scan (round 17b)",
    "sim_kmeans":
        "Lloyd iterations with broadcast centroids: assignment is a "
        "zero-shuffle narrow pass, ONE (cluster) rollup per iteration "
        "(round 11b)",
    "sim_ivf_kmeans_topk":
        "trained-quantizer IVF serving path: broadcast codebook "
        "assignment, cell equi-join candidate restriction, single "
        "top-k rollup (round 11c)",
    "graph_butterflies_capped":
        "degree-capped wedge join: the per-supplier rank compiles to "
        "WindowGroupLimit (map tasks forward at most cap rows per "
        "supplier), then the bounded capped⋈capped self-join — "
        "node-linear where the exact form is hub-quadratic (round 15)",
    "graph_label_prop_partitioned_round":
        "one bcast=false LPA round: label side shuffle-hash-joins into "
        "the persisted HashPartitioning(src) edge cache — zero "
        "edge-side re-exchange, no node-sized broadcast (round 15)",
    "pipe_ccnet_buckets_sketch":
        "quantile-sketch CCNet cutoffs: map-side "
        "partial_quantilesketchagg (each partition ships <= k rows per "
        "language), broadcast cutoffs, narrow bucket pass (round 15)",
    "graph_triangles":
        "degree-ordered triangle count: oriented edges persisted "
        "hash-partitioned on src (zero-exchange wedge self-join), "
        "closure = shuffle-hash inner join feeding a partial count, "
        "n_wedges/max_outdeg off ONE map-side rollup — orientation "
        "bounds any task's wedge fan-out at O(sqrt m) (round 15b)",
    "pipe_priority_sample":
        "priority sampling: per-language rank compiles to "
        "WindowGroupLimit (map tasks forward <= k+1 rows per language), "
        "tau from the same pass, broadcast-tau estimate join "
        "(round 15b)",
    "graph_triangles_partitioned":
        "no-node-broadcast twin: both degree joins ShuffledHashJoin on "
        "the edge endpoints (hint-pinned), wedge pipeline unchanged "
        "(round 15b)",
    "graph_clustering_coeff":
        "per-node LCC: closed wedges attributed to their 3 nodes "
        "(explode + one count shuffle bounded by the triangle total), "
        "DECIMAL(28,9) order-independent avg (round 15b)",
    "pipe_distinct_kmv":
        "KMV distinct sketch: map-side partial_kmvdistinctagg caps "
        "each partition at k tags per group — the user space never "
        "shuffles (round 15b)",
    "pipe_kmv_overlap":
        "KMV set algebra: per-year sketch rollup, then the pairwise "
        "overlap on a |years|^2-row self-join with codegen'd array "
        "built-ins (round 15b)",
    "pipe_count_min":
        "Count-Min sketch: map-side partial_cmsketchagg (one 128-cell "
        "matrix per language per partition), estimates via broadcast "
        "sketch join (round 15b)",
    "pipe_f2_ams":
        "AMS F2 sketch: map-side partial_amssketchagg (60 signed "
        "counters per language per partition) next to the exact "
        "vocabulary rollup it estimates (round 15b)",
    "graph_degree_hist":
        "log2-binned degree profile: one degree rollup + a <=64-bucket "
        "aggregate — the hub diagnostic ahead of every wedge/rank job "
        "(round 15b)",
    "graph_kcore_partitioned_peel":
        "one co-partitioned k-core peel: survivors shuffle-hash into "
        "the checkpointed HashPartitioning(src) edge layout (zero "
        "edge-side re-exchange), surviving-source counts roll up "
        "map-side per dst (round 16)",
    "graph_triangles_capped":
        "ID-oriented degree-capped triangles: the per-node rank "
        "compiles to WindowGroupLimit (map tasks forward <= cap rows "
        "per node), capped set checkpointed hash-partitioned on src "
        "for the zero-exchange wedge self-join (round 16)",
    "sim_knn_graph_auto":
        "auto-width kNN: 1-row broadcast width scalar (bits = "
        "clamp(bitlen(n-1), 8, 18)), masked-signature buckets, "
        "runtime-length multiprobe explode, shuffle-hash candidate "
        "join (round 16)",
}

# name -> existing "## name — comment" line
old_headers = {}
with open(OLD) as f:
    for line in f:
        m = re.match(r"^## (\S+) — (.*)$", line.rstrip("\n"))
        if m:
            old_headers[m.group(1)] = m.group(2)

# parse raw Plans output into (name, plan_text) preserving order
sections = []
name, buf = None, []
plan_line = re.compile(r"^===== (\S+) =====$")
with open(RAW) as f:
    for line in f:
        line = line.rstrip("\n")
        # sbt prefixes stdout with "[info] " in batch mode
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        elif line.startswith("[info]"):
            line = line[len("[info]"):]
        m = plan_line.match(line)
        if m:
            if name:
                sections.append((name, buf))
            name, buf = m.group(1), []
        elif name is not None:
            buf.append(line)
if name:
    sections.append((name, buf))

if not sections:
    sys.exit("no '===== name =====' sections found in " + RAW)

out = [
    "# PLANS — final physical plans of the flagship queries (sf0.001, AQE final)",
    "",
    'Regenerate with `sbt "runMain graft.Plans" > /tmp/plans_raw.txt && '
    "python3 tools/mkplans.py /tmp/plans_raw.txt > PLANS.md` after "
    "plan-affecting changes.",
    "",
]
for qname, lines in sections:
    # NEW_HEADERS wins: an updated entry must override the stale
    # header carried in the existing PLANS.md
    hdr = NEW_HEADERS.get(qname) or old_headers.get(qname)
    if hdr is None:
        sys.exit(f"no header comment known for {qname} — add to NEW_HEADERS")
    # trim trailing blank lines
    while lines and not lines[-1].strip():
        lines.pop()
    while lines and not lines[0].strip():
        lines.pop(0)
    out.append(f"## {qname} — {hdr}")
    out.append("")
    out.append("```")
    out.extend(lines)
    out.append("```")
    out.append("")

print("\n".join(out))
