"""Regenerate PLANS.md: annotated formatted physical plans of flagship
queries. Usage: python tools/dump_plans.py [sf_dir]"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: query -> the scale property the plan is meant to prove.
PICKS = {
    "latest_version_dedup": (
        "Flagship dedup: max_by partial aggregation — one shuffle of one "
        "record per (key, partition), not every version (the reference "
        "shuffled all versions)."
    ),
    "join_star_revenue": (
        "Star join: every dimension broadcast; single shuffle on the fact "
        "grain for the final aggregate."
    ),
    "ngram_jaccard_pairs": (
        "Near-dup pairs: df-cutoff anti-join bounds fan-out; equi-join on "
        "8-byte shingle keys; NO CartesianProduct/BroadcastNestedLoop "
        "anywhere."
    ),
    "cosine_topk": (
        "Exact ANN baseline: query side broadcast; corpus scanned once, "
        "never shuffled; per-query top-k via window on the joined grain."
    ),
    "sequence_packing": (
        "Distributed prefix-scan packing: both branches read ONE "
        "checkpoint-pinned range layout (sampled boundaries are "
        "execution-specific, so plan-level exchange reuse cannot be "
        "trusted — see distributed_cumsum). The one unpartitioned "
        "Window is on the offsets table (num_partitions rows, broadcast "
        "back); the data-sized cumsum is partitioned on _pid."
    ),
    "chunk_overlap_windows": (
        "RAG chunking: scan → project → explode; zero Exchange operators."
    ),
    "copurchase_pagerank": (
        "Iterative graph op: per-iteration hash joins on node id; edge "
        "derivation materialized once (InMemoryTableScan); final "
        "TakeOrdered, no global sort."
    ),
    "copurchase_triangle_nodes": (
        "Triangles: adjacency-intersection form — no wedge table, "
        "bounded arrays from the degree orientation, broadcast degree "
        "join; no CartesianProduct. The Scan ExistingRDD leaves are the "
        "checkpoint-pinned oriented-edge/adjacency tables of the "
        "broadcast-adjacency path (operators/triangles.py) — lineage is "
        "truncated there on purpose, so the plan shows the join "
        "topology ON those materialized inputs."
    ),
    "user_sessions": (
        "Sessionization: lag + running-sum windows and the session "
        "rollup all ride ONE Exchange on the user key."
    ),
    "semdedup_keep": (
        "SemDeDup: within-cell self equi-join only, no cartesian "
        "pairing. The small-m literal assignment keeps parquet stats "
        "visible, so the candidate join auto-broadcasts; at adaptive m "
        "the kernel paths take over and the join degrades gracefully "
        "to a cell-keyed sort-merge."
    ),
    "brand_price_regression": (
        "Group-wise OLS: sufficient statistics in one partial-agg "
        "shuffle; part dimension broadcast."
    ),
    "linear_classifier_scores": (
        "Classifier application: weight table explicitly broadcast — "
        "the exploded corpus never shuffles on the token key."
    ),
    "decontaminated_count": (
        "Broadcast eval shingle set; train side never shuffles."
    ),
    "bloom_decontaminated_docs": (
        "Sketch-prune decontamination: the Bloom filter rides a "
        "broadcast 1-row relation (BroadcastNestedLoopJoin over a "
        "single-row build side — NOT a data-sized nested loop); clean "
        "grams are dropped in-row before the only explode, and the "
        "exact re-check is a broadcast semi-join of the FPR-sized "
        "sliver."
    ),
    "cms_heavy_hitter_terms": (
        "Count-min heavy hitters: the sketch build aggregates on the "
        "FIXED d×w grid (partial agg, key space independent of "
        "vocabulary); the probe filters occurrences in-row against the "
        "broadcast sketch; only surviving candidates reach the exact "
        "groupBy."
    ),
    "incremental_dedup_matches": (
        "Incremental dedup: the standing corpus is NEVER self-joined — "
        "its band index meets the incoming batch on an equi key, and "
        "the exact-Jaccard confirm joins shingle tables semi-join-"
        "pruned to candidate docs; no CartesianProduct anywhere."
    ),
    "cluster_safe_split": (
        "Leakage-free split: the cluster table joins back on doc_id "
        "(the upstream grouping key); the straddle audit attaches as a "
        "1-row broadcast scalar — the only nested-loop join in the "
        "plan has a single-row build side."
    ),
    "adjacency_matrix_500": (
        "The reference's worst-case LINK query (500 entity filters): "
        "INSET filter before the unit self-join, part dim broadcast, "
        "in-row pair symmetrization (the counts subtree appears ONCE — "
        "a union-with-swap doubled every Exchange), 500-column pivot "
        "as a single agg Exchange on entity_a."
    ),
    "ivfpq_topk": (
        "IVFPQ: one corpus scan assigns the cell AND encodes the PQ "
        "codes (both against broadcast tables); the pruning equi-join "
        "on cell and the top-k window are the only shuffles; probe "
        "pairs and per-query LUTs broadcast."
    ),
    "epoch_shuffle_shards": (
        "Epoch shuffle: rank via range exchange + per-partition local "
        "rank + broadcast offsets — the one unpartitioned Window is "
        "over the partition-count offsets table, never the data."
    ),
    "significant_relation_terms": (
        "ES significant-terms twin: one tokenize pass (fg flag is a "
        "same-row column — no self-join), fg/bg doc frequencies from a "
        "single partial-agg shuffle, 1-row broadcast totals, global "
        "top-25 rewritten to TakeOrderedAndProject."
    ),
    "dsir_selected_docs": (
        "DSIR: one text pass pinned at (doc, bucket) count grain, "
        "64-row broadcast ratio table, dsum per-doc weights, Gumbel "
        "top-k as TakeOrderedAndProject — no vocabulary materialized."
    ),
    "quality_rank_ensemble": (
        "Rank fusion without a global row sort: the only "
        "single-partition windows run over DISTINCT-VALUE tables "
        "(per-value counts), ranks broadcast back to the corpus."
    ),
    "lorenz_customer_deciles": (
        "r13: the retired single-partition ntile — decile cut via the "
        "range-partition prefix scan, cumulative share via a broadcast "
        "triangular join over the pinned 10-row rollup; no window at "
        "all in the final plan."
    ),
    "pareto_front_parts": (
        "r13 skyline: the two running maxima of the sort-based identity "
        "as per-partition RANGE windows over one range exchange, "
        "per-partition maxima prefix-combined and broadcast back — "
        "never a global window, no quadratic."
    ),
    "cdc_duplicate_chunks": (
        "r13 content-defined chunking: the chunker is ONE shuffle-free "
        "array-expression projection; the only shuffle is the dedup "
        "rollup on the chunk id with map-side partial counts."
    ),
    "wordpiece_token_counts": (
        "r13 tokenizer inference: the greedy scan unrolled into named "
        "projection columns on the DISTINCT-WORD grain, broadcast "
        "joined back — the corpus never carries the scan columns."
    ),
    "hard_negative_mining": (
        "Anchors broadcast through a non-equi (label <>) join over one "
        "corpus scan; per-anchor top-10 rank-limit-pushed "
        "(WindowGroupLimit Partial before the exchange)."
    ),
    "association_rules": (
        "r14 rule extraction: NO self-join — per-basket brand sets "
        "(collect_set, bounded) with in-row array pair enumeration, "
        "dimension joins broadcast, rule relation bounded at brands²."
    ),
    "chi2_term_lang": (
        "r14 feature selection: occurrences collapse once to (term, "
        "lang) document frequencies; term totals from that grain; lang "
        "totals + N broadcast; per-lang top-10 in a WindowGroupLimit."
    ),
    "wordpiece_trained_scan": (
        "Trainer/inference composition: 10 training iterations at "
        "vocabulary grain (pair + unigram aggs, 1-row argmax), then the "
        "learned vocab collected (bounded: merges + alphabet) into an "
        "unrolled CASE-chain scan over the DISTINCT-WORD table — "
        "whole-stage codegen, no UDF; per-doc rollup rides one broadcast "
        "join back to word instances."
    ),
    "pmi_collocations": (
        "r14 collocations: count-grain marginal joins with the "
        "min-count floor BEFORE them; global top-25 on the rounded "
        "score is TakeOrderedAndProject, never a global sort."
    ),
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # lazy mode: skip the eager pin() checkpoints so the dumped plans
    # show the real query topology instead of a Scan ExistingRDD stub
    os.environ["SPARK_GRAFT_LAZY_PLANS"] = "1"
    from library_beam_spark import registry
    from library_beam_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = registry.queries()
    out = [
        "# PLANS — formatted physical plans of flagship queries",
        "",
        "Generated from `.explain('formatted')` at sf0.01 (plans are",
        "size-independent; AQE may re-plan shuffles at runtime). Each plan is",
        "annotated with the scale property it is meant to prove. Regenerate:",
        "`python tools/dump_plans.py`.",
        "",
    ]
    for name, note in PICKS.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf).explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md: {len(PICKS)} plans")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
