"""Generate PLANS.md: formatted physical plans of the headline
queries, with the properties that matter at scale called out
(broadcast joins, partial aggregation, pushed filters, codegen spans,
absence of cartesian products)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CURATED = [
    "q_exposure_combined",
    "q_availability_ndvi",
    "q_cover_pct",
    "q_accessibility_euclidean",
    "q_knn_parks",  # brute + cells variant union (r5-late merge)
    "q_dedup_neardup",
    "q_embedding_neardup",
    "q_ann_topk",
    "q_ndvi_bands",
    "q_network_subdivision",
    "q_greenspace_shapes",
    "q_viewshed_flat",
    "q_text_profile",
    "q_quality_classifier",
    "q_multimodal_meta",
    "q_line_dedup",
    "q_decontaminate",
    "q_seq_pack",
    "q_substring_dedup",
    "q_pricing_summary",
    "q_pages_snapshot",
    "q_exposure_pages",
    "q_pages_cells",
    # r5 session 5: the AV-union and canonical-url entries
    "q_multimodal_frames",
    "q_domain_stats",
]

def _all_queries():
    """Audit EVERY registry query (round 4): curated ordering first,
    then the remainder alphabetically — the no-BNLJ assertions and
    exemption notes cover the full 50-entry gate surface."""
    from greenexp_r_spark.registry import build_registry
    rest = sorted(set(build_registry()) - set(_CURATED))
    return _CURATED + rest

QUERIES = _all_queries()

# queries whose plan MUST be free of nested-loop/cartesian joins
# (the round-1 all-pairs shapes were re-blocked into equi-joins).
# The accessibility family intentionally keeps a broadcast cross of
# the tiny park dim (candidate generation + map-side min-agg); it is
# size-routed to the cell-index equi-join for large dims
# (accessibility.euclidean_access_auto), so it is exempt here.
NO_BNLJ_REQUIRED = {
    "q_dedup_neardup", "q_embedding_neardup",
    "q_availability_ndvi", "q_cover_pct",
    "q_pages_snapshot", "q_pages_cells",
    # round 4: bbox candidate generation re-blocked into a bucketed
    # equi-join (2km grid key), so the cells side hash-joins
    "q_greenspace_shapes",
}

# deliberate tiny-dim broadcast crosses (documented, size-routed or
# candidate-bounded) — annotated instead of flagged
EXEMPT_NOTE = {
    "q_exposure_combined": "broadcast cross of the 60-row park dim, "
                           "size-routed via euclidean_access_auto",
    "q_accessibility_euclidean": "same broadcast park-dim cross",
    "q_knn_parks": "broadcast park-dim cross on the brute variant "
               "+ the cells variant's exact-fallback slice",
    "q_exposure_pages": "broadcast cross only on the cell-index exact "
                        "fallback slice (points with no indexed park "
                        "within search_radius) against the tiny park "
                        "dim",
    "q_network_subdivision": "range×range cross only inside the "
                             "fixture polyline generator (lattice "
                             "enumeration); the operators themselves "
                             "are equi-join/window only",
    "q_accessibility_cells": "broadcast cross only on the cell-index "
                             "exact fallback slice against the tiny "
                             "park dim (same shape as "
                             "the q_knn_parks cells variant)",
    "q_ann_topk": "query×centroid crosses of the tiny IVF/kmeans "
                  "dims (Lloyd iterations; ~10-row sides)",
    "q_idw": "IDW is ALL-samples-weighted by definition — the cross "
             "is points × the tiny sample-station dim (~40 rows, "
             "broadcast); sf_to_rast.R computes the same dense "
             "weight matrix",
    "q_street_green_cover": "street sample points × the tiny park "
                            "dim (broadcast) before the per-sample "
                            "min-distance aggregate",
    "q_visibility_rows": "tiny broadcast crosses inside the "
                         "visibility observers union (line/polygon "
                         "observer generators against fixture dims); "
                         "the viewshed kernels themselves are "
                         "mapInPandas over the points side only",
}

CHECKS = {
    "BroadcastHashJoin": "small-side broadcast (no shuffle of the big side)",
    "HashAggregate": "partial+final hash aggregation (map-side combine)",
    "WholeStageCodegen": "JVM codegen spans",
}


def main() -> None:
    sf = "/root/testdata/sf0.001"
    from greenexp_r_spark.session import build_session
    from greenexp_r_spark.registry import build_registry

    spark = build_session(app="explain", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    out = ["# PLANS — physical-plan evidence for the headline queries",
           "",
           "Generated by tools/explain_report.py on sf0.001. The scale",
           "properties asserted below are structural (they hold at any",
           "input size; AQE may further coalesce/split at runtime).",
           ""]
    for name in QUERIES:
        df = reg[name].spark(spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree, drop the verbose per-node dumps;
        # cap very deep trees (iterative operators inline their
        # checkpointed lineage) at a readable height
        tree = plan.split("\n\n")[0]
        tlines = tree.splitlines()
        if len(tlines) > 120:
            tree = "\n".join(tlines[:60]
                             + [f"... ({len(tlines) - 60} more plan lines"
                                " — iterative operator, see operator"
                                " docstring for the per-round shape)"])
        flags = [desc for key, desc in CHECKS.items() if key in plan]
        cartesian = "CartesianProduct" in plan or "BroadcastNestedLoop" in plan
        scans = sorted({ln.strip() for ln in plan.splitlines()
                        if "ReadSchema:" in ln or "PushedFilters:" in ln})
        out.append(f"## {name}\n")
        out.append("```\n" + tree.strip() + "\n```\n")
        if scans:
            out.append("Scan evidence (column pruning / filter pushdown):\n")
            out.append("```\n" + "\n".join(scans[:6]) + "\n```\n")
        if cartesian and name in NO_BNLJ_REQUIRED:
            raise AssertionError(
                f"{name}: BroadcastNestedLoop/CartesianProduct in plan — "
                "a re-blocked operator regressed to all-pairs")
        if cartesian and name in EXEMPT_NOTE:
            note = f"; tiny-dim cross (exempt): {EXEMPT_NOTE[name]}"
        elif cartesian:
            note = "; ⚠ nested-loop/cartesian present"
        else:
            note = "; no cartesian/nested-loop joins"
        out.append("Properties: " + "; ".join(flags) + note + "\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
