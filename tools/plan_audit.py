"""Physical-plan audit: regenerates PLANS.md from live `.explain` output.

For each headline query this captures the formatted physical plan at
$SPARK_GRAFT_SF_DIR and distills the scale-relevant evidence — scan
pushdown (PushedFilters / ReadSchema), join strategies, exchange
(shuffle) count, whole-stage-codegen span count, and the top-k /
aggregate physical operators — next to a one-line statement of what the
plan is SUPPOSED to look like.  Run after any planner-relevant change:

    python tools/plan_audit.py        # rewrites PLANS.md

The assertions that would FAIL the build on a plan regression live in
tests/test_plan_shape.py; this file is the human-readable audit trail.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pulsar_sync_java_spark.queries import all_queries
from pulsar_sync_java_spark.session import get_spark

# query -> what the plan must show, as a short contract line
EXPECT = {
    "q_scan_project": "projection prunes the scan: ReadSchema carries only the 4 used columns",
    "q_filter_predicate": "compound predicate reaches parquet: PushedFilters non-empty",
    "q_join_broadcast": "dims broadcast: 2x BroadcastHashJoin, zero shuffle exchanges for the dims",
    "q_join_sortmerge": "two facts: SortMergeJoin (AQE may flip to broadcast at this sf), agg partial+final",
    "q_anti_join": "BroadcastHashJoin LeftAnti (filtered right side broadcasts)",
    "q_asof_join": "union+window as-of: ONE shuffle for the window, no range-join explosion",
    "q_groupby_agg": "partial HashAggregate under the exchange, final above it",
    "q_topk": "TakeOrderedAndProject, no global Sort",
    "q_window_rank": "rank<=3 group-limit pushed below the full window sort (WindowGroupLimit)",
    "q_cursor_translate": "flagship composition: sampling window + as-of + project, bounded exchanges",
    "q_minhash_lsh": "sketch: ArrowEvalPython kernels; shuffles carry only (band,bucket,id) keys, signatures join back on the tiny pair set",
    "q_partition_expand": "Generate (explode) with no shuffle at all",
    "q_repetition_ratio": "pure projection: zero exchanges, all array expressions inside the scan stage",
    "q_contamination": "bench shingles broadcast (BroadcastHashJoin); the training corpus is never shuffled before the per-doc aggregate",
    "q_pack_sequences": "one shuffle (partitionBy lang) feeding the running-sum Window; no global sort",
    "q_window_sliding": "hopping window = Expand (4 rows/event) into ONE partial+final aggregate, single exchange",
    "q_cross_join": "BroadcastNestedLoopJoin over broadcast dims; no CartesianProduct",
    "q_mix_budget": "one shuffle (partitionBy lang) into the running-sum Window + budget filter",
    "q_boilerplate": "one inverted-index shuffle for doc frequencies; boilerplate set joins back via broadcast",
    "q_embedding_neardup": "one persisted signature projection feeds banded bucketing + both join-backs (3x InMemoryTableScan); candidates from collect_list bucket agg; join-backs broadcast the tiny pair set",
    "q_ann_ivf_topk": "ArrowEvalPython cluster assignment (never BatchEvalPython), IN-filter probe, TakeOrderedAndProject top-k — no join, no global sort",
    "q_join_salted": "hot-key set broadcast to both branches (BroadcastHashJoin LeftSemi/LeftAnti); salt expansion is a Generate on the build side",
    "q_knn_join": "queries broadcast (BroadcastNestedLoopJoin BuildRight); MapInPandas partition-local top-k BEFORE the single hashpartitioning(query_id) ranking shuffle",
    "q_dedup_cluster": "contracted forest read from cache (InMemoryTableScan); contraction kernels MapInPandas; label resolution via BroadcastHashJoin only",
    "q_funnel_steps": "3 per-user min-aggregates chained by shrinking joins; type filters pushed to parquet; no window over raw events",
    "q_retention_cohort": "distinct (user, day) + per-user min, plain count after the join — no COUNT(DISTINCT) expand",
    "q_corpus_materialize": "gate filter reads the cached feature table (InMemoryTableScan), never re-evaluating the tokenizer; one shuffle for the dedup window",
}

_SECTION = """\
## {name}

**Contract:** {expect}

- exchanges (shuffles): **{n_exchange}**; broadcast exchanges: {n_bcast}; Python/Arrow stages: {n_arrow}
- joins: {joins}
- physical highlights:
{highlights}
"""


def _fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _highlights(plan: str) -> list[str]:
    keep = (
        "PushedFilters", "ReadSchema", "TakeOrderedAndProject",
        "WindowGroupLimit", "Generate ", "HashAggregate", "SortMergeJoin",
        "BroadcastHashJoin", "BroadcastNestedLoopJoin", "ArrowEvalPython",
        "MapInPandas", "Window ",
    )
    out: list[str] = []
    for line in plan.splitlines():
        s = line.strip()
        if any(k in s for k in keep):
            s = re.sub(r"file:[^\]\s,]+", "file:...", s)
            s = s if len(s) <= 150 else s[:147] + "..."
            if s not in out:
                out.append(s)
    return out[:14]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-audit")
    qs = all_queries()
    sections = []
    for name, expect in EXPECT.items():
        plan = _fmt_plan(qs[name](spark, sf_dir))
        joins = sorted(
            {
                m
                for m in re.findall(
                    r"(SortMergeJoin \w+|BroadcastHashJoin \w+|"
                    r"BroadcastNestedLoopJoin \w+|ShuffledHashJoin \w+)",
                    plan,
                )
            }
        )
        sections.append(
            _SECTION.format(
                name=name,
                expect=expect,
                n_exchange=len(re.findall(r"\(\d+\) Exchange\b", plan)),
                n_bcast=len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)),
                n_arrow=len(re.findall(r"ArrowEvalPython|MapInPandas|BatchEvalPython", plan)),
                joins=", ".join(joins) if joins else "none",
                highlights="\n".join(f"  - `{h}`" for h in _highlights(plan)),
            )
        )
    body = (
        "# PLANS — physical-plan audit of the headline queries\n\n"
        f"Generated by `tools/plan_audit.py` against `{sf_dir}` "
        "(regenerate after planner-relevant changes; the hard assertions "
        "live in `tests/test_plan_shape.py`).  Each section states the "
        "plan contract and the distilled `.explain(\"formatted\")` "
        "evidence.\n\n" + "\n".join(sections)
    )
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(body)
    print(f"wrote PLANS.md ({len(sections)} sections)")


if __name__ == "__main__":
    main()
