"""Connected components over near-duplicate pair graphs.

Turns pairwise dedup output (doc_a, doc_b edges from
`operators/dedup.py`) into keep/drop clusters: every node is labeled
with its component's minimum id.  This is the reference's `computeIfAbsent`
memoization shape (SURVEY.md R26) generalized to transitive closure —
and the step every web-scale dedup pipeline runs after candidate
pairing.

Algorithm: **spanning-forest contraction** (the "filtering" scheme of
Kiveris et al., *Connected Components in MapReduce and Beyond*,
ACM SoCC'14 — public paper; same regime as PAPERS.md's MapReduce CC
family).  Each round partitions the edge list arbitrarily and replaces
every partition with a local spanning forest (union-find): connectivity
is exactly preserved (a spanning forest of a union of spanning forests
is a spanning forest of the union graph), while edge count drops to at
most nodes-1 per partition.  Rounds fan in geometrically until the
surviving forest fits a single task, which resolves exact components
and emits (id, min-of-component).

Why not per-round min-label propagation?  Label propagation needs
diameter-many *blocking* rounds, each a join + aggregate + convergence
action — at 100 TB that is dozens of shuffles, and even on small graphs
every round pays full job latency.  Contraction needs O(log P) rounds,
every one a pure transform, so the WHOLE closure is one lazy pipeline:
no per-round action, no persisted intermediates, and the (expensive)
upstream pair generation is evaluated exactly once.

Scale posture (100 TB corpus):
- the edge list after similarity thresholding is orders of magnitude
  smaller than the corpus (it is the duplicate survivors, not the
  documents); the first forest pass runs NARROW inside the producer's
  own reduce stage, so its per-task state is bounded by the producer's
  shuffle-partition sizing;
- each later round is one shuffle carrying only already-contracted
  forest edges (<= nodes-1 per upstream task), shrinking geometrically
  with the `ladder` fan-in;
- the single-task finish sees the contracted sketch of the graph,
  never the raw pair list.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EDGE_SCHEMA = "src bigint, dst bigint"
_LABEL_SCHEMA = "id bigint, label bigint"


class _UnionFind:
    """Path-halving union-find over arbitrary int node ids."""

    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        root = parent.setdefault(x, x)
        while parent[root] != root:
            parent[root] = parent[parent[root]]
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> bool:
        """Merge; True iff a and b were in different trees."""
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[rb] = ra
        return True


def _forest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition spanning forest: keep exactly the edges that merge
    two so-far-disconnected trees (<= nodes-1 of them)."""
    uf = _UnionFind()
    keep_s: list[int] = []
    keep_d: list[int] = []
    for pdf in batches:
        for a, b in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            a, b = int(a), int(b)
            if a == b:
                # a self-loop merges nothing, but the node must survive
                # contraction (it is "in the graph"): keep its first
                # sighting as a singleton marker edge
                if a not in uf.parent:
                    uf.find(a)
                    keep_s.append(a)
                    keep_d.append(a)
            elif uf.union(a, b):
                keep_s.append(a)
                keep_d.append(b)
    yield pd.DataFrame(
        {
            "src": pd.Series(keep_s, dtype="int64"),
            "dst": pd.Series(keep_d, dtype="int64"),
        }
    )


def _label(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Single-task finish: exact components of the surviving forest,
    labeled with the component minimum (deterministic regardless of
    edge order or earlier partitioning)."""
    uf = _UnionFind()
    for pdf in batches:
        for a, b in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            uf.union(int(a), int(b))
    comp_min: dict[int, int] = {}
    roots = {n: uf.find(n) for n in uf.parent}
    for node, root in roots.items():
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    ids = list(roots)
    yield pd.DataFrame(
        {
            "id": pd.Series(ids, dtype="int64"),
            "label": pd.Series(
                [comp_min[roots[n]] for n in ids], dtype="int64"
            ),
        }
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ladder: tuple[int, ...] = (8,),
) -> DataFrame:
    """(id, label) for every node that appears in `edges`, where label =
    the minimum node id of its connected component.  Edges are
    undirected (direction is ignored); isolated nodes never appear
    (callers wanting singleton clusters left-join this onto the node
    table and coalesce label to id).

    Entirely LAZY — no sizing count, no persisted intermediates, so an
    expensive upstream pair pipeline is evaluated exactly once:

    1. a NARROW local-forest pass on the upstream partitioning (runs
       inside the producer's reduce stage at its full parallelism;
       per-task union-find state is bounded by the producer's own
       shuffle-partition sizing);
    2. one contraction round per `ladder` rung — `repartition(p)` (a
       shuffle barrier on PURPOSE: `coalesce` would collapse the
       producer's stage down to p tasks) carrying only already-
       contracted forest edges;
    3. a single-task finish on the final forest.

    `ladder` trades rounds against per-task state: each rung-p task
    holds ~(previous round's total forest)/p edges of union-find state.
    The default one rung suits dup-pair graphs, which are orders of
    magnitude smaller than the corpus; for a 100 TB corpus with a high
    dup rate add rungs (e.g. (512, 32, 4)) so the fan-in per round
    stays bounded.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    e = e.mapInPandas(_forest, schema=_EDGE_SCHEMA)
    for p in ladder:
        e = e.repartition(p).mapInPandas(_forest, schema=_EDGE_SCHEMA)
    return e.repartition(1).mapInPandas(_label, schema=_LABEL_SCHEMA)
