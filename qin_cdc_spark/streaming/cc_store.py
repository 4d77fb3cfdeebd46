"""Incrementally-maintained connected components (dup-cluster labels).

``dedup_cluster_cc`` resolves near-dup PAIRS into clusters with one
label-propagation pass — correct, but a per-batch recompute over the
whole pair graph.  At 100 TB the near-dup store already yields pairs
incrementally (streaming/neardup_store.py); what is missing is keeping
the CLUSTER ASSIGNMENT current as documents arrive and leave.  That is
textbook incremental graph maintenance, and the exact cost bound it
admits is "touched components": an edge addition can only merge the
components of its endpoints; a document removal can only split the
component it lived in.  ``IncrementalClusterStore`` realises that
bound with three composed engine stores:

* **adjacency** — each undirected edge stored twice as (node, peer)
  rows in a ``VersionedBucketedTable`` keyed (node, peer) but BUCKETED
  by node: "edges incident to X" is a bucket-pruned read (needed to
  erase a removed document's edges and to re-solve its component);
* **labels** — (node → label) keyed/bucketed by node, label = min node
  id in the component (deterministic, SQL-recomputable);
* **members** — a ``GlobalSecondaryIndex`` on the label column,
  maintained from the label store's own CDF: "all nodes of component
  L" is a bucket-pruned lookup, which is what makes the affected
  SUBGRAPH readable without a labels scan (and label MOVES — the
  normal outcome of every merge/split — are exactly the index-move
  case the GSI handles).

Per batch: affected labels = labels of the batch's endpoints and
removed nodes (bucket-pruned read; the label set stays a DATAFRAME —
the members probe is ``GlobalSecondaryIndex.lookup_df``, so the driver
collects only distinct BUCKET ids, ≤ n_buckets at ANY touched-component
count); members and their edges load via the index and adjacency
buckets; min-label propagation
re-solves ONLY that subgraph (iterations = its diameter, localCheckpoint
per round); the three stores merge with the shared batch guard.  Nodes
left edgeless (their last edge or neighbour removed) drop their label
row — membership in the store means "participates in some cluster".

Replay safety: every store no-ops on a redelivered ``batch_id``; a
crash between the three merges replays into whichever guards have not
advanced, and the relabel is a pure function of (adjacency ∪ batch
edges − removed) restricted to the affected components, so the retry
converges to the same state.  Singletons are implicit, so corpus size
never enters any step.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from qin_cdc_spark.streaming.gsi import GlobalSecondaryIndex
from qin_cdc_spark.streaming.versioned import VersionedBucketedTable


class IncrementalClusterStore:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        n_buckets: int = 32,
    ):
        self.spark = spark
        self.adj = VersionedBucketedTable(
            spark, f"{path}/adj", ["node", "peer"],
            n_buckets=n_buckets, bucket_cols=["node"],
        )
        self.labels = VersionedBucketedTable(
            spark, f"{path}/labels", ["node"], n_buckets=n_buckets
        )
        self.members = GlobalSecondaryIndex(
            spark, f"{path}/members", index_col="label", pk_cols=["node"],
            n_buckets=n_buckets,
        )

    def applied_batch(self) -> int:
        return self.labels.last_batch_id()

    def read(self) -> DataFrame | None:
        """(node, label) for every node currently in some cluster."""
        return self.labels.read()

    # -- helpers ---------------------------------------------------------------

    def _buckets_of_nodes(self, nodes: DataFrame, store) -> list[str]:
        man = store._meta()["versions"].get(
            str(store.current_version()), {"buckets": {}}
        )
        nb = store._manifest_n_buckets(man)
        # the bucket index must come from F.hash over the SAME node type
        # the writers hashed (the read_key type-alignment guard): cast
        # the batch's node values to the STORED key type before hashing,
        # else an int32/string batch hashes into the wrong buckets and
        # silently misses stored rows
        st = store.read_internal()
        if st is not None:
            stored_t = st.schema["node"].dataType
            nodes = nodes.select(F.col("node").cast(stored_t).alias("node"))
        return [
            str(r[0])
            for r in nodes.select(store._bucket_expr(nb).alias("_b"))
            .distinct()
            .collect()
        ]

    def _rows_of_nodes(self, nodes: DataFrame, store) -> DataFrame | None:
        """Visible rows of ``store`` for exactly these nodes —
        manifest-pruned to the buckets the nodes hash into."""
        buckets = self._buckets_of_nodes(nodes, store)
        rows = store.read_buckets(buckets) if buckets else None
        if rows is None:
            return None
        return rows.join(nodes, "node", "left_semi")

    # Affected subgraphs above this node count solve with the
    # distributed propagation loop; at or below it, a driver union-find
    # (bounded collect, ~16 bytes/node) replaces the loop's ~3 Spark
    # actions PER ITERATION with two collects (OPTIMIZATION_r11, guide
    # §1 per-action cost: each tiny action costs ~0.3-0.7 s of
    # planning/py4j overhead, and the store BOUNDS touched components
    # by design — "O(size of the touched components), never the graph").
    DRIVER_CC_MAX_NODES = 100_000
    DRIVER_CC_MAX_EDGES = 1_000_000

    def _solve_cc(self, nodes: DataFrame, edges: DataFrame) -> DataFrame:
        """Exact min-label connected components over the (small)
        affected subgraph; ``edges`` is symmetric (node, peer).  Small
        subgraphs solve driver-side (union-find; identical min-label
        result — UTF-8 byte order equals code-point order, so Python
        min on strings matches Spark's); oversized ones fall back to
        the distributed propagation loop."""
        head = nodes.limit(self.DRIVER_CC_MAX_NODES + 1).collect()
        if len(head) <= self.DRIVER_CC_MAX_NODES:
            erows = edges.select("node", "peer").limit(
                self.DRIVER_CC_MAX_EDGES + 1
            ).collect()
            if len(erows) <= self.DRIVER_CC_MAX_EDGES:
                parent: dict = {r[0]: r[0] for r in head}

                def find(x):
                    root = x
                    while parent[root] != root:
                        root = parent[root]
                    while parent[x] != root:
                        parent[x], x = root, parent[x]
                    return root

                for a, b in erows:
                    if a in parent and b in parent:
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[ra] = rb
                label: dict = {}
                for n in parent:
                    r = find(n)
                    if r not in label or n < label[r]:
                        label[r] = n
                from pyspark.sql.types import StructField, StructType

                node_f = nodes.schema["node"]
                schema = StructType(
                    [
                        StructField("node", node_f.dataType),
                        StructField("label", node_f.dataType),
                    ]
                )
                return self.spark.createDataFrame(
                    [(n, label[find(n)]) for n in parent], schema
                )
        return self._solve_cc_distributed(nodes, edges)

    @staticmethod
    def _solve_cc_distributed(nodes: DataFrame, edges: DataFrame) -> DataFrame:
        """Distributed min-label propagation — the at-scale path for
        components too large to collect."""
        lab = nodes.select("node", F.col("node").alias("label"))
        while True:
            lab = lab.localCheckpoint()  # truncate iteration lineage
            nbr = (
                edges.join(lab.withColumnRenamed("node", "peer"), "peer")
                .groupBy("node")
                .agg(F.min("label").alias("nlabel"))
            )
            new = (
                lab.join(nbr, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("label"), F.coalesce("nlabel", F.col("label"))
                    ).alias("label"),
                )
            )
            new = new.localCheckpoint()
            changed = (
                new.alias("n")
                .join(lab.alias("o"), "node")
                .filter(F.col("n.label") != F.col("o.label"))
                .limit(1)
                .count()
            )
            lab = new
            if changed == 0:
                return lab

    # -- maintenance -------------------------------------------------------------

    def apply_batch(
        self,
        new_pairs: DataFrame | None,
        removed_nodes: DataFrame | None = None,
        *,
        batch_id: int | None = None,
    ) -> None:
        """Fold a batch of near-dup pairs (columns a, b) and/or removed
        documents (column node) into the cluster assignment.  Removals
        win over same-batch additions (a purged doc contributes no
        edges).  Cost: O(size of the touched components), never the
        graph."""
        if batch_id is not None and batch_id <= self.applied_batch():
            # labels are the last VersionedBucketedTable to merge — if
            # their guard advanced, adjacency+labels landed.  The member
            # index refreshes from the label store's CDF, so a crash
            # between the label merge and the index refresh heals here.
            self.members.refresh(self.labels)
            return
        if new_pairs is None and removed_nodes is None:
            return
        # node type follows the DATA (string/int32 doc ids work), with
        # the stored labels schema winning once the store exists — a
        # hardcoded `node long` empty frame would union-error on string
        # ids and mis-hash int32 ids
        import pyspark.sql.types as T

        stored = self.labels.read_internal()
        if stored is not None:
            node_t = stored.schema["node"].dataType
        elif removed_nodes is not None:
            node_t = removed_nodes.schema[removed_nodes.columns[0]].dataType
        else:
            node_t = new_pairs.schema["a"].dataType
        empty = self.spark.createDataFrame(
            [], T.StructType([T.StructField("node", node_t)])
        )
        rm = (
            removed_nodes.select(
                F.col(removed_nodes.columns[0]).cast(node_t).alias("node")
            )
            .distinct()
            if removed_nodes is not None
            else empty
        )
        if new_pairs is not None:
            p = new_pairs.select(
                F.least(F.col("a").cast(node_t), F.col("b").cast(node_t)).alias("a"),
                F.greatest(F.col("a").cast(node_t), F.col("b").cast(node_t)).alias("b"),
            ).filter(F.col("a") != F.col("b")).distinct()
            # removals win over same-batch additions
            p = (
                p.join(rm.withColumnRenamed("node", "a"), "a", "left_anti")
                .join(rm.withColumnRenamed("node", "b"), "b", "left_anti")
            )
            add_sym = p.select(F.col("a").alias("node"), F.col("b").alias("peer")).unionByName(
                p.select(F.col("b").alias("node"), F.col("a").alias("peer"))
            )
        else:
            add_sym = empty.withColumn("peer", F.col("node")).limit(0)
        add_sym = add_sym.persist()
        rm = rm.persist()
        try:
            touched0 = add_sym.select("node").unionByName(rm).distinct()
            # labels of the touched nodes → affected component set; the
            # label set stays a DataFrame and probes the members index
            # with lookup_df: the driver collects distinct BUCKET ids
            # only (≤ n_buckets at ANY touched-component count), the
            # read opens ONLY the affected labels' buckets, and
            # membership resolves as a left-semi join inside the scan —
            # one path, bounded by the affected components' storage,
            # with no driver-side label-list cap to overflow
            lab0 = self._rows_of_nodes(touched0, self.labels)
            mem = (
                self.members.lookup_df(lab0.select("label").distinct())
                if lab0 is not None
                else None
            )
            scope = touched0 if mem is None else touched0.unionByName(
                mem.select("node")
            ).distinct()
            scope = scope.persist()
            # adjacency restricted to the scope, minus removed nodes'
            # edges (both directions — the symmetric rows of a removed
            # node's peers are inside the scope by construction)
            old_edges = self._rows_of_nodes(scope, self.adj)
            if old_edges is None:
                old_edges = add_sym.limit(0)
            else:
                old_edges = old_edges.select("node", "peer")
            live_edges = (
                old_edges.unionByName(add_sym)
                .join(rm, "node", "left_anti")
                .join(rm.withColumnRenamed("node", "peer"), "peer", "left_anti")
                .distinct()
                .persist()
            )
            solve_nodes = live_edges.select("node").distinct()
            solved = self._solve_cc(solve_nodes, live_edges)

            # -- write back (order matters only for the replay guard:
            # labels merge LAST, so applied_batch() == fully landed) --
            seq = (self.adj.current_version() + 1) * 2
            # adjacency: removed nodes' incident rows (both directions)
            doomed_adj = (
                old_edges.join(rm, "node", "left_semi")
                .unionByName(
                    old_edges.join(
                        rm.withColumnRenamed("node", "peer"), "peer", "left_semi"
                    )
                )
                .distinct()
                .select(
                    F.lit("delete").alias("op"), F.lit(seq).cast("long").alias("seq"),
                    "node", "peer",
                )
            )
            new_adj = add_sym.select(
                F.lit("upsert").alias("op"), F.lit(seq).cast("long").alias("seq"),
                "node", "peer",
            )
            self.adj.merge(new_adj.unionByName(doomed_adj), batch_id=batch_id)

            # labels: every scoped node gets its solved label; scoped
            # nodes that ended up EDGELESS (and removed nodes) drop out
            lseq = (self.labels.current_version() + 1) * 2
            gone = (
                scope.join(solve_nodes, "node", "left_anti")
                .unionByName(rm)
                .distinct()
                .select(
                    F.lit("delete").alias("op"),
                    F.lit(lseq).cast("long").alias("seq"),
                    "node",
                    F.lit(None).cast(node_t).alias("label"),
                )
            )
            kept = solved.select(
                F.lit("upsert").alias("op"),
                F.lit(lseq).cast("long").alias("seq"),
                "node",
                F.col("label").cast(node_t).alias("label"),
            )
            self.labels.merge(kept.unionByName(gone), batch_id=batch_id)
            # member index follows the label store's own change feed
            self.members.refresh(self.labels)
            scope.unpersist()
            live_edges.unpersist()
        finally:
            add_sym.unpersist()
            rm.unpersist()
