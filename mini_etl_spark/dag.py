"""Multi-source DAG pipelines.

Reference parity (mini_etl/core/dag.py): node types SOURCE/TRANSFORM/SINK/
MERGE/BRANCH (dag.py:20-26), validation + cycle check (dag.py:213-269), Kahn
topological sort (dag.py:271-298), merge strategies CONCAT/JOIN/UNION
(dag.py:56-60), branch conditions (dag.py:63-77).

The execution model is where this deliberately departs: the reference's
``run()`` **fully materializes** every node's output in memory
(``list(extract())``, dag.py:324) — its biggest scale defect. Here each node
builds a *lazy DataFrame*; the whole graph is one Catalyst plan per sink,
with ``persist()`` only on true fan-out nodes. Nothing materializes on the
driver, so a 100 TB DAG behaves like any other Spark job.

Strategy mapping:
- CONCAT ⇒ ``unionByName(allowMissingColumns=True)`` (pandas concat aligns
  by name, missing ⇒ null — dag.py:349-354)
- JOIN   ⇒ pairwise outer equi-join fold on join_keys (dag.py:356-365)
- UNION  ⇒ concat + dropDuplicates — declared in the reference (dag.py:60)
  but never implemented there; implemented properly here
- BRANCH ⇒ two filters off one cached parent (the reference's BRANCH node
  was pass-through only, dag.py:367-374; real routing implemented here)
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark.session import get_spark


class NodeType(Enum):
    SOURCE = "source"
    TRANSFORM = "transform"
    MERGE = "merge"
    BRANCH = "branch"
    SINK = "sink"


class MergeStrategy(Enum):
    CONCAT = "concat"
    JOIN = "join"
    UNION = "union"


@dataclass
class Node:
    name: str
    node_type: NodeType
    func: Any = None                      # source/transform/sink callable
    strategy: MergeStrategy | None = None
    join_keys: list[str] | None = None
    join_how: str = "outer"
    condition: Any = None                 # branch predicate (Column or SQL string)
    metadata: dict = field(default_factory=dict)


class PipelineDAG:
    """Build with ``add_source/add_transform/add_merge/add_branch/add_sink``
    + ``add_edge``; ``run()`` executes one write action per sink."""

    def __init__(self, name: str = "dag", spark: SparkSession | None = None) -> None:
        self.name = name
        self._spark = spark
        self.nodes: dict[str, Node] = {}
        self.edges: dict[str, list[str]] = {}   # node -> downstream nodes
        self.in_edges: dict[str, list[str]] = {}  # node -> upstream nodes (ordered)

    # -- construction --------------------------------------------------------
    def _add(self, node: Node) -> "PipelineDAG":
        if node.name in self.nodes:
            raise ValueError(f"duplicate node name {node.name!r}")
        self.nodes[node.name] = node
        self.edges.setdefault(node.name, [])
        self.in_edges.setdefault(node.name, [])
        return self

    def add_source(self, name: str, source: Callable[[SparkSession], DataFrame] | DataFrame) -> "PipelineDAG":
        if isinstance(source, DataFrame):
            df = source
            source = lambda spark: df  # noqa: E731
        return self._add(Node(name, NodeType.SOURCE, func=source))

    def add_transform(self, name: str, func: Callable[[DataFrame], DataFrame]) -> "PipelineDAG":
        return self._add(Node(name, NodeType.TRANSFORM, func=func))

    def add_merge(
        self,
        name: str,
        strategy: MergeStrategy | str = MergeStrategy.CONCAT,
        join_keys: list[str] | None = None,
        join_how: str = "outer",
    ) -> "PipelineDAG":
        if isinstance(strategy, str):
            strategy = MergeStrategy(strategy.lower())
        return self._add(
            Node(name, NodeType.MERGE, strategy=strategy, join_keys=join_keys, join_how=join_how)
        )

    def add_branch(self, name: str, condition: Any) -> "PipelineDAG":
        """Split into ``{name}.match`` / ``{name}.nomatch`` outputs; connect
        downstream nodes with ``add_edge(name, child, port="match"|"nomatch")``."""
        return self._add(Node(name, NodeType.BRANCH, condition=condition))

    def add_sink(self, name: str, sink: Callable[[DataFrame], None]) -> "PipelineDAG":
        return self._add(Node(name, NodeType.SINK, func=sink))

    def add_edge(self, src: str, dst: str, port: str | None = None) -> "PipelineDAG":
        for n in (src, dst):
            if n not in self.nodes:
                raise ValueError(f"unknown node {n!r}")
        key = f"{src}.{port}" if port else src
        self.edges[src].append(dst)
        self.in_edges[dst].append(key)
        return self

    # -- validation (⇐ dag.py:213-269) ---------------------------------------
    def validate(self) -> list[str]:
        errors: list[str] = []
        for name, node in self.nodes.items():
            ups = self.in_edges[name]
            downs = self.edges[name]
            if node.node_type == NodeType.SOURCE and ups:
                errors.append(f"source {name!r} cannot have inputs")
            if node.node_type == NodeType.SINK and downs:
                errors.append(f"sink {name!r} cannot have outputs")
            if node.node_type == NodeType.SINK and not ups:
                errors.append(f"sink {name!r} has no input")
            if node.node_type in (NodeType.TRANSFORM, NodeType.BRANCH) and len(ups) != 1:
                errors.append(f"{node.node_type.value} {name!r} needs exactly one input")
            if node.node_type == NodeType.MERGE and len(ups) < 2:
                errors.append(f"merge {name!r} needs at least two inputs")
            if node.node_type == NodeType.MERGE and node.strategy == MergeStrategy.JOIN and not node.join_keys:
                errors.append(f"join merge {name!r} requires join_keys")
        if self._has_cycle():
            errors.append("graph contains a cycle")
        return errors

    def _has_cycle(self) -> bool:
        WHITE, GRAY, BLACK = 0, 1, 2
        color = dict.fromkeys(self.nodes, WHITE)

        def visit(n: str) -> bool:
            color[n] = GRAY
            for m in self.edges[n]:
                if color[m] == GRAY or (color[m] == WHITE and visit(m)):
                    return True
            color[n] = BLACK
            return False

        return any(color[n] == WHITE and visit(n) for n in self.nodes)

    # -- topological sort (Kahn, ⇐ dag.py:271-298) ----------------------------
    def topological_sort(self) -> list[str]:
        indeg = {n: len(self.in_edges[n]) for n in self.nodes}
        queue = sorted(n for n, d in indeg.items() if d == 0)
        order: list[str] = []
        while queue:
            n = queue.pop(0)
            order.append(n)
            for m in self.edges[n]:
                indeg[m] -= 1
                if indeg[m] == 0:
                    queue.append(m)
        if len(order) != len(self.nodes):
            raise ValueError("graph contains a cycle")
        return order

    # -- execution ------------------------------------------------------------
    def build(self, spark: SparkSession | None = None) -> dict[str, DataFrame]:
        """Build the lazy DataFrame for every node output (no action). Branch
        nodes produce two entries: ``{name}.match`` and ``{name}.nomatch``."""
        errors = self.validate()
        if errors:
            raise ValueError("invalid DAG: " + "; ".join(errors))
        spark = spark or self._spark or get_spark()
        outputs: dict[str, DataFrame] = {}
        fanout = {n: len(self.edges[n]) for n in self.nodes}

        for name in self.topological_sort():
            node = self.nodes[name]
            inputs = [outputs[k] for k in self.in_edges[name]]
            if node.node_type == NodeType.SOURCE:
                df = node.func(spark)
            elif node.node_type == NodeType.TRANSFORM:
                df = node.func(inputs[0])
            elif node.node_type == NodeType.MERGE:
                df = self._merge(node, inputs)
            elif node.node_type == NodeType.BRANCH:
                cond = F.expr(node.condition) if isinstance(node.condition, str) else node.condition
                parent = inputs[0].persist()  # both sides reuse one computation
                outputs[f"{name}.match"] = parent.filter(cond)
                outputs[f"{name}.nomatch"] = parent.filter(~cond)
                outputs[name] = outputs[f"{name}.match"]
                continue
            elif node.node_type == NodeType.SINK:
                df = inputs[0]
            else:  # pragma: no cover
                raise AssertionError(node.node_type)
            if node.node_type != NodeType.SINK and fanout[name] > 1:
                df = df.persist()
            outputs[name] = df
        return outputs

    @staticmethod
    def _merge(node: Node, inputs: list[DataFrame]) -> DataFrame:
        if node.strategy == MergeStrategy.CONCAT:
            return reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), inputs
            )
        if node.strategy == MergeStrategy.UNION:
            concat = reduce(
                lambda a, b: a.unionByName(b, allowMissingColumns=True), inputs
            )
            return concat.dropDuplicates()
        if node.strategy == MergeStrategy.JOIN:
            return reduce(
                lambda a, b: a.join(b, on=node.join_keys, how=node.join_how), inputs
            )
        raise ValueError(f"unknown merge strategy {node.strategy}")

    def run(self, spark: SparkSession | None = None) -> dict[str, Any]:
        """Execute: one action per sink (⇐ dag.py:300-390, minus the full
        materialization)."""
        start = time.monotonic()
        spark = spark or self._spark or get_spark()
        outputs = self.build(spark)
        sinks = [n for n in self.nodes.values() if n.node_type == NodeType.SINK]
        for node in sinks:
            upstream = outputs[node.name]
            node.func(upstream)
        duration = time.monotonic() - start
        # release any persisted fan-out nodes
        for df in outputs.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - unpersist of non-persisted is fine
                pass
        return {
            "name": self.name,
            "nodes_executed": len(self.nodes),
            "sinks": len(sinks),
            "duration": duration,
        }

    # -- introspection (⇐ dag.py:392-416) -------------------------------------
    def visualize(self) -> str:
        lines = [f"PipelineDAG {self.name!r}:"]
        for name in self.topological_sort():
            node = self.nodes[name]
            downs = ", ".join(self.edges[name]) or "∅"
            lines.append(f"  [{node.node_type.value:9}] {name} -> {downs}")
        return "\n".join(lines)
