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

Beyond the reference: CHECKPOINT nodes (``add_checkpoint``) — durable
fingerprinted materialization barriers, so a failed multi-hour run resumes
from the last checkpoint instead of re-earning every upstream stage.
"""

from __future__ import annotations

import hashlib
import json
import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum
from functools import reduce
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_etl_spark.session import get_spark


logger = logging.getLogger(__name__)


class NodeType(Enum):
    SOURCE = "source"
    TRANSFORM = "transform"
    MERGE = "merge"
    BRANCH = "branch"
    CHECKPOINT = "checkpoint"
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
        self._ckpt_log: dict[str, list[str]] = {"restored": [], "materialized": []}

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

    def add_checkpoint(
        self,
        name: str,
        path: str | None = None,
        version: str = "1",
        force: bool = False,
    ) -> "PipelineDAG":
        """Durable materialization barrier: the upstream result is written
        to parquet once and RESTORED (not recomputed) by later runs whose
        upstream subgraph fingerprint still matches — restartability for
        the multi-hour DAG, where a failure in stage 9 must not re-earn
        stages 1-8. The reference has nothing comparable (its runs are
        single-process and minutes-long); at 100 TB this is the difference
        between resuming and re-paying a day of cluster time.

        The parquet lands at ``path``, or ``<checkpoint_dir>/<name>`` from
        ``run``/``build`` when ``path`` is None. A ``_FINGERPRINT.json``
        marker (written only AFTER the parquet action commits, via the
        same tmp+rename protocol as the streaming state files) records the
        upstream-subgraph fingerprint; on the next run a matching marker
        short-circuits the node to ``spark.read.parquet`` — which also
        cuts the plan's lineage, so downstream optimization works over a
        plain scan instead of the whole upstream graph.

        The fingerprint covers the upstream STRUCTURE (node names, types,
        edges, merge strategy/keys, branch conditions) and a best-effort
        token per callable (its name, bytecode digest, and primitive
        closure/constant values — so ``ops.filter_rows("x > 1")`` changes
        the fingerprint when the expression changes). Non-introspectable
        changes (new data under an unchanged source path, an edited
        extension module) are invisible — bump ``version`` to force
        recomputation, exactly like a dbt model checksum bump, or pass
        ``force=True`` for a one-shot re-materialize (recompute and
        rewrite this run regardless of the marker; the fresh marker
        makes later non-forced runs restore normally)."""
        return self._add(
            Node(
                name,
                NodeType.CHECKPOINT,
                metadata={
                    "path": path,
                    "version": str(version),
                    "force": bool(force),
                },
            )
        )

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
            if (
                node.node_type
                in (NodeType.TRANSFORM, NodeType.BRANCH, NodeType.CHECKPOINT)
                and len(ups) != 1
            ):
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

    # -- checkpoint fingerprinting --------------------------------------------
    def _upstream_closure(self, name: str) -> list[str]:
        """Every node whose output can influence ``name`` (inclusive)."""
        seen: set[str] = set()
        stack = [name]
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(k.split(".", 1)[0] for k in self.in_edges[n])
        return sorted(seen)

    @staticmethod
    def _canon_value(v: Any, depth: int = 0) -> str | None:
        """Deterministic canonical form of a closure/constant value, or
        None when the value is opaque (custom objects, frames, modules).
        Covers the containers a config-style closure actually captures —
        list/tuple/dict/set/frozenset of primitives, nested — because a
        closure like ``lambda df: df.drop(*cols)`` must change token when
        the captured LIST changes. Unordered containers are sorted by
        their canonical form, never by ``repr`` order: frozenset/set/dict
        iteration is hash-randomized per process, and a repr-ordered
        token would silently never match across driver restarts."""
        if depth > 6:
            return None
        if v is None or isinstance(v, (str, int, float, bool, bytes)):
            return f"{type(v).__name__}:{v!r}"
        if isinstance(v, (list, tuple)):
            parts = [PipelineDAG._canon_value(x, depth + 1) for x in v]
            if any(p is None for p in parts):
                return None
            tag = "list" if isinstance(v, list) else "tuple"
            return f"{tag}({','.join(parts)})"
        if isinstance(v, (set, frozenset)):
            parts = [PipelineDAG._canon_value(x, depth + 1) for x in v]
            if any(p is None for p in parts):
                return None
            return f"set({','.join(sorted(parts))})"
        if isinstance(v, dict):
            items = []
            for k, val in v.items():
                ck = PipelineDAG._canon_value(k, depth + 1)
                cv = PipelineDAG._canon_value(val, depth + 1)
                if ck is None or cv is None:
                    return None
                items.append(f"{ck}={cv}")
            return f"dict({','.join(sorted(items))})"
        return None

    @staticmethod
    def _callable_token(fn: Any) -> str | None:
        """Best-effort identity of a node callable: name + bytecode digest
        + canonicalized constants and closure values (so a config-style
        closure like filter_rows("x > 1") — or one capturing a list/dict,
        like ``lambda df: df.drop(*cols)`` — changes token when its
        captured value changes). Opaque closure values are logged and
        skipped — the documented reason add_checkpoint has ``version``/
        ``force`` knobs. Note: the canonical format replaced raw repr
        in round 10, so checkpoints written by earlier builds whose
        callables capture closure values re-materialize ONCE after the
        upgrade (safe — recompute is always safe; restore of stale data
        is what the fingerprint exists to prevent)."""
        if fn is None:
            return None
        name = getattr(fn, "__name__", type(fn).__name__)
        parts = [name]
        code = getattr(fn, "__code__", None)
        if code is not None:
            parts.append(hashlib.sha256(code.co_code).hexdigest()[:16])
            parts.append(
                repr(
                    tuple(
                        c
                        for c in code.co_consts
                        if isinstance(c, (str, int, float, bool, type(None)))
                    )
                )
            )
        for cell in getattr(fn, "__closure__", None) or ():
            try:
                v = cell.cell_contents
            except ValueError:  # empty cell
                continue
            c = PipelineDAG._canon_value(v)
            if c is None:
                logger.info(
                    "checkpoint fingerprint: closure value of type %s in "
                    "callable %r is opaque — not fingerprinted; bump "
                    "version= (or pass force=True) to invalidate a "
                    "checkpoint when it changes",
                    type(v).__name__, name,
                )
            else:
                parts.append(c)
        return "|".join(parts)

    def checkpoint_fingerprint(self, name: str) -> str:
        """Structural hash of the checkpoint's upstream subgraph — what
        the ``_FINGERPRINT.json`` marker must match for a restore."""
        doc = []
        for n in self._upstream_closure(name):
            nd = self.nodes[n]
            doc.append(
                {
                    "name": n,
                    "type": nd.node_type.value,
                    "in": self.in_edges[n],
                    "strategy": nd.strategy.value if nd.strategy else None,
                    "join_keys": nd.join_keys,
                    "join_how": nd.join_how,
                    "condition": (
                        str(nd.condition) if nd.condition is not None else None
                    ),
                    "func": self._callable_token(nd.func),
                    "version": nd.metadata.get("version"),
                }
            )
        return hashlib.sha256(
            json.dumps(doc, sort_keys=True).encode("utf-8")
        ).hexdigest()

    def _restore_or_materialize(
        self,
        spark: SparkSession,
        node: Node,
        upstream: DataFrame,
        checkpoint_dir: str | None,
    ) -> DataFrame:
        # the state-file protocol (tmp+rename publish, .bak recovery) is
        # shared with the streaming sinks — one crash-safety impl, not two
        from mini_etl_spark.streaming.corpus import _read_state, _write_state

        target = node.metadata.get("path") or (
            f"{checkpoint_dir.rstrip('/')}/{node.name}" if checkpoint_dir else None
        )
        if target is None:
            raise ValueError(
                f"checkpoint {node.name!r} has no path: pass path= to "
                "add_checkpoint or checkpoint_dir= to run()/build()"
            )
        fp = self.checkpoint_fingerprint(node.name)
        marker = f"{target}/_FINGERPRINT.json"
        if node.metadata.get("force"):
            # one-shot invalidation for changes the fingerprint cannot
            # see (opaque closures, new data under an unchanged source
            # path): skip the restore check entirely this run
            logger.info(
                "checkpoint %r: force=True — re-materializing %s",
                node.name, target,
            )
            state = {}
        else:
            try:
                state = _read_state(spark, marker)
            except Exception:  # noqa: BLE001 — any unreadable marker (corrupt
                # JSON, Hadoop checksum mismatch from an out-of-band edit, FS
                # hiccup) means "no trustworthy marker"; recomputing is always
                # safe, trusting a half-readable one never is
                state = {}
        if state.get("fingerprint") == fp:
            self._ckpt_log["restored"].append(node.name)
            logger.info("checkpoint %r: fingerprint match — restoring %s",
                        node.name, target)
            return spark.read.parquet(target)
        # The overwrite clears the target dir (marker included) when the
        # job STARTS, so a crash mid-write leaves no marker and the next
        # run recomputes; the marker is republished only after the
        # parquet action commits. Data without marker = recompute;
        # marker without matching fingerprint = recompute.
        upstream.write.mode("overwrite").parquet(target)
        _write_state(
            spark,
            marker,
            {
                "fingerprint": fp,
                "node": node.name,
                "version": node.metadata.get("version"),
            },
        )
        self._ckpt_log["materialized"].append(node.name)
        logger.info("checkpoint %r: materialized %s", node.name, target)
        return spark.read.parquet(target)

    # -- execution ------------------------------------------------------------
    def build(
        self,
        spark: SparkSession | None = None,
        checkpoint_dir: str | None = None,
    ) -> dict[str, DataFrame]:
        """Build the lazy DataFrame for every node output (no action —
        except checkpoint nodes, which are materialization BARRIERS: a
        stale/missing checkpoint runs its parquet write here, a fresh one
        short-circuits to a scan). Branch nodes produce two entries:
        ``{name}.match`` and ``{name}.nomatch``."""
        errors = self.validate()
        if errors:
            raise ValueError("invalid DAG: " + "; ".join(errors))
        spark = spark or self._spark or get_spark()
        outputs: dict[str, DataFrame] = {}
        fanout = {n: len(self.edges[n]) for n in self.nodes}
        self._ckpt_log = {"restored": [], "materialized": []}

        for name in self.topological_sort():
            node = self.nodes[name]
            inputs = [outputs[k] for k in self.in_edges[name]]
            if node.node_type == NodeType.SOURCE:
                df = node.func(spark)
            elif node.node_type == NodeType.TRANSFORM:
                df = node.func(inputs[0])
            elif node.node_type == NodeType.CHECKPOINT:
                df = self._restore_or_materialize(
                    spark, node, inputs[0], checkpoint_dir
                )
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

    def run(
        self,
        spark: SparkSession | None = None,
        checkpoint_dir: str | None = None,
    ) -> dict[str, Any]:
        """Execute: one action per sink (⇐ dag.py:300-390, minus the full
        materialization). ``checkpoint_dir`` gives path-less checkpoint
        nodes their parquet home (``<dir>/<node>``)."""
        start = time.monotonic()
        spark = spark or self._spark or get_spark()
        outputs = self.build(spark, checkpoint_dir=checkpoint_dir)
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
            "checkpoints_restored": list(self._ckpt_log["restored"]),
            "checkpoints_materialized": list(self._ckpt_log["materialized"]),
        }

    # -- introspection (⇐ dag.py:392-416) -------------------------------------
    def visualize(self) -> str:
        lines = [f"PipelineDAG {self.name!r}:"]
        for name in self.topological_sort():
            node = self.nodes[name]
            downs = ", ".join(self.edges[name]) or "∅"
            lines.append(f"  [{node.node_type.value:9}] {name} -> {downs}")
        return "\n".join(lines)
