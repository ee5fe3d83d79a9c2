"""Executed-plan SQL metrics: what a query ACTUALLY did, not what the
optimizer promised.

`plans/analyze.py` pins shapes on the formatted (pre-execution) plan;
some scale facts are only visible after execution:

* **Exchange reuse** — a relation consumed by two branches shows two
  scans in `explain("formatted")` but one `ReusedExchange` in the
  executed plan (AQE materializes the stage once).
* **Map-side combine** — `shuffleRecordsWritten` on the Exchange proves
  partial aggregation collapsed the stream before the wire; the
  formatted plan shows `HashAggregate(partial)` but not the row counts.
* **Row-group / file skipping** — the parquet reader's stats pruning
  surfaces as a scan `numOutputRows` far below the table's row count;
  no plan node changes at all.

The walker talks to the JVM plan tree through the DataFrame's private
queryExecution handle — read-only introspection of the public SQL-metrics
surface (the same numbers the Spark UI renders per node).

Reference anchor: the reference has no observability surface at all (no
metrics, no EXPLAIN); this module is pure extension, built because at
100 TB "did the shuffle carry partials or rows?" is the difference
between a report and an outage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class NodeMetrics:
    cls: str                      # JVM class, e.g. FileSourceScanExec
    name: str                     # display name, e.g. "Scan parquet"
    metrics: dict[str, int] = field(default_factory=dict)
    detail: str = ""              # one-line simpleString (paths, keys)


def _scala_map_items(jmap):
    it = jmap.iterator()
    while it.hasNext():
        kv = it.next()
        yield kv._1(), kv._2()


def executed_nodes(df: DataFrame) -> list[NodeMetrics]:
    """Flatten the EXECUTED physical plan into per-node metric dicts.

    Call AFTER an action (collect/count/write) — metric values accumulate
    during execution; on an unexecuted plan they are all zero.  AQE
    wrappers (AdaptiveSparkPlanExec, *QueryStageExec) are descended
    through, so the list reflects the final re-planned tree."""
    out: list[NodeMetrics] = []

    def walk(p) -> None:
        cls = p.getClass().getSimpleName()
        ms = {k: m.value() for k, m in _scala_map_items(p.metrics())}
        try:
            detail = p.simpleString(200)
        except Exception:
            detail = p.nodeName()
        out.append(NodeMetrics(cls=cls, name=p.nodeName(), metrics=ms, detail=detail))
        if cls == "AdaptiveSparkPlanExec":
            walk(p.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(p.plan())
            return
        ch = p.children().iterator()
        while ch.hasNext():
            walk(ch.next())

    walk(df._jdf.queryExecution().executedPlan())
    return out


def collect_with_metrics(df: DataFrame):
    """Run the query and return ``(rows, executed_nodes(df))`` — the
    one-call form for tests that pin executed facts."""
    rows = df.collect()
    return rows, executed_nodes(df)


def metric_sum(nodes: list[NodeMetrics], cls_prefix: str, metric: str) -> int:
    """Sum ``metric`` over every node whose class starts with
    ``cls_prefix`` (e.g. ("ShuffleExchangeExec", "shuffleRecordsWritten")
    = total rows that crossed any wire)."""
    return sum(
        n.metrics.get(metric, 0) for n in nodes if n.cls.startswith(cls_prefix)
    )


def node_count(nodes: list[NodeMetrics], cls_prefix: str) -> int:
    return sum(1 for n in nodes if n.cls.startswith(cls_prefix))


def scan_output_rows(nodes: list[NodeMetrics], path_fragment: str) -> int:
    """Rows the parquet scan(s) matching ``path_fragment`` actually
    produced — compare against the table's row count to measure stats
    (row-group/file) skipping, which no plan shape can show."""
    return sum(
        n.metrics.get("numOutputRows", 0)
        for n in nodes
        if n.cls == "FileSourceScanExec" and path_fragment in n.detail
    )
