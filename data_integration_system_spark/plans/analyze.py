"""Parse `df.explain("formatted")` output into checkable facts.

Used by tests/test_plans.py to pin the scale-critical plan shapes:
a filter that stops reaching the parquet scan, a fact table that starts
broadcasting, or an extra shuffle appearing are regressions the
row-count/oracle tests can't see — only the plan can.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (captured from
    df.explain("formatted") — the stable public surface)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame, table: str) -> list[str]:
    """PushedFilters entries for the scan of `table` (matched by path)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for block in plan.split("\n\n"):
        if "Scan parquet" in block and f"{table}.parquet" in block:
            m = re.search(r"PushedFilters: \[(.*?)\]", block)
            if m and m.group(1):
                out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_read_schemas(df: DataFrame) -> dict[str, list[str]]:
    """table name -> columns actually read from its parquet scan
    (column pruning check: a 2-column projection must not read 10)."""
    plan = formatted_plan(df)
    out: dict[str, list[str]] = {}
    for block in plan.split("\n\n"):
        if "Scan parquet" not in block:
            continue
        loc = re.search(r"([A-Za-z0-9_]+)\.parquet", block)
        sch = re.search(r"ReadSchema: struct<(.*)>", block)
        if loc and sch:
            cols = [c.split(":")[0] for c in sch.group(1).split(",") if c]
            out.setdefault(loc.group(1), []).extend(cols)
    return out


def partition_filters(df: DataFrame, table_path_fragment: str) -> list[str]:
    """PartitionFilters entries for the scan whose location contains
    `table_path_fragment` — nonempty means partition pruning happened."""
    plan = formatted_plan(df)
    out: list[str] = []
    for block in plan.split("\n\n"):
        if "Scan parquet" in block and table_path_fragment in block:
            m = re.search(r"PartitionFilters: \[(.*?)\]", block)
            if m and m.group(1):
                out.extend(p.strip() for p in m.group(1).split(","))
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes — broadcast exchanges excluded."""
    plan = formatted_plan(df)
    return len(re.findall(r"\n\(\d+\) Exchange", plan))


def broadcast_join_count(df: DataFrame) -> int:
    # "(n) NodeName" detail headers — counting the whole text would double
    # count (each node appears in the tree AND its detail block)
    plan = formatted_plan(df)
    return len(re.findall(r"\n\(\d+\) BroadcastHashJoin", plan))


def sortmerge_join_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return len(re.findall(r"\n\(\d+\) SortMergeJoin", plan))


def is_broadcast(df: DataFrame, table: str) -> bool:
    """True if `table`'s scan feeds a BroadcastExchange (i.e. that side is
    shipped to every executor — must be FALSE for fact tables)."""
    plan = formatted_plan(df)
    # formatted explain lists nodes; find scan id for the table, then see
    # if a BroadcastExchange consumes it in the tree section.
    tree = plan.split("\n\n")[0]
    scan_ids = []
    for block in plan.split("\n\n"):
        if "Scan parquet" in block and f"{table}.parquet" in block:
            m = re.match(r"\((\d+)\) Scan parquet", block.strip())
            if m:
                scan_ids.append(m.group(1))
    for sid in scan_ids:
        # walk up the indented tree: find the scan line, look at shallower
        # lines above it for a BroadcastExchange before any join node
        lines = tree.splitlines()
        for i, line in enumerate(lines):
            if re.search(rf"Scan parquet\s+\({sid}\)", line):
                depth = len(line) - len(line.lstrip(" :+-"))
                for j in range(i - 1, -1, -1):
                    up = lines[j]
                    ud = len(up) - len(up.lstrip(" :+-"))
                    if ud < depth:
                        if "BroadcastExchange" in up:
                            return True
                        if "Join" in up or "Aggregate" in up:
                            break
                        depth = ud
    return False
