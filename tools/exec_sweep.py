#!/usr/bin/env python
"""Spark-side-only ANSI execution sweep — the overflow detector at
scales where the DuckDB oracle replay is no longer practical.

The r12/r13 doctrine: under ANSI mode (Spark 4 default) an integer
overflow is a loud job-killing error, so simply EXECUTING every
registry plan against a larger-than-official corpus is a cheap
registry-wide detector for accumulator-growth bugs — it caught five
BIGINT-overflow expressions at the 5x corpus in r12 (all fixed, plus
two more lifted in r13). This tool runs that detector WITHOUT the
oracle: each query's DataFrame is forced through a noop sink, so the
whole plan executes distributed but nothing is collected or compared
(value-exactness is the differential sweep's job at scales DuckDB can
reach; this proves only execute-without-error plus wall time).

Same chunked-child + per-NAME watchdog skeleton as sweep_sf01.py.

Usage: python tools/exec_sweep.py [chunk_size] [sf_dir] > exec.log
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

PER_NAME_TIMEOUT = int(os.environ.get("SWEEP_NAME_TIMEOUT", "900"))
CHUNK_TIMEOUT = int(os.environ.get("SWEEP_CHUNK_TIMEOUT", "1800"))

CHILD = r"""
import sys, time
SF_DIR = sys.argv[2]
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from hbase_hadoop_flightsearch_spark.operators.ranks import (
    release_rank_bases,
)
from hbase_hadoop_flightsearch_spark.plans.registry import load_all
names = sys.argv[1].split(",")
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "12g")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
assert spark.conf.get("spark.sql.ansi.enabled") == "true", "ANSI off?"
reg = load_all()
for name in names:
    print(f"START {name}", flush=True)
    t0 = time.time()
    try:
        reg[name].fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"OK {name} {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        msg = str(ex).replace(chr(10), " ")[:250]
        print(f"FAIL {name} {msg}", flush=True)
    finally:
        release_rank_bases()
spark.stop()
"""


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    chunk_size = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sorted(load_all())
    only = os.environ.get("SWEEP_ONLY")
    if only:
        keep = set(only.split(","))
        names = [n for n in names if n in keep]

    counts = {"ok": 0, "fail": 0, "timeout_alone": 0, "lost": 0}
    terminal: set[str] = set()

    def run_child(chunk, timeout, label):
        out, rc = "", None
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, ",".join(chunk), sf_dir],
                capture_output=True, text=True, timeout=timeout,
            )
            out, rc = p.stdout, p.returncode
        except subprocess.TimeoutExpired as e:
            raw = e.stdout or ""
            out = raw.decode() if isinstance(raw, bytes) else raw
        done, started = set(), []
        for line in out.splitlines():
            m = re.search(r"\b(START|OK|FAIL) (\S+)", line)
            if not m or m.group(2) not in chunk:
                continue
            if m.group(1) == "START":
                started.append(m.group(2))
                continue
            print(line[m.start():] + label, flush=True)
            done.add(m.group(2))
            terminal.add(m.group(2))
            counts["ok" if m.group(1) == "OK" else "fail"] += 1
        missing = [n for n in chunk if n not in done]
        culprit = None
        if rc is None:
            inflight = [n for n in started if n not in done]
            culprit = inflight[-1] if inflight else None
        elif missing:
            print(f"CHILD EXITED rc={rc}: {missing}", flush=True)
        return missing, culprit, rc is None

    retry = []
    for i in range(0, len(names), chunk_size):
        chunk = names[i: i + chunk_size]
        missing, culprit, _ = run_child(chunk, CHUNK_TIMEOUT, "")
        for n in missing:
            why = "chunk-culprit" if n == culprit else "chunk-collateral"
            print(f"RETRY {n} ({why})", flush=True)
            retry.append((n, why))

    for name, why in retry:
        missing, _, timed_out = run_child(
            [name], PER_NAME_TIMEOUT, f" (alone; was {why})"
        )
        if name not in missing:
            continue
        terminal.add(name)
        kind = "timeout_alone" if timed_out else "lost"
        print(
            f"{'TIMEOUT_ALONE' if timed_out else 'LOST'} {name} "
            f"(>{PER_NAME_TIMEOUT}s solo; was {why})",
            flush=True,
        )
        counts[kind] += 1

    uncategorized = [n for n in names if n not in terminal]
    for n in uncategorized:
        print(f"LOST {n} (no terminal record)", flush=True)
        counts["lost"] += 1
    print(
        f"EXEC SWEEP DONE: ok={counts['ok']} fail={counts['fail']} "
        f"timeout_alone={counts['timeout_alone']} lost={counts['lost']} "
        f"uncategorized={len(uncategorized)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
