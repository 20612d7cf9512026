#!/usr/bin/env python
"""Full-registry oracle sweep at sf0.1 with a per-chunk watchdog.

Names are partitioned into chunks; each chunk runs in a FRESH subprocess
(own SparkSession) under a hard timeout, so one pathological DuckDB
oracle (the deliberately quadratic SQL formulations) costs its chunk a
TIMEOUT record instead of hanging the sweep. Known-quadratic oracles are
pre-skipped; anything newly slow surfaces as a named timeout.

Usage: python tools/sweep_sf01.py [chunk_size] [sf_dir] > sweep.log
       sf_dir defaults to /root/testdata/sf0.1; pass e.g. a
       tools/gen_altseed.py scale corpus to sweep larger-than-official
       fixtures (the r12 5x sweep that caught the BIGINT-overflow class).
"""

from __future__ import annotations

import re
import subprocess
import sys

# Oracles whose SQL formulation is deliberately all-pairs / correlated-
# inequality: conclusive at sf <= 0.01 (the suite), impractical for
# DuckDB at sf0.1. The SPARK side of each has sf0.1 evidence via bench
# or the per-round sweeps.
SKIP = {
    "dedup_cross_source_matrix",
    "asof_join_events_orders", "asof_join_forward_next_purchase",
    "asof_join_tolerance", "dedup_ngram_jaccard",
    "dedup_containment_prefix", "dedup_simhash", "dedup_cc_clusters",
    "dedup_embedding_cosine", "dedup_levenshtein_blocked",
    "dedup_levenshtein_block_stats", "dedup_chaining_audit",
    "dedup_minhash_lsh",
    "similarity_mmr_rerank", "pipeline_chunk_dedup",
    "pipeline_corpus_prep_neardup", "join_interval_overlap_sessions",
}

CHILD = r"""
import sys, time
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from pyspark.sql import SparkSession
from hbase_hadoop_flightsearch_spark.plans.registry import load_all
from oracle_utils import compare_query_to_oracle
names = sys.argv[1].split(",")
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
reg = load_all()
for name in names:
    t0 = time.time()
    try:
        compare_query_to_oracle(spark, reg[name], SF_DIR)
        print(f"OK {name} {time.time()-t0:.1f}s", flush=True)
    except Exception as ex:
        print(f"FAIL {name} {str(ex)[:250]}", flush=True)
spark.stop()
"""


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    chunk_size = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = [n for n in sorted(load_all()) if n not in SKIP]
    ok = fail = timeout = 0
    lost: list[str] = []

    def run_chunk(chunk: list[str]) -> list[str]:
        """Run one child; returns chunk names that produced NO OK/FAIL
        line (child crashed mid-chunk — e.g. an OOM kill — which the
        r9 sweep showed can silently swallow names)."""
        nonlocal ok, fail, timeout
        out, rc = "", None
        try:
            p = subprocess.run(
                [sys.executable, "-c", CHILD, ",".join(chunk), sf_dir],
                capture_output=True, text=True, timeout=1800,
            )
            out, rc = p.stdout, p.returncode
        except subprocess.TimeoutExpired as e:
            raw = e.stdout or ""
            out = raw.decode() if isinstance(raw, bytes) else raw
        done = set()
        for line in out.splitlines():
            # match anywhere in the line, not just at the start: DuckDB's
            # progress bar used to glue "100% ▕...▏ " in front of the
            # child's OK print (the r9 silent-loss bug — the bar is now
            # disabled in oracle_utils, this keeps the parse robust)
            m = re.search(r"\b(OK|FAIL) (\S+)", line)
            # require the captured token to be a name of THIS chunk, so a
            # stray log/exception line containing "OK <word>" mid-text
            # cannot mark a crashed name as accounted (ADVICE r9)
            if m and m.group(2) in chunk:
                print(line[m.start():], flush=True)
                done.add(m.group(2))
                if m.group(1) == "OK":
                    ok += 1
                else:
                    fail += 1
        missing = [n for n in chunk if n not in done]
        if missing and rc is None:  # timeout path
            for name in missing:
                print(f"TIMEOUT {name}", flush=True)
                timeout += 1
            return []
        if missing:
            print(
                f"CHILD EXITED rc={rc} with unaccounted names: {missing}",
                flush=True,
            )
        return missing

    for i in range(0, len(names), chunk_size):
        lost.extend(run_chunk(names[i: i + chunk_size]))
    # Second pass: every lost name gets its own fresh child, so one
    # crashing or pathological name costs exactly itself.
    for name in lost:
        still = run_chunk([name])
        for n in still:
            print(f"LOST {n} (singleton child died twice)", flush=True)
            fail += 1
    print(
        f"SWEEP DONE: ok={ok} fail={fail} timeout={timeout} "
        f"skipped={len(SKIP)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
