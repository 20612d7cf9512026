"""Registry-wide single-task-window contract (VERDICT r11 follow-on).

r12 swept EVERY registry query's executed plan for a Window fed by an
Exchange SinglePartition — the one-task global sort that stops scaling
the moment its input is fact-sized — and migrated every fact-sized site
(17 beyond the nine VERDICT named) onto operators/ranks.py. What remains
is the allowlist below: windows whose INPUT is bounded by construction
(a fixed bucket/cell count, calendar days/hours, digest compression, a
deploy knob) and therefore one-task by CHOICE, not by accident. This
test pins both directions: no query outside the allowlist may contain a
single-task window, and every allowlist entry must still contain one
(so entries go stale loudly when a site is migrated or removed).

Runtime note: building all ~400 plans at sf0.001 takes a few minutes
(iterative plans run their driver loops at build time); it is ONE test
on purpose so a sweep failure reports every violating query at once.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.deep  # driver-default deselected tier (pytest.ini, VERDICT r15 #6)

from hbase_hadoop_flightsearch_spark.plans.registry import load_all

SF = "/root/testdata/sf0.001"

# Queries whose plans legitimately contain a Window fed by an Exchange
# SinglePartition — each with the bound that makes the one-task stage
# O(small), independent of corpus size.
BOUNDED_INPUT = {
    "agg_ks_uniformity_gof": "ECDF window over KS1_BUCKETS=100 rows",
    "agg_lorenz_curve_deciles": (
        "cumulative-share windows over the 10 decile rows (the decile "
        "assignment itself is the distributed NTILE)"
    ),
    "dq_benford_first_digit": "grand-total window over 9 digit rows",
    "dq_chisq_independence": (
        "windows over the priority x status contingency cells (<= 15)"
    ),
    "events_alert_hysteresis": "state scan over O(hours), calendar-bounded",
    "events_error_budget_burn": "burn windows over O(hours)",
    "events_granger_views_purchases": "lag design matrix over O(days)",
    "events_metric_contribution": "rank over O(event types) = 5",
    "events_running_distinct_users": "running sum over O(hours)",
    "events_survival_repeat_purchase": (
        "KM suffix/prefix windows over O(distinct gap-days), "
        "calendar-bounded"
    ),
    "flight_otp_ranking": "rank over O(carriers) = 20",
    "incremental_digest_merge": (
        "merge window over digest centroids (compression-bounded)"
    ),
    "layout_snapshot_time_travel": "log replay over O(snapshot versions)",
    "ml_eval_conformal_snaive": (
        "seasonal-naive lag + residual ranks over O(hours)"
    ),
    "ml_eval_pinball_quantile": "seasonal-naive lag over O(hours)",
    "pipeline_pack_shards": (
        "offset window over block totals; block width derived from "
        "table stats so blocks <= ~10 x shuffle.partitions BY "
        "CONSTRUCTION (r13, knob retired; A/B vs ranks.py in SCALE.md)"
    ),
    "sample_neyman_allocation": "largest-remainder rank over O(strata)",
    "sketch_quantile_digest": (
        "finish window over digest centroids (compression-bounded)"
    ),
    "ts_forecast_brown_double": "smoothing replay over O(days)",
    "ts_rolling_corr_daily": "rolling frames over O(days)",
    "ts_runs_test_randomness": "sign-flip lag over O(days)",
    "window_max_drawdown": "equity running max over O(days)",
    "window_sliding_median_exact": "frame collect over O(days)",
}


def _window_fed_by_single_partition(plan: str) -> list[str]:
    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Window" not in line:
            continue
        for nxt in lines[i + 1 : i + 4]:
            if "Exchange SinglePartition" in nxt:
                hits.append(line.strip()[:120])
                break
            if "Window" in nxt or "Join" in nxt or "Aggregate" in nxt:
                break
    return hits


def test_registry_single_task_windows_exactly_allowlisted(spark):
    registry = load_all()
    unexpected: dict[str, str] = {}
    hit_names: set[str] = set()
    errors: dict[str, str] = {}
    for name, q in sorted(registry.items()):
        try:
            df = q.fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 - report, don't abort sweep
            errors[name] = str(ex)[:200]
            continue
        hits = _window_fed_by_single_partition(plan)
        if hits:
            hit_names.add(name)
            if name not in BOUNDED_INPUT:
                unexpected[name] = hits[0]
    assert not errors, f"plans failed to build: {errors}"
    assert not unexpected, (
        "single-task Window over un-allowlisted queries (fact-sized "
        f"input? migrate onto operators/ranks.py): {unexpected}"
    )
    stale = set(BOUNDED_INPUT) - hit_names
    assert not stale, (
        f"allowlist entries no longer hit (remove them): {sorted(stale)}"
    )
