"""Cross-engine parity on a hostile EVENTS corpus.

Third member of the hostile-fixture family (whitespace -> text,
numerics -> orders/lineitem, this file -> events): synthetic event
streams with the shapes that break time-series logic — exact timestamp
TIES (tiebreak order), a purchase BEFORE its user's signup (funnel edge),
single-event users, one user owning most of the stream (skew),
same-instant duplicate events (dedup/debounce edges), zero and negative
values — replayed through the registered event-family query/oracle pairs
with the driver's comparator.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

_T = "2024-01-{d:02d} {h:02d}:00:00"

# (event_id, ts, user_id, event_type, value, props)
HOSTILE_EVENTS = (
    # user 1: five events at the SAME instant — every per-user order is
    # a pure event_id tiebreak; includes duplicate event types
    [(i, _T.format(d=1, h=9), 1, t, 10.0, '{"k": 1}')
     for i, t in enumerate(["click", "click", "view", "purchase", "signup"])]
    # user 2: purchase BEFORE signup — the funnel's temporal edge
    + [(10, _T.format(d=2, h=8), 2, "purchase", 50.0, '{"k": 2}'),
       (11, _T.format(d=2, h=12), 2, "signup", 0.0, '{"k": 3}'),
       (12, _T.format(d=2, h=13), 2, "purchase", 70.0, '{"k": 4}')]
    # user 3: a single event ever (singleton group)
    + [(20, _T.format(d=3, h=10), 3, "error", -5.0, '{"k": 5}')]
    # user 4: dominant user, alternating types across days (SCD2 runs),
    # zero values
    + [(100 + i, _T.format(d=4 + i % 20, h=i % 24), 4,
        ["click", "view"][i % 2], float(i % 3), '{"k": 6}')
       for i in range(60)]
    # user 5: strictly decreasing values, duplicate (user, type, ts)
    # triple with different event ids
    + [(200, _T.format(d=5, h=5), 5, "view", 9.0, '{"k": 7}'),
       (201, _T.format(d=5, h=5), 5, "view", 8.0, '{"k": 8}'),
       (202, _T.format(d=5, h=6), 5, "signup", 7.0, '{"k": 9}')]
)

_EVENT_PANEL = [
    # r12 Granger: the hostile corpus has days with zero clicks AND
    # zero purchases (constant regressor blocks -> singular 2x2 takes
    # the NULL branch), and the single-day corpus leaves n < 4
    "granger_clicks_purchases_lag1",
    # r10 growth accounting: a SINGLE-month corpus — everyone is NEW,
    # zero retained/resurrected, and churn past the horizon must be
    # ABSENT (unknowable), not zero
    "growth_accounting_monthly",
    # r10 Markov stationary: the singleton 'error' user creates a
    # DANGLING type (self-loop convention), same-instant events make
    # the LEAD order a pure event_id tiebreak, and the decimal-rounded
    # power steps must agree for all 10 iterations
    "markov_stationary_event_types",
    # r11 IPS/SNIPS: negative and zero values stress the round(value *
    # 100) reward bridge; contexts the target policy never matches in
    # this tiny log must emit NULL SNIPS identically on both engines
    "ips_offline_policy_value",
    # r11 Shapley: a tiny log leaves most of the 16 coalitions
    # UNOBSERVED (v = 0 convention must agree), purchase-only journeys
    # hit the empty coalition, and the week truncation must bucket
    # same-instant events identically
    "shapley_channel_attribution",
    # r11 DiD: the hostile corpus is ENTIRELY pre-period (Jan 2024), so
    # both post cells are empty -> NULL means and a NULL estimate must
    # propagate identically (never a fabricated 0); negative values
    # stress the integer-cents bridge
    "diff_in_diff_event_value",
    # r11 Markov removal: purchase-BEFORE-signup journeys truncate at
    # the first purchase (later events dropped identically); the
    # purchase-only week takes the direct START->CONV arc; same-instant
    # events make journey order a pure event_id tiebreak through all
    # 12 rounded absorption steps
    "markov_removal_attribution",
    # r11 Croston: the hostile corpus is bursty by construction (many
    # all-zero days between events) — the interval smoother q must
    # advance across zero-fill identically; types seen on a single day
    # stay at their seed (z = d, p = first gap) on both engines
    "croston_intermittent_demand",
    # r11 precedence: user 1's five same-instant events make EVERY
    # first-occurrence comparison a pure event_id tiebreak; singleton
    # users contribute to no pair
    "temporal_precedence_pairs",
    # r11 interval union: five same-instant events form ONE island
    # whose coverage is exactly one window; fully-disjoint singleton
    # users produce n_islands = n_events identically
    "interval_union_coverage_per_user",
    # r11 entropy rate: the dangling 'error' type's self-loop has
    # p = 1 -> addend exactly 0; deterministic chains (single
    # continuation per src) must drive entropy toward 0 identically
    # through the shared 10-step stationary machinery
    "markov_entropy_rate",
    "ohlc_hourly_by_type",
    "funnel_signup_to_purchase",
    "scd2_user_event_history",
    "scd2_as_of_snapshot",
    "sessionization_stats",
    "event_type_transitions",
    "debounce_user_events",
    "ema_customer_spend",
    "time_bucket_rollup_15min",
    "event_type_daily_values",
    "session_window_user_activity",
    "incremental_daily_event_counts",
    "daily_event_anomalies",
    "cohort_retention_daily",
    "timezone_conversion_events",
    "funnel_time_to_convert",
    "cogrouped_asof_attribution",
    "rolling_7day_active_users",
    "max_concurrent_sessions_daily",
    "snapshot_diff_user_state",
    # same-instant touch/conversion ties (strict < excludes them) and
    # equal-ts touches (event_id tiebreak) are exactly what the U-shaped
    # position weights are sensitive to
    "multi_touch_attribution",
    # strict-> ordering with same-instant chains (user 1 has all five
    # event types at ONE instant: no step may qualify) and the
    # purchase-before-signup user
    "ordered_funnel_three_step",
    # all-same-instant sessions are bounces of zero duration; singleton
    # users and the dominant user stress the per-day session rollup
    "bounce_rate_daily",
    # the fused composition must inherit every component tie rule at once
    "events_analytics_pipeline",
    # cross-correlation under missing event types (zero series ->
    # NULL guard) and a single-day corpus (no lagged pairs)
    "ccf_click_vs_purchase",
    # trigram paths under same-instant chains (event_id tiebreak IS
    # the path order) and users with < 3 events (no trigram rows)
    "top_event_paths_trigram",
    # Fano under single-day types (zero variance) and zero counts
    "fano_burstiness_by_event_type",
    # TWAP under same-instant events (zero durations -> NULL twap),
    # singleton users, and sub-second timestamp arithmetic
    "twap_value_by_user",
    # LTV cohorts under single-event users, negative values, and
    # the dominant user landing everything in week 0
    "cohort_ltv_weekly",
    # unordered completion under same-instant event bursts and the
    # strict < window boundary at exactly t0 + 7 days
    "unordered_completion_funnel",
    # r9 watermark drop audit: same-instant arrivals (event_id breaks
    # the arrival order), the strict-predecessor running max on the
    # first event (NULL -> not dropped), and window-end boundary hits
    "late_event_drop_audit",
    # r9 gaps-and-islands: same-instant and same-day event bursts must
    # collapse to one active day; single-day users are 1-day islands
    "activity_islands_per_user",
    # r9 CUPED: users entirely pre- or post-period (zero covariate or
    # metric), negative values, and the zero-variance covariate guard
    "cuped_variance_reduction",
    # r9 cluster bootstrap: singleton arms, replicas that zero out an
    # arm (NULL lift dropped from min/max), negative values
    "ab_lift_bootstrap_range",
]


@pytest.fixture(scope="module")
def hostile_events_dir(spark, tmp_path_factory):
    from tests.fixture_io import write_naive_parquet

    root = tmp_path_factory.mktemp("hostile_events")
    for t in TESTDATA_TABLES:
        if t != "events":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    write_naive_parquet(
        str(root / "events.parquet"),
        HOSTILE_EVENTS,
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
        ts_cols=["ts"],
        int_cols=["event_id", "user_id"],
    )
    return str(root)


@pytest.mark.parametrize("name", _EVENT_PANEL)
def test_event_family_parity_on_hostile_stream(spark, hostile_events_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(
        queries[name](spark, hostile_events_dir), oracles[name], hostile_events_dir
    )
    assert not problems, f"{name} on hostile events: {problems}"
