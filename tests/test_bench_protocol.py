"""Unit tests for the bench measurement protocol (bench.py) — the
canary gate and baseline selection are load-bearing for every
cross-round performance claim, so their logic is pinned here without
spinning Spark.

Context (BENCH_NOTES.md rounds 6-7): the shared host has multi-hour
noisy-neighbor windows that inflate every query a uniform ~1.45x;
round 6's artifact recorded 43 phantom regressions from one. The
protocol's answer: a pinned canary before/after the sweep stamps the
artifact noisy_host, noisy artifacts never become the comparison
base, and a noisy current run publishes no delta/regression lists.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench


def _write(dirpath, name, **payload):
    (dirpath / name).write_text(json.dumps(payload))


def test_canary_verdict_quiet():
    canary, noisy = bench.canary_verdict(0.16, 0.17, 0.153)
    assert not noisy
    assert canary["ratio_before"] == pytest.approx(1.046, abs=1e-3)
    assert canary["ratio_after"] == pytest.approx(1.111, abs=1e-3)


def test_canary_verdict_noisy_on_either_end():
    # noisy BEFORE only: the sweep started on a loaded host
    _, noisy = bench.canary_verdict(0.40, 0.16, 0.153)
    assert noisy
    # noisy AFTER only: load arrived mid-sweep
    _, noisy = bench.canary_verdict(0.16, 0.40, 0.153)
    assert noisy


def test_canary_verdict_per_end_refs_quiet():
    # r08 recalibration: each end normalized by its own idle floor —
    # a fresh-session before of 0.45 s (cold-JIT spread, not load) and
    # a warm after of 0.22 s are both QUIET under the per-end refs
    ref = {"before": 0.29, "after": 0.21}
    canary, noisy = bench.canary_verdict(0.45, 0.22, ref)
    assert not noisy
    assert canary["ratio_before"] == pytest.approx(0.45 / 0.29, abs=1e-3)
    assert canary["ratio_after"] == pytest.approx(0.22 / 0.21, abs=1e-3)
    assert canary["threshold_before"] == bench.CANARY_NOISY_RATIO_BEFORE


def test_canary_verdict_per_end_refs_noisy():
    ref = {"before": 0.29, "after": 0.21}
    # after-end is the fine sensor: 0.26/0.21 = 1.24 > 1.2 band
    _, noisy = bench.canary_verdict(0.35, 0.26, ref)
    assert noisy
    # before-end only detects gross load: 1.47 s (round-7-era noisy
    # observation) = ratio 5.1 > 2.0 band
    _, noisy = bench.canary_verdict(1.47, 0.21, ref)
    assert noisy
    # before-end inside its wide band (0.55/0.29 = 1.9): not noisy
    _, noisy = bench.canary_verdict(0.55, 0.21, ref)
    assert not noisy


def test_steal_pct():
    # (steal, total) jiffy samples: 200 steal over 4000 total = 5%
    assert bench.steal_pct((100, 10000), (300, 14000)) == 5.0
    assert bench.steal_pct(None, (300, 14000)) is None
    assert bench.steal_pct((100, 10000), (100, 10000)) is None  # dt=0


def test_steal_gate_mid_sweep_burst_stamps_noisy():
    # the live round-8 case: both canary endpoints quiet (verdict
    # False) but the hypervisor stole 4.82% of the sweep's cycles —
    # the sweep body ran under a co-tenant wave the endpoints missed
    # and its 40 wall "regressions" were phantoms
    noisy, via = bench.steal_gate(False, 4.82)
    assert noisy and via == "steal"


def test_steal_gate_quiet_run_passes():
    # idle-window probes measure 0.0% steal; sub-threshold stays quiet
    noisy, via = bench.steal_gate(False, 0.0)
    assert not noisy and via is None
    noisy, via = bench.steal_gate(False, 0.4)
    assert not noisy and via is None


def test_steal_gate_canary_verdict_takes_precedence():
    # canary-fired runs keep "canary" provenance even with high steal
    noisy, via = bench.steal_gate(True, 8.8)
    assert noisy and via == "canary"
    # and an unmeasurable steal (non-Linux) never stamps anything
    noisy, via = bench.steal_gate(False, None)
    assert not noisy and via is None


def test_read_cpu_jiffies_shape():
    s = bench.read_cpu_jiffies()
    # on Linux this must parse; elsewhere None is the contract
    if s is not None:
        steal, total = s
        assert 0 <= steal <= total


def test_canary_verdict_no_reference_sf():
    # smoke runs at sf0.001 have no pinned reference: record raw times,
    # never stamp noisy (there is nothing to compare against)
    canary, noisy = bench.canary_verdict(0.05, 0.06, None)
    assert not noisy
    assert "ratio_before" not in canary


def test_canary_verdict_failed_measurement():
    _, noisy = bench.canary_verdict(-1.0, -1.0, 0.153)
    assert not noisy  # absent canary query: no verdict, no stamp


def test_baseline_skips_noisy_versioned_artifacts(tmp_path):
    _write(tmp_path, "BENCH_DETAIL_r05.json",
           sf=0.1, queries={"q": 1.0})
    _write(tmp_path, "BENCH_DETAIL_r06.json",
           sf=0.1, queries={"q": 1.5}, noisy_host=True)
    prior, tag, sf = bench.pick_prior_baseline(str(tmp_path), "r07")
    assert tag == "r05" and sf == 0.1
    assert prior == {"q": 1.0}


def test_baseline_excludes_own_round(tmp_path):
    # a re-run within the same round must not become its own baseline
    _write(tmp_path, "BENCH_DETAIL_r07.json", sf=0.1, queries={"q": 9.0})
    _write(tmp_path, "BENCH_DETAIL_r05.json", sf=0.1, queries={"q": 1.0})
    prior, tag, _ = bench.pick_prior_baseline(str(tmp_path), "r07")
    assert tag == "r05" and prior == {"q": 1.0}


def test_baseline_falls_back_to_working_file(tmp_path):
    _write(tmp_path, "BENCH_DETAIL.json", sf=0.1, queries={"q": 2.0})
    prior, tag, sf = bench.pick_prior_baseline(str(tmp_path), "r07")
    assert tag == "prev" and sf == 0.1 and prior == {"q": 2.0}


def test_baseline_none_when_all_noisy(tmp_path):
    _write(tmp_path, "BENCH_DETAIL_r06.json",
           sf=0.1, queries={"q": 1.5}, noisy_host=True)
    prior, tag, sf = bench.pick_prior_baseline(str(tmp_path), "r07")
    assert prior == {} and tag is None and sf is None


def test_baseline_skips_cpus_mismatched_artifacts(tmp_path):
    # the driver's low-core scaling sweep is a valid measurement but
    # not a valid wall baseline for full-core runs (round 9: the c8
    # sweep landed as the newest versioned file and flagged 9 phantom
    # regressions). Legacy artifacts without the cpus field stay
    # eligible — every pre-field versioned artifact is a c32 sweep.
    _write(tmp_path, "BENCH_DETAIL_r08.json",
           sf=0.1, queries={"q": 1.0})  # legacy, no cpus field
    _write(tmp_path, "BENCH_DETAIL_r09.json",
           sf=0.1, queries={"q": 0.5}, cpus=8)
    prior, tag, sf = bench.pick_prior_baseline(str(tmp_path), "r10", cpus=32)
    assert tag == "r08" and prior == {"q": 1.0}
    # matching cpus: eligible
    prior, tag, _ = bench.pick_prior_baseline(str(tmp_path), "r10", cpus=8)
    assert tag == "r09" and prior == {"q": 0.5}


def test_metrics_baseline_skips_cpus_mismatched_artifacts(tmp_path):
    # tasks / shuffle records follow the core count (scan fan-out,
    # map-side combine granularity), so the metrics channel is only
    # comparable within one core count
    _write(tmp_path, "BENCH_DETAIL_r08.json",
           sf=0.1, queries={"q": 1.0}, exec_metrics={"q": _m()})
    _write(tmp_path, "BENCH_DETAIL_r09.json",
           sf=0.1, queries={"q": 1.0}, cpus=8,
           exec_metrics={"q": _m(swr=99_000)})
    prior, tag, _ = bench.pick_metrics_baseline(str(tmp_path), "r10", cpus=32)
    assert tag == "r08" and prior == {"q": _m()}


def test_bench_names_cover_every_catalog_entry():
    # the printed JSON line's `queries` map is built from `names`,
    # which must cover EVERY registered query (declared + extras) —
    # the r05-style drift that blinded PERF_r08 (per-query map silently
    # missing) must not recur in the coverage dimension either
    from streamz_spark.catalog import load_all
    from streamz_spark.queries.extra import EXTRA_REGISTRY

    registry = dict(load_all())
    registry.update(EXTRA_REGISTRY)
    names = [n for n in bench.HEADLINE if n in registry] + sorted(
        set(registry) - set(bench.HEADLINE)
    )
    assert set(names) == set(registry)
    assert len(names) == len(registry)  # no duplicates in the map


def test_committed_r06_artifact_is_stamped_noisy():
    # the retroactive stamp that keeps r06's 43 phantom regressions
    # out of every future comparison — if someone regenerates the
    # artifact without the stamp, this fails
    repo = Path(__file__).parent.parent
    d = json.loads((repo / "BENCH_DETAIL_r06.json").read_text())
    assert d.get("noisy_host") is True


def test_committed_r07_artifact_carries_canary_fields():
    repo = Path(__file__).parent.parent
    p = repo / "BENCH_DETAIL_r07.json"
    if not p.exists():
        pytest.skip("r07 artifact not yet taken")
    d = json.loads(p.read_text())
    c = d.get("canary", {})
    assert c.get("query") == bench.CANARY_QUERY
    assert "before" in c and "after" in c and "threshold" in c
    # invariant: a noisy-stamped artifact publishes no regression list
    if d.get("noisy_host"):
        assert d["regressions"] == {} and d["delta_vs_prev"] == {}


def test_committed_r07_artifact_restamp_consistent():
    # round-8 retro-correction: r07 was stamped noisy by the stale
    # 0.153 s reference; its RAW canary ends pass the recalibrated
    # per-end gate, so it was restamped quiet (with provenance) and
    # serves as the wall-time baseline. This test forces the restamp
    # to be re-justified if the references ever move again.
    repo = Path(__file__).parent.parent
    p = repo / "BENCH_DETAIL_r07.json"
    if not p.exists():
        pytest.skip("r07 artifact not yet taken")
    d = json.loads(p.read_text())
    rs = d.get("restamp")
    if not rs:
        pytest.skip("r07 artifact not restamped")
    assert rs["original_noisy_host"] is True
    c = d["canary"]
    _, noisy = bench.canary_verdict(
        c["before"], c["after"], bench.CANARY_REF_SEC.get(d["sf"])
    )
    assert not noisy, "restamped r07 must pass the current canary gate"
    assert d["noisy_host"] is False


# -- noise-matched secondary channel ----------------------------------

def _art(tmp_path, tag, queries, ratio=None, sf=0.1):
    payload = {"sf": sf, "queries": queries}
    if ratio is not None:
        payload["canary"] = {"ratio_after": ratio}
    _write(tmp_path, f"BENCH_DETAIL_{tag}.json", **payload)


def test_noise_matched_uniform_inflation_flags_nothing(tmp_path):
    # a pure host-factor window (every query x1.4) must produce ZERO
    # flags after median normalization — the r06 failure mode
    base = {f"q{i}": 1.0 + i * 0.1 for i in range(15)}
    _art(tmp_path, "r07", base, ratio=1.44)
    now = {k: round(v * 1.4, 4) for k, v in base.items()}
    spread = {k: 0.05 for k in now}
    tag_, med, flags = bench.noise_matched_regressions(
        now, spread, str(tmp_path), "r08", 0.1, 1.5
    )
    assert tag_ == "r07"
    assert med == pytest.approx(1.4, abs=0.01)
    assert flags == {}


def test_noise_matched_catches_genuine_regression(tmp_path):
    base = {f"q{i}": 1.0 for i in range(14)}
    base["big"] = 4.0
    _art(tmp_path, "r07", base, ratio=1.44)
    now = {k: 1.4 for k in base}
    now["big"] = 4.0 * 1.4 * 2.2  # a real 2.2x plan regression on top
    spread = {k: 0.05 for k in now}
    _, _, flags = bench.noise_matched_regressions(
        now, spread, str(tmp_path), "r08", 0.1, 1.5
    )
    assert list(flags) == ["big"]
    assert flags["big"]["normalized_ratio"] == pytest.approx(2.2, abs=0.1)


def test_noise_matched_requires_similar_canary(tmp_path):
    # a 1.44x-window artifact is NOT comparable to a 2.5x-window run
    base = {f"q{i}": 1.0 for i in range(15)}
    _art(tmp_path, "r07", base, ratio=1.44)
    tag_, _, flags = bench.noise_matched_regressions(
        {k: 2.5 for k in base}, {k: 0.0 for k in base},
        str(tmp_path), "r08", 0.1, 2.5,
    )
    assert tag_ is None and flags == {}


def test_noise_matched_skips_artifacts_without_canary(tmp_path):
    # pre-protocol artifacts (r05 and earlier) carry no canary ratio —
    # their host factor is unknown, so they are not match candidates
    base = {f"q{i}": 1.0 for i in range(15)}
    _art(tmp_path, "r05", base, ratio=None)
    tag_, _, _ = bench.noise_matched_regressions(
        {k: 1.4 for k in base}, {k: 0.0 for k in base},
        str(tmp_path), "r08", 0.1, 1.44,
    )
    assert tag_ is None


def test_noise_matched_same_tag_prior_artifact_is_eligible(tmp_path):
    # round-7 VERDICT #5: an in-round re-run about to overwrite
    # BENCH_DETAIL_<tag>.json must be able to match the existing
    # committed same-tag artifact — it is a DIFFERENT run, just same
    # tag (the driver's r07 re-sweep got base_tag null with an eligible
    # base at canary 1.444 vs its 1.475)
    base = {f"q{i}": 1.0 for i in range(15)}
    _art(tmp_path, "r08", base, ratio=1.444)
    tag_, med, flags = bench.noise_matched_regressions(
        {k: 1.475 for k in base}, {k: 0.0 for k in base},
        str(tmp_path), "r08", 0.1, 1.475,
    )
    assert tag_ == "r08"
    assert med == pytest.approx(1.475, abs=0.01)
    assert flags == {}


def test_noise_matched_rejects_decaying_current_run(tmp_path):
    # round-7 ADVICE: a run noisy only BEFORE the sweep (ratio_before
    # 2.4, ratio_after 1.44) ran under a decaying, non-uniform host
    # factor — the median-normalization assumption fails, so the
    # channel must refuse to match rather than compare
    base = {f"q{i}": 1.0 for i in range(15)}
    _art(tmp_path, "r07", base, ratio=1.44)
    tag_, _, flags = bench.noise_matched_regressions(
        {k: 1.44 for k in base}, {k: 0.0 for k in base},
        str(tmp_path), "r08", 0.1,
        {"ratio_before": 2.392, "ratio_after": 1.444},
    )
    assert tag_ is None and flags == {}


def test_noise_matched_rejects_decaying_candidate(tmp_path):
    # symmetric: a candidate artifact whose own before/after disagree
    # beyond the band is not a valid base either
    base = {f"q{i}": 1.0 for i in range(15)}
    payload = {
        "sf": 0.1, "queries": base,
        "canary": {"ratio_before": 2.392, "ratio_after": 1.444},
    }
    _write(tmp_path, "BENCH_DETAIL_r07.json", **payload)
    tag_, _, _ = bench.noise_matched_regressions(
        {k: 1.44 for k in base}, {k: 0.0 for k in base},
        str(tmp_path), "r08", 0.1, 1.444,
    )
    assert tag_ is None


def test_noise_matched_spread_guard(tmp_path):
    # a sub-second entry whose excess sits inside its own run-to-run
    # spread is jitter, not a regression (the unigram_nll_full_vocab
    # case from the round-7 manual audit)
    base = {f"q{i}": 1.0 for i in range(14)}
    base["jittery"] = 0.8
    _art(tmp_path, "r07", base, ratio=1.44)
    now = {k: 1.4 for k in base}
    now["jittery"] = 0.8 * 1.4 * 1.8  # 1.8x normalized...
    spread = {k: 0.05 for k in now}
    spread["jittery"] = 0.9  # ...but inside its own spread band
    _, _, flags = bench.noise_matched_regressions(
        now, spread, str(tmp_path), "r08", 0.1, 1.5
    )
    assert flags == {}


# -- deterministic-metrics channel -------------------------------------

from streamz_spark.benchmetrics import (  # noqa: E402
    harvest_group_metrics,
    metric_regressions,
)


def _m(stages=3, swr=10_000, swb=5 << 20, cpu=2_000, inp=50 << 20, spill=0):
    return {
        "jobs": 1, "stages": stages, "skipped_stages": 0, "tasks": 64,
        "shuffle_write_bytes": swb, "shuffle_write_records": swr,
        "shuffle_read_bytes": swb, "executor_cpu_ms": cpu,
        "input_bytes": inp, "spill_bytes": spill,
    }


def test_metric_regressions_catch_planted_extra_exchange():
    # the scenario wall-time noise hides (round-7 VERDICT #1): a plan
    # regression adds one exchange — an extra shuffle stage plus extra
    # shuffle records — while a 1.5x host factor swamps the wall-clock
    # delta. The metrics channel must flag it regardless of host state.
    prior = {"q_join": _m(stages=3, swr=10_000)}
    now = {"q_join": _m(stages=4, swr=25_000)}
    flags = metric_regressions(now, prior)
    assert "q_join" in flags
    assert flags["q_join"]["stages"] == {"prev": 3, "now": 4}
    assert flags["q_join"]["shuffle_write_records"]["now"] == 25_000


def test_metric_regressions_ignore_host_noise_shaped_drift():
    # uniform host contention inflates wall time AND executor CPU but
    # leaves plan shape and shuffle volume IDENTICAL — the primary
    # channel flags nothing even at 2x CPU (this is what makes it
    # noise-immune; the round-8 live A/B across two noisy runs measured
    # zero structural flags and CPU-only drift), while the advisory
    # CPU_RULES list carries the CPU signal separately
    from streamz_spark.benchmetrics import CPU_RULES

    prior = {"q": _m(cpu=2_000)}
    now = {"q": _m(cpu=4_000)}
    assert metric_regressions(now, prior) == {}
    assert metric_regressions(now, prior, rules=CPU_RULES) == {
        "q": {"executor_cpu_ms": {"prev": 2_000, "now": 4_000}}
    }


def test_metric_regressions_expected_mode_suppressed():
    # tpch_q5's documented AQE alternating mode (broadcast-replan vs
    # sort-merge: 207 vs 118,322 shuffle records) must not re-flag on
    # every cross-mode comparison; unlisted fields still flag
    from streamz_spark.benchmetrics import metric_regressions

    prev = {"tpch_q5_local_supplier_volume": _m(stages=15, swr=207, swb=2022),
            "other_q": _m(swr=207)}
    now = {"tpch_q5_local_supplier_volume": _m(stages=16, swr=118_322, swb=1_383_123),
           "other_q": _m(swr=118_322)}
    flags = metric_regressions(now, prev)
    assert "tpch_q5_local_supplier_volume" not in flags
    assert "other_q" in flags  # only the listed query is suppressed
    # a q5 regression in an UNLISTED field still flags
    now2 = {"tpch_q5_local_supplier_volume": _m(stages=15, swr=207, swb=2022,
                                                inp=500 << 20)}
    flags2 = metric_regressions(now2, prev)
    assert "input_bytes" in flags2.get("tpch_q5_local_supplier_volume", {})


def test_metric_regressions_absolute_floors():
    # tiny queries: +60% of nearly-nothing is rounding, not regression
    prior = {"q": _m(swr=100, swb=1000, cpu=50, inp=1000)}
    now = {"q": _m(swr=160, swb=1600, cpu=80, inp=1600)}
    assert metric_regressions(now, prior) == {}


def test_metric_regressions_skip_failed_and_new_queries():
    prior = {"old": _m()}
    now = {"old": None, "new": _m()}  # harvest failed / no prior entry
    assert metric_regressions(now, prior) == {}


def test_metrics_baseline_accepts_noisy_artifacts(tmp_path):
    # unlike the wall-time baseline, noisy-stamped artifacts ARE
    # eligible metric bases — shuffle volume doesn't inflate with load
    _write(tmp_path, "BENCH_DETAIL_r07.json",
           sf=0.1, queries={"q": 1.5}, noisy_host=True,
           exec_metrics={"q": _m()})
    _write(tmp_path, "BENCH_DETAIL_r05.json",
           sf=0.1, queries={"q": 1.0})  # quiet but pre-metrics: skipped
    prior, tag, sf = bench.pick_metrics_baseline(str(tmp_path), "r08")
    assert tag == "r07" and sf == 0.1
    assert prior == {"q": _m()}


def test_metrics_baseline_same_tag_eligible(tmp_path):
    _write(tmp_path, "BENCH_DETAIL_r08.json",
           sf=0.1, queries={"q": 1.0}, exec_metrics={"q": _m()})
    _, tag, _ = bench.pick_metrics_baseline(str(tmp_path), "r08")
    assert tag == "r08"


def test_metrics_baseline_none_without_metrics(tmp_path):
    _write(tmp_path, "BENCH_DETAIL_r06.json", sf=0.1, queries={"q": 1.0})
    prior, tag, sf = bench.pick_metrics_baseline(str(tmp_path), "r08")
    assert prior == {} and tag is None


def test_harvest_group_metrics_live(spark):
    # end-to-end: a groupBy over range data must show >=2 complete
    # stages (map + reduce), real shuffle records, and nonzero CPU
    sc = spark.sparkContext
    sc.setJobGroup("bench_metrics_live_test", "probe")
    (spark.range(100_000)
     .selectExpr("id % 7 AS k", "id AS v")
     .groupBy("k").sum("v")
     .write.format("noop").mode("overwrite").save())
    sc.setJobGroup("bench_metrics_idle", "")
    m = harvest_group_metrics(spark, "bench_metrics_live_test")
    assert m["jobs"] >= 1
    assert m["stages"] >= 2
    assert m["shuffle_write_records"] > 0
    assert m["shuffle_read_bytes"] == m["shuffle_write_bytes"] > 0
    assert m["executor_cpu_ms"] > 0
    assert m["tasks"] > 0
