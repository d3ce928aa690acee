"""Unit tests for the bench's trial-selection logic (pure function —
no Spark): clean-pool median vs the degraded ctrl-normalized
upper-half fallback. The r4 driver run hit 6/6 dirty trials and the
old lower-middle median read 62.7 ev/s on an engine whose clean
medians were ~645 — these gates pin the selection behavior."""

from grate_spark.cdc.bench import select_median


def mk(eps, ctrl, clean):
    return {"events_per_sec": eps, "ctrl_miters": ctrl, "clean": clean}


def test_clean_pool_upper_middle_median():
    trials = [mk(100, 9, True), mk(200, 9, True),
              mk(300, 9, True), mk(400, 9, True)]
    med, degraded = select_median(trials)
    assert not degraded
    assert med["events_per_sec"] == 300  # upper middle, never lower


def test_clean_pool_ignores_dirty_trials():
    trials = [mk(10, 3, False), mk(500, 9, True), mk(600, 9, True)]
    med, degraded = select_median(trials)
    assert not degraded and med["events_per_sec"] == 600


def test_all_dirty_reports_upper_half_with_flag():
    # the exact r4 driver epoch (0/6 clean): the old selection reported
    # 62.7; the degraded rule must land in the fast cluster
    trials = [mk(22.52, 7.8, False), mk(49.22, 6.63, False),
              mk(62.69, 4.29, False), mk(160.85, 6.56, False),
              mk(151.83, 8.07, False), mk(168.37, 7.0, False)]
    med, degraded = select_median(trials)
    assert degraded
    assert med["events_per_sec"] >= 151.83


def test_degraded_reports_raw_not_normalized_value():
    trials = [mk(50, 3.5, False), mk(40, 3.5, False)]
    med, degraded = select_median(trials)
    assert degraded
    assert med["events_per_sec"] in (40, 50)  # a measured trial, raw


def test_single_trial():
    med, degraded = select_median([mk(100, 2.0, False)])
    assert degraded and med["events_per_sec"] == 100
    med, degraded = select_median([mk(100, 9.0, True)])
    assert degraded  # one clean trial is not a quorum
    assert med["events_per_sec"] == 100


def test_one_clean_among_dirty_is_degraded_but_prefers_fast():
    trials = [mk(100, 9, True), mk(10, 2, False)]
    med, degraded = select_median(trials)
    assert degraded and med["events_per_sec"] == 100
