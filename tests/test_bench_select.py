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


def test_wait_for_clean_epoch_gating_order():
    """Round-6 gate (VERDICT r5 item 4): the epoch wait probes BEFORE
    consuming budget, sleeps only while dirty, and stops on either a
    clean probe or budget exhaustion."""
    from grate_spark.cdc.bench import wait_for_clean_epoch

    calls = []

    def probe_seq(vals):
        it = iter(vals)
        def probe():
            v = next(it)
            calls.append(("probe", v))
            return v
        return probe

    def sleeper(s):
        calls.append(("sleep", s))

    # clean immediately: no sleep, full budget back
    calls.clear()
    left = wait_for_clean_epoch(300.0, 7.0, probe_seq([9.0]), sleeper)
    assert left == 300.0 and calls == [("probe", 9.0)]

    # two dirty probes then clean: sleep between probes, budget drains
    calls.clear()
    left = wait_for_clean_epoch(300.0, 7.0,
                                probe_seq([2.0, 3.0, 8.0]), sleeper)
    assert [c[0] for c in calls] == ["probe", "sleep", "probe",
                                    "sleep", "probe"]
    assert abs(left - (300.0 - 2 * 10.4)) < 1e-9

    # budget exhaustion: stops even while dirty
    left = wait_for_clean_epoch(15.0, 7.0,
                                probe_seq([1.0] * 10), sleeper)
    assert left <= 0


def test_replay_bench_pre_gates_first_trial(monkeypatch):
    """replay_events_per_sec must consult the epoch gate BEFORE trial 1
    (not only after n_trials dirty trials, which burned 7/13 r5
    campaigns)."""
    from grate_spark.cdc import bench as B

    order = []
    monkeypatch.setattr(
        B, "wait_for_clean_epoch",
        lambda budget, min_ctrl, probe=None, sleeper=None:
        (order.append("gate"), budget)[1])

    class _FakePipe:
        def __init__(self, *a, **k):
            pass
        def replay(self, events, batch_size=None):
            order.append("trial")
            return [{"seconds": 0.01}]
        def results(self):
            class _R:
                def count(self):
                    return 1
            return _R()

    class _FakeEvents:
        def count(self):
            return 10

    monkeypatch.setattr(B, "CdcPipeline", _FakePipe)
    monkeypatch.setattr(B, "_ctrl_score", lambda *a, **k: 9.0)

    class _FakeSpark:
        class read:
            @staticmethod
            def parquet(p):
                return _FakeEvents()

    import os
    import tempfile
    wd = tempfile.mkdtemp()
    evp = os.path.join(wd, "ev.parquet")
    os.makedirs(evp, exist_ok=True)  # exists -> generation skipped
    B.replay_events_per_sec(_FakeSpark(), "unused-sf", n_trials=3,
                            workdir=wd, events_path=evp)
    assert order[0] == "gate" and "trial" in order
    first_trial = order.index("trial")
    assert order[:first_trial].count("gate") >= 1
