"""Embedded scheduler: cron next-fire math, trigger-kwargs validation
(reference mixins/schedule.py:65-77), and real fires that land pipeline
results in a store (schedule.py:79-131 ``schedule_job`` semantics)."""

from __future__ import annotations

import datetime as dt
import time

import pytest

from event_pipeline_spark.streaming.schedule import ScheduleError
from event_pipeline_spark.streaming.scheduler import (
    CronSchedule,
    EmbeddedScheduler,
    schedule_pipeline,
)


def _wait_until(cond, timeout=8.0, step=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if cond():
            return True
        time.sleep(step)
    return False


class TestCronNextFire:
    def test_hour_pins_lower_fields_to_min(self):
        # APScheduler fill rule: hour=3 -> 03:00:00 daily
        c = CronSchedule(hour=3)
        got = c.next_fire(dt.datetime(2026, 8, 13, 10, 30, 0))
        assert got == dt.datetime(2026, 8, 14, 3, 0, 0)
        got = c.next_fire(dt.datetime(2026, 8, 13, 2, 59, 59))
        assert got == dt.datetime(2026, 8, 13, 3, 0, 0)

    def test_step_and_list_expressions(self):
        c = CronSchedule(minute="*/15")
        assert c.next_fire(dt.datetime(2026, 1, 1, 9, 16, 0)) == dt.datetime(
            2026, 1, 1, 9, 30, 0
        )
        c = CronSchedule(hour="9-17", minute="0,30")
        assert c.next_fire(dt.datetime(2026, 1, 1, 17, 30, 0)) == dt.datetime(
            2026, 1, 2, 9, 0, 0
        )

    def test_day_of_week_names(self):
        c = CronSchedule(day_of_week="mon", hour=6)
        # 2026-08-13 is a Thursday; next Monday is 08-17
        assert c.next_fire(dt.datetime(2026, 8, 13, 12, 0, 0)) == dt.datetime(
            2026, 8, 17, 6, 0, 0
        )

    def test_month_rollover_and_invalid_days_skipped(self):
        c = CronSchedule(day=31)
        # April has 30 days -> skips to May 31
        assert c.next_fire(dt.datetime(2026, 4, 1, 0, 0, 0)) == dt.datetime(
            2026, 4, 30, 0, 0, 0
        ) or c.next_fire(dt.datetime(2026, 4, 1, 0, 0, 0)) == dt.datetime(
            2026, 5, 31, 0, 0, 0
        )

    def test_never_fires_raises(self):
        with pytest.raises(ScheduleError, match="never fires"):
            CronSchedule(month=2, day=31).next_fire(dt.datetime(2026, 1, 1))

    def test_exact_second_is_strictly_after(self):
        c = CronSchedule(second="*/1")
        t = dt.datetime(2026, 1, 1, 0, 0, 5)
        assert c.next_fire(t) == dt.datetime(2026, 1, 1, 0, 0, 6)

    def test_bad_expressions(self):
        with pytest.raises(ScheduleError, match="out of range"):
            CronSchedule(minute=61)
        with pytest.raises(ScheduleError, match="inverted"):
            CronSchedule(hour="10-3")
        with pytest.raises(ScheduleError, match="cron trigger takes"):
            CronSchedule(centuries=1)


class TestValidation:
    """Same error surface as the reference's _validate_trigger_args."""

    def test_unknown_trigger(self):
        with pytest.raises(ScheduleError, match="unknown trigger"):
            EmbeddedScheduler().add_job(lambda: None, "hourly")

    def test_interval_rejects_unknown_and_empty(self):
        s = EmbeddedScheduler()
        with pytest.raises(ScheduleError, match="invalid trigger arguments"):
            s.add_job(lambda: None, "interval", lightyears=1)
        with pytest.raises(ScheduleError, match="expected argument"):
            s.add_job(lambda: None, "interval")

    def test_cron_requires_a_field(self):
        with pytest.raises(ScheduleError, match="expected argument"):
            EmbeddedScheduler().add_job(lambda: None, "cron")

    def test_duplicate_job_id(self):
        s = EmbeddedScheduler()
        s.add_job(lambda: None, "interval", id="j", hours=1)
        try:
            with pytest.raises(ScheduleError, match="already scheduled"):
                s.add_job(lambda: None, "interval", id="j", hours=1)
        finally:
            s.shutdown()


class TestFiring:
    def test_interval_fires_repeatedly_then_shutdown(self):
        s = EmbeddedScheduler()
        fires: list[float] = []
        job = s.add_job(lambda: fires.append(time.monotonic()), "interval", seconds=0.15)
        assert _wait_until(lambda: len(fires) >= 3)
        s.shutdown()
        n = len(fires)
        time.sleep(0.4)
        assert len(fires) == n  # no fires after shutdown
        assert job.next_run_time is None

    def test_date_fires_once(self):
        s = EmbeddedScheduler()
        fires: list[int] = []
        s.add_job(lambda: fires.append(1), "date")  # run_date omitted -> now
        assert _wait_until(lambda: len(fires) == 1)
        time.sleep(0.3)
        assert len(fires) == 1
        assert s.get_jobs() == []
        s.shutdown()

    def test_cron_per_second_fires(self):
        s = EmbeddedScheduler()
        fires: list[int] = []
        s.add_job(lambda: fires.append(1), "cron", second="*/1")
        assert _wait_until(lambda: len(fires) >= 2, timeout=5.0)
        s.shutdown()

    def test_max_runs_and_job_error_does_not_kill_schedule(self):
        s = EmbeddedScheduler()
        fires: list[int] = []

        def boom():
            fires.append(1)
            raise RuntimeError("job body failure")

        s.add_job(boom, "interval", seconds=0.1, max_runs=2)
        assert _wait_until(lambda: len(fires) == 2)
        time.sleep(0.35)
        assert len(fires) == 2  # max_runs honored even though every run raised
        assert s.get_jobs() == []
        s.shutdown()

    def test_remove_job(self):
        s = EmbeddedScheduler()
        fires: list[int] = []
        job = s.add_job(lambda: fires.append(1), "interval", seconds=5)
        s.remove_job(job.id)
        assert s.get_jobs() == []
        with pytest.raises(ScheduleError, match="no such job"):
            s.remove_job(job.id)


class TestPipelineIntegration:
    """A *scheduled pipeline* actually executes and lands rows in a store
    — the reference's end-to-end schedule_job workflow."""

    def test_scheduled_pipeline_lands_rows_in_store(self, spark, tmp_path):
        from event_pipeline_spark.core.events import EventBase
        from event_pipeline_spark.plans.pipeline import Pipeline
        from event_pipeline_spark.stores.sqlite import SQLiteStore

        store = SQLiteStore(str(tmp_path / "sched.db"), spark)

        class SchedTick(EventBase):
            def process(self, **params):
                df = self.spark.range(3).withColumnRenamed("id", "n")
                store.upsert_record(
                    "ticks",
                    f"t{time.monotonic_ns()}",
                    {"rows": df.count(), "at": dt.datetime.now().isoformat()},
                )
                return True, df

        class TickPipeline(Pipeline):
            class Meta:
                pointy = "SchedTick"

        s = EmbeddedScheduler()
        p = TickPipeline()
        job = schedule_pipeline(
            p, spark, "interval", scheduler=s, seconds=0.5, max_runs=2
        )
        assert job.name == "TickPipeline"
        try:
            assert _wait_until(lambda: _count(store) >= 2, timeout=15.0)
        finally:
            s.shutdown()
        assert store.count_where("ticks", rows=3) == _count(store)
        assert p._last_run is not None  # the pipeline really ran
        store.close()

    def test_batch_pipeline_dispatches_execute(self, spark):
        from event_pipeline_spark.core.events import event
        from event_pipeline_spark.core.fields import InputDataField
        from event_pipeline_spark.plans.pipeline import BatchPipeline

        seen: list[list] = []

        @event
        def SchedConsume(names):
            seen.append(list(names) if names else None)
            return None

        class SchedBP(BatchPipeline):
            names = InputDataField(list, batch_size=2)

            class Meta:
                pointy = "SchedConsume"

        s = EmbeddedScheduler()
        schedule_pipeline(SchedBP(names=["a", "b", "c"]), spark, "date", scheduler=s)
        try:
            assert _wait_until(lambda: len(seen) == 2, timeout=15.0)
        finally:
            s.shutdown()
        assert seen == [["a", "b"], ["c"]]


def _count(store) -> int:
    try:
        return store.count("ticks")
    except Exception:
        return 0
