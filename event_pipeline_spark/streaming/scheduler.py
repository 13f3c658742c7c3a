"""Embedded driver-side job scheduler (interval / date / cron).

The reference schedules pipeline runs on an APScheduler
``BackgroundScheduler`` — ``schedule_job`` validates trigger kwargs,
wraps the pipeline in a ``_PipeLineJob`` and registers it
(nexus/mixins/schedule.py:46-131). This module supplies the same embedded
execution without the dependency: stdlib ``threading.Timer`` per job, a
cron next-fire computed APScheduler-style (most-significant omitted
fields → ``*``, less-significant → their minimum, so ``hour=3`` means
03:00:00 daily), and the same trigger-kwargs validation error surface.

Division of labor with ``streaming/schedule.py``: continuous *data*
cadence belongs to Structured Streaming triggers (``make_trigger``);
this scheduler owns *job* cadence — kicking off batch pipeline runs on
a clock, which the reference does in-process and a cluster deployment
would hand to Airflow/cron. Both are driver-side, O(jobs) timers — no
executor resources are held between fires.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import logging
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

from event_pipeline_spark.streaming.schedule import ScheduleError

logger = logging.getLogger(__name__)

_DOW_NAMES = {n: i for i, n in enumerate(("mon", "tue", "wed", "thu", "fri", "sat", "sun"))}
_MONTH_NAMES = {
    n: i + 1
    for i, n in enumerate(
        ("jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec")
    )
}

# (name, min, max) in significance order; day and day_of_week share a level
_CRON_FIELDS: list[tuple[str, int, int]] = [
    ("year", 1970, 9999),
    ("month", 1, 12),
    ("day", 1, 31),
    ("hour", 0, 23),
    ("minute", 0, 59),
    ("second", 0, 59),
]
_CRON_KW = {name for name, _, _ in _CRON_FIELDS} | {"day_of_week"}
_INTERVAL_KW = {"weeks", "days", "hours", "minutes", "seconds", "start_date"}
_DATE_KW = {"run_date"}


def _parse_field(expr: Any, lo: int, hi: int, names: dict[str, int] | None = None) -> list[int]:
    """One cron field -> sorted allowed values. Grammar (APScheduler/cron
    subset): ``*``, ``*/step``, ``a``, ``a-b``, ``a-b/step``, comma lists,
    and names for month/day_of_week."""

    def atom(tok: str) -> int:
        tok = tok.strip().lower()
        if names and tok in names:
            return names[tok]
        try:
            v = int(tok)
        except ValueError:
            raise ScheduleError(f"bad cron atom {tok!r}") from None
        if not lo <= v <= hi:
            raise ScheduleError(f"cron value {v} out of range [{lo}, {hi}]")
        return v

    allowed: set[int] = set()
    for term in str(expr).split(","):
        term = term.strip()
        step = 1
        if "/" in term:
            term, step_s = term.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ScheduleError(f"cron step must be positive, got {step}")
        if term in ("*", ""):
            a, b = lo, hi
        elif "-" in term and not term.lstrip("-").isdigit():
            a_s, b_s = term.split("-", 1)
            a, b = atom(a_s), atom(b_s)
            if b < a:
                raise ScheduleError(f"inverted cron range {a}-{b}")
        else:
            a = b = atom(term)
        allowed.update(range(a, b + 1, step))
    if not allowed:
        raise ScheduleError(f"cron field {expr!r} matches nothing")
    return sorted(allowed)


class CronSchedule:
    """Compiled cron constraint with APScheduler default-fill semantics:
    fields more significant than the most significant one given are
    ``*``; less significant ones are pinned to their minimum."""

    def __init__(self, **fields: Any) -> None:
        unknown = set(fields) - _CRON_KW
        if unknown:
            raise ScheduleError(
                f"cron trigger takes {sorted(_CRON_KW)}, got {sorted(unknown)}"
            )
        if not fields:
            raise ScheduleError("cron trigger needs at least one field")
        sig_names = [name for name, _, _ in _CRON_FIELDS]
        # day_of_week sits at day significance for the fill rule
        given = {("day" if k == "day_of_week" else k) for k in fields}
        most_sig = min(sig_names.index(k) for k in given)
        self.allowed: dict[str, list[int]] = {}
        for idx, (name, lo, hi) in enumerate(_CRON_FIELDS):
            if name in fields:
                names = _MONTH_NAMES if name == "month" else None
                self.allowed[name] = _parse_field(fields[name], lo, hi, names)
            elif idx < most_sig or (name == "day" and "day_of_week" in fields):
                self.allowed[name] = list(range(lo, hi + 1))
            elif idx == most_sig:
                self.allowed[name] = list(range(lo, hi + 1))
            else:
                self.allowed[name] = [lo]
        self.dow = (
            _parse_field(fields["day_of_week"], 0, 6, _DOW_NAMES)
            if "day_of_week" in fields
            else list(range(7))
        )

    def next_fire(self, after: _dt.datetime) -> _dt.datetime:
        """Earliest matching instant strictly after ``after`` (second
        resolution). Hierarchical search — at most
        O(years·12·31·|hour|·|minute|·|second| candidates) with pruning,
        in practice a handful of iterations."""
        t = (after + _dt.timedelta(seconds=1)).replace(microsecond=0)
        want = (t.year, t.month, t.day, t.hour, t.minute, t.second)

        def search(level: int, prefix: tuple[int, ...], tight: bool) -> tuple[int, ...] | None:
            if level == len(_CRON_FIELDS):
                return prefix
            name = _CRON_FIELDS[level][0]
            for v in self.allowed[name]:
                if tight and v < want[level]:
                    continue
                if name == "day":
                    year, month = prefix
                    if v > calendar.monthrange(year, month)[1]:
                        continue
                    if _dt.date(year, month, v).weekday() not in self.dow:
                        continue
                still_tight = tight and v == want[level]
                got = search(level + 1, prefix + (v,), still_tight)
                if got is not None:
                    return got
            return None

        # cap the year scan: beyond the allowed years there is no fire
        got = search(0, (), True)
        if got is None:
            raise ScheduleError("cron schedule never fires again")
        return _dt.datetime(*got)


@dataclass
class Job:
    """One registered job (the reference returns APScheduler's Job)."""

    id: str
    name: str
    trigger: str
    func: Callable[[], Any]
    next_run_time: _dt.datetime | None
    interval: _dt.timedelta | None = None
    cron: CronSchedule | None = None
    max_runs: int | None = None
    runs: int = 0
    _timer: threading.Timer | None = field(default=None, repr=False)


class EmbeddedScheduler:
    """Minimal BackgroundScheduler stand-in: one daemon Timer per job.

    Execution runs in the timer thread (like APScheduler's default
    thread-pool of size≥1); the *next* fire is armed before the job body
    runs, so a slow run never skews the clock — same drift-free behavior
    as IntervalTrigger. Exceptions are logged and the schedule continues.
    """

    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}
        self._lock = threading.Lock()
        self._seq = 0

    # -- validation (reference _validate_trigger_args, schedule.py:65-77)

    @staticmethod
    def _validate(trigger: str, kwargs: dict[str, Any]) -> None:
        expected = {"interval": _INTERVAL_KW, "date": _DATE_KW, "cron": _CRON_KW}
        if trigger not in expected:
            raise ScheduleError(
                f"unknown trigger {trigger!r}; expected one of {sorted(expected)}"
            )
        unknown = set(kwargs) - expected[trigger]
        if unknown:
            raise ScheduleError(
                f"invalid trigger arguments {sorted(unknown)}; expected "
                f"argument(s) {sorted(expected[trigger])}"
            )
        if trigger == "interval" and not set(kwargs) & (_INTERVAL_KW - {"start_date"}):
            raise ScheduleError(
                f"invalid trigger arguments; expected argument(s) {sorted(_INTERVAL_KW)}"
            )
        if trigger == "cron" and not kwargs:
            raise ScheduleError(
                f"invalid trigger arguments; expected argument(s) {sorted(_CRON_KW)}"
            )

    # -- job registry ---------------------------------------------------

    def add_job(
        self,
        func: Callable[[], Any],
        trigger: str,
        *,
        id: str | None = None,
        name: str | None = None,
        max_runs: int | None = None,
        **trigger_args: Any,
    ) -> Job:
        self._validate(trigger, trigger_args)
        now = _dt.datetime.now()
        interval = cron = None
        if trigger == "interval":
            start = trigger_args.pop("start_date", None)
            interval = _dt.timedelta(
                **{k: float(v) for k, v in trigger_args.items()}
            )
            if interval.total_seconds() <= 0:
                raise ScheduleError("interval must be positive")
            first = start if start is not None else now + interval
        elif trigger == "date":
            first = trigger_args.get("run_date") or now
        else:
            cron = CronSchedule(**trigger_args)
            first = cron.next_fire(now)

        with self._lock:
            self._seq += 1
            job_id = id or f"job-{self._seq}"
            if job_id in self._jobs:
                raise ScheduleError(f"job id {job_id!r} already scheduled")
            job = Job(
                id=job_id,
                name=name or getattr(func, "__name__", job_id),
                trigger=trigger,
                func=func,
                next_run_time=first,
                interval=interval,
                cron=cron,
                max_runs=max_runs,
            )
            self._jobs[job_id] = job
            self._arm(job, now)
        return job

    def get_jobs(self) -> list[Job]:
        with self._lock:
            return list(self._jobs.values())

    def remove_job(self, job_id: str) -> None:
        with self._lock:
            job = self._jobs.pop(job_id, None)
        if job is None:
            raise ScheduleError(f"no such job {job_id!r}")
        if job._timer is not None:
            job._timer.cancel()
        job.next_run_time = None

    def shutdown(self) -> None:
        with self._lock:
            jobs, self._jobs = list(self._jobs.values()), {}
        for job in jobs:
            if job._timer is not None:
                job._timer.cancel()
            job.next_run_time = None

    # -- firing ---------------------------------------------------------

    def _arm(self, job: Job, now: _dt.datetime) -> None:
        delay = max(0.0, (job.next_run_time - now).total_seconds())
        job._timer = threading.Timer(delay, self._fire, args=(job,))
        job._timer.daemon = True
        job._timer.start()

    def _fire(self, job: Job) -> None:
        fired_at = job.next_run_time or _dt.datetime.now()
        job.runs += 1
        done = job.trigger == "date" or (
            job.max_runs is not None and job.runs >= job.max_runs
        )
        with self._lock:
            live = self._jobs.get(job.id) is job
            if live and not done:
                if job.trigger == "interval":
                    job.next_run_time = fired_at + job.interval
                else:
                    job.next_run_time = job.cron.next_fire(
                        max(fired_at, _dt.datetime.now())
                    )
                self._arm(job, _dt.datetime.now())
            elif live:
                del self._jobs[job.id]
                job.next_run_time = None
        try:
            job.func()
        except Exception:  # noqa: BLE001 — scheduler must survive job errors
            logger.exception("scheduled job %s failed", job.id)


_DEFAULT_SCHEDULER: EmbeddedScheduler | None = None
_DEFAULT_LOCK = threading.Lock()


def get_pipeline_scheduler() -> EmbeddedScheduler:
    """Process-wide scheduler, like the reference's module-level
    ``_PIPELINE_BACKGROUND_SCHEDULER`` (schedule.py:17)."""
    global _DEFAULT_SCHEDULER
    with _DEFAULT_LOCK:
        if _DEFAULT_SCHEDULER is None:
            _DEFAULT_SCHEDULER = EmbeddedScheduler()
        return _DEFAULT_SCHEDULER


def schedule_pipeline(
    pipeline: Any,
    spark: Any,
    trigger: str,
    *,
    scheduler: EmbeddedScheduler | None = None,
    max_runs: int | None = None,
    **trigger_args: Any,
) -> Job:
    """Register a pipeline run on the scheduler — the reference's
    ``ScheduleMixin.schedule_job`` (schedule.py:79-131): ``BatchPipeline``
    fires ``execute()``, plain ``Pipeline`` fires ``start(force_rerun=True)``
    (the ``_PipeLineJob`` dispatch, schedule.py:36-43)."""
    from event_pipeline_spark.plans.pipeline import BatchPipeline

    sched = scheduler or get_pipeline_scheduler()

    if isinstance(pipeline, BatchPipeline):
        run = lambda: pipeline.execute(spark)  # noqa: E731
    else:
        run = lambda: pipeline.start(spark, force_rerun=True)  # noqa: E731
    return sched.add_job(
        run,
        trigger,
        id=f"{type(pipeline).__name__}-{id(pipeline):x}",
        name=type(pipeline).__name__,
        max_runs=max_runs,
        **trigger_args,
    )
