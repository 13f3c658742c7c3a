"""Scheduling → Structured Streaming triggers (SURVEY §2.8, §3.3).

The reference registers pipeline runs on an APScheduler
``BackgroundScheduler`` with interval/date/cron triggers, validating the
trigger kwargs against the trigger class signature
(nexus/mixins/schedule.py:46-131). The Spark mapping:

- **interval** → ``trigger(processingTime="N seconds")`` on a continuous
  stream (the engine re-runs the plan each interval; state/checkpoints
  replace the scheduler's job store);
- **once / date-now** → ``trigger(availableNow=True)`` — process all
  available input then stop (the reference's one-shot job);
- **cron / future date** → deliberately NOT emulated in-process: on a
  cluster an external scheduler (Airflow/cron/k8s CronJob) invokes a
  batch run. ``make_trigger`` raises with that guidance, mirroring the
  reference's kwarg validation errors (schedule.py:94-107).
"""

from __future__ import annotations

from typing import Any

_INTERVAL_KW = {"weeks", "days", "hours", "minutes", "seconds"}
_SECONDS = {"weeks": 604800, "days": 86400, "hours": 3600, "minutes": 60, "seconds": 1}


class ScheduleError(ValueError):
    """Invalid trigger kwargs (reference raises on signature mismatch)."""


def make_trigger(trigger: str, **kwargs: Any) -> dict[str, Any]:
    """Build ``DataStreamWriter.trigger(**...)`` kwargs from the
    reference's (trigger_name, **trigger_args) surface."""
    if trigger == "interval":
        unknown = set(kwargs) - _INTERVAL_KW
        if unknown:
            raise ScheduleError(
                f"interval trigger takes {sorted(_INTERVAL_KW)}, got {sorted(unknown)}"
            )
        if not kwargs:
            raise ScheduleError("interval trigger needs at least one duration kwarg")
        total = sum(_SECONDS[k] * float(v) for k, v in kwargs.items())
        if total <= 0:
            raise ScheduleError("interval must be positive")
        return {"processingTime": f"{int(total)} seconds"}
    if trigger in ("once", "availableNow"):
        if kwargs:
            raise ScheduleError(f"{trigger} trigger takes no kwargs")
        return {"availableNow": True}
    if trigger in ("date", "cron"):
        raise ScheduleError(
            f"{trigger!r} is job cadence, not stream cadence: use "
            "streaming.scheduler.EmbeddedScheduler/schedule_pipeline for "
            "in-process date/cron runs (the reference's APScheduler path), "
            "or an external scheduler (Airflow/cron) on a cluster"
        )
    raise ScheduleError(f"unknown trigger {trigger!r}")
