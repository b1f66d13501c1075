"""Opt-in cross-task CPU-seconds meter (bench instrumentation, VERDICT r3
"Next round" #1).

Problem it solves: on this benchmark VM, stage WALL time swings 3-30x with
host phantom load on identical code+data, so a slow consolidate/query bench
cannot distinguish "engine regressed" from "host degraded".  CPU seconds
(``time.process_time``) are immune to page-fault stalls and scheduler
preemption: if CPU-seconds stay flat while wall inflates, the run was
noise-bound; if CPU-seconds scale with wall, the engine is doing more work.

Mechanics: the bench driver creates one named Ray actor
(``start_meter()``).  Worker-side hot sections call ``report(key, secs)``
— a best-effort fire-and-forget that no-ops (and caches the miss) when no
meter actor exists, so normal library use pays one failed ``get_actor``
lookup per process and nothing else.  The driver reads per-key totals with
``read_meter()`` between stages.
"""

from __future__ import annotations

METER_NAME = "ire_cpu_meter"

_handle = None  # per-process cache: None = unresolved, False = absent


class _CpuMeter:
    def __init__(self):
        self.user: dict[str, float] = {}
        self.sys: dict[str, float] = {}
        self.tasks: dict[str, int] = {}

    def add(self, key: str, user_secs: float, sys_secs: float = 0.0) -> None:
        self.user[key] = self.user.get(key, 0.0) + float(user_secs)
        self.sys[key] = self.sys.get(key, 0.0) + float(sys_secs)
        self.tasks[key] = self.tasks.get(key, 0) + 1

    def read_reset(self) -> dict:
        # user_secs is the decisive channel on this host: page-fault
        # handling shows up as guest SYSTEM time, so user time stays flat
        # under host noise while sys+wall inflate
        out = {
            k: {
                "cpu_secs": round(v + self.sys.get(k, 0.0), 4),
                "user_secs": round(v, 4),
                "sys_secs": round(self.sys.get(k, 0.0), 4),
                "tasks": self.tasks.get(k, 0),
            }
            for k, v in self.user.items()
        }
        self.user, self.sys, self.tasks = {}, {}, {}
        return out


def start_meter():
    """Driver-side: create (or reuse) the named meter actor.  Returns the
    handle; the actor dies with the creating driver."""
    import ray

    global _handle
    try:
        _handle = ray.get_actor(METER_NAME)
    except ValueError:
        _handle = (
            ray.remote(_CpuMeter).options(name=METER_NAME, num_cpus=0).remote()
        )
    return _handle


def read_meter() -> dict:
    """Driver-side: per-key {cpu_secs, tasks} since the last read; {} when
    no meter is running."""
    import ray

    try:
        h = ray.get_actor(METER_NAME)
    except Exception:
        return {}
    return ray.get(h.read_reset.remote())


def cpu_mark() -> tuple[float, float]:
    """(user, sys) CPU seconds of this process — pair with report_since."""
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    return (ru.ru_utime, ru.ru_stime)


def report_since(key: str, mark: tuple[float, float]) -> None:
    """Report the (user, sys) CPU delta since ``mark`` under ``key``."""
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    report(key, ru.ru_utime - mark[0], ru.ru_stime - mark[1])


def report(key: str, user_secs: float, sys_secs: float = 0.0) -> None:
    """Worker-side: best-effort add.  Never raises; no-ops without a meter."""
    global _handle
    if _handle is False:
        return
    try:
        import ray

        if _handle is None:
            if not ray.is_initialized():
                _handle = False
                return
            try:
                _handle = ray.get_actor(METER_NAME)
            except ValueError:
                _handle = False
                return
        _handle.add.remote(key, user_secs, sys_secs)
    except Exception:
        _handle = False
