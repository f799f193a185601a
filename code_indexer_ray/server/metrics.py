"""Metrics tier — counters/gauges/histograms with a /metrics exposition.

Reference ``server/telemetry/`` (Story #695/#696: ``TelemetryManager`` OTEL
lifecycle, ``metrics_instrumentation.py`` request counters + duration
histograms, ``job_metrics.py`` job lifecycle counters/histograms with
active/queued observable gauges, ``machine_metrics.py`` system gauges —
``system.cpu.usage``, ``system.memory.usage``, ``system.disk.free``,
``system.disk.io.read/write``, ``system.network.io.receive/transmit``).

The OTEL SDK is not available in this environment, so the tier is a
self-contained stdlib registry with the SAME metric vocabulary, exposed in
the Prometheus text exposition format (the other open standard) at
``GET /metrics``:

- :class:`Counter` / :class:`Gauge` / :class:`Histogram` — thread-safe,
  labeled instruments; gauges may be OBSERVABLE (a callback read at
  scrape time, the OTEL observable-gauge pattern the reference uses for
  job/machine gauges).
- :class:`MetricsRegistry.render` — one scrape = one consistent snapshot.
- :class:`MachineMetricsCollector` — /proc + statvfs readers emitting the
  reference's system.* metric names (cpu from /proc/stat deltas, memory
  from MemAvailable/MemTotal, disk free, cumulative disk/net IO).

Zero overhead when unused: nothing is sampled until a scrape or an
explicit record call (the reference's lazy-when-disabled requirement).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Callable, Iterable

__all__ = [
    "Counter",
    "Gauge",
    "Histogram",
    "MetricsRegistry",
    "MachineMetricsCollector",
    "DEFAULT_LATENCY_BUCKETS",
]

#: seconds — request-latency histogram bounds (sub-ms daemon hits through
#: multi-second cold loads)
DEFAULT_LATENCY_BUCKETS = (
    0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0
)


def _fmt_labels(labels: tuple[tuple[str, str], ...]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{_escape(v)}"' for k, v in labels)
    return "{" + inner + "}"


def _escape(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _san(name: str) -> str:
    """OTEL dotted names → Prometheus underscore names."""
    return name.replace(".", "_").replace("-", "_")


class _Instrument:
    def __init__(self, name: str, help_text: str):
        self.name = name
        self.help = help_text
        self._lock = threading.Lock()


class Counter(_Instrument):
    kind = "counter"

    def __init__(self, name: str, help_text: str = ""):
        super().__init__(name, help_text)
        self._values: dict[tuple, float] = {}

    def inc(self, amount: float = 1.0, **labels) -> None:
        key = tuple(sorted(labels.items()))
        with self._lock:
            self._values[key] = self._values.get(key, 0.0) + amount

    def value(self, **labels) -> float:
        key = tuple(sorted(labels.items()))
        with self._lock:
            return self._values.get(key, 0.0)

    def _render(self) -> Iterable[str]:
        with self._lock:
            items = sorted(self._values.items())
        n = _san(self.name)
        for key, v in items:
            yield f"{n}_total{_fmt_labels(key)} {_num(v)}"


class Gauge(_Instrument):
    kind = "gauge"

    def __init__(
        self,
        name: str,
        help_text: str = "",
        callback: Callable[[], float | dict] | None = None,
    ):
        super().__init__(name, help_text)
        self._values: dict[tuple, float] = {}
        self._callback = callback

    def set(self, value: float, **labels) -> None:
        key = tuple(sorted(labels.items()))
        with self._lock:
            self._values[key] = float(value)

    def _render(self) -> Iterable[str]:
        n = _san(self.name)
        if self._callback is not None:
            got = self._callback()
            if isinstance(got, dict):
                # observable gauge fanning out one series per label value
                for label_val, v in sorted(got.items()):
                    yield f'{n}{{state="{_escape(label_val)}"}} {_num(v)}'
            else:
                yield f"{n} {_num(got)}"
            return
        with self._lock:
            items = sorted(self._values.items())
        for key, v in items:
            yield f"{n}{_fmt_labels(key)} {_num(v)}"


class Histogram(_Instrument):
    kind = "histogram"

    def __init__(
        self,
        name: str,
        help_text: str = "",
        buckets: tuple[float, ...] = DEFAULT_LATENCY_BUCKETS,
    ):
        super().__init__(name, help_text)
        self.buckets = tuple(sorted(buckets))
        self._counts: dict[tuple, list[int]] = {}
        self._sums: dict[tuple, float] = {}
        self._totals: dict[tuple, int] = {}

    def observe(self, value: float, **labels) -> None:
        key = tuple(sorted(labels.items()))
        with self._lock:
            counts = self._counts.setdefault(key, [0] * len(self.buckets))
            for i, b in enumerate(self.buckets):
                if value <= b:
                    counts[i] += 1
                    break
            self._sums[key] = self._sums.get(key, 0.0) + value
            self._totals[key] = self._totals.get(key, 0) + 1

    def percentile(self, q: float, **labels) -> float:
        """Approximate quantile from bucket counts (upper-bound estimate)."""
        key = tuple(sorted(labels.items()))
        with self._lock:
            counts = list(self._counts.get(key, []))
            total = self._totals.get(key, 0)
        if total == 0:
            return 0.0
        target = q * total
        acc = 0
        for i, c in enumerate(counts):
            acc += c
            if acc >= target:
                return self.buckets[i]
        return float("inf")

    def _render(self) -> Iterable[str]:
        with self._lock:
            keys = sorted(self._counts)
            snap = {
                k: (list(self._counts[k]), self._sums[k], self._totals[k])
                for k in keys
            }
        n = _san(self.name)
        for key, (counts, total_sum, total_n) in snap.items():
            acc = 0
            for i, b in enumerate(self.buckets):
                acc += counts[i]
                lb = key + (("le", _num(b)),)
                yield f"{n}_bucket{_fmt_labels(lb)} {acc}"
            lb = key + (("le", "+Inf"),)
            yield f"{n}_bucket{_fmt_labels(lb)} {total_n}"
            yield f"{n}_sum{_fmt_labels(key)} {_num(total_sum)}"
            yield f"{n}_count{_fmt_labels(key)} {total_n}"


def _num(v: float) -> str:
    f = float(v)
    return str(int(f)) if f.is_integer() else repr(f)


class MetricsRegistry:
    """Named instruments + one-shot text exposition."""

    def __init__(self):
        self._instruments: dict[str, _Instrument] = {}
        self._lock = threading.Lock()

    def counter(self, name: str, help_text: str = "") -> Counter:
        return self._get_or_make(name, lambda: Counter(name, help_text), Counter)

    def gauge(self, name: str, help_text: str = "", callback=None) -> Gauge:
        return self._get_or_make(
            name, lambda: Gauge(name, help_text, callback=callback), Gauge
        )

    def histogram(
        self, name: str, help_text: str = "",
        buckets: tuple[float, ...] = DEFAULT_LATENCY_BUCKETS,
    ) -> Histogram:
        return self._get_or_make(
            name, lambda: Histogram(name, help_text, buckets=buckets), Histogram
        )

    def _get_or_make(self, name, factory, cls):
        with self._lock:
            got = self._instruments.get(name)
            if got is None:
                got = factory()
                self._instruments[name] = got
            elif not isinstance(got, cls):
                raise ValueError(f"metric {name!r} already registered as {got.kind}")
            return got

    def render(self) -> str:
        with self._lock:
            instruments = list(self._instruments.values())
        lines: list[str] = []
        for ins in instruments:
            n = _san(ins.name)
            if ins.help:
                lines.append(f"# HELP {n} {ins.help}")
            lines.append(f"# TYPE {n} {ins.kind}")
            lines.extend(ins._render())
        return "\n".join(lines) + "\n"


class MachineMetricsCollector:
    """System gauges with the reference's metric names (machine_metrics.py),
    read from /proc + statvfs — no psutil in this container."""

    def __init__(self, disk_path: str = "/"):
        self.disk_path = disk_path
        self._last_cpu: tuple[float, float] | None = None  # (busy, total)

    def register(self, registry: MetricsRegistry) -> None:
        registry.gauge("system.cpu.usage", "CPU usage percent (0-100)",
                       callback=self.cpu_usage)
        registry.gauge("system.memory.usage", "Memory usage percent (0-100)",
                       callback=self.memory_usage)
        registry.gauge("system.disk.free", "Free disk bytes",
                       callback=self.disk_free)
        registry.gauge("system.disk.io.read", "Cumulative disk read bytes",
                       callback=lambda: self.disk_io()[0])
        registry.gauge("system.disk.io.write", "Cumulative disk write bytes",
                       callback=lambda: self.disk_io()[1])
        registry.gauge("system.network.io.receive", "Cumulative net rx bytes",
                       callback=lambda: self.net_io()[0])
        registry.gauge("system.network.io.transmit", "Cumulative net tx bytes",
                       callback=lambda: self.net_io()[1])

    def cpu_usage(self) -> float:
        try:
            with open("/proc/stat") as f:
                parts = f.readline().split()[1:]
            nums = [float(x) for x in parts[:8]]
        except (OSError, ValueError, IndexError):
            return 0.0
        idle = nums[3] + (nums[4] if len(nums) > 4 else 0.0)
        total = sum(nums)
        busy = total - idle
        prev, self._last_cpu = self._last_cpu, (busy, total)
        if prev is None or total <= prev[1]:
            return 0.0
        dt = total - prev[1]
        return round(100.0 * (busy - prev[0]) / dt, 2) if dt > 0 else 0.0

    def memory_usage(self) -> float:
        try:
            info: dict[str, float] = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, _, rest = line.partition(":")
                    info[k] = float(rest.split()[0])
            total = info["MemTotal"]
            avail = info.get("MemAvailable", info.get("MemFree", 0.0))
            return round(100.0 * (1.0 - avail / total), 2) if total else 0.0
        except (OSError, KeyError, ValueError, ZeroDivisionError):
            return 0.0

    def disk_free(self) -> float:
        try:
            st = os.statvfs(self.disk_path)
            return float(st.f_bavail * st.f_frsize)
        except OSError:
            return 0.0

    def disk_io(self) -> tuple[float, float]:
        read = written = 0.0
        try:
            with open("/proc/diskstats") as f:
                for line in f:
                    p = line.split()
                    if len(p) < 10 or not p[2][-1].isalpha():
                        continue  # skip partitions (sda1); count whole devices
                    read += float(p[5]) * 512
                    written += float(p[9]) * 512
        except (OSError, ValueError):
            pass
        return read, written

    def net_io(self) -> tuple[float, float]:
        rx = tx = 0.0
        try:
            with open("/proc/net/dev") as f:
                for line in f.readlines()[2:]:
                    name, _, rest = line.partition(":")
                    if name.strip() == "lo":
                        continue
                    p = rest.split()
                    rx += float(p[0])
                    tx += float(p[8])
        except (OSError, ValueError, IndexError):
            pass
        return rx, tx
