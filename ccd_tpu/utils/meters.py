"""Training meters (parity: SmoothedValue/MetricLogger,
Dino/modules/utils.py:235-411, and Averager/Timer, Dino/utils).

Cross-process synchronization is a ``jax.process_count()``-aware psum via a
tiny jitted all-reduce instead of ``dist.all_reduce`` — on a single process it
is a no-op.
"""

from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Windowed median/avg meter with global total/count."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        import jax
        if jax.process_count() == 1:
            return
        import jax.numpy as jnp
        arr = jnp.asarray([float(self.count), self.total])
        arr = jax.experimental.multihost_utils.process_allgather(arr).sum(0)
        self.count = int(arr[0])
        self.total = float(arr[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_processes(self) -> None:
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def __getattr__(self, attr: str):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self) -> str:
        return self.delimiter.join(f"{name}: {meter}"
                                   for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: Optional[str] = None):
        header = header or ""
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 and total:
                eta = datetime.timedelta(seconds=int(iter_time.global_avg * (total - i)))
                print(f"{header} [{i}/{total}] eta: {eta} {self} "
                      f"time: {iter_time} data: {data_time}")
            i += 1
            end = time.time()
        elapsed = time.time() - start
        if total:
            print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))} "
                  f"({elapsed / max(total, 1):.4f} s / it)")


class Averager:
    """Simple running average (Dino/utils/util.py:5-25)."""

    def __init__(self):
        self.reset()

    def add(self, v: float) -> None:
        self.n_count += 1
        self.sum += float(v)

    def reset(self) -> None:
        self.n_count = 0
        self.sum = 0.0

    def val(self) -> float:
        return self.sum / self.n_count if self.n_count else 0.0


class Timer:
    """Data/compute phase timer (Dino/utils/utils.py:118-157)."""

    def __init__(self):
        self.data_total_time = 0.0
        self.data_call = 0
        self.running_total_time = 0.0
        self.running_call = 0
        self._t = time.time()

    def tic(self) -> None:
        self._t = time.time()

    def toc_data(self) -> None:
        now = time.time()
        self.data_total_time += now - self._t
        self.data_call += 1
        self._t = now

    def toc_running(self) -> None:
        now = time.time()
        self.running_total_time += now - self._t
        self.running_call += 1
        self._t = now

    def average_data_time(self) -> float:
        return self.data_total_time / (self.data_call or 1)

    def average_running_time(self) -> float:
        return self.running_total_time / (self.running_call or 1)
