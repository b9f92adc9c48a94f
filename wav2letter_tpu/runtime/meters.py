"""Meters: edit distance, timers, throughput — reference ``TrainMeters``
(``cpc/Train.cpp:587-650``: runtime/timer/sampletimer/fwdtimer/critfwdtimer/
bwdtimer/optimtimer/stats + per-dataset {tknEdit, wrdEdit, loss}) and
``syncMeter`` cross-rank reduction (``:642``; here a psum-style numpy
reduction hook for multi-process mode).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence


class EditDistanceMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.errors = 0
        self.total = 0

    def add(self, ref: Sequence, hyp: Sequence):
        from ..ops.editdistance import edit_distance

        self.errors += edit_distance(ref, hyp)
        self.total += len(ref)

    def add_counts(self, errors: int, total: int):
        self.errors += errors
        self.total += total

    def error_rate(self) -> float:
        return 100.0 * self.errors / max(1, self.total)

    def state(self):
        return [self.errors, self.total]

    def load_state(self, s):
        self.errors, self.total = int(s[0]), int(s[1])


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.n = 0

    def add(self, v: float, n: int = 1):
        self.sum += float(v) * n
        self.n += n

    def value(self) -> float:
        return self.sum / max(1, self.n)

    def state(self):
        return [self.sum, self.n]

    def load_state(self, s):
        self.sum, self.n = float(s[0]), int(s[1])


class TimerMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total = 0.0
        self._t0: Optional[float] = None
        self.count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self.total += time.perf_counter() - self._t0
            self._t0 = None
            self.count += 1

    def value(self) -> float:
        return self.total

    def avg_ms(self) -> float:
        return 1000.0 * self.total / max(1, self.count)

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *a):
        self.stop()


class SpeedMeter:
    """Throughput: audio seconds processed per wall second."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.audio_s = 0.0
        self.wall_t0 = time.perf_counter()

    def add_audio(self, seconds: float):
        self.audio_s += seconds

    def value(self) -> float:
        dt = time.perf_counter() - self.wall_t0
        return self.audio_s / max(1e-9, dt)


class DatasetMeters:
    def __init__(self):
        self.tkn_edit = EditDistanceMeter()
        self.wrd_edit = EditDistanceMeter()
        self.loss = AverageMeter()

    def reset(self):
        self.tkn_edit.reset()
        self.wrd_edit.reset()
        self.loss.reset()


class TrainMeters:
    def __init__(self, valid_tags: Sequence[str] = ()):
        self.runtime = TimerMeter()
        self.timer = TimerMeter()  # per-batch
        self.sample_timer = TimerMeter()
        self.fwd_timer = TimerMeter()
        self.crit_fwd_timer = TimerMeter()
        self.bwd_timer = TimerMeter()
        self.optim_timer = TimerMeter()
        self.speed = SpeedMeter()
        self.train = DatasetMeters()
        self.valid: Dict[str, DatasetMeters] = {t: DatasetMeters() for t in valid_tags}

    def reset_train(self):
        self.train.reset()
        self.speed.reset()
        for t in (
            self.timer,
            self.sample_timer,
            self.fwd_timer,
            self.crit_fwd_timer,
            self.bwd_timer,
            self.optim_timer,
        ):
            t.reset()


def sync_meters(meters: TrainMeters):
    """Cross-process meter reduction. Single-process: no-op. Multi-process
    (jax.distributed): sums error/total counts over hosts via a tiny psum."""
    import jax

    if jax.process_count() == 1:
        return meters
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    vals = []
    objs = [meters.train.tkn_edit, meters.train.wrd_edit]
    for ds in meters.valid.values():
        objs += [ds.tkn_edit, ds.wrd_edit]
    for o in objs:
        vals += o.state()
    for ds in [meters.train] + list(meters.valid.values()):
        vals += ds.loss.state()
    arr = np.asarray(vals, np.float64)
    summed = multihost_utils.process_allgather(arr).sum(axis=0)
    i = 0
    for o in objs:
        o.load_state(summed[i : i + 2])
        i += 2
    for ds in [meters.train] + list(meters.valid.values()):
        ds.loss.load_state(summed[i : i + 2])
        i += 2
    return meters


def get_log_string(
    meters: TrainMeters,
    epoch: int,
    updates: int,
    lr: float,
    lr_crit: float = 0.0,
) -> str:
    """Status line in the reference's format (``getLogString`` analog)."""
    parts = [
        f"epoch: {epoch:8d}",
        f"nupdates: {updates:12d}",
        f"lr: {lr:09.6f}",
        f"lrcriterion: {lr_crit:09.6f}",
        f"runtime: {meters.runtime.value():.2f}s",
        f"bch(ms): {meters.timer.avg_ms():.2f}",
        f"smp(ms): {meters.sample_timer.avg_ms():.2f}",
        f"fwd(ms): {meters.fwd_timer.avg_ms():.2f}",
        f"crit-fwd(ms): {meters.crit_fwd_timer.avg_ms():.2f}",
        f"bwd(ms): {meters.bwd_timer.avg_ms():.2f}",
        f"optim(ms): {meters.optim_timer.avg_ms():.2f}",
        f"loss: {meters.train.loss.value():10.5f}",
        f"train-TER: {meters.train.tkn_edit.error_rate():5.2f}",
        f"train-WER: {meters.train.wrd_edit.error_rate():5.2f}",
    ]
    for tag, ds in meters.valid.items():
        parts.append(f"{tag}-loss: {ds.loss.value():10.5f}")
        parts.append(f"{tag}-TER: {ds.tkn_edit.error_rate():5.2f}")
        parts.append(f"{tag}-WER: {ds.wrd_edit.error_rate():5.2f}")
    parts.append(f"avg-isz(audio-s/s): {meters.speed.value():08.2f}")
    return " | ".join(parts)
