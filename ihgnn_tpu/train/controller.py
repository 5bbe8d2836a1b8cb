"""Epoch scheduler with remaining-time estimation.

Parity with Helpers/ProcessController.py: iterate epochs from a
checkpoint-aware start, fire test/store at (start position, frequency) and
always at the last epoch; estimate remaining time from the rolling average
of the last two train/test durations.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional


class ProcessController:
    def __init__(self, epoch_count: int, start_epoch: int, start_test_epoch: int,
                 test_frequency: int, start_store_epoch: Optional[int] = None,
                 store_frequency: Optional[int] = None):
        self.StartEpoch = start_epoch
        self.EpochCount = epoch_count
        self.EndEpoch = start_epoch + epoch_count
        self.CurrentEpoch = start_epoch - 1
        self._start_test_epoch = start_test_epoch
        self._test_frequency = test_frequency
        self._test_count = 1 + (epoch_count - start_test_epoch) / test_frequency
        self._train_times: List[float] = []
        self._test_times: List[float] = []
        if start_store_epoch is None or store_frequency is None:
            self._start_store_epoch = self._store_frequency = None
        else:
            self._start_store_epoch = start_store_epoch
            self._store_frequency = store_frequency

    def __len__(self) -> int:
        return self.EpochCount

    def __iter__(self) -> Iterator[int]:
        self.CurrentEpoch = self.StartEpoch - 1
        return self

    def __next__(self) -> int:
        self.CurrentEpoch += 1
        if self.CurrentEpoch == self.EndEpoch:
            raise StopIteration
        return self.CurrentEpoch

    def ShouldTest(self) -> bool:
        epoch = self.CurrentEpoch + 1
        start = self._start_test_epoch
        return (epoch - self.StartEpoch >= start) and (
            (self.CurrentEpoch - start) % self._test_frequency == 0
            or epoch == self.EndEpoch)

    def ShouldStore(self) -> bool:
        if self._start_store_epoch is None:
            return False
        epoch = self.CurrentEpoch + 1
        start = self._start_store_epoch
        return (epoch - self.StartEpoch >= start) and (
            (self.CurrentEpoch - start) % self._store_frequency == 0
            or epoch == self.EndEpoch)

    def AddTrainTime(self, t: float) -> None:
        self._train_times.append(t)

    def AddTestTime(self, t: float) -> None:
        self._test_times.append(t)

    def GetRemainingTime(self) -> float:
        if len(self._train_times) >= 2:
            avg_train = (self._train_times[-1] + self._train_times[-2]) / 2
        elif len(self._train_times) == 1:
            avg_train = self._train_times[0]
        else:
            return float("nan")

        if len(self._test_times) >= 2:
            avg_test = (self._test_times[-1] + self._test_times[-2]) / 2
        elif len(self._test_times) == 1:
            avg_test = self._test_times[0]
        else:
            avg_test = avg_train * 2

        remain_train = avg_train * (self.EndEpoch - self.CurrentEpoch)
        remain_test = avg_test * (self._test_count - len(self._test_times))
        return remain_train + remain_test

    def GetRemainingTimeString(self) -> str:
        t = self.GetRemainingTime()
        if math.isnan(t):
            return "n/a"
        if t >= 3600:
            h = t // 3600
            return f"{int(h)} h {int(t / 60 - 60 * h)} m"
        if t >= 60:
            return f"{int(t / 60)} m"
        return f"{int(t)} s"
