"""Logging + metering utilities.

Covers the reference's observability surface: the stdout tee Logger
(utils/misc.py:88-98) and the running-average meters every driver
duplicates (train_face.py:385-401). `StepTimer` adds the wall-clock
batch/data timing the drivers print.
"""

from __future__ import annotations

import sys
import time


class Logger:
    """Tee stdout to a logfile (install via `sys.stdout = Logger(path)`)."""

    def __init__(self, filename: str = "default.log", stream=None):
        self.terminal = stream or sys.stdout
        self.log = open(filename, "w")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        if "\n" in message:
            # training prints are minutes apart; an unflushed logfile
            # makes a long run look hung from outside
            self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class AverageMeter:
    """Running average of a scalar."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class StepTimer:
    """Batch/data wall-clock timing."""

    def __init__(self):
        self.batch = AverageMeter()
        self.data = AverageMeter()
        self._t = time.time()

    def mark_data(self):
        now = time.time()
        self.data.update(now - self._t)
        return now

    def mark_batch(self):
        now = time.time()
        self.batch.update(now - self._t)
        self._t = now
