"""stdout/stderr tee logger.

Reconstructs the ``Log.py`` module the reference imports but never shipped
(reference src/mnist_exm.py:19, :325-331; SURVEY §8.4): a ``Logger`` that
tees writes to both the terminal and ``./Logs/log-<timestamp>.log``.
"""

from __future__ import annotations

import os
import sys
import time


class Logger:
    def __init__(self, filename: str, stream=None):
        self.terminal = stream if stream is not None else sys.__stdout__
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        self.log = open(filename, "a", buffering=1)

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()

    def isatty(self):
        return False


def initial_log(log_path: str = "./Logs/") -> str:
    """Install tee loggers on stdout/stderr (reference src/mnist_exm.py:325)."""
    os.makedirs(log_path, exist_ok=True)
    name = os.path.join(
        log_path, "log-" + time.strftime("%Y%m%d-%H%M", time.localtime())
        + ".log")
    sys.stdout = Logger(name, sys.__stdout__)
    sys.stderr = Logger(name, sys.__stderr__)
    return name
