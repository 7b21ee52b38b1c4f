"""Seeding and log-redirect run setup (reference utils.py:13-30, 292-305).

JAX is functionally seeded (keys thread through explicitly), so ``set_seed``
covers the host-side RNGs (python/numpy) that drive data prep; trainer/model
keys derive from config seeds.
"""

from __future__ import annotations

import os
import random
import sys

import numpy as np


def set_seed(seed=0):
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


class Unbuffered:
    """Flush-on-write stream wrapper (utils.py:292-305)."""

    def __init__(self, stream):
        self.stream = stream

    def write(self, data):
        self.stream.write(data)
        self.stream.flush()

    def writelines(self, datas):
        self.stream.writelines(datas)
        self.stream.flush()

    def __getattr__(self, attr):
        return getattr(self.stream, attr)


def init_run(log_path, seed):
    """mkdir + redirect stdout/stderr to an unbuffered log file
    (utils.py:24-30; the reference's file is named 'lo00gg.txt' — kept)."""
    set_seed(seed)
    if not os.path.exists(log_path):
        os.mkdir(log_path)
    f = Unbuffered(open(os.path.join(log_path, "lo00gg.txt"), "w"))
    sys.stderr = f
    sys.stdout = f
