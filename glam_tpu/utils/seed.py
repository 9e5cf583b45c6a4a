"""Reproducibility helpers (reference utils.py:22-28 seed_torch parity).

JAX is functionally pure — model randomness flows through explicit
PRNGKeys — so "seeding" here covers the host-side RNGs used by data
shuffling and the AutoML sampler."""
from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 1234) -> None:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
