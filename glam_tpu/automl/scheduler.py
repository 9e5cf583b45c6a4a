"""Trial scheduler: device-topology-aware slot management.

Replaces the reference's GPUManager (nvidia-smi free-memory polling,
utils.py:190-246).  On TPU there is no shared-memory oversubscription to
poll — a chip is either assigned to a trial process or not — so the
scheduler hands out a fixed number of trial slots (one per addressable
device group, or a configured process cap) and blocks until a running
trial exits, mirroring ``wait_free_gpu``'s backpressure semantics."""
from __future__ import annotations

import os
import time
from typing import List, Optional


def _detect_slots() -> int:
    env = os.environ.get("GLAM_TPU_TRIAL_SLOTS")
    if env:
        return max(1, int(env))
    # deliberately do NOT query jax here: the solver process must not
    # initialize the TPU backend — trial child processes own the chips.
    # Set GLAM_TPU_TRIAL_SLOTS on multi-chip hosts.
    return 1


class DeviceManager:
    """Fixed-slot trial scheduler with blocking backpressure."""

    def __init__(self, num_slots: Optional[int] = None,
                 poll_interval: float = 2.0):
        self.num_slots = num_slots if num_slots else _detect_slots()
        self.poll_interval = poll_interval

    def running(self, procs: List) -> int:
        return sum(1 for p in procs if p.poll() is None)

    def wait_free_slot(self, procs: List) -> None:
        """Block until fewer than num_slots trials are running
        (reference utils.py:219-225 30s-sleep loop, tightened)."""
        while self.running(procs) >= self.num_slots:
            time.sleep(self.poll_interval)

    def wait_free_device(self, slot_procs: dict) -> int:
        """Block until a specific slot (= device index on a multi-chip
        host) is free and return it — the reference pins each trial to a
        distinct GPU via --gpu (utils.py:219-225 + run.py); children pin
        their default device to jax.devices()[slot]."""
        while True:
            for s in range(self.num_slots):
                p = slot_procs.get(s)
                if p is None or p.poll() is not None:
                    return s
            time.sleep(self.poll_interval)
