"""Adaptive per-epoch rate controller (SURVEY §2.5 G4).

Reference analog: ``adjustBatchSizes`` with the
``ADAPTIVE_MINIMIZE_IDLE_TIME`` load-hint policy — a feedback controller
that re-tunes each backend's share from the previous iteration's timings in
decaying increments (/root/reference/src/image_generic_codec.h:1064-1123;
policy enum /root/reference/include/nvimgcodec.h:688-694).

Here the controlled variable is the events-per-epoch cap (the
``maxOffsetsPerTrigger`` analog for our LSN-sliced micro-batches): epochs
that finish under the target grow the cap, slow epochs shrink it, with a
decaying step so the cap converges instead of oscillating.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class AdaptiveRateController:
    target_epoch_seconds: float = 30.0
    cap: int = 1_000_000
    min_cap: int = 10_000
    max_cap: int = 50_000_000
    step: float = 0.5  # initial relative step; decays toward step_floor
    step_floor: float = 0.005  # the reference converges in ~0.5% increments
    decay: float = 0.7
    history: list = field(default_factory=list)

    def observe(self, epoch_events: int, epoch_seconds: float) -> int:
        """Record an epoch; return the cap for the next epoch."""
        self.history.append((epoch_events, epoch_seconds))
        if epoch_events <= 0 or epoch_seconds <= 0:
            return self.cap
        ratio = self.target_epoch_seconds / epoch_seconds
        # move a (decaying) fraction of the way toward the ideal cap
        ideal = epoch_events * ratio
        delta = (ideal - self.cap) * max(self.step, self.step_floor)
        self.cap = int(min(self.max_cap, max(self.min_cap, self.cap + delta)))
        self.step = max(self.step * self.decay, self.step_floor)
        return self.cap
