"""Update tripwire: detect-and-revert for rare catastrophic optimizer steps.

Failure-detection/recovery subsystem (no reference analogue).  Round-1
forensics of the n=29 interacting run (PARITY.md) showed the f32 SR
occasionally emitting a single garbage update — visible in the NEXT epoch's
observables as a discrete upward free-energy jump tens of standard errors
wide (epoch 411 -> 412: K 0.99 -> 2.54, accept 0.36 -> 0.21) — from which the
dynamics would otherwise recover, except the corrupted parameters seed an
entropy collapse.  The tripwire keeps a two-deep parameter history and, when
an epoch's observables are non-finite or F jumped upward by more than
``sigma`` combined standard errors, reverts to the pre-jump parameters and
lets the Markov chains re-thermalize.

The observables logged at epoch ``i`` describe the parameters produced by
the apply step of epoch ``i-1``; reverting therefore restores the parameters
saved at the TOP of epoch ``i-1`` (two snapshots back).
"""

from __future__ import annotations

import math
from collections import deque

__all__ = ["UpdateTripwire"]


class UpdateTripwire:
    """Decides whether to revert after each epoch's observables arrive.

    Usage per epoch::

        snap = tripwire.snapshot(params_state)     # BEFORE sampling/apply
        ... sample, accumulate, apply ...
        revert_to = tripwire.check(F_raw, F_stderr, all_finite)
        if revert_to is not None:
            params_state = revert_to
    """

    def __init__(self, sigma: float = 15.0, cooldown: int = 3,
                 max_events: int = 8, window: int = 80):
        self.sigma = sigma
        self.cooldown_epochs = cooldown
        self.max_events = max_events
        self.window = window
        self._hist = deque(maxlen=2)  # snapshots of the opaque params state
        self._prev = None  # (F, stderr) of the last healthy epoch
        self._cooldown = 0
        self._epoch = 0
        self.events = []  # epochs at which a revert fired
        self.disabled = sigma <= 0

    def snapshot(self, state) -> None:
        """Record the parameter state entering this epoch."""
        self._hist.append(state)

    def check(self, F: float, F_stderr: float, finite: bool):
        """Return the state to revert to, or None to keep going.

        ``F``/``F_stderr``: this epoch's free-energy estimate (any consistent
        units); ``finite``: whether ALL observables were finite.
        """
        self._epoch += 1
        if self.disabled:
            return None
        jump = False
        if finite and self._prev is not None and self._cooldown <= 0:
            F_prev, sig_prev = self._prev
            jump = (F - F_prev) > self.sigma * (F_stderr + sig_prev)
            if not math.isfinite(F_stderr + sig_prev):
                jump = False
        if (not finite or jump) and len(self._hist) == 2:
            target = self._hist[0]
            self._hist.clear()
            self._prev = None
            self._cooldown = self.cooldown_epochs
            self.events.append(self._epoch)
            if (len(self.events) >= self.max_events
                    and self.events[-self.max_events] > self._epoch - self.window):
                # persistent instability, not a rare bad step: stop fighting it
                self.disabled = True
            return target
        if finite:
            self._prev = (F, F_stderr)
        self._cooldown = max(0, self._cooldown - 1)
        return None
