"""Update tripwire: detect-and-revert for rare catastrophic optimizer steps.

Failure-detection/recovery subsystem (no reference analogue).  Round-1
forensics of the n=29 interacting run (PARITY.md) showed the f32 SR
occasionally emitting a single garbage update — visible in the NEXT epoch's
observables as a discrete upward free-energy jump tens of standard errors
wide (epoch 411 -> 412: K 0.99 -> 2.54, accept 0.36 -> 0.21) — from which the
dynamics would otherwise recover, except the corrupted parameters seed an
entropy collapse.

Round-2 forensics (the n=49 host64 pretraining runs) exposed three further
failure modes of the original two-deep-history design:

1. The bad step RECURS right after a revert, lands inside the cooldown
   window, and a *gradual* runaway (each epoch's rise individually under the
   step threshold) walks the baseline up with it.  Fix: anchor to the BEST
   healthy epoch seen and fire on cumulative ascent above it, reverting to
   the best parameters — healthy by construction even when the recent
   history is already corrupted.

2. Near the converged plateau the Monte-Carlo standard error (~3e-3 at
   batch 8192) is far SMALLER than the natural epoch-to-epoch fluctuation of
   F under SR updates (~2-5e-2), so a purely stderr-based threshold fires on
   ordinary noise.  Fix: a self-tuning noise floor — track the upper
   quartile of |ΔF| between consecutive healthy epochs and use
   ``sigma * max(combined_stderr, scatter)`` as the threshold.

3. The original "too many reverts → disable" escape hatch removed protection
   exactly when the dynamics were most unstable: the observed n=49 run
   disabled itself after 8 events and the next unguarded catastrophic step
   collapsed the entropy from 21.6 to 13.3.  Fix: never disable.  On a burst
   of events the tripwire instead HALVES ``trust_scale`` (a multiplier the
   training loop applies to the SR trust radius ``max_norm``), attacking the
   bad steps at their source while continuing to guard.

The observables logged at epoch ``i`` describe the parameters produced by
the apply step of epoch ``i-1``, i.e. the parameters ENTERING epoch ``i`` —
exactly the state passed to ``snapshot`` at the top of epoch ``i``.
"""

from __future__ import annotations

import math
from collections import deque

__all__ = ["UpdateTripwire"]


def _q75(xs):
    """Upper-quartile scatter estimate: robust to the occasional un-reverted
    outlier, and biased UPWARD relative to the median — the sample median of
    ~16 half-normal |dF| draws scatters low enough to cause noise fires."""
    s = sorted(xs)
    return s[int(0.75 * (len(s) - 1))]


class UpdateTripwire:
    """Decides whether to revert after each epoch's observables arrive.

    Usage per epoch::

        tripwire.snapshot(params_state)            # BEFORE sampling/apply
        ... sample, accumulate, apply ...          # trust radius scaled by
        ...                                        #   tripwire.trust_scale
        revert_to = tripwire.check(F_raw, F_stderr, all_finite)
        if revert_to is not None:
            params_state = revert_to
    """

    def __init__(self, sigma: float = 15.0, cooldown: int = 3,
                 burst_events: int = 4, window: int = 80,
                 scatter_window: int = 16, min_trust_scale: float = 1 / 16):
        self.sigma = sigma
        self.cooldown_epochs = cooldown
        self.burst_events = burst_events
        self.window = window  # also the max age of the best-epoch anchor
        self.min_trust_scale = min_trust_scale
        self._hist = deque(maxlen=2)  # snapshots of the opaque params state
        self._prev = None  # (F, stderr) of the last healthy epoch
        self._best = None  # (F, stderr, state, epoch) of the best healthy epoch
        self._recent = None  # most recent healthy (F, stderr, state, epoch)
        self._deltas = deque(maxlen=scatter_window)  # |ΔF| between healthy epochs
        self._cooldown = 0
        self._epoch = 0
        self.events = []  # epochs at which a revert fired
        self._last_event = 0
        self.trust_scale = 1.0  # loop multiplies max_norm by this
        self.disabled = sigma <= 0

    def _thresh(self, stderr_combined: float) -> float:
        """sigma * max(MC error, observed epoch-to-epoch scatter)."""
        scatter = _q75(self._deltas) if len(self._deltas) >= 6 else 0.0
        return self.sigma * max(stderr_combined, scatter)

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
        # the state that PRODUCED this epoch's observables
        state = self._hist[-1] if self._hist else None

        jump = False
        # Jump detection arms only once the epoch-to-epoch noise estimate
        # exists (>= 6 healthy deltas): before that the stderr-only threshold
        # cannot separate ordinary SR fluctuation from a bad step.  Non-finite
        # observables revert unconditionally below.
        if finite and self._cooldown <= 0 and len(self._deltas) >= 6:
            if self._prev is not None:
                F_prev, sig_prev = self._prev
                thresh = self._thresh(F_stderr + sig_prev)
                jump = math.isfinite(thresh) and (F - F_prev) > thresh
            if not jump and self._best is not None:
                # runaway guard: cumulative ascent above the best healthy
                # epoch, even if each individual step stayed under threshold.
                # The anchor is a running MINIMUM, which sits ~2 scatter units
                # below the running mean under pure noise — widen the band by
                # 2x so ordinary fluctuations measured from the min don't fire.
                F_best, sig_best, _, _ = self._best
                thresh = 2.0 * self._thresh(F_stderr + sig_best)
                jump = math.isfinite(thresh) and (F - F_best) > thresh

        if not finite or jump:
            target = None
            if self._best is not None:
                target = self._best[2]
            elif len(self._hist) == 2:
                target = self._hist[0]
            if target is not None:
                self._hist.clear()
                self._prev = None
                self._cooldown = self.cooldown_epochs
                self.events.append(self._epoch)
                self._last_event = self._epoch
                if (len(self.events) >= self.burst_events
                        and self.events[-self.burst_events]
                        > self._epoch - self.window):
                    # persistent instability, not a rare bad step: shrink the
                    # trust region at the source and keep guarding
                    self.trust_scale = max(self.min_trust_scale,
                                           self.trust_scale * 0.5)
                    self.events.clear()
                return target

        if finite:
            if self._prev is not None and self._cooldown <= 0:
                d = abs(F - self._prev[0])
                if math.isfinite(d):
                    self._deltas.append(d)
            if (self.trust_scale < 1.0
                    and self._epoch - self._last_event > self.window
                    and self._epoch % self.window == 0):
                # a full window without events: relax the trust region back
                self.trust_scale = min(1.0, self.trust_scale * 2.0)
            self._prev = (F, F_stderr)
            if self._cooldown <= 0 and state is not None:
                rec = (F, F_stderr, state, self._epoch)
                self._recent = rec
                if self._best is None or F <= self._best[0]:
                    self._best = rec
                elif (self._epoch - self._best[3] > self.window
                      and self._recent is not None):
                    # the anchor has gone stale (e.g. an early lucky-noise
                    # minimum in a long plateau): re-anchor to the present
                    self._best = self._recent
        self._cooldown = max(0, self._cooldown - 1)
        return None
