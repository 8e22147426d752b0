"""StepWatchdog: heartbeat-silence detection for wedged device RPCs.

Round-5 incident replay: the rs=5.0 sweep resume hung >10 minutes inside one
sample step (device future never resolved), invisible to the between-epochs
tripwire.  The watchdog must fire on silence, stay quiet under a live
heartbeat, honor the first-interval compile grace, and be inert at
timeout 0 (the default).
"""

import time

from coulombgas_tpu.utils.watchdog import HANG_EXIT_CODE, StepWatchdog


def _make(timeout, **kw):
    fired = []
    wd = StepWatchdog(timeout, exit_fn=fired.append, poll_s=0.02, **kw)
    return wd, fired


def test_fires_on_silence():
    wd, fired = _make(0.15, first_grace=1.0)
    wd.start()
    time.sleep(0.5)
    wd.stop()
    assert fired == [HANG_EXIT_CODE]


def test_quiet_under_heartbeat_then_fires():
    wd, fired = _make(0.2, first_grace=1.0)
    wd.start()
    for _ in range(10):
        time.sleep(0.05)
        wd.beat()
    assert fired == []           # live heartbeat: never fires
    time.sleep(0.6)              # heartbeat stops: must fire
    wd.stop()
    assert fired == [HANG_EXIT_CODE]


def test_first_interval_grace_covers_compile():
    # first interval budget = timeout * first_grace; silence longer than the
    # timeout but inside the grace must NOT fire before the first beat
    wd, fired = _make(0.1, first_grace=10.0)
    wd.start()
    time.sleep(0.35)             # > timeout, < timeout * grace
    assert fired == []
    wd.beat()                    # grace collapses to 1x after the first beat
    time.sleep(0.4)
    wd.stop()
    assert fired == [HANG_EXIT_CODE]


def test_disabled_at_zero_timeout():
    wd, fired = _make(0.0)
    wd.start()
    assert wd._thread is None    # start() is a no-op when disabled
    time.sleep(0.1)
    assert fired == []


def test_stop_prevents_firing():
    wd, fired = _make(0.15, first_grace=1.0)
    wd.start()
    wd.stop()
    time.sleep(0.4)
    assert fired == []
