"""One-slot dispatch->fetch pipelining for device loops.

The pattern (train/loop.py, evals/validator.py): a loop that dispatches a
jitted step and then ``jax.device_get``s its (tiny) results would stall
the host on every iteration — the blocking fetch sits between step k and
batch k+1's host prep + upload, so the device idles through every H2D
transfer. Keeping exactly ONE result in flight and fetching it only after
the next step has been dispatched overlaps the upload (and any host-side
accumulation) with device compute. This helper holds that invariant in
one place: ``push()`` drains the *previous* item, ``flush()`` drains the
last one after the loop.
"""

from __future__ import annotations

from typing import Callable


class DelayedFetch:
    """Hold one in-flight item; drain it through ``fn`` on the next push.

    ``fn`` receives whatever was pushed (positionally). Results therefore
    arrive exactly one iteration late — callers displaying per-step values
    (tqdm postfix) lag one step, by design.
    """

    def __init__(self, fn: Callable):
        self._fn = fn
        self._pending: tuple | None = None

    def push(self, *item) -> None:
        prev, self._pending = self._pending, item
        if prev is not None:
            self._fn(*prev)

    def flush(self) -> None:
        prev, self._pending = self._pending, None
        if prev is not None:
            self._fn(*prev)
