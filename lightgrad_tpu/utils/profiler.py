"""Per-op wall-clock profiler.

Behavioral parity with the reference profiler
(``/root/reference/lightgrad/autograd/utils/profiler.py``): a stack of active
``Profiler`` context managers receives ``(op name, elapsed, fwd/bwd)`` samples
from ``Tracker``s wrapped around every Function application and every backward
step; nested trackers are suppressed so a composite op (softmax, mean, ...)
shows up as a single entry.

TPU note: op dispatch is asynchronous -- XLA returns before the device
finishes.  ``Tracker`` therefore calls an optional per-backend ``sync`` hook on
exit when a profiler is active (the TPU backend registers
``jax.block_until_ready`` semantics via :func:`set_sync_fn`), so recorded times
are true device wall-clock rather than dispatch latency.
"""

import time
from collections import defaultdict

__all__ = ["Profiler", "Tracker", "set_sync_fn"]

# backends register a "wait for device idle" hook here (see autograd/tpu)
_sync_fn = None


def set_sync_fn(fn):
    global _sync_fn
    _sync_fn = fn


class Profiler:
    """Collects cumulative forward/backward time and call counts per op."""

    _active = []

    def __init__(self):
        self.fwd_time = defaultdict(float)
        self.fwd_count = defaultdict(int)
        self.bwd_time = defaultdict(float)
        self.bwd_count = defaultdict(int)

    def update(self, name, dt, backward=False):
        if backward:
            self.bwd_time[name] += dt
            self.bwd_count[name] += 1
        else:
            self.fwd_time[name] += dt
            self.fwd_count[name] += 1

    def __enter__(self):
        Profiler._active.append(self)
        return self

    def __exit__(self, *exc):
        Profiler._active.remove(self)
        return False

    def print(self, topn: int = -1):
        names = sorted(
            set(self.fwd_time) | set(self.bwd_time),
            key=lambda n: -self.fwd_time[n],
        )
        if topn > 0:
            names = names[:topn]
        print(" Function       |   forward      \t|   backward   \n" + "-" * 70)
        for n in names:
            print(
                " %-15s| %8.4fs (%i)\t| %8.4fs (%i) "
                % (n, self.fwd_time[n], self.fwd_count[n], self.bwd_time[n], self.bwd_count[n])
            )
        print()


class Tracker:
    """Wall-clock context around one op application; outermost-only."""

    _depth = 0

    def __init__(self, name: str, backward: bool = False):
        self.name = name
        self.backward = backward
        # record only at top level and only when someone is listening
        self.active = Tracker._depth == 0 and bool(Profiler._active)

    def __enter__(self):
        Tracker._depth += 1
        if self.active:
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        Tracker._depth = max(0, Tracker._depth - 1)
        if self.active:
            if _sync_fn is not None:
                _sync_fn()
            dt = time.perf_counter() - self.t0
            for p in Profiler._active:
                p.update(self.name, dt, backward=self.backward)
        return False


class device_trace:
    """XLA/TPU device trace for TensorBoard (``jax.profiler``): records the
    compiled programs' on-device timeline -- the right tool once a step is
    fused by ``lightgrad_tpu.jit`` and the eager per-op Profiler above can
    no longer see inside it.

        with light.utils.profiler.device_trace("/tmp/trace"):
            for _ in range(5):
                step()

    View with ``tensorboard --logdir /tmp/trace`` (Profile tab).
    """

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
