"""Stage timers and throughput accounting.

The reference tracks wall-clock per pipeline stage in a ``time_metrics``
dict and prints FPS / FPS-without-IO (MC3D_crop_tracker.py:168-181,
1301-1308). Same capability here, plus a jax.profiler trace hook.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class StageTimers:
    def __init__(self, stages: List[str]):
        self.acc: Dict[str, float] = {s: 0.0 for s in stages}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        start = time.time()
        try:
            yield
        finally:
            self.acc[stage] = self.acc.get(stage, 0.0) + time.time() - start

    def totals(self) -> Dict[str, float]:
        return dict(self.acc)

    def reset(self) -> None:
        for s in self.acc:
            self.acc[s] = 0.0

    def fps_without(self, n_frames: int, wall: float, exclude=("load", "plot")) -> float:
        excluded = sum(self.acc.get(s, 0.0) for s in exclude)
        return n_frames / max(wall - excluded, 1e-9)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_ms(fn, *args, iters: int = 10, warmup: bool = True) -> float:
    """True on-device time per call of ``fn(*args)`` in milliseconds.

    On a tunneled/remote device, dispatch is asynchronous and
    ``block_until_ready`` can return before execution, so naive wall-clock
    loops measure dispatch latency, not compute. This helper runs ``iters``
    iterations inside ONE jitted ``fori_loop`` — each iteration perturbs the
    first float input by the (data-dependent) accumulator so XLA cannot CSE
    or parallelize iterations — and synchronizes via a scalar fetch. The
    one-round-trip overhead is removed by differencing an iters=1 run.
    """
    import jax
    import jax.numpy as jnp

    flat, treedef = jax.tree_util.tree_flatten(args)
    f_idx = next(
        (i for i, l in enumerate(flat) if hasattr(l, "dtype") and jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)),
        None,
    )

    def make_loop(n):
        @jax.jit
        def loop(*flat_args):
            def body(_, acc):
                cur = list(flat_args)
                if f_idx is not None:
                    cur[f_idx] = cur[f_idx] + (acc * 1e-30).astype(cur[f_idx].dtype)
                out = fn(*jax.tree_util.tree_unflatten(treedef, cur))
                leaf = jax.tree_util.tree_leaves(out)[0]
                # reduce over the WHOLE leaf: depending on a single element
                # would let XLA narrow the computation to the slice that
                # produces it (a lone conv probed this way measures ~0)
                return acc + jnp.sum(leaf).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop

    loop1, loopN = make_loop(1), make_loop(iters)
    if warmup:
        float(loop1(*flat))
        float(loopN(*flat))
    t0 = time.time()
    float(loop1(*flat))
    t1 = time.time() - t0
    t0 = time.time()
    float(loopN(*flat))
    tN = time.time() - t0
    return max(tN - t1, 0.0) / (iters - 1) * 1000.0
