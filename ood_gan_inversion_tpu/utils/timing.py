"""On-device timing helpers robust to a non-blocking block_until_ready.

r4 environment regression: the axon PJRT runtime's `block_until_ready`
returns immediately (measured: a 100-matmul chained program "completes" in
0.2 ms while its real result fetch takes seconds), so the wall-clock
windows all earlier rounds closed with block_until_ready no longer measure
device time, and per-call host round-trip latency rose to ~29 ms (vs
~0.9 ms). These helpers time the device with a SLOPE protocol:

  t(n) = enqueue n calls, then force completion by fetching the last
         call's scalar output (host round-trip; in-order execution means
         every earlier enqueued program finished first)
  ms_per_call = (t(n2) - t(n1)) / (n2 - n1)

The constant round-trip/dispatch overhead cancels in the subtraction. The
benched function must RETURN A SCALAR (wrap a pipeline in `tree_sum` — a
full-tensor reduction epilogue, NOT a slice, so XLA cannot DCE any of the
producing compute; cost is one pass over the outputs, negligible vs the
pipelines measured). In-order execution is sanity-checked by
`check_inorder` (slope must grow with n).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def tree_sum(out):
    """Scalar fp32 sum over every leaf of a pytree — the forced epilogue.
    Full reductions (not slices) so no producer is dead-code-eliminated."""
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
               if hasattr(l, "astype"))


def _window(fn, args_list, n):
    t0 = time.perf_counter()
    for i in range(n - 1):
        fn(*args_list[i % len(args_list)])
    # the fetch (np.asarray on a scalar) is the only reliable completion
    # barrier in this environment
    float(np.asarray(fn(*args_list[(n - 1) % len(args_list)])))
    return time.perf_counter() - t0


def device_ms_per_call(fn, args_list, windows=3, pair=(3, 13),
                       verbose_label=None, file=None):
    """Median-of-`windows` slope estimate of the device ms per call of `fn`
    (a jitted function returning a scalar). args_list: list of positional
    arg tuples cycled through (pre-stage device inputs/keys outside).

    One throwaway window pair runs first: the window right after warmup has
    shown an inflated t(n1) (straggling queue work), and with a slope
    estimator an inflated t(n1) UNDER-estimates the cost, so min-of-slopes
    is biased optimistic — hence throwaway + median."""
    import sys
    f = file or sys.stderr
    n1, n2 = pair
    _window(fn, args_list, n1)
    _window(fn, args_list, n2)
    samples = []
    for w in range(windows):
        t1 = _window(fn, args_list, n1)
        t2 = _window(fn, args_list, n2)
        ms = (t2 - t1) * 1000.0 / (n2 - n1)
        samples.append(ms)
        if verbose_label:
            print(f"{verbose_label} window {w}: {ms:.2f} ms/call "
                  f"(t{n1}={t1*1e3:.0f}ms t{n2}={t2*1e3:.0f}ms)", file=f,
                  flush=True)
    return float(np.median(samples)), samples


def check_inorder(fn, args):
    """Sanity-check that enqueued programs execute in submission order
    (t grows with n); returns (t1, t4, t16) seconds."""
    ts = [_window(fn, [args], n) for n in (1, 4, 16)]
    return tuple(ts)
