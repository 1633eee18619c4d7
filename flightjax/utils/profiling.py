"""Tracing / profiling utilities.

The reference has no built-in profiler (SURVEY.md §5): observability is the
logged `y` hierarchy plus wall-time via `@elapsed`. For a TPU framework the
equivalents are:
- `trace(logdir)`: context manager around `jax.profiler.trace` — captures a
  device trace (HLO op timeline, memory) viewable in TensorBoard/Perfetto;
- `step_timer(fn)`: wall-clock timing of a jitted step with proper device
  synchronization (block_until_ready), reporting per-step latency and
  steps/s — the measurement discipline bench.py uses;
- `compile_report(fn, *args)`: compile-only pass returning fusion/op counts
  from the optimized HLO — the stable-HLO analog of the reference's
  zero-allocation contract (`test_c172x1.jl:82-86`): assert the step stays
  a bounded number of fusions instead of asserting zero heap allocations.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="/tmp/flightjax-trace"):
    """Capture a device trace for TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def step_timer(fn, *args, iters=100, warmup=2):
    """Time a jitted `fn(*args) -> carry` applied iteratively.

    Returns dict(per_call_us, per_iter_us): fn is called `iters` times
    feeding its output back as the first argument (device-synchronized)."""
    f = jax.jit(fn)
    carry = args[0]
    rest = args[1:]
    for _ in range(warmup):
        carry = f(carry, *rest)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = f(carry, *rest)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    return {"per_iter_us": dt / iters * 1e6, "total_s": dt}


def compile_report(fn, *args):
    """Compile `fn` (no execution) and report optimized-HLO statistics:
    number of fusions, total ops, and the program text length."""
    compiled = jax.jit(fn).lower(*args).compile()
    txt = compiled.as_text()
    return {
        "fusions": txt.count(" fusion("),
        "while_loops": txt.count("while("),
        "custom_calls": txt.count("custom-call("),
        "hlo_chars": len(txt),
    }
