"""Compile each cluster kernel in ISOLATION on the current TPU.

The remote Mosaic compile helper caps per-request memory; compiling the
whole cluster step (5 kernels in one XLA module) can SIGKILL it. This
probe builds the kernels via `clusterstep.KERNEL_SINK`, then jits each one
alone — one Mosaic kernel per module — printing compile time / failure,
so the offending kernel (the one to split further) is identified.

Run: python tools/probe_pallas_kernels.py [minor|major|fine] [names...]
("fine" = split="fine" minor layout; otherwise split="subsystems")
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:  # reuse compiled artifacts across probe reruns (same key = same kernel)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass


def main():
    import flightjax.parallel.clusterstep as cs
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel.pallas_block import to_minor

    layout = sys.argv[1] if len(sys.argv) > 1 else "minor"
    only = set(sys.argv[2:])
    batch = 4096
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    cs.KERNEL_SINK = sink = []
    cs.make_cluster_step(
        sim, state, ctx,
        split="fine" if layout == "fine" else "subsystems",
        layout="major" if layout == "major" else "minor")
    print(f"built {len(sink)} kernels: {[n for n, _, _ in sink]}", flush=True)

    for name, fn, args in sink:
        if only and name not in only:
            continue
        call_args = (args if layout == "major"
                     else [to_minor(a) for a in args])
        t0 = time.perf_counter()
        try:
            out = jax.jit(lambda *a: fn(*a))(*call_args)
            jax.block_until_ready(out)
            print(f"{name}: OK  compile+run {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as exc:
            msg = str(exc).splitlines()[0][:160]
            print(f"{name}: FAIL after {time.perf_counter() - t0:.1f}s — "
                  f"{type(exc).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
