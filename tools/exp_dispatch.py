"""Dispatch-length x unroll sweep for the bench roll (batch 4096, donated
carry). Measured on the v5e (2026-08-19):

    s1000 u4: 234.9 us/fleet-step  17.43M steps/s
    s4000 u4: 225.3 us/fleet-step  18.18M steps/s   <- bench.py config
    s1000 u6: 548.4 us/fleet-step   7.47M steps/s   (spills, like u8)
    s4000 u6: 537.0 us/fleet-step   7.63M steps/s

1000-step dispatches leave ~3 us/step of per-dispatch tunnel round-trip;
4000 amortizes it and is flat beyond. Run: python tools/exp_dispatch.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from flightjax.models.c172 import flagship_sim
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (4096,) + jnp.shape(l)), state0)

    def run(tag, steps, unroll, n=3):
        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=unroll)
            return st
        roll = jax.jit(roll_fn, donate_argnums=(0,))
        t0 = time.time()
        c = jax.block_until_ready(roll(jax.tree.map(jnp.copy, state)))
        cold = time.time() - t0
        c = jax.block_until_ready(roll(c))
        t0 = time.perf_counter()
        for _ in range(n):
            c = roll(c)
        jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / (n * steps)
        print(f"{tag:12s}: {dt*1e6:7.1f} us/step  {4096/dt/1e6:6.2f}M "
              f"steps/s (cold {cold:.0f}s)", flush=True)

    for steps in (1000, 4000):
        for unroll in (4, 6):
            run(f"s{steps} u{unroll}", steps, unroll)


if __name__ == "__main__":
    main()
