"""Cheap throughput levers for the plain-XLA fleet roll at batch 4096:

- `lax.scan(..., unroll=k)`: unrolling the step body k-fold halves the
  per-iteration fixed costs (fusion dispatch ramp) and lets XLA fuse across
  the step boundary at the cost of a k-fold bigger while-body.
- `jit(..., donate_argnums=0)`: donate the carry so the dispatch reuses the
  input buffers instead of copying.

Run: python tools/exp_unroll_donate.py [batch] [steps]
Prints us/fleet-step and vehicle-steps/s per variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from flightjax.models.c172 import flagship_sim

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
    print(f"# {jax.devices()} batch={batch} steps={steps}", flush=True)

    def variant(unroll, donate):
        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=unroll)
            return st
        return jax.jit(roll_fn, donate_argnums=(0,) if donate else ())

    results = {}
    for name, unroll, donate in (("u1", 1, False), ("u2", 2, False),
                                 ("u4", 4, False), ("u1+donate", 1, True)):
        roll = variant(unroll, donate)
        t0 = time.time()
        carry = jax.block_until_ready(roll(state if not donate
                                           else jax.tree.map(jnp.copy, state)))
        compile_s = time.time() - t0
        carry = jax.block_until_ready(roll(carry))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            carry = roll(carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / (n * steps)
        results[name] = dt
        print(f"{name:10s}: {dt*1e6:8.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s  (compile {compile_s:.0f}s)",
              flush=True)
    best = min(results, key=results.get)
    print(f"best: {best} ({batch/results[best]/1e6:.2f}M steps/s)")


if __name__ == "__main__":
    main()
