"""Measure the plain (non-Pallas) C172 step in batch-MAJOR vs batch-MINOR
layout on the current device.

Batch-major puts the fleet on the sublane axis, so every small [B, 3] /
[B, 4] leaf occupies 3/128 or 4/128 of each lane register row. Mapping the
fleet onto the MINOR axis (vmap in_axes=-1/out_axes=-1 over a `to_minor`
state) gives [3, B] leaves whose vector ops run at full lane occupancy.

Run: python tools/exp_minor.py [major|minor|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

BATCH = 4096
STEPS = 200


def measure(roll, carry, label):
    t0 = time.perf_counter()
    carry = jax.block_until_ready(roll(carry))
    print(f"{label}: compile+1 roll {time.perf_counter() - t0:.1f}s",
          flush=True)
    carry = jax.block_until_ready(roll(carry))  # absorb layout shuffles
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        carry = roll(carry)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    us_per_step = dt / (n * STEPS) * 1e6
    print(f"{label}: {us_per_step:.1f} us/fleet-step = "
          f"{BATCH * 1e6 / us_per_step / 1e6:.2f}M vehicle-steps/s",
        flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel.pallas_block import to_minor

    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (BATCH,) + jnp.shape(l)), state0)

    if which in ("major", "both"):
        @jax.jit
        def roll_major(st):
            def body(st, _):
                return jax.vmap(lambda s: sim.step(s, ctx))(st), None
            return jax.lax.scan(body, st, None, length=STEPS)[0]

        measure(roll_major, state, "major")

    if which in ("minor", "both"):
        @jax.jit
        def roll_minor(st):
            def body(st, _):
                return jax.vmap(lambda s: sim.step(s, ctx),
                                in_axes=-1, out_axes=-1)(st), None
            return jax.lax.scan(body, st, None, length=STEPS)[0]

        measure(roll_minor, to_minor(state), "minor")


if __name__ == "__main__":
    main()
