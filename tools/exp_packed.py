"""Measure the plain C172 fleet roll with an UNPACKED vs PACKED scan carry.

The batched SimState has ~50 small leaves; every scan iteration pays
per-buffer loop-boundary latency for each. Packing the carry into one
buffer per dtype (reshape-based, `make_packer(..., mosaic_safe=False)`)
makes the boundary 2-3 large arrays; the unpack slices fuse into the
physics and the repack is one concatenate per dtype.

Run: python tools/exp_packed.py [batch] [steps]
Prints us/fleet-step and aggregate vehicle-steps/s for both variants,
plus a max-abs equivalence check after one dispatch.
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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel.packed import make_packer

    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    @jax.jit
    def roll_plain(st):
        def body(st, _):
            return sim.fleet_step(st, ctx), None
        st, _ = jax.lax.scan(body, st, None, length=steps)
        return st

    spec, pack, unpack = make_packer(state, mosaic_safe=False)

    @jax.jit
    def roll_packed(bufs):
        def body(bufs, _):
            st = sim.fleet_step(unpack(bufs), ctx)
            return pack(st), None
        bufs, _ = jax.lax.scan(body, bufs, None, length=steps)
        return bufs

    def time_roll(fn, carry, label):
        carry = jax.block_until_ready(fn(carry))   # compile + warm
        carry = jax.block_until_ready(fn(carry))   # absorb layout shuffle
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            carry = fn(carry)
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        us = dt / (n * steps) * 1e6
        rate = batch * steps * n / dt
        print(f"{label}: {us:.1f} us/fleet-step, {rate / 1e6:.2f}M "
              f"vehicle-steps/s", flush=True)
        return carry

    # equivalence: one packed dispatch == one plain dispatch
    got = unpack(jax.block_until_ready(roll_packed(pack(state))))
    ref = jax.block_until_ready(roll_plain(state))
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), got, ref)))
    print(f"equivalence after {steps} steps: max|diff| = {err:.3e}",
          flush=True)

    time_roll(roll_plain, state, "plain ")
    time_roll(roll_packed, pack(state), "packed")


if __name__ == "__main__":
    main()
