"""A/B the table-lookup bundling configurations on the real chip.

The round-3 roofline (docs/notes/performance.md) shows the fleet step is
fixed-overhead-bound (~425 sequential fusion kernels, 0.6% of the HBM
ceiling), so collapsing N table-lookup matmuls into one block-diagonal
matmul (`interp.eval_bundle`) should win ~linearly in removed kernels —
UNLESS the bundled weight matrix is wide enough that its materialization
and the serialized big matmul cost more than the overlapped small ones
(the same failure mode as the VPU-matvec and joint-weight negatives).

Configs measured (us/fleet-step at batch 4096, 1000-step dispatches):
  off        — per-table matmuls everywhere (round-2b shipped form)
  aero-small — 9 small aero tables bundled; wide alpha tables standalone
  aero-all   — all 11 aero tables bundled (one (B,194) weight matrix)
  engine     — engine charts bundled per dependency stage (7 -> 4)
  small+eng  — aero-small + engine (the candidate shipping config)

Also prints the max 1-step state divergence of each config vs `off`.
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
    from flightjax.models.c172 import common
    from flightjax.physics import piston
    from flightjax.models.c172 import flagship_sim

    batch, steps = 4096, 1000
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    configs = [
        ("off", False, False),
        ("aero-small", "small", False),
        ("aero-all", "all", False),
        ("engine", False, True),
        ("small+eng", "small", True),
    ]
    outs, times = {}, {}
    for name, aero, eng in configs:
        common._BUNDLE_AERO = aero
        piston._BUNDLE_ENGINE = eng

        one = jax.jit(lambda st: sim.fleet_step(st, ctx))
        outs[name] = jax.block_until_ready(one(state))

        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=4)
            return st
        roll = jax.jit(roll_fn, donate_argnums=(0,))
        carry = jax.block_until_ready(roll(jax.tree.map(jnp.copy, state)))
        carry = jax.block_until_ready(roll(carry))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            carry = roll(carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / (n * steps)
        times[name] = dt
        print(f"{name:>10}: {dt*1e6:7.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s", flush=True)

    for name, _, _ in configs[1:]:
        err = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float64) -
                                               b.astype(jnp.float64)))),
            outs["off"], outs[name])))
        print(f"max 1-step state divergence {name} vs off: {err:.3e}")


if __name__ == "__main__":
    main()
