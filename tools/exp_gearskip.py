"""Ceiling measurement for a fleet-level "gear skip" gate: replace the
GearSet strut/contact math with the exact wow=false defaults (what a
lax.cond skip branch would compute when the whole fleet is airborne) and
time the fleet roll. The delta vs the stock step is the upper bound of
the win from scalar-gating the gear subsystem.

Run: python tools/exp_gearskip.py [batch] [steps]
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


def airborne_versions():
    """The shipped airborne branches (landinggear.GearSet), bound as
    unconditional replacements — measures the ceiling without the cond."""
    from flightjax.physics.landinggear import GearSet

    def f_ode_airborne(self, x, u, t, kin, trn):
        return GearSet.f_ode_airborne(self, x, u, t, kin, trn)

    def f_step_airborne(self, x, u, t, kin, trn):
        return {"frc": jnp.zeros_like(x["frc"])}

    def strut_y_airborne(self, x, u, t, kin, trn):
        return GearSet.strut_y_airborne(self, kin, trn)

    return f_ode_airborne, f_step_airborne, strut_y_airborne


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.physics.landinggear import GearSet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
    print(f"# {jax.devices()} batch={batch} steps={steps}", flush=True)

    def timed(tag):
        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=4)
            return st
        roll = jax.jit(roll_fn, donate_argnums=(0,))
        t0 = time.time()
        carry = jax.block_until_ready(roll(jax.tree.map(jnp.copy, state)))
        compile_s = time.time() - t0
        carry = jax.block_until_ready(roll(carry))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            carry = roll(carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / (n * steps)
        print(f"{tag:12s}: {dt*1e6:7.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    base = timed("stock")
    f_ode_air, f_step_air, strut_y_air = airborne_versions()
    GearSet.f_ode = f_ode_air
    GearSet.f_step = f_step_air
    GearSet.strut_y = strut_y_air
    skip = timed("gear-skipped")
    print(f"ceiling: {(base - skip)*1e6:.1f} us/step "
          f"({(base/skip - 1)*100:.1f}% throughput)")


if __name__ == "__main__":
    main()
