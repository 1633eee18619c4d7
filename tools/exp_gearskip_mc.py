"""Gear-gate cost on a GROUND-HEAVY fleet: the Monte Carlo fleet has lanes
that descend/crash into terrain, so the gate's predicate goes True and the
inner conds pay their fusion-boundary cost with no skip.

Measured (v5e, batch 4096, 30000 steps): gate=10 12.1M vs gate=None 14.9M
steps/s — which is why tools/bench_report.py's MC config and any
ground-heavy workload should construct Simulation(gear_gate_margin=None)
(docs/notes/performance.md "Gear-gate cost profile").

Run: python tools/exp_gearskip_mc.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel import fleet

    sim, state0, ctx = flagship_sim()
    st = fleet.broadcast_state(state0, 4096)
    st = fleet.monte_carlo_c172(st, jax.random.PRNGKey(0))
    n = 30000

    def run(tag, margin, unroll=1):
        s2 = sim.replace(gear_gate_margin=margin)
        t0 = time.time()
        out = jax.block_until_ready(
            fleet.fleet_rollout(s2, st, n, ctx, unroll=unroll))
        cold = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(
            fleet.fleet_rollout(s2, st, n, ctx, unroll=unroll))
        warm = time.time() - t0
        print(f"{tag:22s}: warm {warm:6.2f}s  {4096*n/warm/1e6:6.2f}M "
              f"steps/s (cold {cold:.0f}s)", flush=True)
        return out

    run("gate=10  unroll=1", 10.0)
    out = run("gate=None unroll=1", None)
    h = np.asarray(out.x["vehicle"]["kinematics"]["h_e"])
    crashed = np.asarray(out.s["vehicle"]["systems"]["crashed"])
    print("h_e percentiles:", np.percentile(h, [0, 1, 50, 99, 100]).round(1))
    print(f"crashed lanes: {int(crashed.sum())} / {crashed.size}")


if __name__ == "__main__":
    main()
