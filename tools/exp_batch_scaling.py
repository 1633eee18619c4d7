"""Where does the plain-XLA fleet step sit: fixed-overhead-bound or
HBM/compute-bound?  Times a 100-step fleet roll at several batch sizes on
the real chip and counts fusions in the compiled while-body at batch 4096.

Interpretation:
- us/fleet-step flat in batch  -> per-fusion fixed overhead dominates
  (sequential kernel launches inside the scan body); the lever is fewer,
  bigger fusions.
- us/fleet-step ~linear in batch -> HBM traffic of materialized
  intermediates dominates; the lever is less state touched per step.
"""

import json
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

    sim, state0, ctx = flagship_sim()
    print(f"# devices: {jax.devices()}", flush=True)

    # bench conditions: unroll=4 (see bench.py); 400 steps keeps the
    # dispatch long enough to amortize the tunnel round-trip
    steps, unroll = 400, 4
    print(f"# steps={steps} unroll={unroll}", flush=True)

    def make_roll():
        @jax.jit
        def roll(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=unroll)
            return st
        return roll

    results = []
    for batch in (512, 1024, 2048, 4096, 8192, 16384):
        state = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
        roll = make_roll()
        t0 = time.time()
        carry = jax.block_until_ready(roll(state))
        compile_s = time.time() - t0
        # warm
        carry = jax.block_until_ready(roll(carry))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            carry = roll(carry)
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        us_per_fleet_step = dt / (n * steps) * 1e6
        rec = {
            "batch": batch,
            "compile_s": round(compile_s, 1),
            "us_per_fleet_step": round(us_per_fleet_step, 1),
            "vehicle_steps_per_s": round(batch / (us_per_fleet_step * 1e-6)),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if "--hlo" in sys.argv:
        batch = 4096
        state = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
        txt = make_roll().lower(state).compile().as_text()
        n_fusion = txt.count(" fusion(")
        n_while = txt.count(" while(")
        print(json.dumps({"batch": batch, "fusions_total": n_fusion,
                          "while_ops": n_while,
                          "hlo_lines": txt.count("\n")}), flush=True)
        with open("/tmp/fleet_roll_4096.hlo.txt", "w") as f:
            f.write(txt)
        print("# optimized HLO -> /tmp/fleet_roll_4096.hlo.txt", flush=True)


if __name__ == "__main__":
    main()
