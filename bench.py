"""Headline benchmark: aggregate vehicle-steps/sec on one chip at batch 4096.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline target (BASELINE.json) is >= 1e7 aggregate aircraft-steps/sec at
batch 4096 on one TPU chip for the full C172 step; until the C172 stack lands
the flagship is Robot2D. `vs_baseline` is value / 1e7.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

try:  # persistent compile cache: the Pallas cluster kernels take minutes
    # to compile via the remote Mosaic service; cache across processes so
    # the driver's bench run reuses the validation run's artifacts
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

BATCH = 4096
TARGET = 1.0e7


def main():
    try:
        from flightjax.models.c172 import flagship_sim
        sim, state0, ctx = flagship_sim()
        name = "c172"
    except ImportError:
        from flightjax.core.sim import Simulation
        from flightjax.models.robot2d import Robot
        sim = Simulation(Robot(), dt=0.01, periodic_dt=0.02)
        state0, ctx = sim.init(), ()
        name = "robot2d"

    state = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (BATCH,) + jnp.shape(leaf)), state0)

    # long scans amortize the per-dispatch host round-trip (the chip may sit
    # behind a network tunnel); scan trip count doesn't grow the HLO, so
    # compile cost is unchanged vs short dispatches. Measured on the v5e:
    # 200-step dispatches lose ~10%, 1000-step ~3 us/step of tunnel
    # overhead remains, 4000-step is ~flat beyond (tools/exp_dispatch.py
    # sweep: 234.9 -> 225.3 us/fleet-step at unroll=4)
    steps_per_call = 4000

    # Preferred path: the step as a handful of Pallas cluster kernels (the
    # plain path lowers to O(100) small fusions and is launch-latency-bound
    # at this batch). Validated against the plain step; falls back to
    # the plain scan if the kernel fails to build or diverges.
    carry, roll = None, None
    import os
    marker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".pallas_ok")
    variant = os.environ.get("FLIGHTJAX_PALLAS", "")
    if not variant and os.path.exists(marker):
        with open(marker) as f:
            head = f.read().split()
        variant = (head[0].split("=", 1)[1]
                   if head and head[0].startswith("variant=") else "minor")
    try:
        if not variant:
            # the cluster kernels compile for minutes; only attempt them
            # once they have been validated on this hardware (.pallas_ok,
            # written by tools/validate_pallas.py) or forced via env
            # (FLIGHTJAX_PALLAS=minor|subsystems)
            raise ImportError("pallas path not validated on this hardware")
        from flightjax.parallel.clusterstep import make_cluster_step
        from flightjax.parallel.pallas_block import to_major, to_minor
        minor = variant in ("minor", "1", "fine", "hybrid")
        cstep = make_cluster_step(
            sim, state, ctx,
            split=(variant if variant in ("fine", "hybrid")
                   else "subsystems"),
            layout="minor" if minor else "major")

        carry0 = to_minor(state) if minor else state
        got = jax.block_until_ready(jax.jit(cstep)(carry0))
        ref = jax.jit(lambda st: sim.fleet_step(st, ctx))(state)
        err = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(
                a.astype(jnp.float32) - b.astype(jnp.float32)))),
            to_major(got) if minor else got, ref)))
        if err > 1e-3:
            raise RuntimeError(f"cluster step diverges from plain step: {err}")

        @jax.jit
        def roll_ck(st):
            def body(c, _):
                return cstep(c), None
            c, _ = jax.lax.scan(body, st, None, length=steps_per_call)
            return c

        carry, roll = carry0, roll_ck
        name += f"+pallas-{variant}"
    except Exception as exc:  # pragma: no cover - fallback path
        print(f"# pallas cluster step unavailable ({type(exc).__name__}: "
              f"{exc}); plain scan", flush=True)

    if roll is None:
        # unroll=4 halves the per-iteration dispatch/ramp fixed cost and lets
        # XLA fuse across step boundaries (285 vs 306 us/fleet-step measured,
        # tools/exp_unroll_donate.py; unroll=8 spills and is 2.5x SLOWER);
        # donating the carry saves the dispatch-boundary copy (~1% more)
        def roll_plain(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps_per_call,
                                 unroll=4)
            return st

        carry, roll = state, jax.jit(roll_plain, donate_argnums=(0,))

    carry = roll(carry)  # compile + warm up
    jax.block_until_ready(carry)
    carry = roll(carry)  # second warm-up: absorbs one-time layout shuffling
    jax.block_until_ready(carry)

    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        carry = roll(carry)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0

    steps_per_sec = BATCH * steps_per_call * n_calls / dt
    print(json.dumps({
        "metric": f"{name}-steps/sec/chip@batch{BATCH}",
        "value": round(steps_per_sec),
        "unit": "vehicle-steps/s",
        "vs_baseline": round(steps_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
