"""Headline benchmark: aggregate vehicle-steps/sec on one chip at batch 4096.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The baseline target (BASELINE.json) is >= 1e7 aggregate aircraft-steps/sec at
batch 4096 on one TPU chip for the full C172 step; until the C172 stack lands
the flagship is Robot2D. `vs_baseline` is value / 1e7.
"""

import json
import time

import jax
import jax.numpy as jnp

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

    steps_per_call = 100

    @jax.jit
    def roll(state):
        def body(st, _):
            return jax.vmap(lambda s: sim.step(s, ctx))(st), None
        state, _ = jax.lax.scan(body, state, None, length=steps_per_call)
        return state

    state = roll(state)  # compile + warm up
    jax.block_until_ready(state)
    state = roll(state)  # second warm-up: absorbs one-time layout shuffling
    jax.block_until_ready(state)

    n_calls = 5
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state = roll(state)
    jax.block_until_ready(state)
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
