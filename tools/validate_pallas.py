"""Validate the Pallas cluster-kernel step on the current TPU and, on
success, write `.pallas_ok` at the repo root so bench.py uses it.

Run: python tools/validate_pallas.py [minor|subsystems]   (default: minor)
The marker records the validated variant; bench.py reads it back.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:  # share compiled artifacts with bench.py (see bench.py header)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel.clusterstep import make_cluster_step
    from flightjax.parallel.pallas_block import to_major, to_minor

    variant = sys.argv[1] if len(sys.argv) > 1 else "minor"
    batch = 4096
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    t0 = time.perf_counter()
    if variant == "minor":
        step = make_cluster_step(sim, state, ctx, split="subsystems",
                                 layout="minor")
        got = to_major(jax.block_until_ready(
            jax.jit(step)(to_minor(state))))
    else:
        step = make_cluster_step(sim, state, ctx, split="subsystems")
        got = jax.block_until_ready(jax.jit(step)(state))
    print(f"compile+1 step [{variant}]: {time.perf_counter() - t0:.1f}s")

    ref = jax.jit(jax.vmap(lambda s: sim.step(s, ctx)))(state)
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), got, ref)))
    print("max leaf diff vs plain step:", err)
    if err > 1e-3:
        raise SystemExit(f"FAIL: diverges ({err})")

    marker = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".pallas_ok")
    with open(marker, "w") as f:
        f.write(f"variant={variant} err={err}\n")
    print("OK ->", marker)


if __name__ == "__main__":
    main()
