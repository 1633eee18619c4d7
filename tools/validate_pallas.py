"""Validate the Pallas cluster-kernel step on the current TPU and, on
success, write `.pallas_ok` at the repo root so bench.py uses it.

Run: python tools/validate_pallas.py [hybrid|fine|minor|subsystems]   (default: hybrid)
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

    variant = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    batch = 4096
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    t0 = time.perf_counter()
    if variant in ("minor", "fine", "hybrid"):
        step = make_cluster_step(
            sim, state, ctx,
            split=(variant if variant in ("fine", "hybrid")
                   else "subsystems"),
            layout="minor")
        got = to_major(jax.block_until_ready(
            jax.jit(step)(to_minor(state))))
    else:
        step = make_cluster_step(sim, state, ctx, split="subsystems")
        got = jax.block_until_ready(jax.jit(step)(state))
    print(f"compile+1 step [{variant}]: {time.perf_counter() - t0:.1f}s")

    ref = jax.jit(lambda st: sim.fleet_step(st, ctx))(state)
    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32)))), got, ref)))
    print("max leaf diff vs plain step:", err)
    if err > 1e-3:
        raise SystemExit(f"FAIL: diverges ({err})")

    # ------------------------------------------------ time vs the plain path
    def rate(roll, carry, steps_per_call=200, n_calls=5):
        carry = jax.block_until_ready(roll(carry))  # compile
        carry = jax.block_until_ready(roll(carry))  # absorb layout shuffle
        t0 = time.perf_counter()
        for _ in range(n_calls):
            carry = roll(carry)
        jax.block_until_ready(carry)
        return batch * steps_per_call * n_calls / (time.perf_counter() - t0)

    if variant in ("minor", "fine", "hybrid"):
        carry0 = to_minor(state)
    else:
        carry0 = state

    @jax.jit
    def roll_ck(st):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, st, None, length=200)
        return c

    @jax.jit
    def roll_plain(st):
        def body(c, _):
            return sim.fleet_step(c, ctx), None
        c, _ = jax.lax.scan(body, st, None, length=200)
        return c

    r_pallas = rate(roll_ck, carry0)
    r_plain = rate(roll_plain, state)
    print(f"pallas[{variant}]: {r_pallas:.3e} steps/s   "
          f"plain: {r_plain:.3e} steps/s   "
          f"ratio {r_pallas / r_plain:.2f}x")

    marker = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".pallas_ok")
    if r_pallas <= r_plain:
        print("pallas path validated but SLOWER than the plain path; "
              "not writing", marker)
        if os.path.exists(marker):
            os.remove(marker)
        return
    with open(marker, "w") as f:
        f.write(f"variant={variant} err={err} rate={r_pallas:.4g} "
                f"plain={r_plain:.4g}\n")
    print("OK ->", marker)


if __name__ == "__main__":
    main()
