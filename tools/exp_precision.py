"""Measure interp matmul precision: HIGH (3-pass bf16) vs HIGHEST (6-pass).

Prints the max 1-step fleet-state divergence and the 1000-step roll timing
for each setting. CPU/f64 ignores precision, so only the on-chip f32 path
is affected.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

def main():
    from flightjax.ops import interp
    from flightjax.models.c172 import flagship_sim
    batch, steps = 4096, 1000
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    outs, times = {}, {}
    for name, prec in (("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)):
        interp._PRECISION = prec
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
        print(f"{name:8s}: {dt*1e6:7.1f} us/fleet-step  {batch/dt/1e6:6.2f}M steps/s",
              flush=True)

    err = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float64) -
                                           b.astype(jnp.float64)))),
        outs["HIGH"].x, outs["HIGHEST"].x)))
    print(f"max 1-step x divergence HIGH vs HIGHEST: {err:.3e}")
    print(f"speedup: {times['HIGHEST']/times['HIGH']:.3f}x")

if __name__ == "__main__":
    main()
