"""Round 2 of the unroll sweep at bench conditions (1000-step dispatches)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

def main():
    from flightjax.models.c172 import flagship_sim
    batch, steps = 4096, 1000
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
    print(f"# {jax.devices()} batch={batch} steps={steps}", flush=True)

    def variant(unroll, donate):
        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=unroll)
            return st
        return jax.jit(roll_fn, donate_argnums=(0,) if donate else ())

    for name, unroll, donate in (("u1", 1, False), ("u4", 4, False),
                                 ("u8", 8, False), ("u4+donate", 4, True)):
        roll = variant(unroll, donate)
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
        print(f"{name:10s}: {dt*1e6:8.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s  (compile {compile_s:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
