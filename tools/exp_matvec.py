"""A/B the first-axis contraction form for tiny tables: MXU matvec vs VPU
broadcast-multiply-reduce (`interp._VPU_MAX_R`).

The post-round-2b profile attributes ~25 us/step to `interp.py` matmuls with
f32[4096] outputs — the (B, n0) x (n0, 1) matvecs of the ~9 one-dimensional
aero/engine tables, evaluated 4x per step (RK4 stages). An N=1 matmul pads
to 128x128 MXU tiles AND forces the hat-weight tensor to materialize as a
matmul operand; the reduce form fuses into the weight computation.

Related measured negative (docs/notes/performance.md): the JOINT
outer-product weight form for multi-axis tables was 1.6x slower — this
experiment only rewrites the R<=threshold first-axis contraction, which is
strictly less VPU work than the joint form.

Prints us/fleet-step for thresholds 0 (all-MXU, round-2b baseline), 1, 8,
and the max 1-step state divergence vs threshold 0.
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
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    outs, times = {}, {}
    for thresh in (0, 1, 8):
        interp._VPU_MAX_R = thresh
        one = jax.jit(lambda st: sim.fleet_step(st, ctx))
        outs[thresh] = jax.block_until_ready(one(state))

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
        times[thresh] = dt
        print(f"_VPU_MAX_R={thresh}: {dt*1e6:7.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s", flush=True)

    for thresh in (1, 8):
        # compare EVERY leaf of the state pytree (x, attitude, velocities,
        # engine/discrete state), not just the .x subtree
        err = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float64) -
                                               b.astype(jnp.float64)))),
            outs[0], outs[thresh])))
        print(f"max 1-step state divergence {thresh} vs 0: {err:.3e}")


if __name__ == "__main__":
    main()
