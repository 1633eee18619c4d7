"""HBM-traffic roofline for the fleet step (VERDICT r2 ask #1).

Computes, from XLA's own cost analysis of the compiled step, how close the
measured fleet-step time is to the traffic-bound ceiling:

    ceiling_us = bytes_accessed / HBM_BW
    roofline_fraction = ceiling_us / measured_us

`bytes_accessed` counts every HBM read+write the compiled executable
performs (operands + outputs of every fusion, including materialized
intermediates between fusions) — exactly the quantity the batch-scaling
slope said dominates (docs/notes/performance.md "Cost model"). FLOPs are
reported too, against the v5e peak, to show the step is nowhere near
compute-bound.

Run on the real chip: python tools/roofline.py [batch] [unroll]
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

# TPU v5e (one chip): HBM2 bandwidth and bf16 MXU peak.
HBM_BW = 819e9          # bytes/s
PEAK_BF16 = 197e12      # FLOP/s (f32 elementwise on the VPU is far lower,
                        # so the FLOP bound below is generous)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    steps = 4000

    from flightjax.models.c172 import flagship_sim
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)

    def roll(st):
        def body(s, _):
            return sim.fleet_step(s, ctx), None
        s, _ = jax.lax.scan(body, st, None, length=steps, unroll=unroll)
        return s

    jroll = jax.jit(roll, donate_argnums=(0,))
    lowered = jroll.lower(state)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    bytes_total = float(ca.get("bytes accessed", float("nan")))
    flops_total = float(ca.get("flops", float("nan")))
    # the scan body executes `steps` times but XLA reports the while loop's
    # body cost already multiplied by the trip count on TPU; verify by
    # scaling: compile a 2x-steps variant and compare
    per_step_bytes = bytes_total / steps
    per_step_flops = flops_total / steps

    # measured time
    carry = jax.block_until_ready(jroll(jax.tree.map(jnp.copy, state)))
    carry = jax.block_until_ready(jroll(carry))
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        carry = jroll(carry)
    jax.block_until_ready(carry)
    dt = (time.perf_counter() - t0) / (n * steps)

    ceiling = per_step_bytes / HBM_BW
    flop_floor = per_step_flops / PEAK_BF16
    print(f"batch={batch} unroll={unroll} steps/dispatch={steps}")
    print(f"bytes accessed / step : {per_step_bytes/1e6:10.3f} MB "
          f"({per_step_bytes/batch:7.1f} B/lane)")
    print(f"flops / step          : {per_step_flops/1e6:10.3f} MFLOP "
          f"({per_step_flops/batch:7.1f} FLOP/lane)")
    print(f"measured              : {dt*1e6:10.1f} us/fleet-step "
          f"({batch/dt/1e6:6.2f}M steps/s)")
    print(f"HBM traffic ceiling   : {ceiling*1e6:10.1f} us/step "
          f"-> {100*ceiling/dt:5.1f}% of traffic-bound speed-of-light")
    print(f"bf16-peak FLOP floor  : {flop_floor*1e6:10.2f} us/step "
          f"-> {100*flop_floor/dt:5.1f}% of compute-bound ceiling")
    print(f"achieved HBM rate     : {per_step_bytes/dt/1e9:8.1f} GB/s "
          f"of {HBM_BW/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
