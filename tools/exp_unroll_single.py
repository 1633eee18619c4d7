"""Scan-body unroll on the SINGLE-VEHICLE CPU path (the reference's own
workload shape: one aircraft, real-time-factor metric).

At batch 1 on the host backend each scan iteration executes hundreds of
tiny kernels; dispatch overhead dominates (374 us/step for the 600 s
turning climb = ~26.8x realtime, tools/bench_report.py). `Simulation.run`
exposes `unroll` so XLA can fuse across step boundaries — this experiment
measures the effect on the turning-climb autopilot workload.

RESULT (2026-08-20, idle 1-CPU box, persistent compile cache warm):
    unroll=1: 248.5 us/step (40.2x realtime)   <- ships as default
    unroll=2: 339.2 us/step
    unroll=4: 329.0 us/step
    unroll=8: 370.4 us/step
Measured NEGATIVE at every factor: XLA:CPU already runs the scan as a
host loop with no per-iteration dispatch boundary (unlike the TPU fleet
path, where unroll=4 is +7%), so unrolling only bloats the loop body
past the code/cache sweet spot. `run(unroll=)` stays default-1 on CPU;
the knob exists for TPU-resident single-vehicle work and parity with
`fleet_rollout`. See docs/notes/performance.md "single-vehicle unroll".

Run on an otherwise-idle box: python tools/exp_unroll_single.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The whole experiment targets the host CPU backend; force it at the
# platform level so import-time table constants don't device_put to the
# default (remote TPU) backend — which also hangs the run outright when
# the tunnel is down.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    from flightjax.demos.c172_demos import turning_climb, turning_climb_setup

    with jax.default_device(jax.devices("cpu")[0]):  # no-op under jax_platforms=cpu, kept for clarity
        t0 = time.perf_counter()
        rig = turning_climb_setup(dt=0.01)
        print(f"setup/trim: {time.perf_counter() - t0:.1f}s", flush=True)

        for unroll in (1, 2, 4, 8):
            t0 = time.perf_counter()
            final, _ = turning_climb(t_end=600.0, dt=0.01, rig=rig,
                                     unroll=unroll)
            jax.block_until_ready(final.x)
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            final, _ = turning_climb(t_end=600.0, dt=0.01, rig=rig,
                                     unroll=unroll)
            jax.block_until_ready(final.x)
            warm = time.perf_counter() - t0
            print(f"unroll={unroll}: warm {warm:6.2f}s "
                  f"({600.0/warm:6.1f}x realtime, "
                  f"{warm/60000*1e6:5.1f} us/step; cold {cold:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
