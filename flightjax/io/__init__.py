"""Host-side I/O: UDP networking, X-Plane 12 visualization bridge, SDL2
joysticks, real-time simulation loop. All of this runs on the host CPU
outside jit, consuming dispatched state snapshots — the TPU-native analog
of the reference's SimInterface threads (`sim.jl:100-166`)."""
