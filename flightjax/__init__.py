"""flightjax — a TPU-native flight dynamics, simulation & GNC framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Flight.jl
(reference: e271828e/Flight.jl): hierarchical hybrid continuous/discrete
modeling, a fixed-step RK4 simulation engine under `jax.lax.scan`, flight
physics (quaternion attitude, WGS84 geodesy, ISA atmosphere, 6-DOF rigid body
dynamics, propellers, piston engines, landing gear), trim & linearization via
autodiff, gain-scheduled PID/LQR control laws, and worked applications
(Cessna 172 family, 2D self-balancing robot) — all batched with `vmap` and
sharded over TPU meshes.

Everything in the compute path is pure and jit-compatible; host I/O (X-Plane
UDP, joystick, GUI) consumes dispatched state snapshots outside of jit.
"""

__version__ = "0.1.0"

from flightjax import ops
from flightjax import core
from flightjax import physics
from flightjax import utils

# umbrella re-exports (the reference's Reexport pattern, `src/Flight.jl`)
from flightjax.core.sim import Simulation, SimState, TimeSeries
from flightjax.core.modeling import Component, Subsampled, print_tree, tree_repr
from flightjax.core.mission import MissionAvionics, Phase
from flightjax.physics.aircraftbase import (Aircraft, NoVehicleSystems,
                                            SimpleWorld, Vehicle)
