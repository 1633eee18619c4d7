"""Cessna 172 family."""

from flightjax.models.c172.c172s import (build_aircraft, build_vehicle,
                                         flagship_sim, flagship_world,
                                         linearize_ned, trim)
from flightjax.models.c172.common import TrimParameters, TrimState, trim_parameters
