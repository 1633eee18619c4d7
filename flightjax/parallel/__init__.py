from flightjax.parallel.fleet import (broadcast_state, fleet_metrics,
                                      monte_carlo_c172, shard_fleet,
                                      fleet_step_fn, fleet_rollout)
