"""Checkpoint / resume for simulation state.

The reference has no checkpointing (`SURVEY.md §5`) — re-initialization
only. Here the whole hybrid state is one pytree, so checkpointing is
first-class: orbax-backed for production (async, fleet-sharded states
supported), with a plain-npz fallback for tiny states.
"""

import os
import pickle

import jax
import numpy as np


def save_state(path, state):
    """Save any pytree (e.g. a SimState, batched or not) to `path`."""
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, __treedef__=np.frombuffer(pickle.dumps(treedef), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path):
    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["__treedef__"].tobytes())
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    import jax.numpy as jnp
    return jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])


def save_state_orbax(path, state):
    """Async-capable orbax checkpoint (for large sharded fleet states)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path, like):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
