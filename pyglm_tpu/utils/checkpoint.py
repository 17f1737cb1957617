"""Chain checkpoint/resume.

The reference has no checkpoint subsystem — users pickle model objects
(SURVEY.md §5). Here MCMC state is an explicit pytree, so checkpointing is
trivial and robust: the full chain state (parameters + aux + network +
PRNG key) round-trips through one .npz file. Orbax is available in the
image but overkill for MB-scale states; npz keeps checkpoints portable.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, model) -> None:
    """Save a model's chain state (parameters, aux, network, PRNG key)."""
    leaves, treedef = jax.tree.flatten(model.state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__key__"] = np.asarray(jax.random.key_data(model._key))
    np.savez(path, **arrays)
    model.__dict__.setdefault("_treedef_cache", treedef)


def load_state(path: str, model) -> None:
    """Restore a chain state saved by save_state into a model built with
    the SAME configuration (N, B, families, priors). Resuming continues
    the chain exactly where it left off (same PRNG stream)."""
    data = np.load(path)
    _, treedef = jax.tree.flatten(model.state)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    model.state = jax.tree.unflatten(treedef, leaves)
    model._key = jax.random.wrap_key_data(jnp.asarray(data["__key__"]))
