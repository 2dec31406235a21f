"""Checkpoint / resume of sampler state.

The reference has no checkpointing: chain state lives only in device memory
for one ``KernelWrapper`` call, and "resume" is the host app feeding the
output poses back in as the next input ``cfg`` (SURVEY.md §5). Here the full
``MHState`` PyTree — pose, cost breakdown, RNG key, step counters,
adaptation state — round-trips to disk, so a run can resume exactly where
it stopped (deterministically: the chain continues bitwise-identically,
because the key/step fold is part of the state).

Uses orbax when available; falls back to a plain ``.npz`` of the flattened
leaves (PRNG keys are serialized via ``jax.random.key_data``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised when orbax present
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _encode(tree):
    """Replace PRNG key arrays with raw key data (serializable)."""

    def enc(leaf):
        if isinstance(leaf, jax.Array) and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            return {"__prng_key__": jax.random.key_data(leaf)}
        return leaf

    return jax.tree.map(enc, tree, is_leaf=lambda x: isinstance(x, jax.Array))


def _decode(tree):
    def is_marker(x):
        return isinstance(x, dict) and "__prng_key__" in x

    def dec(leaf):
        if is_marker(leaf):
            return jax.random.wrap_key_data(jnp.asarray(leaf["__prng_key__"]))
        return leaf

    return jax.tree.map(dec, tree, is_leaf=is_marker)


def save_state(path: str, state, log=None) -> None:
    """Save a sampler-state PyTree (MHState or any pytree of arrays).

    ``log``: optional :class:`~mh_tpu.utils.runlog.RunLogger` — emits a
    ``checkpoint`` event (op=save) on completion.
    """
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, _encode(state), force=True)
        ckptr.wait_until_finished()
    else:
        leaves, _ = jax.tree.flatten(_encode(state))
        np.savez(path + ".npz", *[np.asarray(l) for l in leaves])
    if log is not None:
        step = getattr(state, "step", None)
        log.log_checkpoint(
            "save", path,
            **({"step": int(np.max(np.asarray(step)))} if step is not None else {}),
        )


def restore_state(path: str, template, log=None):
    """Restore a PyTree saved by :func:`save_state`; ``template`` gives structure."""
    path = os.path.abspath(path)
    enc_template = _encode(template)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            enc_template,
        )
        restored = ckptr.restore(path, abstract)
    else:
        data = np.load(path + ".npz")
        leaves, treedef = jax.tree.flatten(enc_template)
        restored = jax.tree.unflatten(
            treedef, [jnp.asarray(data[f]) for f in data.files]
        )
    if log is not None:
        log.log_checkpoint("restore", path)
    return _decode(restored)


# --- distributed (per-process shard) checkpointing ---------------------------
#
# The pod recovery pattern: every process saves only the rows of the
# globally-sharded state its local devices own; on restart, each process
# loads its own shard file and the shards are re-assembled into global
# arrays over the (new) mesh. No cross-process traffic at save or restore.


def _local_rows(leaf):
    """Locally-addressable rows of a (possibly sharded) array, in order."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        shards = sorted(
            leaf.addressable_shards,
            key=lambda s: (s.index[0].start or 0) if s.index else 0,
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(leaf)


def save_local_shards(path: str, state) -> None:
    """Save this process's shard of a chains-sharded state PyTree."""
    enc = _encode(state)
    leaves, _ = jax.tree.flatten(enc)
    np.savez(
        f"{os.path.abspath(path)}.proc{jax.process_index()}.npz",
        *[_local_rows(l) for l in leaves],
    )


def restore_local_shards(path: str, template, mesh, spec):
    """Restore a state saved by :func:`save_local_shards` onto ``mesh``.

    ``template`` gives the PyTree structure (local shapes); ``spec`` is the
    ``PartitionSpec`` of every leaf (the chains axis). Each process reads
    only its own file; leaves are reassembled into global arrays with
    ``host_local_array_to_global_array``.
    """
    from jax.experimental import multihost_utils

    data = np.load(f"{os.path.abspath(path)}.proc{jax.process_index()}.npz")
    enc_template = _encode(template)
    leaves, treedef = jax.tree.flatten(enc_template)
    restored = [
        multihost_utils.host_local_array_to_global_array(
            data[f], mesh, spec
        )
        for f in data.files
    ]
    return _decode(jax.tree.unflatten(treedef, restored))
