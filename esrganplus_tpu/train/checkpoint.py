"""Checkpoint / resume.

Reference semantics (``codes/models/base_model.py:50-85``): per-network weight
files ``<iter>_G.pth`` / ``<iter>_D.pth`` plus a trainer-state file with
epoch/iter/optimizer/scheduler state, saved every ``save_checkpoint_freq`` and
restored via ``resume_state``.

Here the full train state (params, optimizer pytrees, step) is one
``<iter>.state.npz`` — leaves flattened in treedef order, restored against a
template state from ``trainer.init_state`` so arbitrary optax structures
round-trip without pickling. Generator/discriminator weights are additionally
exported as reference-layout ``.pth`` so the upstream tools (test.py,
net_interp.py, transfer_params.py) can consume our checkpoints directly.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

STATE_SUFFIX = ".state.npz"


def _fetch_tree(tree):
    """Device→host fetch of a pytree, overlapping transfers where safe.

    ``copy_to_host_async`` overlaps the per-array round-trip for plainly
    placed (single-device) arrays, but on remote-attached runtimes it takes
    a pathological seconds-per-leaf path for ``NamedSharding`` outputs of
    jitted steps (measured ~2-3 s/leaf vs ~30 ms plain) — so async is only
    requested for single-device leaves and sharded leaves drain serially."""
    import jax.sharding as jsh

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    for leaf in leaves:
        if (hasattr(leaf, "copy_to_host_async")
                and isinstance(getattr(leaf, "sharding", None),
                               jsh.SingleDeviceSharding)):
            leaf.copy_to_host_async()
    return [np.asarray(leaf) for leaf in leaves], treedef


def save_state(path: str, state) -> None:
    leaves, treedef = _fetch_tree(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"leaf_{i}": leaf for i, leaf in enumerate(leaves)}
    meta = {"n_leaves": len(leaves), "treedef": str(treedef)}
    # write-then-rename: a crash mid-write must not leave a truncated file
    # where resume expects a checkpoint (np.savez appends '.npz' to bare
    # paths, so hand it an open handle)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, __meta__=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def device_snapshot(tree):
    """On-device copy of every jax.Array leaf (new HBM buffers, shardings
    preserved). The point: the train step DONATES its state buffers, so a
    background checkpoint fetch from the live state would race the next
    step's donation — fetch from a snapshot instead. The copy is device-side
    and cheap (~HBM bandwidth); nothing touches the host here."""
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a, tree)


class AsyncCheckpointer:
    """Background checkpoint writer.

    On remote-attached runtimes the device→host state fetch is the slow,
    unpredictable part (measured 42 s to >9 min for a 202 MB train state
    through the tunnel, NOTES_ROUND3.md) and it serialized with training.
    ``save()`` snapshots the state on device (fast), then fetches and writes
    — plus any caller-supplied exports — in a daemon thread, so the train
    loop only ever pays the HBM copy. One write in flight at a time: a new
    save first waits out the previous one (bounds memory to one snapshot);
    call ``wait()`` before process exit so the last write lands."""

    def __init__(self):
        self._thread: Optional[object] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state, export_fn=None) -> None:
        import threading

        self.wait()
        snap = device_snapshot(state)

        def work():
            try:
                save_state(path, snap)
                if export_fn is not None:
                    export_fn(snap)
            except BaseException as e:  # surfaced on the next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) finished; re-raise its
        error, if it had one, on the caller's thread."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def load_state(path: str, template_state):
    """Restore into the structure of ``template_state`` (shape-checked)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        leaves = [data[f"leaf_{i}"] for i in range(meta["n_leaves"])]
    t_leaves, treedef = jax.tree_util.tree_flatten(template_state)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template has {len(t_leaves)} "
            "— config mismatch?")
    for i, (a, b) in enumerate(zip(leaves, t_leaves)):
        if tuple(a.shape) != tuple(np.shape(b)):
            raise ValueError(f"leaf {i} shape {a.shape} != template {np.shape(b)}")
    restored = [np.asarray(a, dtype=np.asarray(b).dtype) for a, b in zip(leaves, t_leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored)


def _toggle_g_repr(tree, net_cfg):
    """Flip every generator-param-shaped subtree between the canonical and
    prepared-trunk representations (``models/rrdb.py prep_trunk_ct`` /
    ``unprep_trunk_ct``). The prepared layout is a permutation of the
    canonical entries (plus structural zeros), so the map is exact for the
    Adam moment trees too — they mirror the params structure and convert
    with the same slicing/transposing."""
    from esrganplus_tpu.models.rrdb import prep_trunk_ct, unprep_trunk_ct

    def rec(node):
        if isinstance(node, dict):
            if "trunk" in node and "trunk_conv" in node:
                return prep_trunk_ct(node, net_cfg)
            if "trunk_ct" in node:
                return unprep_trunk_ct(node, net_cfg)
            return {k: rec(v) for k, v in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[rec(v) for v in node])
        if isinstance(node, (list, tuple)):
            return type(node)(rec(v) for v in node)
        return node

    return rec(tree)


def load_state_auto(path: str, template_state, net_cfg=None):
    """:func:`load_state` that also accepts checkpoints saved under the OTHER
    generator representation (prepared-trunk masters vs canonical — the
    ``prep_trunk`` auto-gate differs across backends, so e.g. a TPU-trained
    state can resume on a CPU trainer). On a structure mismatch the template
    is toggled to the other representation, the checkpoint restored into it,
    and the result converted back — exact, the layouts are permutations of
    each other."""
    try:
        return load_state(path, template_state)
    except ValueError as orig:
        if net_cfg is None:
            raise
        try:
            alt_template = _toggle_g_repr(template_state, net_cfg)
            loaded = load_state(path, alt_template)
        except Exception as exc:
            # not a representation mismatch (e.g. a genuine config mismatch,
            # or a non-RRDB generator) — surface the original shape error,
            # keeping the retry failure inspectable via __cause__
            raise orig from exc
        return _toggle_g_repr(loaded, net_cfg)


def _save_pth(path: str, sd) -> None:
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save({k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path)


def save_networks_pth(models_dir: str, tag, g_params, g_cfg, d_params=None,
                      d_cfg=None) -> None:
    """Export weights in reference-layout .pth (``<tag>_G.pth``, ``<tag>_D.pth``)."""
    from esrganplus_tpu.convert.pth import (
        discriminator_sn_to_state_dict,
        discriminator_to_state_dict,
        generator_to_state_dict,
    )

    # fetch to host with overlapped transfers before the layout conversion
    # (the converters iterate leaves serially otherwise — see _fetch_tree)
    g_leaves, g_def = _fetch_tree(g_params)
    g_params = jax.tree_util.tree_unflatten(g_def, g_leaves)
    _save_pth(os.path.join(models_dir, f"{tag}_G.pth"), generator_to_state_dict(g_params, g_cfg))
    if d_params is not None and d_cfg is not None:
        d_leaves, d_def = _fetch_tree(d_params)
        d_params = jax.tree_util.tree_unflatten(d_def, d_leaves)
        d_to_sd = (discriminator_sn_to_state_dict
                   if getattr(d_cfg, "spectral_norm", False)
                   else discriminator_to_state_dict)
        _save_pth(os.path.join(models_dir, f"{tag}_D.pth"), d_to_sd(d_params, d_cfg))


def latest_state_path(state_dir: str) -> Optional[str]:
    if not os.path.isdir(state_dir):
        return None
    states = [f for f in os.listdir(state_dir) if f.endswith(STATE_SUFFIX)]
    if not states:
        return None
    states.sort(key=lambda f: int(f.split(".")[0]))
    return os.path.join(state_dir, states[-1])
