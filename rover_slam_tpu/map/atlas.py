"""Atlas: multi-map management and checkpoint/resume.

TPU-native replacement for the reference's Atlas + boost serialization
(reference: src/Atlas.cc — CreateNewMap :62 on tracking loss
(Tracking::CreateMapInAtlas src/Tracking.cc:3167), active/stored maps;
System::SaveAtlas/LoadAtlas src/System.cc:1476-1594 with md5 checksum
:1596 — the multi-session mechanism).

With the array-of-structs map, "multiple maps" are map_id labels inside ONE
MapState (merging maps = relabeling, no pointer surgery), and
checkpoint/resume is a straight array dump: np.savez of the MapState pytree +
sha256 (the md5-checksum equivalent), restoring byte-identical device state.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from . import map_state as ms


def create_new_map(state: ms.MapState) -> ms.MapState:
    """Start a fresh active map (reference CreateMapInAtlas on tracking loss:
    keeps the stored maps' keyframes/landmarks under their old map_id; new
    insertions get the bumped id)."""
    return state.replace(active_map_id=state.active_map_id + 1)


def active_map_masks(state: ms.MapState):
    """(kf_mask, lm_mask) of the active map."""
    return (state.kf_active & (state.kf_map_id == state.active_map_id),
            state.lm_active & (state.lm_map_id == state.active_map_id))


def merge_maps(state: ms.MapState, keep_id: int, absorb_id: int) -> ms.MapState:
    """Relabel map `absorb_id` into `keep_id` after the loop-closing module has
    aligned the geometry (reference MergeLocal's map-weld bookkeeping)."""
    return state.replace(
        kf_map_id=jnp.where(state.kf_map_id == absorb_id, keep_id,
                            state.kf_map_id),
        lm_map_id=jnp.where(state.lm_map_id == absorb_id, keep_id,
                            state.lm_map_id),
        active_map_id=jnp.asarray(keep_id, jnp.int32))


# ---------------------------------------------------------------------------
# Checkpoint / resume (reference SaveAtlas/LoadAtlas)
# ---------------------------------------------------------------------------

def save_atlas(state: ms.MapState, path: str, metadata: dict | None = None):
    """Serialize the full map state + integrity checksum."""
    arrays = {f: np.asarray(getattr(state, f)) for f in state.__dataclass_fields__}
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    digest = _sha256(path)
    with open(path + ".meta.json", "w") as f:
        json.dump({"sha256": digest, "version": 2,
                   **(metadata or {})}, f)
    return digest


def load_atlas(path: str, verify: bool = True) -> ms.MapState:
    """Restore a map state; verifies the checksum like the reference's md5 gate
    (System::LoadAtlas refuses a corrupted file)."""
    if verify:
        meta_path = path + ".meta.json"
        with open(meta_path) as f:
            meta = json.load(f)
        digest = _sha256(path)
        if digest != meta["sha256"]:
            raise ValueError(
                f"atlas checksum mismatch: {digest} != {meta['sha256']}")
    data = np.load(path)
    kwargs = {k: jnp.asarray(data[k]) for k in data.files}
    # Forward-compat: scalar counters added after a checkpoint was written
    # default to zero (array fields are structural and must be present).
    kwargs.setdefault("lm_dropped", jnp.zeros((), jnp.int32))
    # Back-compat (version 1 checkpoints, pre stereo inverse depth): default
    # kf_kpt_invd to "no right-eye observation" everywhere; shape matches the
    # per-keypoint valid table.
    if "kf_kpt_invd" not in kwargs:
        kwargs["kf_kpt_invd"] = jnp.full(kwargs["kf_kpt_valid"].shape, -1.0,
                                         jnp.float32)
    return ms.MapState(**kwargs)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()
