"""Device-resident SLAM map: keyframes, landmarks, covisibility — as padded arrays.

TPU-native replacement for the reference's pointer-graph map model
(reference: src/{Frame,KeyFrame,MapPoint,Map,Atlas}.cc — KeyFrame covisibility graph
src/KeyFrame.cc:477 UpdateConnections, MapPoint observations map KF->(idx)
src/MapPoint.cc, Atlas multi-map src/Atlas.cc).

Design (SURVEY.md §7 stance): arrays-of-structs with fixed capacities and active
masks; every mutation is a functional masked update, so the whole map lives in HBM
and tracking / BA / loop closing never round-trip pointers through the host.

Key layout decisions vs. the reference:
- Observations: the reference stores per-MapPoint observation maps; we store the
  inverse — `landmark_idx[K, N]`: keypoint slot (k, i) -> landmark id or -1. BA
  edges are exactly the valid entries of this dense table (static shape), and the
  per-landmark observation list is recovered with segment ops.
- Covisibility: dense [K, K] int32 weight matrix computed with ONE MXU matmul of
  the KxL observation indicator with itself (the reference walks std::map counters
  per keyframe, src/KeyFrame.cc:477-540).
- Multi-map (Atlas): a `map_id` per keyframe/landmark instead of separate Map
  objects; merges relabel ids (src/Atlas.cc CreateNewMap analog: bump a counter).
"""
from __future__ import annotations

from typing import Any

import functools

import jax
import jax.numpy as jnp
import flax.struct


@flax.struct.dataclass
class MapState:
    # --- keyframes (capacity K, N keypoint slots each) ---
    kf_R_cw: jnp.ndarray        # [K,3,3] world->camera rotation
    kf_t_cw: jnp.ndarray        # [K,3]
    kf_R_wb: jnp.ndarray        # [K,3,3] body(IMU)->world rotation
    kf_p_wb: jnp.ndarray        # [K,3]
    kf_v_wb: jnp.ndarray        # [K,3] velocity
    kf_bg: jnp.ndarray          # [K,3] gyro bias
    kf_ba: jnp.ndarray          # [K,3] accel bias
    kf_time: jnp.ndarray        # [K]
    kf_kpts: jnp.ndarray        # [K,N,2] undistorted pixel coords
    kf_rays: jnp.ndarray        # [K,N,3] unprojected bearing rays (z=1 scale)
    kf_desc: jnp.ndarray        # [K,N,D] descriptors
    kf_kpt_valid: jnp.ndarray   # [K,N] bool
    kf_kpt_invd: jnp.ndarray    # [K,N] stereo inverse depth of the keypoint
                                # (-1 = mono / no right-eye match). Carries the
                                # metric stereo observation into every solver:
                                # the reference's 3-dim (uL,vL,uR) edges store
                                # u_R = u_L - bf*invd (EdgeStereoSE3ProjectXYZ,
                                # include/G2oTypes.h:497-575); inverse depth is
                                # the camera-model-agnostic form (KB8 rigs get
                                # a weighted inverse-depth residual instead of
                                # the rectified-disparity identity).
    kf_landmark_idx: jnp.ndarray  # [K,N] int32, -1 = no landmark
    kf_active: jnp.ndarray      # [K] bool
    kf_map_id: jnp.ndarray      # [K] int32
    kf_parent: jnp.ndarray      # [K] int32 spanning-tree parent (-1 root)
    kf_loop_edges: jnp.ndarray  # [K,K] bool loop/merge edges

    # --- landmarks (capacity L) ---
    lm_pos: jnp.ndarray         # [L,3]
    lm_desc: jnp.ndarray        # [L,D] distinctive descriptor
    lm_normal: jnp.ndarray      # [L,3] mean viewing direction
    lm_active: jnp.ndarray      # [L] bool
    lm_map_id: jnp.ndarray      # [L] int32
    lm_anchor_kf: jnp.ndarray   # [L] int32 reference keyframe
    lm_n_obs: jnp.ndarray       # [L] int32
    lm_found: jnp.ndarray       # [L] int32  (tracking hit count)
    lm_visible: jnp.ndarray     # [L] int32  (frustum-visible count)
    lm_first_kf: jnp.ndarray    # [L] int32  (creation keyframe, for culling age)

    # --- counters ---
    n_kf: jnp.ndarray           # scalar int32: next free keyframe slot
    n_lm: jnp.ndarray           # scalar int32: next free landmark slot
    active_map_id: jnp.ndarray  # scalar int32
    lm_dropped: jnp.ndarray     # scalar int32: landmarks lost to capacity
                                # overflow (observability: a real sequence must
                                # compact before this ever becomes nonzero)

    @property
    def K(self):
        return self.kf_active.shape[0]

    @property
    def L(self):
        return self.lm_active.shape[0]

    @property
    def N(self):
        return self.kf_kpt_valid.shape[1]


def empty_map(K: int = 256, N: int = 1024, L: int = 16384, D: int = 256,
              desc_dtype: Any = jnp.float32) -> MapState:
    f = jnp.float32
    return MapState(
        kf_R_cw=jnp.tile(jnp.eye(3, dtype=f)[None], (K, 1, 1)),
        kf_t_cw=jnp.zeros((K, 3), f),
        kf_R_wb=jnp.tile(jnp.eye(3, dtype=f)[None], (K, 1, 1)),
        kf_p_wb=jnp.zeros((K, 3), f),
        kf_v_wb=jnp.zeros((K, 3), f),
        kf_bg=jnp.zeros((K, 3), f),
        kf_ba=jnp.zeros((K, 3), f),
        kf_time=jnp.zeros((K,), f),
        kf_kpts=jnp.zeros((K, N, 2), f),
        kf_rays=jnp.zeros((K, N, 3), f),
        kf_desc=jnp.zeros((K, N, D), desc_dtype),
        kf_kpt_valid=jnp.zeros((K, N), bool),
        kf_kpt_invd=jnp.full((K, N), -1.0, f),
        kf_landmark_idx=jnp.full((K, N), -1, jnp.int32),
        kf_active=jnp.zeros((K,), bool),
        kf_map_id=jnp.zeros((K,), jnp.int32),
        kf_parent=jnp.full((K,), -1, jnp.int32),
        kf_loop_edges=jnp.zeros((K, K), bool),
        lm_pos=jnp.zeros((L, 3), f),
        lm_desc=jnp.zeros((L, D), desc_dtype),
        lm_normal=jnp.zeros((L, 3), f),
        lm_active=jnp.zeros((L,), bool),
        lm_map_id=jnp.zeros((L,), jnp.int32),
        lm_anchor_kf=jnp.full((L,), -1, jnp.int32),
        lm_n_obs=jnp.zeros((L,), jnp.int32),
        lm_found=jnp.ones((L,), jnp.int32),
        lm_visible=jnp.ones((L,), jnp.int32),
        lm_first_kf=jnp.full((L,), -1, jnp.int32),
        n_kf=jnp.zeros((), jnp.int32),
        n_lm=jnp.zeros((), jnp.int32),
        active_map_id=jnp.zeros((), jnp.int32),
        lm_dropped=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------

def add_keyframe(state: MapState, R_cw, t_cw, kpts, rays, desc, kpt_valid,
                 landmark_idx, time, R_wb=None, p_wb=None, v_wb=None,
                 bg=None, ba=None, parent=None,
                 kpt_invd=None) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe at the next free slot. Returns (new_state, kf_id).

    If capacity is full the write is dropped (caller checks n_kf < K on host —
    capacity planning is a config concern, matching fixed-shape compilation).
    """
    k = state.n_kf
    ok = k < state.K
    kc = jnp.minimum(k, state.K - 1)

    def setk(arr, val):
        return arr.at[kc].set(jnp.where(ok, val, arr[kc]))

    new = state.replace(
        kf_R_cw=setk(state.kf_R_cw, R_cw),
        kf_t_cw=setk(state.kf_t_cw, t_cw),
        kf_kpts=setk(state.kf_kpts, kpts),
        kf_rays=setk(state.kf_rays, rays),
        kf_desc=setk(state.kf_desc, desc.astype(state.kf_desc.dtype)),
        kf_kpt_valid=setk(state.kf_kpt_valid, kpt_valid),
        kf_kpt_invd=setk(state.kf_kpt_invd,
                         kpt_invd if kpt_invd is not None
                         else jnp.full((state.N,), -1.0, jnp.float32)),
        kf_landmark_idx=setk(state.kf_landmark_idx, landmark_idx),
        kf_time=setk(state.kf_time, time),
        kf_active=setk(state.kf_active, ok),
        kf_map_id=setk(state.kf_map_id, state.active_map_id),
        kf_parent=setk(state.kf_parent, jnp.asarray(parent if parent is not None else -1, jnp.int32)),
        kf_R_wb=setk(state.kf_R_wb, R_wb) if R_wb is not None else state.kf_R_wb,
        kf_p_wb=setk(state.kf_p_wb, p_wb) if p_wb is not None else state.kf_p_wb,
        kf_v_wb=setk(state.kf_v_wb, v_wb) if v_wb is not None else state.kf_v_wb,
        kf_bg=setk(state.kf_bg, bg) if bg is not None else state.kf_bg,
        kf_ba=setk(state.kf_ba, ba) if ba is not None else state.kf_ba,
        n_kf=jnp.where(ok, k + 1, k),
    )
    # Count the new observations on the landmarks this KF sees
    # (scatter-free segment add, ops/scatterless.py).
    from ..ops import scatterless
    obs_lm = jnp.where(kpt_valid, landmark_idx, -1)
    counts = scatterless.seg_add(
        obs_lm, jnp.ones((obs_lm.shape[0], 1), jnp.float32),
        state.L)[:, 0].astype(jnp.int32)
    new = new.replace(lm_n_obs=jnp.where(ok, new.lm_n_obs + counts, new.lm_n_obs))
    return new, kc


def add_landmarks(state: MapState, positions, descs, normals, anchor_kf,
                  valid_mask) -> tuple[MapState, jnp.ndarray]:
    """Append a batch of B landmarks at the next free slots (compacted by mask).

    positions [B,3], descs [B,D], normals [B,3], valid_mask [B].
    Returns (new_state, slot_ids [B] int32 with -1 where invalid/overflow).
    """
    B = positions.shape[0]
    # Compact ranks: i-th valid landmark gets slot n_lm + rank.
    ranks = jnp.cumsum(valid_mask.astype(jnp.int32)) - 1
    slots = jnp.where(valid_mask, state.n_lm + ranks, -1)
    in_cap = slots < state.L
    slots = jnp.where(in_cap, slots, -1)
    write = slots >= 0
    slot_c = jnp.clip(slots, 0, state.L - 1)

    def setl(arr, val):
        return arr.at[slot_c].set(jnp.where(write[:, None] if arr.ndim > 1 else write,
                                            val, arr[slot_c]))

    new = state.replace(
        lm_pos=setl(state.lm_pos, positions),
        lm_desc=setl(state.lm_desc, descs.astype(state.lm_desc.dtype)),
        lm_normal=setl(state.lm_normal, normals),
        lm_active=state.lm_active.at[slot_c].set(
            jnp.where(write, True, state.lm_active[slot_c])),
        lm_map_id=state.lm_map_id.at[slot_c].set(
            jnp.where(write, state.active_map_id, state.lm_map_id[slot_c])),
        lm_anchor_kf=state.lm_anchor_kf.at[slot_c].set(
            jnp.where(write, anchor_kf, state.lm_anchor_kf[slot_c])),
        lm_first_kf=state.lm_first_kf.at[slot_c].set(
            jnp.where(write, anchor_kf, state.lm_first_kf[slot_c])),
        lm_n_obs=state.lm_n_obs.at[slot_c].set(
            jnp.where(write, 0, state.lm_n_obs[slot_c])),
        n_lm=jnp.minimum(state.n_lm + jnp.sum(valid_mask.astype(jnp.int32)),
                         state.L),
        # Count capacity overflow so a full sequence can never LOSE landmarks
        # silently (the caller compacts the table before this trips; the
        # reference recycles by deletion, MapPoint erase semantics).
        lm_dropped=state.lm_dropped + jnp.sum(
            (valid_mask & ~in_cap).astype(jnp.int32)),
    )
    return new, slots


# ---------------------------------------------------------------------------
# Covisibility (ONE matmul instead of per-KF counter maps)
# ---------------------------------------------------------------------------

def observation_matrix(state: MapState) -> jnp.ndarray:
    """[K, L] float32 indicator: keyframe k observes landmark l.

    Built as a DECOMPOSED one-hot contraction on the MXU: landmark id
    l = hi*128 + lo, obs[k, hi, lo] = sum_n onehot(hi)[k,n] * onehot(lo)[k,n]
    — one batched [K, HI, N] @ [K, N, LO] matmul of exact {0,1} bf16 inputs
    with f32 accumulation. The previous element-wise scatter
    (.at[rows, lm].add) cost ~7.8 ms at bench capacities (K=512, L=16k:
    XLA serializes the 524k single-element updates at ~15 ns each); this
    form measures well under 1 ms and every obs consumer (keyframe insert,
    place recognition, fusion, covisibility) inherits the win."""
    K, L = state.K, state.L
    lm = jnp.where(state.kf_kpt_valid & (state.kf_landmark_idx >= 0),
                   state.kf_landmark_idx, -1)  # -1: no observation
    LO = 128
    HI = (L + LO - 1) // LO
    # -1 maps to hi=-1 (numpy floor-div), which matches no one-hot column.
    hi = lm // LO
    lo = lm % LO
    oh_hi = (hi[:, :, None] == jnp.arange(HI, dtype=lm.dtype)[None, None, :]
             ).astype(jnp.bfloat16)                        # [K, N, HI]
    oh_lo = (lo[:, :, None] == jnp.arange(LO, dtype=lm.dtype)[None, None, :]
             ).astype(jnp.bfloat16)                        # [K, N, LO]
    cnt = jnp.einsum("knh,knw->khw", oh_hi, oh_lo,
                     preferred_element_type=jnp.float32)   # [K, HI, LO]
    obs = jnp.minimum(cnt.reshape(K, HI * LO)[:, :L], 1.0)
    obs = obs * state.lm_active[None, :].astype(jnp.float32)
    obs = obs * state.kf_active[:, None].astype(jnp.float32)
    return obs


def covisibility(state: MapState) -> jnp.ndarray:
    """Dense [K, K] shared-landmark counts (diagonal zeroed). MXU matmul.
    (reference: KeyFrame::UpdateConnections src/KeyFrame.cc:477)."""
    obs = observation_matrix(state)
    W = obs @ obs.T
    W = W * (1.0 - jnp.eye(state.K, dtype=W.dtype))
    return W.astype(jnp.int32)


def covisibility_row(state: MapState, kf_id) -> jnp.ndarray:
    """ONE keyframe's shared-landmark counts against all others: [K] int32,
    self-count zeroed. An O(K*L) matvec instead of covisibility()'s O(K^2*L)
    matmul — the place-recognition/verification kernels only consume the
    query's row, and the full matrix cost ~4 ms per keyframe at the bench
    capacities (K=512, L=16k, f32-highest)."""
    obs = observation_matrix(state)
    row = obs @ obs[kf_id]
    return row.at[kf_id].set(0.0).astype(jnp.int32)


def best_covisible(W: jnp.ndarray, kf_id, n: int):
    """Top-n covisible keyframes of kf_id by weight. Returns (ids[n], weights[n])."""
    w = W[kf_id]
    weights, ids = jax.lax.top_k(w, n)
    return jnp.where(weights > 0, ids, -1), weights


# ---------------------------------------------------------------------------
# Landmark maintenance
# ---------------------------------------------------------------------------

def remove_landmarks(state: MapState, kill_mask: jnp.ndarray) -> MapState:
    """Deactivate landmarks and clear their observations (reference
    MapPoint::SetBadFlag + Map::EraseMapPoint)."""
    lm_active = state.lm_active & ~kill_mask
    li = state.kf_landmark_idx
    obs_killed = (li >= 0) & kill_mask[jnp.clip(li, 0, state.L - 1)]
    return state.replace(
        lm_active=lm_active,
        kf_landmark_idx=jnp.where(obs_killed, -1, li),
    )


def replace_landmark_ids(state: MapState, old_to_new: jnp.ndarray) -> MapState:
    """Apply a landmark substitution table [L] int32 (identity where unchanged)
    to all keyframe observation slots (reference MapPoint::Replace fusion)."""
    li = state.kf_landmark_idx
    mapped = jnp.where(li >= 0, old_to_new[jnp.clip(li, 0, state.L - 1)], li)
    return state.replace(kf_landmark_idx=mapped)


# ---------------------------------------------------------------------------
# Slot compaction (capacity recycling)
# ---------------------------------------------------------------------------

def _pack_indices(keep: jnp.ndarray):
    """Order-preserving pack of the True slots of `keep` [n].

    Returns (old_of_new [n] int32 gather indices (0-padded past the count),
             new_live [n] bool, old2new [n] int32 with -1 for dropped)."""
    n = keep.shape[0]
    cnt = jnp.cumsum(keep.astype(jnp.int32))
    old2new = jnp.where(keep, cnt - 1, -1).astype(jnp.int32)
    old_of_new = jnp.nonzero(keep, size=n, fill_value=0)[0].astype(jnp.int32)
    new_live = jnp.arange(n) < cnt[-1]
    return old_of_new, new_live, old2new


@functools.partial(jax.jit, donate_argnums=(0,))
def compact_map(state: MapState):
    """Pack active keyframes/landmarks to the front of their tables, freeing
    the slots of culled entries for reuse.

    The reference recycles capacity by DELETING objects (KeyFrame::SetBadFlag
    src/KeyFrame.cc:719, MapPoint erase in MapPointCulling
    src/LocalMapping.cc:462-505); with fixed-shape device tables the
    equivalent is a periodic permutation gather that remaps every index
    reference. The pack is ORDER-PRESERVING, so every temporal-ordering
    invariant (newest keyframe = n_kf-1, kf_time monotone, temporal VI
    windows) survives renumbering.

    Landmarks whose anchor keyframe was culled are re-anchored to their first
    surviving observer (the reference re-anchors via the observation map);
    landmarks with no surviving observer at all are dropped.

    Returns (new_state, kf_old2new [K] int32 (-1 = dropped),
             lm_old2new [L] int32 (-1 = dropped)).
    """
    K, L, N = state.K, state.L, state.N
    kf_of, kf_live, kf_o2n = _pack_indices(state.kf_active)

    # Landmark keep-set: active AND has a surviving anchor (re-anchored to the
    # first surviving observing keyframe when the original anchor was culled).
    obs = observation_matrix(state)                        # [K, L]
    has_obs = jnp.any(obs > 0, axis=0)
    first_obs = jnp.argmax(obs > 0, axis=0).astype(jnp.int32)
    anc = state.lm_anchor_kf
    anc_ok = (anc >= 0) & (kf_o2n[jnp.clip(anc, 0, K - 1)] >= 0)
    anc_res = jnp.where(anc_ok, anc,
                        jnp.where(has_obs, first_obs, -1))
    lm_keep = state.lm_active & (anc_res >= 0)
    lm_of, lm_live, lm_o2n = _pack_indices(lm_keep)

    def gk(arr, fill=None):
        g = arr[kf_of]
        if fill is None:
            return g
        m = kf_live.reshape((K,) + (1,) * (arr.ndim - 1))
        return jnp.where(m, g, fill)

    def gl(arr, fill=None):
        g = arr[lm_of]
        if fill is None:
            return g
        m = lm_live.reshape((L,) + (1,) * (arr.ndim - 1))
        return jnp.where(m, g, fill)

    # Keyframe-side index references.
    li = state.kf_landmark_idx[kf_of]                      # old lm ids
    li_new = jnp.where(li >= 0, lm_o2n[jnp.clip(li, 0, L - 1)], -1)
    li_new = jnp.where(kf_live[:, None], li_new, -1)
    par = state.kf_parent[kf_of]
    par_new = jnp.where(par >= 0, kf_o2n[jnp.clip(par, 0, K - 1)], -1)
    par_new = jnp.where(kf_live, par_new, -1)
    loops = state.kf_loop_edges[kf_of][:, kf_of]
    loops = loops & kf_live[:, None] & kf_live[None, :]

    # Landmark-side index references.
    anc_new = jnp.where(lm_live, kf_o2n[jnp.clip(anc_res[lm_of], 0, K - 1)], -1)
    fkf = state.lm_first_kf[lm_of]
    fkf_new = jnp.where(fkf >= 0, kf_o2n[jnp.clip(fkf, 0, K - 1)], 0)
    fkf_new = jnp.where(lm_live, jnp.maximum(fkf_new, 0), -1)

    new = state.replace(
        kf_R_cw=gk(state.kf_R_cw), kf_t_cw=gk(state.kf_t_cw),
        kf_R_wb=gk(state.kf_R_wb), kf_p_wb=gk(state.kf_p_wb),
        kf_v_wb=gk(state.kf_v_wb), kf_bg=gk(state.kf_bg),
        kf_ba=gk(state.kf_ba), kf_time=gk(state.kf_time),
        kf_kpts=gk(state.kf_kpts), kf_rays=gk(state.kf_rays),
        kf_desc=gk(state.kf_desc),
        kf_kpt_valid=gk(state.kf_kpt_valid, False),
        kf_kpt_invd=gk(state.kf_kpt_invd, -1.0),
        kf_landmark_idx=li_new,
        kf_active=kf_live & gk(state.kf_active),
        kf_map_id=gk(state.kf_map_id),
        kf_parent=par_new,
        kf_loop_edges=loops,
        lm_pos=gl(state.lm_pos), lm_desc=gl(state.lm_desc),
        lm_normal=gl(state.lm_normal),
        lm_active=lm_live & gl(lm_keep),
        lm_map_id=gl(state.lm_map_id),
        lm_anchor_kf=anc_new,
        lm_n_obs=gl(state.lm_n_obs, 0),
        lm_found=gl(state.lm_found, 1),
        lm_visible=gl(state.lm_visible, 1),
        lm_first_kf=fkf_new,
        n_kf=jnp.sum(state.kf_active.astype(jnp.int32)),
        n_lm=jnp.sum(lm_keep.astype(jnp.int32)),
    )
    return new, kf_o2n, lm_o2n


@jax.jit
def remap_landmark_refs(lidx: jnp.ndarray, lm_old2new: jnp.ndarray):
    """Remap a frame's per-keypoint landmark ids through a compaction table."""
    L = lm_old2new.shape[0]
    return jnp.where(lidx >= 0, lm_old2new[jnp.clip(lidx, 0, L - 1)], -1)


def compute_normals_and_depths(state: MapState) -> MapState:
    """Recompute landmark viewing normals from anchor keyframes
    (reference MapPoint::UpdateNormalAndDepth — here only the anchor-based normal;
    full mean-over-observations normals happen during BA postprocessing)."""
    anchor = jnp.clip(state.lm_anchor_kf, 0, state.K - 1)
    R_cw = state.kf_R_cw[anchor]
    t_cw = state.kf_t_cw[anchor]
    # camera center in world: -R^T t
    centers = -jnp.einsum("lji,lj->li", R_cw, t_cw)
    d = state.lm_pos - centers
    n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return state.replace(lm_normal=jnp.where(state.lm_active[:, None], n,
                                             state.lm_normal))
