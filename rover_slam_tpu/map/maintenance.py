"""Map maintenance: landmark culling, keyframe culling, global BA.

TPU-native replacement for LocalMapping::MapPointCulling (reference:
src/LocalMapping.cc:462-505 — foundRatio < 0.05 (fork-loosened from 0.25) or
age >= 2 KFs with <= 2-3 observations), KeyFrameCulling (:1310-1504 — cull a
keyframe when >= 90% of its points are seen by >= 3 other keyframes), and
GlobalBundleAdjustemnt (src/Optimizer.cc:2813).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import cameras
from ..ops import association as assoc
from ..optim import ba
from . import map_state as ms


@jax.jit
def cull_landmarks(state: ms.MapState, min_found_ratio: float = 0.05,
                   min_obs: int = 1, min_age_kf: int = 3) -> ms.MapState:
    # Defaults are softer than the reference's cnThObs=2/age2: per-keyframe
    # SearchInNeighbors fusion (which grows nObs there) is round-2 work.
    """Deactivate weak landmarks (reference MapPointCulling)."""
    found_ratio = state.lm_found.astype(jnp.float32) / jnp.maximum(
        state.lm_visible.astype(jnp.float32), 1.0)
    age = state.n_kf - state.lm_first_kf
    weak = (found_ratio < min_found_ratio) | \
        ((age >= min_age_kf) & (state.lm_n_obs <= min_obs))
    kill = state.lm_active & weak & (state.lm_first_kf >= 0)
    return ms.remove_landmarks(state, kill)


def cull_keyframes(state: ms.MapState, redundancy: float = 0.9,
                   min_kept_obs: int = 3):
    """Compatibility wrapper: (state, n_culled). See cull_keyframes_ex."""
    state, n, _ = cull_keyframes_ex(state, redundancy, min_kept_obs)
    return state, n


@jax.jit
def cull_keyframes_ex(state: ms.MapState, redundancy: float = 0.9,
                      min_kept_obs: int = 3):
    """Deactivate redundant keyframes: >= `redundancy` of their landmarks are
    observed by >= min_kept_obs other keyframes (reference KeyFrameCulling,
    src/LocalMapping.cc:1310-1504). Keyframes 0/1 (origin) and the newest are
    protected, as are loop-edge endpoints (reference mspLoopEdges keeps a KF
    not-erasable, KeyFrame::SetBadFlag src/KeyFrame.cc:719-745).

    Graph surgery on cull (reference SetBadFlag :746-963): children of a
    culled keyframe are re-parented to the culled keyframe's own parent —
    done by pointer-jumping so whole culled CHAINS resolve in one fused
    kernel (log2 K hops instead of the reference's per-KF mutex dance) —
    keeping the spanning tree connected for the essential graph. Landmark
    observation counts are decremented.

    Returns (state, n_culled, redirect) where redirect =
    (cull_mask [K], surviving_parent [K] int32, R_cp [K,3,3], t_cp [K,3]):
    for each culled keyframe, its first surviving spanning-tree ancestor and
    the relative pose T_cp = T_cw * T_pw^-1 frozen at cull time — what the
    reference stores as mTcp in KeyFrame::SetBadFlag (src/KeyFrame.cc:719)
    so trajectory reconstitution can chain through erased reference
    keyframes (System::SaveTrajectoryEuRoC src/System.cc:730-1124)."""
    K, L = state.K, state.L
    obs = ms.observation_matrix(state)            # [K, L]
    lm_obs_count = jnp.sum(obs, axis=0)           # [L]
    # Landmark is redundant for keyframe k if others see it enough.
    redundant_lm = (lm_obs_count[None, :] - obs) >= min_kept_obs  # [K, L]
    n_own = jnp.sum(obs, axis=1)
    n_red = jnp.sum(obs * redundant_lm, axis=1)
    frac = n_red / jnp.maximum(n_own, 1.0)
    has_loop_edge = jnp.any(state.kf_loop_edges, axis=1)
    protect = (jnp.arange(K) <= 1) | (jnp.arange(K) >= state.n_kf - 2) \
        | has_loop_edge
    cull = state.kf_active & (frac > redundancy) & ~protect & (n_own > 0)
    return _apply_kf_cull(state, cull, obs)


@functools.partial(jax.jit, static_argnames=("n_free", "protect_recent"))
def cull_oldest_ex(state: ms.MapState, n_free: int = 4,
                   protect_recent: int = 8):
    """Capacity-pressure fallback: deactivate the OLDEST active-map keyframes
    (sliding-window shedding) when redundancy-based culling cannot free any
    slot — e.g. pure forward motion where nothing is ever re-observed.

    No reference counterpart (its maps grow without bound,
    /root/reference/src/Map.cc); a fixed-capacity device table must bound its
    working set, and for never-revisited territory the oldest keyframes are
    the least useful. Loop-edge endpoints, stored-map keyframes (they await a
    place-recognition merge) and the newest `protect_recent` are protected.
    Returns (state, n_culled, redirect) like cull_keyframes_ex."""
    K = state.K
    act = state.kf_active & (state.kf_map_id == state.active_map_id)
    has_loop_edge = jnp.any(state.kf_loop_edges, axis=1)
    rank = jnp.cumsum(act.astype(jnp.int32)) - 1
    n_act = jnp.sum(act.astype(jnp.int32))
    recent = rank >= n_act - protect_recent
    cand = act & ~has_loop_edge & ~recent
    crank = jnp.cumsum(cand.astype(jnp.int32)) - 1
    cull = cand & (crank < n_free)
    obs = ms.observation_matrix(state)
    return _apply_kf_cull(state, cull, obs)


def _apply_kf_cull(state: ms.MapState, cull, obs):
    """Shared keyframe-removal surgery (reference KeyFrame::SetBadFlag
    /root/reference/src/KeyFrame.cc:719-963): spanning-tree re-parenting,
    observation-count decrement, redirect record."""
    K, L = state.K, state.L
    # Spanning-tree surgery: re-parent through culled ancestors.
    # parent'[j] = first non-culled ancestor of j. Pointer-jumping: K is a
    # power-of-two-ish capacity, ceil(log2(K)) hops suffice for any chain.
    parent = state.kf_parent
    culled_at = lambda p: (p >= 0) & cull[jnp.clip(p, 0, K - 1)]
    import math
    n_hops = max(1, math.ceil(math.log2(max(int(K), 2))))
    for _ in range(n_hops):
        pp = parent[jnp.clip(parent, 0, K - 1)]
        parent = jnp.where(culled_at(parent), pp, parent)
    # Redirect record for trajectory reconstitution (reference mTcp): each
    # culled keyframe's pose relative to its first SURVIVING ancestor, frozen
    # now. For root-chain culls with no surviving ancestor the mask ends the
    # chain (-1).
    surv = jnp.where(culled_at(parent), -1, parent)        # [K]
    sc = jnp.clip(surv, 0, K - 1)
    R_pw, t_pw = state.kf_R_cw[sc], state.kf_t_cw[sc]
    # T_cp = T_cw * T_pw^-1:  R_cp = R_cw R_pw^T, t_cp = t_cw - R_cp t_pw
    R_cp = jnp.einsum("kij,klj->kil", state.kf_R_cw, R_pw)
    t_cp = state.kf_t_cw - jnp.einsum("kij,kj->ki", R_cp, t_pw)
    redirect = (cull, jnp.where(cull, surv, -1), R_cp, t_cp)
    # A culled keyframe's own parent pointer is cleared.
    parent = jnp.where(cull, -1, parent)
    # Decrement landmark observation counts for the dropped observations.
    dropped = jnp.sum(obs * cull[:, None].astype(obs.dtype), axis=0)
    lm_n_obs = jnp.maximum(state.lm_n_obs - dropped.astype(jnp.int32), 0)
    # Clear observations of culled KFs.
    li = jnp.where(cull[:, None], -1, state.kf_landmark_idx)
    state = state.replace(kf_active=state.kf_active & ~cull,
                          kf_landmark_idx=li, kf_parent=parent,
                          lm_n_obs=lm_n_obs)
    return state, jnp.sum(cull), redirect


@functools.partial(jax.jit, static_argnames=("cam_kind",))
def fuse_into_keyframe(state: ms.MapState, kf_id, cam_params,
                       cam_kind: int = cameras.PINHOLE, radius: float = 3.0,
                       th_desc2: float = 1.44, obs=None):
    """Per-keyframe neighborhood fusion (reference
    LocalMapping::SearchInNeighbors src/LocalMapping.cc:1048-1203 +
    SPmatcher::Fuse :49-229): project landmarks seen by covisible neighbors
    into the new keyframe; a projected landmark colliding with a keypoint that
    already holds a DIFFERENT landmark replaces/absorbs it (the more-observed
    one wins, reference MapPoint::Replace), and unmatched keypoints gain new
    observations. Returns (state, n_fused, n_added).

    obs: optional precomputed observation matrix [K, L] — the fused insert
    kernel threads one obs build through all its stages (each build is a
    ~1.4 ms scatter on TPU); a slightly stale view only shrinks the fusion
    candidate set by the just-triangulated points, which are observed by
    this keyframe already and therefore never fusion candidates."""
    from ..ops import scatterless
    K, L, N = state.K, state.L, state.N
    if obs is None:
        obs = ms.observation_matrix(state)                 # [K, L]
    W = obs @ obs.T
    W = W * (1.0 - jnp.eye(K, dtype=W.dtype))
    nbr = (W[kf_id] > 0) & (jnp.arange(K) != kf_id)        # covis neighbors
    seen_by_nbr = (nbr.astype(jnp.float32) @ obs) > 0      # [L]
    observed_here = obs[kf_id] > 0
    # Candidates: active, seen by a neighbor, NOT already observed by this KF
    # (keeps per-KF observations one-to-one).
    cand = state.lm_active & seen_by_nbr & ~observed_here
    uv, depth, visible = assoc.project_landmarks(
        state.lm_pos, cand, state.kf_R_cw[kf_id], state.kf_t_cw[kf_id],
        cam_params, cam_kind)
    kpt_lm, _ = assoc.projection_match(
        uv, state.lm_desc.astype(jnp.float32), visible,
        state.kf_kpts[kf_id], state.kf_desc[kf_id].astype(jnp.float32),
        state.kf_kpt_valid[kf_id], radius=radius, th_desc2=th_desc2)
    li = state.kf_landmark_idx[kf_id]
    proj = kpt_lm                                          # [N] lm idx or -1
    pc = jnp.clip(proj, 0, L - 1)
    lc = jnp.clip(li, 0, L - 1)

    # --- duplicate fusion: projected lm collides with an existing obs ---
    dup = (proj >= 0) & (li >= 0) & (proj != li)
    n_p, n_l = state.lm_n_obs[pc], state.lm_n_obs[lc]
    keep_proj = (n_p > n_l) | ((n_p == n_l) & (pc < lc))   # total order
    winner = jnp.where(keep_proj, proj, li)
    loser = jnp.where(keep_proj, li, proj)
    # Substitution table without scatters (ops/scatterless.py): per landmark,
    # the first duplicate row naming it as loser wins.
    table = scatterless.seg_pick(
        jnp.where(dup, loser, -1), winner, dup, L,
        jnp.arange(L, dtype=jnp.int32)).astype(jnp.int32)
    table = table[table]                                   # compress chains
    killed = scatterless.seg_any(jnp.where(dup, loser, -1),
                                 dup, L)
    state = ms.replace_landmark_ids(state, table)
    state = state.replace(lm_active=state.lm_active & ~killed)

    # --- new observations on empty keypoint slots ---
    li2 = state.kf_landmark_idx[kf_id]                     # post-substitution
    proj2 = jnp.where(proj >= 0, table[pc], -1)
    add = ((proj2 >= 0) & (li2 < 0) & state.kf_kpt_valid[kf_id]
           & state.lm_active[jnp.clip(proj2, 0, L - 1)])
    li_new = jnp.where(add, proj2, li2)
    state = state.replace(
        kf_landmark_idx=state.kf_landmark_idx.at[kf_id].set(li_new))

    # Incremental observation-count update (the reference maintains nObs
    # incrementally too, MapPoint::AddObservation/Replace): winners absorb
    # the losers' counts, losers zero out, newly added observations +1.
    # The absorbed count is DEDUPED against keyframes already observing the
    # winner (reference MapPoint::Replace only transfers observations for
    # keyframes not already observing the winner) — without this a keyframe
    # seeing both gets double-counted and the error feeds cull_landmarks'
    # min-obs gate. Residual drift from fusion chains is reconciled by the
    # exact recount on the keyframe-insert cadence (recount_lm_obs).
    w_c = jnp.clip(winner, 0, L - 1)
    l_c = jnp.clip(loser, 0, L - 1)
    overlap = jnp.einsum("kn,kn->n", obs[:, w_c], obs[:, l_c])
    absorbed = jnp.maximum(
        state.lm_n_obs[l_c].astype(jnp.float32) - overlap, 0.0)
    gained = scatterless.seg_add(
        jnp.where(dup, winner, -1),
        jnp.where(dup, absorbed, 0.0)[:, None], L)[:, 0].astype(jnp.int32)
    added = scatterless.seg_add(
        jnp.where(add, proj2, -1),
        jnp.ones((N, 1), jnp.float32), L)[:, 0].astype(jnp.int32)
    lm_n_obs = jnp.where(killed, 0, state.lm_n_obs + gained + added)
    state = state.replace(lm_n_obs=lm_n_obs)
    return state, jnp.sum(dup), jnp.sum(add)


def recount_lm_obs(state: ms.MapState, obs=None) -> ms.MapState:
    """Exact landmark observation counts = column sums of the observation
    matrix. Run on the keyframe-insert cadence to reconcile any drift the
    incremental updates accumulate through fusion chains (advisor finding:
    table[table] chain compression can credit an absorbed count to a landmark
    that is itself absorbed in the same pass). obs: optional precomputed
    observation matrix (the insert kernel shares one build across stages)."""
    if obs is None:
        obs = ms.observation_matrix(state)
    return state.replace(lm_n_obs=jnp.sum(obs, axis=0).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n_obs_kfs",))
def update_distinctive_descriptors(state: ms.MapState, kf_id,
                                   n_obs_kfs: int = 12,
                                   obs=None) -> ms.MapState:
    """Recompute the representative descriptor of every landmark observed by
    keyframe kf_id as the observation descriptor with the minimum MEDIAN
    L2 distance to the other observations of that landmark (reference
    MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:438 — run per
    keyframe by LocalMapping::ProcessNewKeyFrame).

    Observations are taken from kf_id + its top (n_obs_kfs-1) covisible
    keyframes rather than the whole table: the candidate set stays O(N*O*Nk)
    regardless of the keyframe capacity (at K=512 the full [N,K,Nk] compare
    and [N,K,K] pairwise matrices would be gigabytes), and a landmark touched
    by kf_id has nearly all its observations inside that covis neighborhood
    by construction."""
    K, L, N = state.K, state.L, state.N
    O = min(n_obs_kfs, K)     # tiny test maps: cap at the table size
    D = state.lm_desc.shape[1]
    # Landmarks touched by this KF (<= N of them).
    li = state.kf_landmark_idx[kf_id]
    touched = jnp.clip(li, 0, L - 1)                      # [N]
    t_valid = (li >= 0) & state.kf_kpt_valid[kf_id] \
        & state.lm_active[touched]

    # Observer candidate set: kf_id + top covisible neighbors (reuse the
    # caller's observation matrix when given — each build is a ~ms scatter).
    if obs is None:
        obs = ms.observation_matrix(state)
    w_row = obs @ obs[kf_id]
    w_row = w_row.at[kf_id].set(0.0)
    nbr_w, nbr_ids = jax.lax.top_k(w_row, O - 1)
    nbr_ids = jnp.where(nbr_w > 0, nbr_ids, -1).astype(jnp.int32)
    obs_kfs = jnp.concatenate([kf_id[None].astype(jnp.int32), nbr_ids])
    obs_ok = jnp.concatenate([jnp.ones((1,), bool), nbr_ids >= 0])
    ok_c = jnp.clip(obs_kfs, 0, K - 1)

    # Per-observer slot of each TOUCHED landmark, by equality compare + min
    # over slots ([N, O, Nk] lanes — bounded by the covis cap, not K).
    li_all = state.kf_landmark_idx[ok_c]                  # [O, Nk]
    lm_of = jnp.where((li_all >= 0) & state.kf_kpt_valid[ok_c]
                      & (state.kf_active[ok_c] & obs_ok)[:, None],
                      li_all, -2)
    eq = lm_of[None, :, :] == touched[:, None, None]      # [N, O, Nk]
    slot_tk = jnp.min(jnp.where(eq, jnp.arange(N)[None, None, :], N),
                      axis=2).astype(jnp.int32)           # [N, O]
    has_obs = slot_tk < N                                 # [N, O]

    # Gather observation descriptors [N, O, D] (pad row N -> zeros).
    desc_pad = jnp.concatenate(
        [state.kf_desc[ok_c], jnp.zeros((O, 1, D), state.kf_desc.dtype)],
        axis=1)
    obs_desc = desc_pad[jnp.arange(O)[None, :],
                        jnp.clip(slot_tk, 0, N)].astype(jnp.float32)

    # Pairwise L2^2 among observations of each landmark: [N, O, O].
    d2 = (jnp.sum(obs_desc ** 2, -1)[:, :, None]
          + jnp.sum(obs_desc ** 2, -1)[:, None, :]
          - 2.0 * jnp.einsum("nkd,nqd->nkq", obs_desc, obs_desc))
    big = jnp.float32(1e9)
    pair_ok = has_obs[:, :, None] & has_obs[:, None, :]
    d2 = jnp.where(pair_ok, jnp.maximum(d2, 0.0), jnp.nan)
    med = jnp.nanmedian(d2, axis=2)                       # [N, O]
    med = jnp.where(has_obs, med, big)
    best_k = jnp.argmin(med, axis=1)                      # [N]
    new_desc = obs_desc[jnp.arange(med.shape[0]), best_k]
    write = t_valid & (jnp.min(med, axis=1) < big)
    # Scatter-free row replace (ops/scatterless.py): pick per landmark the
    # first writer, keep the old row otherwise.
    from ..ops import scatterless
    lm_desc = scatterless.seg_pick(
        jnp.where(write, touched, -1), new_desc.astype(state.lm_desc.dtype),
        write, L, state.lm_desc)
    return state.replace(lm_desc=lm_desc)


@functools.partial(jax.jit, static_argnames=("e_cap",))
def _build_global_problem(state: ms.MapState, cam_params, bf=None,
                          e_cap: int | None = None):
    """Full-map BA problem. e_cap compacts the EDGE list to a static cap
    with a nonzero gather: the padded [K*N] edge set runs ~30x more slots
    than the map has live observations (bench scale: 524,288 slots vs ~18k
    edges), and the PCG matvec is O(E) — the uncompacted global BA cost
    ~1.2 s per 2-iteration chunk on-chip, the single biggest frame-time
    tail in the product loop. Returns (problem, gather_idx|None)."""
    K, N, L = state.K, state.N, state.L
    li = state.kf_landmark_idx
    kv = state.kf_kpt_valid & state.kf_active[:, None]
    e_lm = jnp.clip(jnp.where((li >= 0) & kv, li, 0), 0, L - 1).reshape(-1)
    e_valid = ((li >= 0) & kv).reshape(-1) & state.lm_active[e_lm.reshape(-1)]
    e_kf = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N)).reshape(-1)
    e_uv = state.kf_kpts.reshape(-1, 2)
    e_invd = None if bf is None else state.kf_kpt_invd.reshape(-1)
    idx = None
    if e_cap is not None and e_cap < K * N:
        idx = jnp.nonzero(e_valid, size=e_cap, fill_value=0)[0]
        n_val = jnp.sum(e_valid)
        e_kf, e_lm, e_uv = e_kf[idx], e_lm[idx], e_uv[idx]
        e_valid = jnp.arange(e_cap) < jnp.minimum(n_val, e_cap)
        if e_invd is not None:
            e_invd = e_invd[idx]
    prob = ba.BAProblem(
        R_cw=state.kf_R_cw, t_cw=state.kf_t_cw,
        pose_opt_mask=state.kf_active & (jnp.arange(K) != 0),
        lm_pos=state.lm_pos, lm_opt_mask=state.lm_active,
        cam_params=cam_params,
        e_kf=e_kf.astype(jnp.int32), e_lm=e_lm.astype(jnp.int32),
        e_uv=e_uv, e_valid=e_valid,
        e_info=jnp.ones(e_valid.shape, jnp.float32),
        e_invd=e_invd, bf=bf)
    return prob, idx


# (e_cap, lm_cap) ladder for the compacted global BA: static shapes, so the
# host picks the smallest level that fits the live map (with ~30% headroom)
# and precompile warms the current AND next level — map growth between
# precompile and a fired loop then stays compile-free.
GBA_LEVELS = ((16384, 4096), (65536, 8192), (262144, 16384),
              (1048576, 65536))


def gba_level_for(n_edges: int) -> int:
    for i, (e_cap, _) in enumerate(GBA_LEVELS):
        if n_edges * 1.3 <= e_cap:
            return i
    return len(GBA_LEVELS) - 1


def count_global_edges(state: ms.MapState) -> int:
    """Host-side live observation count (ONE scalar fetch; callers use it
    once per fired loop to pick the GBA compaction level)."""
    li = state.kf_landmark_idx
    kv = state.kf_kpt_valid & state.kf_active[:, None]
    lm = jnp.clip(jnp.where((li >= 0) & kv, li, 0), 0, state.L - 1)
    return int(jnp.sum(((li >= 0) & kv) & state.lm_active[lm]))


@functools.partial(jax.jit,
                   static_argnames=("cam_kind", "iters", "e_cap", "lm_cap"))
def _global_ba_single(state: ms.MapState, cam_params, cam_kind: int,
                      iters: int, bf=None, e_cap: int | None = None,
                      lm_cap: int | None = None) -> ms.MapState:
    K, N, L = state.K, state.N, state.L
    if e_cap is not None and e_cap >= K * N:
        e_cap = None
    if lm_cap is not None and lm_cap >= L:
        lm_cap = None
    prob, idx = _build_global_problem(state, cam_params, bf=bf, e_cap=e_cap)
    res = ba.solve_ba(prob, cam_kind=cam_kind, iters=iters, cg_iters=25,
                      solver="pcg", phases=2, kf_major=True, lm_cap=lm_cap)
    bad = (~res.e_inlier) & prob.e_valid
    if idx is not None:
        bad_flat = jnp.zeros((K * N,), bool).at[idx].set(bad)
    else:
        bad_flat = bad
    li_new = jnp.where(bad_flat.reshape(K, N), -1, state.kf_landmark_idx)
    return state.replace(kf_R_cw=res.R_cw, kf_t_cw=res.t_cw,
                         lm_pos=res.lm_pos, kf_landmark_idx=li_new)


def global_ba(state: ms.MapState, cam_params, cam_kind: int = cameras.PINHOLE,
              iters: int = 10, mesh=None, bf=None,
              level: int | None = None) -> ms.MapState:
    """Full-map bundle adjustment (reference GlobalBundleAdjustemnt — 10 iters
    after a loop closure, run in a detached thread; here one device program
    over every active keyframe/landmark using the PCG solver).

    mesh: optional jax.sharding.Mesh — when given (and >1 device) the solve
    dispatches to the landmark-variable-sharded distributed LM-PCG
    (parallel.sharded_ba.solve_ba_sharded_lm): landmark math shard-local,
    only the 6K-float pose vector rides the ICI psum. This is the live-loop
    entry of the distributed backend (SURVEY §7 step 8) — the map-scale BA
    is the problem that outgrows one chip first. (The sharded path's
    edge-partitioning is host-side, so this branch runs outside jit.)"""
    if mesh is None or mesh.devices.size <= 1:
        e_cap = lm_cap = None
        if level is not None:
            e_cap, lm_cap = GBA_LEVELS[min(level, len(GBA_LEVELS) - 1)]
        return _global_ba_single(state, cam_params, cam_kind=cam_kind,
                                 iters=iters, bf=bf, e_cap=e_cap,
                                 lm_cap=lm_cap)
    from ..parallel import sharded_ba
    L = state.L
    prob, _ = _build_global_problem(state, cam_params)
    R, t, lm_pos, _ = sharded_ba.solve_ba_sharded_lm(
        prob, mesh, cam_kind=cam_kind, iters=iters, cg_iters=25)
    return state.replace(kf_R_cw=R, kf_t_cw=t, lm_pos=lm_pos[:L])


@jax.jit
def update_found_visible(state: ms.MapState, visible_mask, found_mask
                         ) -> ms.MapState:
    """Per-frame statistics update (reference MapPoint::IncreaseVisible/Found)."""
    return state.replace(
        lm_visible=state.lm_visible + visible_mask.astype(jnp.int32),
        lm_found=state.lm_found + found_mask.astype(jnp.int32))
