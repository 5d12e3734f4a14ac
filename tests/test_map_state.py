"""Device-resident map tests (reference: src/{KeyFrame,MapPoint,Map}.cc graph ops)."""
import numpy as np
import jax.numpy as jnp

from rover_slam_tpu.map import map_state as ms

RNG = np.random.default_rng(40)


def small_map(K=8, N=32, L=64, D=16):
    return ms.empty_map(K=K, N=N, L=L, D=D)


def add_kf(state, lm_ids, n_valid=None):
    N = state.N
    n_valid = n_valid if n_valid is not None else N
    kpt_valid = jnp.asarray(np.arange(N) < n_valid)
    lidx = jnp.asarray(lm_ids, jnp.int32)
    return ms.add_keyframe(
        state, jnp.eye(3), jnp.zeros(3),
        jnp.zeros((N, 2)), jnp.ones((N, 3)), jnp.zeros((N, state.kf_desc.shape[2])),
        kpt_valid, lidx, 0.0)


def test_add_keyframe_and_capacity():
    st = small_map(K=2)
    st, k0 = add_kf(st, np.full(32, -1))
    st, k1 = add_kf(st, np.full(32, -1))
    assert int(st.n_kf) == 2
    assert bool(st.kf_active[0]) and bool(st.kf_active[1])
    # Overflow is dropped.
    st, _ = add_kf(st, np.full(32, -1))
    assert int(st.n_kf) == 2


def test_add_landmarks_compaction():
    st = small_map()
    pos = np.arange(15).reshape(5, 3).astype(np.float32)
    valid = jnp.asarray([True, False, True, True, False])
    st, slots = ms.add_landmarks(st, jnp.asarray(pos), jnp.zeros((5, 16)),
                                 jnp.zeros((5, 3)), jnp.zeros(5, jnp.int32), valid)
    s = np.asarray(slots)
    assert (s == [0, -1, 1, 2, -1]).all()
    assert int(st.n_lm) == 3
    np.testing.assert_allclose(np.asarray(st.lm_pos[1]), pos[2])
    assert bool(st.lm_active[2]) and not bool(st.lm_active[3])


def test_covisibility_counts():
    st = small_map(K=4, N=8, L=32)
    # Activate landmarks 0..9.
    st, _ = ms.add_landmarks(st, jnp.zeros((10, 3)), jnp.zeros((10, 16)),
                             jnp.zeros((10, 3)), jnp.zeros(10, jnp.int32),
                             jnp.ones(10, bool))
    # KF0 sees lm 0-5, KF1 sees lm 3-8 -> 3 shared (3,4,5)
    lm0 = np.full(8, -1); lm0[:6] = np.arange(6)
    lm1 = np.full(8, -1); lm1[:6] = np.arange(3, 9)
    st, _ = add_kf(st, lm0)
    st, _ = add_kf(st, lm1)
    W = np.asarray(ms.covisibility(st))
    assert W[0, 1] == 3 and W[1, 0] == 3
    assert W[0, 0] == 0
    ids, w = ms.best_covisible(jnp.asarray(W), 0, 3)
    assert np.asarray(ids)[0] == 1 and np.asarray(w)[0] == 3
    assert (np.asarray(ids)[1:] == -1).all()


def test_observation_counts():
    st = small_map(K=4, N=8, L=32)
    st, _ = ms.add_landmarks(st, jnp.zeros((5, 3)), jnp.zeros((5, 16)),
                             jnp.zeros((5, 3)), jnp.zeros(5, jnp.int32),
                             jnp.ones(5, bool))
    lm0 = np.full(8, -1); lm0[:3] = [0, 1, 2]
    lm1 = np.full(8, -1); lm1[:2] = [1, 2]
    st, _ = add_kf(st, lm0)
    st, _ = add_kf(st, lm1)
    obs = np.asarray(st.lm_n_obs[:5])
    assert (obs == [1, 2, 2, 0, 0]).all()


def test_remove_landmarks_clears_observations():
    st = small_map(K=2, N=8, L=32)
    st, _ = ms.add_landmarks(st, jnp.zeros((4, 3)), jnp.zeros((4, 16)),
                             jnp.zeros((4, 3)), jnp.zeros(4, jnp.int32),
                             jnp.ones(4, bool))
    lm0 = np.full(8, -1); lm0[:4] = np.arange(4)
    st, _ = add_kf(st, lm0)
    kill = jnp.zeros(32, bool).at[1].set(True).at[3].set(True)
    st = ms.remove_landmarks(st, kill)
    li = np.asarray(st.kf_landmark_idx[0, :4])
    assert (li == [0, -1, 2, -1]).all()
    assert not bool(st.lm_active[1])


def test_replace_landmark_ids():
    st = small_map(K=2, N=8, L=32)
    st, _ = ms.add_landmarks(st, jnp.zeros((4, 3)), jnp.zeros((4, 16)),
                             jnp.zeros((4, 3)), jnp.zeros(4, jnp.int32),
                             jnp.ones(4, bool))
    lm0 = np.full(8, -1); lm0[:4] = np.arange(4)
    st, _ = add_kf(st, lm0)
    table = jnp.arange(32, dtype=jnp.int32).at[3].set(0)  # fuse lm3 -> lm0
    st = ms.replace_landmark_ids(st, table)
    li = np.asarray(st.kf_landmark_idx[0, :4])
    assert (li == [0, 1, 2, 0]).all()


def test_normals_point_from_camera():
    st = small_map(K=2, N=8, L=32)
    pos = jnp.asarray([[0.0, 0.0, 5.0]])
    st, slots = ms.add_landmarks(st, pos, jnp.zeros((1, 16)), jnp.zeros((1, 3)),
                                 jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
    st, _ = add_kf(st, np.full(8, -1))
    st = ms.compute_normals_and_depths(st)
    np.testing.assert_allclose(np.asarray(st.lm_normal[0]), [0, 0, 1], atol=1e-6)
