"""Train LightGlue on SuperPoint features from the synthetic photo world.

Role: the reference matches with the official `superpoint_lightglue.pth`
through ONNX Runtime (/root/reference/src/Matchers/lightglue_onnx.cpp:162-330).
With no egress, this trains the SAME Flax architecture (models/lightglue.py)
on pairs whose ground-truth assignment is exact: a detected keypoint inherits
the sprite id of the nearest ground-truth sprite projection (<=3 px), and two
keypoints correspond iff they inherit the same sprite.

Loss: negative log-likelihood of the ground-truth assignment under the
double-softmax log-assignment matrix — matched pairs at la[i,j], unmatched
valid keypoints at their dustbin entries (Lindenberger et al. 2023, eq. 6).

Run:  python -m rover_slam_tpu.training.lightglue_train \
          --sp rover_slam_tpu/assets/superpoint_synth.npz \
          --out rover_slam_tpu/assets/lightglue_synth.npz
"""
from __future__ import annotations

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import superpoint as sp
from ..models import lightglue as lg
from . import data as D
from . import checkpoints


def sprite_ids(kpts, valid, uv, vis, radius=3.0):
    """[N] sprite id per detected keypoint (-1 = no sprite within radius)."""
    d = np.linalg.norm(uv[None, :, :] - kpts[:, None, :], axis=-1)
    d[:, ~vis] = 1e9
    j = d.argmin(1)
    ok = (d[np.arange(len(kpts)), j] < radius) & valid
    return np.where(ok, j, -1)


def gt_assignment(sid0, sid1):
    """GT matches: m0 [N] index into image1 or -1; matched iff same sprite.
    A sprite detected twice in one image keeps only the first keypoint."""
    n1_of = {}
    for j, s in enumerate(sid1):
        if s >= 0 and s not in n1_of:
            n1_of[s] = j
    seen = set()
    m0 = np.full(len(sid0), -1, np.int64)
    for i, s in enumerate(sid0):
        if s >= 0 and s in n1_of and s not in seen:
            m0[i] = n1_of[s]
            seen.add(s)
    return m0


def make_dataset(extractor, rng, n_pairs, image_hw=(240, 320), n_kpts=512,
                 batch_render=8):
    """Extract SP features on rendered pairs + GT assignment labels."""
    out = []
    for _ in range(n_pairs):
        s = D.make_pair(rng, image_hw=image_hw)
        o0 = extractor(jnp.asarray(s.img0[None]))
        o1 = extractor(jnp.asarray(s.img1[None]))
        k0 = np.asarray(o0["keypoints"][0])[:n_kpts]
        k1 = np.asarray(o1["keypoints"][0])[:n_kpts]
        v0 = np.asarray(o0["valid"][0])[:n_kpts]
        v1 = np.asarray(o1["valid"][0])[:n_kpts]
        d0 = np.asarray(o0["descriptors"][0])[:n_kpts]
        d1 = np.asarray(o1["descriptors"][0])[:n_kpts]
        sid0 = sprite_ids(k0, v0, s.uv0, s.vis0)
        sid1 = sprite_ids(k1, v1, s.uv1, s.vis1)
        m0 = gt_assignment(sid0, sid1)
        kn0 = np.asarray(lg.normalize_keypoints(jnp.asarray(k0), image_hw))
        kn1 = np.asarray(lg.normalize_keypoints(jnp.asarray(k1), image_hw))
        out.append({"k0": kn0, "d0": d0, "v0": v0,
                    "k1": kn1, "d1": d1, "v1": v1, "m0": m0})
    return out


def make_train_step(model, tx):
    def loss_fn(params, b):
        la, _, _ = model.apply({"params": params}, b["k0"], b["d0"], b["v0"],
                               b["k1"], b["d1"], b["v1"])
        B, N0p, N1p = la.shape
        N0, N1 = N0p - 1, N1p - 1
        m0 = b["m0"]                                   # [B,N0]
        matched = m0 >= 0
        midx = jnp.clip(m0, 0, N1 - 1)
        nll_pos = -jnp.take_along_axis(
            la[:, :N0, :N1], midx[:, :, None], axis=2)[..., 0]
        # Dustbin targets for unmatched-but-valid keypoints on both sides.
        un0 = b["v0"] & ~matched
        hit1 = jax.vmap(lambda m, v: jnp.zeros(
            (N1,), bool).at[jnp.clip(m, 0, N1 - 1)].set(v))(midx, matched)
        un1 = b["v1"] & ~hit1
        nll_un0 = -la[:, :N0, N1]
        nll_un1 = -la[:, N0, :N1]
        wp = matched.astype(jnp.float32)
        w0 = un0.astype(jnp.float32)
        w1 = un1.astype(jnp.float32)
        # Positives weighted as heavily as both dustbin terms together (the
        # official loss averages positives and negatives separately).
        lp = jnp.sum(nll_pos * wp) / jnp.maximum(jnp.sum(wp), 1.0)
        ln = (jnp.sum(nll_un0 * w0) + jnp.sum(nll_un1 * w1)) \
            / jnp.maximum(jnp.sum(w0) + jnp.sum(w1), 1.0)
        return lp + 0.5 * ln, (lp, ln)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, (lp, ln)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, lp, ln

    return step


def eval_matcher(matcher, dataset):
    """Precision/recall of mutual-argmax matches vs GT on a dataset slice."""
    tp = fp = fn = 0
    for b in dataset:
        out = matcher(jnp.asarray(b["k0"][None]), jnp.asarray(b["d0"][None]),
                      jnp.asarray(b["v0"][None]), jnp.asarray(b["k1"][None]),
                      jnp.asarray(b["d1"][None]), jnp.asarray(b["v1"][None]))
        m = np.asarray(out["matches0"][0])
        gt = b["m0"]
        pred = m >= 0
        tp += ((m == gt) & pred & (gt >= 0)).sum()
        fp += (pred & (m != gt)).sum()
        fn += ((gt >= 0) & ~pred).sum()
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


class _RawMatcher:
    """LightGlueMatcher-compatible view over raw params for eval (keypoints
    already normalized in the dataset)."""

    def __init__(self, model, params, threshold=0.1):
        self.model, self.params, self.threshold = model, params, threshold
        self._fwd = jax.jit(lambda p, *a: lg.extract_matches(
            model.apply({"params": p}, *a)[0], a[2], a[5], threshold))

    def __call__(self, k0, d0, v0, k1, d1, v1):
        return self._fwd(self.params, k0, d0, v0, k1, d1, v1)


def train(sp_ckpt, steps=1200, batch=4, lr=2e-4, seed=0, n_pairs=300,
          num_layers=9, image_hw=(240, 320), n_kpts=512, out=None,
          log_every=50):
    rng = np.random.default_rng(seed)
    extractor = sp.SuperPointExtractor(
        params=checkpoints.load_params(sp_ckpt), image_hw=image_hw,
        max_keypoints=n_kpts)
    print(f"# extracting features for {n_pairs} pairs ...", flush=True)
    t0 = time.time()
    dataset = make_dataset(extractor, rng, n_pairs, image_hw=image_hw,
                           n_kpts=n_kpts)
    n_gt = np.mean([(b["m0"] >= 0).sum() for b in dataset])
    print(f"# dataset in {time.time()-t0:.0f}s; avg GT matches/pair "
          f"{n_gt:.0f}", flush=True)

    model = lg.LightGlue(num_layers=num_layers)
    key = jax.random.PRNGKey(seed)
    zk = jnp.zeros((1, n_kpts, 2), jnp.float32)
    zd = jnp.zeros((1, n_kpts, 256), jnp.float32)
    zm = jnp.ones((1, n_kpts), bool)
    params = model.init(key, zk, zd, zm, zk, zd, zm)["params"]
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    def get_batch():
        picks = rng.choice(len(dataset), batch, replace=False)
        return {k: jnp.asarray(np.stack([dataset[i][k] for i in picks]))
                for k in dataset[0]}

    t0 = time.time()
    for it in range(steps):
        params, opt_state, loss, lp, ln = step(params, opt_state, get_batch())
        if it % log_every == 0 or it == steps - 1:
            print(f"# step {it} loss {float(loss):.4f} pos {float(lp):.4f} "
                  f"dust {float(ln):.4f} ({time.time()-t0:.0f}s)", flush=True)
    if out:
        checkpoints.save_params(out, params)
        print(f"# saved {out}")
    heldout = make_dataset(extractor, np.random.default_rng(seed + 1), 8,
                           image_hw=image_hw, n_kpts=n_kpts)
    prec, rec = eval_matcher(_RawMatcher(model, params), heldout)
    print(f"# heldout precision {prec:.3f} recall {rec:.3f}")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sp", default="rover_slam_tpu/assets/superpoint_synth.npz")
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--pairs", type=int, default=300)
    ap.add_argument("--layers", type=int, default=9)
    ap.add_argument("--out", default="rover_slam_tpu/assets/lightglue_synth.npz")
    args = ap.parse_args()
    train(args.sp, steps=args.steps, batch=args.batch, lr=args.lr,
          n_pairs=args.pairs, num_layers=args.layers, out=args.out)


if __name__ == "__main__":
    main()
