"""Train SuperPoint on the synthetic photo world (detector CE + descriptor
InfoNCE), producing real weights for the learned front-end in-env.

Role: the reference runs the public `superpoint_v1.pth` through ONNX Runtime
(/root/reference/src/Extractors/superpoint_onnx.cc:88-255). That checkpoint
cannot be fetched here (no egress), so this trains the SAME Flax architecture
(models/superpoint.py) on rendered photo-world pairs with exact ground truth:

- detector: 65-way cell cross-entropy — each 8x8 cell's label is the
  within-cell pixel of a sprite center, or the dustbin (SuperPoint's
  MagicPoint loss, DeTone et al. 2018 eq. 2-4).
- descriptor: symmetric InfoNCE over ground-truth correspondences — the
  coarse descriptor grid is bilinearly sampled at the matched sprite centers
  in both views; same sprite = positive, all other sampled points = negatives
  (a modern replacement for the hinge loss of the paper; same geometry
  supervision, better-conditioned gradients).

Run:  python -m rover_slam_tpu.training.superpoint_train \
          --steps 1500 --out rover_slam_tpu/assets/superpoint_synth.npz
"""
from __future__ import annotations

import argparse
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import superpoint as sp
from . import data as D
from . import checkpoints


def desc_info_nce(desc_grid0, desc_grid1, uv0, uv1, corr_valid, tau=0.1):
    """Symmetric InfoNCE over GT correspondences of ONE pair.

    desc_grid*: [Hc,Wc,256] L2-normalized coarse grids; uv*: [C,2] pixels;
    corr_valid: [C] bool."""
    d0 = sp.sample_descriptors(desc_grid0[None], uv0[None])[0]   # [C,D]
    d1 = sp.sample_descriptors(desc_grid1[None], uv1[None])[0]
    sim = (d0 @ d1.T) / tau                                      # [C,C]
    mask = corr_valid[:, None] & corr_valid[None, :]
    sim = jnp.where(mask, sim, -1e9)
    labels = jnp.arange(sim.shape[0])
    ce0 = optax.softmax_cross_entropy_with_integer_labels(sim, labels)
    ce1 = optax.softmax_cross_entropy_with_integer_labels(sim.T, labels)
    w = corr_valid.astype(jnp.float32)
    return jnp.sum((ce0 + ce1) * 0.5 * w) / jnp.maximum(jnp.sum(w), 1.0)


def make_train_step(model, tx, det_weight=1.0, desc_weight=1.0):
    def loss_fn(params, batch):
        def head(img):
            prob, desc, logits = model.apply({"params": params}, img,
                                             return_logits=True)
            return desc, logits

        desc0, logits0 = head(batch["img0"])
        desc1, logits1 = head(batch["img1"])
        ce = (optax.softmax_cross_entropy_with_integer_labels(
                  logits0, batch["lab0"]).mean()
              + optax.softmax_cross_entropy_with_integer_labels(
                  logits1, batch["lab1"]).mean()) * 0.5
        nce = jax.vmap(desc_info_nce)(desc0, desc1, batch["uv0"],
                                      batch["uv1"], batch["corr_valid"]).mean()
        return det_weight * ce + desc_weight * nce, (ce, nce)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, (ce, nce)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, ce, nce

    return step


def eval_matching(extractor, rng, n_pairs=8, image_hw=(240, 320)):
    """Mutual-NN match precision on held-out pairs (a match is correct when
    the two keypoints lie within 4 px of the same sprite's projections)."""
    from ..ops import association as assoc
    correct = total = 0
    for _ in range(n_pairs):
        s = D.make_pair(rng, image_hw=image_hw)
        o0 = extractor(jnp.asarray(s.img0[None]))
        o1 = extractor(jnp.asarray(s.img1[None]))
        m, _ = assoc.mutual_nn_match(o0["descriptors"][0], o0["valid"][0],
                                     o1["descriptors"][0], o1["valid"][0],
                                     ratio=0.95)
        m = np.asarray(m)
        k0 = np.asarray(o0["keypoints"][0])
        k1 = np.asarray(o1["keypoints"][0])

        def sprite_of(k, uv, vis):
            d = np.linalg.norm(uv[None, :, :] - k[:, None, :], axis=-1)
            d[:, ~vis] = 1e9
            j = d.argmin(1)
            return np.where(d[np.arange(len(k)), j] < 4.0, j, -1)

        s0 = sprite_of(k0, s.uv0, s.vis0)
        s1 = sprite_of(k1, s.uv1, s.vis1)
        mm = m >= 0
        total += mm.sum()
        correct += ((s0[mm] >= 0) & (s0[mm] == s1[np.clip(m[mm], 0, None)])).sum()
    return correct / max(total, 1), total / n_pairs


def train(steps=1500, batch=4, lr=1e-3, seed=0, image_hw=(240, 320),
          pool=400, out=None, log_every=50):
    rng = np.random.default_rng(seed)
    model = sp.SuperPoint()
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.zeros((1, *image_hw, 1), jnp.float32))["params"]
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=0.05))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    print(f"# rendering {pool} training pairs ...", flush=True)
    t0 = time.time()
    samples = [D.render_batch(rng, 1, image_hw=image_hw) for _ in range(pool)]
    print(f"# pool in {time.time()-t0:.0f}s", flush=True)

    def get_batch():
        picks = rng.choice(pool, batch, replace=False)
        return {k: jnp.asarray(np.concatenate([samples[i][k] for i in picks]))
                for k in samples[0]}

    t0 = time.time()
    for it in range(steps):
        params, opt_state, loss, ce, nce = step(params, opt_state, get_batch())
        if it % log_every == 0 or it == steps - 1:
            print(f"# step {it} loss {float(loss):.4f} det {float(ce):.4f} "
                  f"desc {float(nce):.4f} ({time.time()-t0:.0f}s)", flush=True)
    if out:
        checkpoints.save_params(out, params)
        print(f"# saved {out}")
    ext = sp.SuperPointExtractor(params=params, image_hw=image_hw)
    prec, n = eval_matching(ext, np.random.default_rng(seed + 1),
                            image_hw=image_hw)
    print(f"# heldout mutual-NN precision {prec:.3f} ({n:.0f} matches/pair)")
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pool", type=int, default=400)
    ap.add_argument("--out", default="rover_slam_tpu/assets/superpoint_synth.npz")
    args = ap.parse_args()
    train(steps=args.steps, batch=args.batch, lr=args.lr, pool=args.pool,
          out=args.out)


if __name__ == "__main__":
    main()
