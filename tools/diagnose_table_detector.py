"""Diagnose the closed-loop table detector's failure mode.

For a batch of val-split renders (same path as closed_loop.train_detectors'
probe), compare the detector's 13 extracted peaks against (a) the true
keypoint projections and (b) the three mirror-permutations of the truth
(x->-x net mirror, y->-y centerline mirror, both). If the error under a
mirror permutation is far lower than under identity, the detector localizes
corners but assigns them to mirror-swapped channels (identity ambiguity);
if all four are equally bad, it is plain mislocalization.

  JAX_PLATFORMS=cpu python tools/diagnose_table_detector.py \
      --ckpt artifacts/closed_loop/table_detector [--n 4]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def mirror_perms():
    from upliftingtabletennis_tpu.core.geometry import TABLE_POINTS

    P = np.asarray(TABLE_POINTS)
    perms = {}
    for name, flip in (("net_mirror", (-1, 1)), ("center_mirror", (1, -1)),
                       ("both", (-1, -1))):
        Q = P * np.array([flip[0], flip[1], 1.0])
        idx = np.array([int(np.argmin(np.linalg.norm(P - q, axis=1))) for q in Q])
        perms[name] = idx
    return perms


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/closed_loop/table_detector")
    p.add_argument("--n", type=int, default=4, help="val batches to probe")
    p.add_argument("--render_res", type=int, nargs=2, default=(960, 544))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from upliftingtabletennis_tpu.core.geometry import WIDTH as UPL_W, HEIGHT as UPL_H
    from upliftingtabletennis_tpu.data import datagen as DG
    from upliftingtabletennis_tpu.data import synthetic as SYN
    from upliftingtabletennis_tpu.data.image_transforms import normalize_image
    from upliftingtabletennis_tpu.data.render_rally import (
        project_context, render_frames, rescale_px,
    )
    from upliftingtabletennis_tpu.models.factory import get_detector
    from upliftingtabletennis_tpu.ops.peak import extract_peaks
    from upliftingtabletennis_tpu.utils.checkpoint import load_checkpoint

    EVAL_W, EVAL_H = 1920, 1080
    RW, RH = args.render_res
    tree, ident, info = load_checkpoint(args.ckpt)
    print("checkpoint:", ident, info)
    model, _ = get_detector(info.get("model", "hrnet"), "table", train=False)

    key = jax.random.PRNGKey(0)
    res = DG.generate_dataset(key, 64, "intermediate", "left_to_right")
    store = SYN.store_from_datagen(res)
    store_j = jax.tree.map(jnp.asarray, store)
    perms = mirror_perms()

    @jax.jit
    def probe(k):
        idx = jax.random.choice(jax.random.fold_in(k, 1),
                                jnp.arange(len(store)), (2,), replace=False)
        sample = SYN.assemble_batch(jax.random.fold_in(k, 2), store_j, idx,
                                    train=True)
        table_px = rescale_px(sample["table_img"][..., :2], (UPL_W, UPL_H),
                              (EVAL_W, EVAL_H))
        ctx_px = rescale_px(project_context(sample["Mint"], sample["Mext"]),
                            (UPL_W, UPL_H), (EVAL_W, EVAL_H))

        def render_one(kk, b):
            frames = render_frames(
                kk, table_px[b, :1] * 0 - 1e6, jnp.zeros(1), table_px[b],
                height=EVAL_H, width=EVAL_W, context_px=ctx_px[b])
            frames = jax.image.resize(frames.astype(jnp.float32),
                                      (1, RH, RW, 3), "bilinear",
                                      antialias=False)
            return jnp.clip(jnp.round(frames), 0, 255)[0]

        imgs = jax.vmap(render_one)(jax.random.split(jax.random.fold_in(k, 3), 2),
                                    jnp.arange(2))
        x = normalize_image(imgs)
        v = {"params": tree["params"]}
        if "batch_stats" in tree:
            v["batch_stats"] = tree["batch_stats"]
        y = model.apply(v, x)
        heat = y[0] if isinstance(y, tuple) else y
        pk = extract_peaks(jnp.moveaxis(heat, -1, 1), EVAL_W, EVAL_H)
        return pk[..., :2], table_px, sample["table_img"][..., 2]

    all_pred, all_gt, all_vis = [], [], []
    for i in range(args.n):
        pk, gt, vis = probe(jax.random.PRNGKey(100 + i))
        all_pred.append(np.asarray(pk))
        all_gt.append(np.asarray(gt))
        all_vis.append(np.asarray(vis))
    pred = np.concatenate(all_pred)   # (N, 13, 2)
    gt = np.concatenate(all_gt)
    vis = np.concatenate(all_vis) > 0

    def err_under(idx):
        d = np.linalg.norm(pred - gt[:, idx], axis=-1)
        return d

    d_id = err_under(np.arange(13))
    print(f"\nidentity:      mean {d_id[vis].mean():8.1f} px  "
          f"median {np.median(d_id[vis]):8.1f}")
    for name, idx in perms.items():
        d = err_under(idx)
        print(f"{name:14s} mean {d[vis].mean():8.1f} px  "
              f"median {np.median(d[vis]):8.1f}")
    # best-of-4 per frame: picks each frame's best assignment
    best = []
    for f in range(pred.shape[0]):
        cands = [err_under(np.arange(13))[f]] + [err_under(i)[f] for i in perms.values()]
        means = [c[vis[f]].mean() for c in cands]
        best.append(min(means))
    print(f"best-of-4/frame mean {np.mean(best):8.1f} px")
    print("\nper-keypoint identity mean px (visible only):")
    for kp in range(13):
        m = vis[:, kp]
        if m.any():
            print(f"  kp{kp:2d}: {d_id[m, kp].mean():8.1f}")


if __name__ == "__main__":
    main()
