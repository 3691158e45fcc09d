"""Diagnose the closed-loop table detector's failure mode.

For a batch of val-split renders (approximating closed_loop.train_detectors'
probe path: val-split corpus indices, ball rendered into the frame), compare
the detector's 13 extracted peaks against:

  (a) the true keypoint projections (identity),
  (b) the three mirror-permutations of the truth (x->-x net mirror,
      y->-y centerline mirror, both) — low error here = corners localized
      but assigned to mirror-swapped channels (identity ambiguity),
  (c) the per-frame HUNGARIAN best assignment over all 13! pairings —
      low error here with high identity error = peaks land on real
      keypoint locations but with a scrambled (non-mirror) channel
      assignment; high error everywhere = plain mislocalization
      (peaks at non-keypoint image structure, e.g. other line
      intersections or context markers).

With --overlay_dir it also saves per-frame PNGs: the rendered input frame,
predicted peak positions (colored x per channel), GT keypoints (same color
o), and the max-over-channels predicted heatmap as a translucent overlay —
so "diffuse heatmap" vs "sharp wrong-place peak" is decided by looking.

  JAX_PLATFORMS=cpu python tools/diagnose_table_detector.py \
      --ckpt artifacts/closed_loop/table_detector --n 4 \
      [--data_dir data/corpus] [--overlay_dir artifacts/diagnose_table]
"""
import argparse
import os
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


def save_overlay(path, frame, heat_max, pred, gt, vis):
    """One PNG: frame + translucent heatmap + pred 'x' / gt 'o' per channel."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    H, W = frame.shape[:2]
    fig, ax = plt.subplots(figsize=(W / 96, H / 96), dpi=96)
    ax.imshow(frame.astype(np.uint8), extent=[0, W, H, 0])
    hm = np.clip(heat_max, 0, None)
    hm = hm / max(hm.max(), 1e-6)
    ax.imshow(hm, alpha=0.45, cmap="inferno", extent=[0, W, H, 0])
    cmap = plt.get_cmap("hsv")
    for k in range(gt.shape[0]):
        c = cmap(k / 13)
        if vis[k]:
            ax.plot(gt[k, 0], gt[k, 1], "o", ms=10, mfc="none", mec=c, mew=1.5)
            ax.annotate(str(k), gt[k, :2], color=c, fontsize=7)
        ax.plot(pred[k, 0], pred[k, 1], "x", ms=8, c=c, mew=1.5)
    ax.set_xlim(0, W)
    ax.set_ylim(H, 0)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="artifacts/closed_loop/table_detector")
    p.add_argument("--n", type=int, default=4, help="val batches to probe (2 frames each)")
    p.add_argument("--render_res", type=int, nargs=2, default=None,
                   help="detector input res W H; default = the render_res "
                        "stored in the checkpoint meta (falls back to 960 544)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="corpus dir; samples the val split of the real store "
                        "(default: fresh 64-trajectory datagen)")
    p.add_argument("--overlay_dir", type=str, default=None,
                   help="write per-frame overlay PNGs here")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from scipy.optimize import linear_sum_assignment

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
    tree, ident, info = load_checkpoint(args.ckpt)
    print("checkpoint:", ident, info)
    # input res: checkpoint meta wins unless the CLI explicitly overrides
    stored_res = info.get("render_res")
    if args.render_res is not None:
        RW, RH = args.render_res
        if stored_res and tuple(stored_res) != (RW, RH):
            print(f"WARNING: probing at {RW}x{RH} but checkpoint was trained "
                  f"at {stored_res[0]}x{stored_res[1]}")
    elif stored_res:
        RW, RH = stored_res
    else:
        RW, RH = 960, 544
    model, _ = get_detector(info.get("model", "hrnet"), "table", train=False)

    if args.data_dir and os.path.isdir(args.data_dir):
        from upliftingtabletennis_tpu.eval.closed_loop import _load_store

        store = _load_store(args.data_dir)
        print(f"[data] corpus store: {len(store)} trajectories (val split)")
    else:
        res = DG.generate_dataset(jax.random.PRNGKey(0), 64, "intermediate",
                                  "left_to_right")
        store = SYN.store_from_datagen(res)
        print("[data] fresh 64-trajectory datagen store (val split)")
    store_j = jax.tree.map(jnp.asarray, store)
    val_idx = jnp.asarray(SYN.split_indices(len(store), "val"))
    perms = mirror_perms()

    @jax.jit
    def probe(k):
        idx = jax.random.choice(jax.random.fold_in(k, 1), val_idx, (2,),
                                replace=False)
        sample = SYN.assemble_batch(jax.random.fold_in(k, 2), store_j, idx,
                                    train=True)
        table_px = rescale_px(sample["table_img"][..., :2], (UPL_W, UPL_H),
                              (EVAL_W, EVAL_H))
        ball_px = rescale_px(sample["r_img"], (UPL_W, UPL_H), (EVAL_W, EVAL_H))
        ctx_px = rescale_px(project_context(sample["Mint"], sample["Mext"]),
                            (UPL_W, UPL_H), (EVAL_W, EVAL_H))
        # real ball rendered at a random valid mid-rally frame, like training
        n_valid = jnp.sum(sample["mask"], axis=1)
        u = jax.random.uniform(jax.random.fold_in(k, 4), (2,))
        t_mid = jnp.clip((u * (n_valid - 2)).astype(jnp.int32) + 1, 1,
                         ball_px.shape[1] - 2)

        def render_one(kk, b):
            frames = render_frames(
                kk, ball_px[b, t_mid[b]][None], sample["mask"][b, t_mid[b]][None],
                table_px[b], height=EVAL_H, width=EVAL_W, context_px=ctx_px[b])
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
        return pk[..., :2], table_px, sample["table_img"][..., 2], imgs, heat

    all_pred, all_gt, all_vis, all_img, all_heat = [], [], [], [], []
    for i in range(args.n):
        pk, gt, vis, imgs, heat = probe(jax.random.PRNGKey(100 + i))
        all_pred.append(np.asarray(pk))
        all_gt.append(np.asarray(gt))
        all_vis.append(np.asarray(vis))
        if args.overlay_dir:
            all_img.append(np.asarray(imgs))
            all_heat.append(np.asarray(heat))
    pred = np.concatenate(all_pred)   # (N, 13, 2)
    gt = np.concatenate(all_gt)
    vis = np.concatenate(all_vis) > 0

    def err_under(idx):
        """(distances, mask) with the visibility mask FOLLOWING the
        permutation: channel k is compared to gt[idx[k]], so it counts
        exactly when gt[idx[k]] is a visible point (ADVICE r3 #3)."""
        return np.linalg.norm(pred - gt[:, idx], axis=-1), vis[:, idx]

    d_id, m_id = err_under(np.arange(13))
    print(f"\nidentity:      mean {d_id[m_id].mean():8.1f} px  "
          f"median {np.median(d_id[m_id]):8.1f}")
    for name, idx in perms.items():
        d, m = err_under(idx)
        print(f"{name:14s} mean {d[m].mean():8.1f} px  "
              f"median {np.median(d[m]):8.1f}")
    # best-of-4 per frame: picks each frame's best mirror assignment
    best = []
    for f in range(pred.shape[0]):
        means = []
        for idx in [np.arange(13)] + list(perms.values()):
            d, m = err_under(idx)
            if m[f].any():
                means.append(d[f][m[f]].mean())
        best.append(min(means))
    print(f"best-of-4/frame mean {np.mean(best):8.1f} px")

    # Hungarian best assignment per frame over ALL pairings: separates
    # "peaks at true keypoint locations, scrambled channels" (low here)
    # from "peaks at non-keypoint structure" (high even here)
    hung_err, n_identity = [], 0
    for f in range(pred.shape[0]):
        mf = np.flatnonzero(vis[f])
        if not len(mf):
            continue
        C = np.linalg.norm(pred[f][:, None] - gt[f][None, mf], axis=-1)
        ri, ci = linear_sum_assignment(C)
        hung_err.append(C[ri, ci].mean())
        matched = {int(r): int(mf[c]) for r, c in zip(ri, ci)}
        n_identity += sum(1 for r, g in matched.items() if r == g)
    print(f"hungarian/frame mean {np.mean(hung_err):8.1f} px  "
          f"(identity-matched {n_identity}/{int(vis.sum())} visible kps)")

    print("\nper-keypoint identity mean px (visible only):")
    for kp in range(13):
        m = vis[:, kp]
        if m.any():
            print(f"  kp{kp:2d}: {d_id[m, kp].mean():8.1f}")

    if args.overlay_dir:
        os.makedirs(args.overlay_dir, exist_ok=True)
        imgs = np.concatenate(all_img)
        heats = np.concatenate(all_heat)
        sx, sy = RW / EVAL_W, RH / EVAL_H
        for f in range(imgs.shape[0]):
            save_overlay(
                os.path.join(args.overlay_dir, f"frame{f:02d}.png"),
                imgs[f], heats[f].max(axis=-1),
                pred[f] * [sx, sy], gt[f] * [sx, sy], vis[f],
            )
        print(f"\noverlays: {imgs.shape[0]} PNGs in {args.overlay_dir}")


if __name__ == "__main__":
    main()
