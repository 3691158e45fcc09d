"""Pose-estimation loss library (JAX port of the vendored mmpose losses).

The reference ships a full loss family inside the vendored ViTPose package
(ref: vit_pose/vit_models/losses/ — JointsMSELoss/JointsOHKMMSELoss in
mse_loss.py, AdaptiveWingLoss, WingLoss, SoftWingLoss, plus mesh/GAN/AE
losses specific to human-pose workflows). Only JointsMSELoss is exercised
by its (dormant) trainer; this module ports the ENTIRE family as pure JAX
functions usable inside jitted training steps — heatmap, classification,
regression, associative-embedding, semi-supervision and mesh/GAN losses —
each torch-parity-tested against the vendored original
(tests/test_losses_and_misc.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def joints_mse_loss(pred, target, target_weight=None, use_target_weight=False):
    """Per-joint MSE over flattened heatmaps (ref: mse_loss.py JointsMSELoss).

    pred/target (B, K, H, W); target_weight (B, K, 1).
    """
    B, K = pred.shape[:2]
    p = pred.reshape(B, K, -1)
    t = target.reshape(B, K, -1)
    if use_target_weight and target_weight is not None:
        w = target_weight.reshape(B, K, 1)
        p = p * w
        t = t * w
    # mean over spatial, *0.5 like torch MSELoss reduction in mmpose
    per_joint = 0.5 * jnp.mean((p - t) ** 2, axis=-1)
    return jnp.mean(per_joint)


def joints_ohkm_mse_loss(pred, target, target_weight=None, topk: int = 8):
    """Online hard-keypoint mining: average the top-k per-joint losses
    (ref: mse_loss.py JointsOHKMMSELoss)."""
    B, K = pred.shape[:2]
    p = pred.reshape(B, K, -1)
    t = target.reshape(B, K, -1)
    if target_weight is not None:
        w = target_weight.reshape(B, K, 1)
        p = p * w
        t = t * w
    per_joint = 0.5 * jnp.mean((p - t) ** 2, axis=-1)  # (B, K)
    k = min(topk, K)
    top = jax.lax.top_k(per_joint, k)[0]
    return jnp.mean(jnp.sum(top, axis=1) / k)


def wing_loss(pred, target, target_weight=None, omega=10.0, epsilon=2.0):
    """Wing loss for coordinate regression (ref: losses WingLoss;
    Feng et al. 2018). pred/target (B, K, D)."""
    delta = jnp.abs(pred - target)
    C = omega - omega * jnp.log(1.0 + omega / epsilon)
    loss = jnp.where(
        delta < omega, omega * jnp.log(1.0 + delta / epsilon), delta - C
    )
    if target_weight is not None:
        loss = loss * target_weight
    return jnp.mean(loss)


def soft_wing_loss(pred, target, target_weight=None, omega1=2.0, omega2=20.0, epsilon=0.5):
    """SoftWingLoss (ref: losses SoftWingLoss; Wang et al. 2021)."""
    delta = jnp.abs(pred - target)
    B = omega1 - omega2 * jnp.log(1.0 + omega1 / epsilon)
    loss = jnp.where(
        delta < omega1, delta, omega2 * jnp.log(1.0 + delta / epsilon) + B
    )
    if target_weight is not None:
        loss = loss * target_weight
    return jnp.mean(loss)


def adaptive_wing_loss(pred, target, target_weight=None, alpha=2.1, omega=14.0,
                       epsilon=1.0, theta=0.5):
    """Adaptive wing loss for heatmap regression
    (ref: losses AdaptiveWingLoss; Wang et al. 2019). pred/target (B, K, H, W)."""
    delta = jnp.abs(pred - target)
    expo = alpha - target
    A = (
        omega
        * (1.0 / (1.0 + (theta / epsilon) ** expo))
        * expo
        * ((theta / epsilon) ** (expo - 1.0))
        / epsilon
    )
    C = theta * A - omega * jnp.log(1.0 + (theta / epsilon) ** expo)
    loss = jnp.where(
        delta < theta,
        omega * jnp.log(1.0 + (delta / epsilon) ** expo),
        A * delta - C,
    )
    if target_weight is not None:
        loss = loss * target_weight[..., None, None]
    return jnp.mean(loss)


def layer_decay_schedule(depth: int, decay_rate: float = 0.75):
    """Per-layer learning-rate multipliers for a ViT backbone: layer i of
    `depth` gets decay_rate**(depth - i) (ref: vit_pose/vit_models/
    optimizer.py LayerDecayOptimizer). Returns {layer_index: multiplier}
    with index depth = head/final params (multiplier 1)."""
    return {i: decay_rate ** (depth - i) for i in range(depth + 1)}


def vit_layer_index(path_parts, depth: int) -> int:
    """Map a flax param path to its layer index: patch embed / pos embed ->
    0, blocks_i -> i + 1, everything after the backbone -> depth."""
    for p in path_parts:
        p = str(p)
        if p.startswith("blocks_"):
            return int(p.split("_")[1]) + 1
        if p in ("patch_embed_proj", "pos_embed"):
            return 0
    return depth


def layer_decay_mask_fn(params, depth: int, decay_rate: float = 0.75):
    """Per-param multipliers pytree for optax.scale_by... usage:
    tx = optax.chain(adam, optax.masked-style multiply). Combine with
    `optax.multi_transform` or scale updates manually."""
    import jax

    sched = layer_decay_schedule(depth, decay_rate)

    def mult(path, leaf):
        parts = tuple(getattr(p, "key", getattr(p, "idx", "")) for p in path)
        return sched[vit_layer_index(parts, depth)]

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tree_def = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(tree_def, [mult(p, l) for p, l in flat])


def scale_by_layer_decay(depth: int, decay_rate: float = 0.75):
    """Optax transform applying layer-wise LR decay to ViT parameters."""
    import optax

    def init_fn(params):
        return {"mults": layer_decay_mask_fn(params, depth, decay_rate)}

    def update_fn(updates, state, params=None):
        import jax

        updates = jax.tree.map(lambda u, m: u * m, updates, state["mults"])
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# Bottom-up (associative embedding) losses
# (ref: vit_pose/vit_models/losses/multi_loss_factory.py:30-161)
# ---------------------------------------------------------------------------

def bottomup_heatmap_loss(pred, gt, mask, supervise_empty: bool = True):
    """Masked per-image heatmap MSE (ref: HeatmapLoss, :40-67).

    pred/gt (N, K, H, W); mask (N, H, W). Returns (N,) per-image losses.
    """
    se = (pred - gt) ** 2
    if not supervise_empty:
        empty = (jnp.sum(gt, axis=(2, 3), keepdims=True) > 0).astype(pred.dtype)
        se = se * empty
    se = se * mask[:, None, :, :]
    return jnp.mean(se, axis=(1, 2, 3))


def ae_loss_single(pred_tag, joints, loss_type: str = "exp"):
    """Associative-embedding push/pull loss for ONE image, vectorized over
    the reference's per-person python loops (ref: AELoss.singleTagLoss,
    :82-135; Newell et al. 1611.05424).

    pred_tag (K*H*W,) flattened tag map; joints (M, K, 2) int — per person
    per joint (flat_index, visibility>0). Returns (push, pull) scalars with
    the reference's exact normalization quirks (n==1 keeps pull UNdivided).
    """
    idx = joints[..., 0]
    vis = (joints[..., 1] > 0).astype(pred_tag.dtype)  # (M, K)
    t = pred_tag[idx]  # (M, K)
    cnt = vis.sum(axis=1)
    has = cnt > 0
    mean_t = (t * vis).sum(axis=1) / jnp.maximum(cnt, 1.0)  # (M,)
    pull_m = (((t - mean_t[:, None]) ** 2) * vis).sum(axis=1) / jnp.maximum(cnt, 1.0)
    pull_raw = jnp.sum(jnp.where(has, pull_m, 0.0))
    n = jnp.sum(has.astype(jnp.int32))

    diff = mean_t[:, None] - mean_t[None, :]
    pair = (has[:, None] & has[None, :]).astype(pred_tag.dtype)
    if loss_type == "exp":
        push_raw = jnp.sum(jnp.exp(-(diff**2)) * pair) - n
    elif loss_type == "max":
        push_raw = jnp.sum(jnp.clip(1.0 - jnp.abs(diff), 0.0) * pair) - n
    else:
        raise ValueError(f"Unknown ae loss type {loss_type}")

    nf = n.astype(pred_tag.dtype)
    push = jnp.where(n > 1, push_raw / jnp.maximum((nf - 1.0) * nf, 1.0) * 0.5, 0.0)
    # ref quirk: num_tags == 1 returns the raw pull (not divided by n)
    pull = jnp.where(n > 1, pull_raw / jnp.maximum(nf, 1.0),
                     jnp.where(n == 1, pull_raw, 0.0))
    return push, pull


def ae_loss(tags, joints, loss_type: str = "exp"):
    """Batched AE loss (ref: AELoss.forward, :137-161).

    tags (N, K*H*W) or (N, K*H*W, 1); joints (N, M, K, 2) int.
    Returns (push (N,), pull (N,)).
    """
    if tags.ndim == 3:
        tags = tags[..., 0]
    return jax.vmap(lambda t, j: ae_loss_single(t, j, loss_type))(tags, joints)


# ---------------------------------------------------------------------------
# Regression losses (ref: vit_pose/vit_models/losses/regression_loss.py)
# ---------------------------------------------------------------------------

def _weighted(fn, output, target, target_weight, use_target_weight):
    if use_target_weight:
        return fn(output * target_weight, target * target_weight)
    return fn(output, target)


def smooth_l1_loss(output, target, target_weight=None, use_target_weight=False,
                   loss_weight=1.0):
    """SmoothL1 (ref: :14-52). output/target (N, K, D)."""
    def f(a, b):
        d = jnp.abs(a - b)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))

    return _weighted(f, output, target, target_weight, use_target_weight) * loss_weight


def l1_regression_loss(output, target, target_weight=None,
                       use_target_weight=False, loss_weight=1.0):
    """L1 (ref: :239-268)."""
    f = lambda a, b: jnp.mean(jnp.abs(a - b))  # noqa: E731
    return _weighted(f, output, target, target_weight, use_target_weight) * loss_weight


def mse_regression_loss(output, target, target_weight=None,
                        use_target_weight=False, loss_weight=1.0):
    """MSE (ref: :271-300)."""
    f = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
    return _weighted(f, output, target, target_weight, use_target_weight) * loss_weight


def mpjpe_loss(output, target, target_weight=None, use_target_weight=False,
               loss_weight=1.0):
    """Mean per-joint position error (ref: :200-236)."""
    f = lambda a, b: jnp.mean(jnp.linalg.norm(a - b, axis=-1))  # noqa: E731
    return _weighted(f, output, target, target_weight, use_target_weight) * loss_weight


def bone_loss(output, target, joint_parents, target_weight=None,
              use_target_weight=False, loss_weight=1.0):
    """Bone-length consistency (ref: BoneLoss, :303-353).

    output/target (N, K, D); joint_parents: K parent indices (root points
    to itself); target_weight (N, K_nonroot) bone-type weights.
    """
    parents = jnp.asarray(joint_parents)
    non_root = [i for i in range(len(joint_parents)) if joint_parents[i] != i]
    nr = jnp.asarray(non_root)
    ob = jnp.linalg.norm(output - output[:, parents], axis=-1)[:, nr]
    tb = jnp.linalg.norm(target - target[:, parents], axis=-1)[:, nr]
    if use_target_weight:
        loss = jnp.mean(jnp.abs((ob * target_weight).mean(axis=0)
                                - (tb * target_weight).mean(axis=0)))
    else:
        loss = jnp.mean(jnp.abs(ob.mean(axis=0) - tb.mean(axis=0)))
    return loss * loss_weight


# ---------------------------------------------------------------------------
# Classification / combined-target losses
# (ref: vit_pose/vit_models/losses/classfication_loss.py, mse_loss.py:47-92)
# ---------------------------------------------------------------------------

def bce_loss(output, target, target_weight=None, use_target_weight=False,
             loss_weight=1.0, eps=1e-12):
    """Binary cross entropy on probabilities (ref: classfication_loss.py
    BCELoss). output/target (N, K) in [0, 1]; target_weight (N, K) or (N,)."""
    o = jnp.clip(output, eps, 1.0 - eps)
    per = -(target * jnp.log(o) + (1.0 - target) * jnp.log(1.0 - o))
    if use_target_weight:
        w = target_weight
        if w.ndim == 1:
            w = w[:, None]
        return jnp.mean(per * w) * loss_weight
    return jnp.mean(per) * loss_weight


def combined_target_mse_loss(output, target, target_weight=None,
                             use_target_weight=False, loss_weight=1.0):
    """UDP combined-target MSE: channels come in (heatmap, offset_x,
    offset_y) triples per joint; offsets are supervised only where the GT
    response map is live (ref: mse_loss.py CombinedTargetMSELoss:47-92;
    Huang et al. CVPR 2020). output/target (N, 3*K, H, W)."""
    N, C = output.shape[:2]
    K = C // 3
    p = output.reshape(N, K, 3, -1)
    t = target.reshape(N, K, 3, -1)
    hm_p, hm_t = p[:, :, 0], t[:, :, 0]
    if use_target_weight:
        w = target_weight.reshape(N, K, 1)
        hm_p = hm_p * w
        hm_t = hm_t * w
    loss = 0.5 * jnp.mean((hm_p - hm_t) ** 2, axis=(0, 2))        # (K,)
    for a in (1, 2):  # offset maps gated by the (weighted) GT response map
        loss = loss + 0.5 * jnp.mean(
            (hm_t * p[:, :, a] - hm_t * t[:, :, a]) ** 2, axis=(0, 2))
    return jnp.mean(loss) * loss_weight


# ---------------------------------------------------------------------------
# Rotation representations + mesh losses
# (ref: vit_pose/vit_models/losses/mesh_loss.py)
# ---------------------------------------------------------------------------

def quat_to_rotmat(quat):
    """(B, 4) wxyz quaternions -> (B, 3, 3) rotation matrices
    (ref: mesh_loss.py:44-69)."""
    q = quat / jnp.linalg.norm(quat, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack([
        w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
        2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
        2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
    ], axis=1).reshape(-1, 3, 3)


def batch_rodrigues(theta):
    """(B, 3) axis-angle -> (B, 3, 3) via the reference's quaternion route
    (ref: mesh_loss.py:26-41, incl. its +1e-8 norm regularizer)."""
    l2 = jnp.linalg.norm(theta + 1e-8, axis=1)
    angle = l2[:, None]
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=1)
    return quat_to_rotmat(quat)


def rot6d_to_rotmat(x):
    """(B, 6) continuous 6D rotation (Zhou et al. CVPR 2019) -> (B, 3, 3).

    The reference's copy (ref: mesh_loss.py:7-23) calls `F.normalize`
    without importing `torch.nn.functional` — it would NameError if ever
    reached (the mesh path is dormant). This implements the intended math.
    """
    x = x.reshape(-1, 3, 2)
    a1, a2 = x[:, :, 0], x[:, :, 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=1, keepdims=True), 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=1, keepdims=True) * b1
    b2 = a2p / jnp.maximum(jnp.linalg.norm(a2p, axis=1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def perspective_projection(points, rotation, translation, focal_length,
                           camera_center):
    """Pinhole projection of (B, N, 3) points (ref: mesh_loss.py:73-110)."""
    pts = jnp.einsum("bij,bkj->bki", rotation, points) + translation[:, None]
    pts = pts / pts[:, :, -1:]
    fx = fy = focal_length
    x = fx[:, None] * pts[:, :, 0] + camera_center[:, None, 0]
    y = fy[:, None] * pts[:, :, 1] + camera_center[:, None, 1]
    return jnp.stack([x, y], axis=-1)


def _smooth_l1(a, b):
    d = jnp.abs(a - b)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def mesh_project_points(points_3d, camera, img_res, focal_length=5000.0):
    """Weak-perspective (scale, tx, ty) camera -> 2D (ref: mesh_loss.py
    MeshLoss.project_points:211-245)."""
    B = points_3d.shape[0]
    cam_t = jnp.stack([
        camera[:, 1], camera[:, 2],
        2.0 * focal_length / (img_res * camera[:, 0] + 1e-9),
    ], axis=-1)
    rot = jnp.broadcast_to(jnp.eye(3, dtype=points_3d.dtype), (B, 3, 3))
    f = jnp.full((B,), focal_length, points_3d.dtype)
    c = jnp.zeros((B, 2), points_3d.dtype)
    return perspective_projection(points_3d, rot, cam_t, f, c)


def mesh_loss(output, target, joints_2d_loss_weight, joints_3d_loss_weight,
              vertex_loss_weight, smpl_pose_loss_weight, smpl_beta_loss_weight,
              img_res, focal_length=5000.0):
    """3D-mesh mixed loss (ref: mesh_loss.py MeshLoss:113-310): L1 vertices +
    pelvis-centered smooth-L1 3D joints + weak-perspective-reprojected
    smooth-L1 2D joints (+ MSE on SMPL pose rotmats/betas when predicted),
    each visibility/has_smpl-gated. `output`/`target` are dicts of arrays
    with the reference's keys; returns a dict of weighted scalar losses."""
    losses = {}
    has_smpl = target["has_smpl"].astype(jnp.float32)

    v_l1 = jnp.abs(output["vertices"] - target["vertices"])
    losses["vertex_loss"] = (
        jnp.mean(has_smpl[:, None, None] * v_l1) * vertex_loss_weight)

    if "pose" in output and "beta" in output:
        gt_rotmat = batch_rodrigues(
            target["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
        pose_mse = (output["pose"] - gt_rotmat) ** 2
        beta_mse = (output["beta"] - target["beta"]) ** 2
        losses["smpl_pose_loss"] = (
            jnp.mean(has_smpl[:, None, None, None] * pose_mse)
            * smpl_pose_loss_weight)
        losses["smpl_beta_loss"] = (
            jnp.mean(has_smpl[:, None] * beta_mse) * smpl_beta_loss_weight)

    pred_j3d, gt_j3d = output["joints_3d"], target["joints_3d"]
    conf3 = target["joints_3d_visible"].astype(jnp.float32)
    gt_pelvis = (gt_j3d[:, 2] + gt_j3d[:, 3]) / 2.0
    pred_pelvis = (pred_j3d[:, 2] + pred_j3d[:, 3]) / 2.0
    losses["joints_3d_loss"] = jnp.mean(
        conf3 * _smooth_l1(pred_j3d - pred_pelvis[:, None],
                           gt_j3d - gt_pelvis[:, None])
    ) * joints_3d_loss_weight

    conf2 = target["joints_2d_visible"].astype(jnp.float32)
    pred_j2d = mesh_project_points(pred_j3d, output["camera"], img_res,
                                   focal_length)
    # pred is centered-origin, gt is top-left-origin; both -> [-1, 1]
    pred_j2d = 2.0 * pred_j2d / (img_res - 1.0)
    gt_j2d = 2.0 * target["joints_2d"] / (img_res - 1.0) - 1.0
    losses["joints_2d_loss"] = jnp.mean(
        conf2 * _smooth_l1(pred_j2d, gt_j2d)) * joints_2d_loss_weight
    return losses


def gan_loss(x, target_is_real: bool, gan_type: str = "vanilla",
             real_label_val=1.0, fake_label_val=0.0, loss_weight=1.0,
             is_disc: bool = False):
    """GAN objective for the mesh adversary (ref: mesh_loss.py
    GANLoss:313-402). `loss_weight` applies to the generator only."""
    target_val = real_label_val if target_is_real else fake_label_val
    if gan_type == "vanilla":  # BCE with logits
        t = jnp.full_like(x, target_val)
        loss = jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
    elif gan_type == "lsgan":
        loss = jnp.mean((x - target_val) ** 2)
    elif gan_type == "wgan":
        loss = -jnp.mean(x) if target_is_real else jnp.mean(x)
    elif gan_type == "hinge":
        if is_disc:
            loss = jnp.mean(jax.nn.relu(1.0 + (-x if target_is_real else x)))
        else:
            loss = -jnp.mean(x)
    else:
        raise NotImplementedError(f"GAN type {gan_type} is not implemented.")
    return loss if is_disc else loss * loss_weight


# ---------------------------------------------------------------------------
# Semi-supervision loss (ref: regression_loss.py SemiSupervisionLoss:356-444)
# ---------------------------------------------------------------------------

def project_joints(x, intrinsics):
    """Project (N, K, 3) joints with (N, 4) [f, c] or (N, 9) [f, c, k, p]
    intrinsics, incl. radial/tangential distortion (ref: :391-419)."""
    intr = intrinsics[:, None, :]
    f, c = intr[..., :2], intr[..., 2:4]
    _x = jnp.clip(x[:, :, :2] / x[:, :, 2:], -1.0, 1.0)
    if intrinsics.shape[-1] == 9:
        k, p = intr[..., 4:7], intr[..., 7:9]
        r2 = jnp.sum(_x**2, axis=-1, keepdims=True)
        radial = 1.0 + jnp.sum(
            k * jnp.concatenate((r2, r2**2, r2**3), axis=-1),
            axis=-1, keepdims=True)
        tan = jnp.sum(p * _x, axis=-1, keepdims=True)
        _x = _x * (radial + tan) + p * r2
    return f * _x + c


def semi_supervision_loss(output, target, joint_parents,
                          projection_loss_weight=1.0, bone_loss_weight=1.0):
    """Projection + bone consistency on unlabeled data (ref:
    SemiSupervisionLoss.forward:421-444; Pavllo et al. CVPR 2019).

    The reference's module counts iterations internally and returns `{}`
    during warmup — stateful and not jittable; here the caller gates the
    warmup (e.g. `lax.cond(step > warmup, ...)`), matching the documented
    `warmup_iterations` semantics.
    """
    unlabeled_2d = project_joints(
        output["unlabeled_pose"] + output["unlabeled_traj"],
        target["intrinsics"])
    return {
        "proj_loss": mpjpe_loss(unlabeled_2d, target["unlabeled_target_2d"],
                                loss_weight=projection_loss_weight),
        "bone_loss": bone_loss(output["unlabeled_pose"],
                               output["labeled_pose"], joint_parents,
                               loss_weight=bone_loss_weight),
    }


# ---------------------------------------------------------------------------
# Multi-stage bottom-up loss factory
# (ref: vit_pose/vit_models/losses/multi_loss_factory.py:162-279)
# ---------------------------------------------------------------------------

def multi_stage_loss(outputs, heatmaps, masks, joints, num_joints,
                     ae_loss_type="exp", with_ae_loss=(True,),
                     push_loss_factor=(0.001,), pull_loss_factor=(0.001,),
                     with_heatmaps_loss=(True,), heatmaps_loss_factor=(1.0,),
                     supervise_empty=True):
    """Per-stage heatmap + AE losses for bottom-up models (ref:
    MultiLossFactory.forward:230-279). `outputs[i]` is (N, C_i, H, W) with
    the first `num_joints` channels the heatmaps and the rest tag maps.
    Returns (heatmaps_losses, push_losses, pull_losses) lists with None
    where a stage's loss is disabled, matching the reference."""
    hm_losses, push_losses, pull_losses = [], [], []
    for i, out in enumerate(outputs):
        offset = 0
        if with_heatmaps_loss[i]:
            offset = num_joints
            hm = bottomup_heatmap_loss(out[:, :num_joints], heatmaps[i],
                                       masks[i], supervise_empty)
            hm_losses.append(hm * heatmaps_loss_factor[i])
        else:
            hm_losses.append(None)
        if with_ae_loss[i]:
            tags = out[:, offset:].reshape(out.shape[0], -1)
            push, pull = ae_loss(tags, joints[i], ae_loss_type)
            push_losses.append(push * push_loss_factor[i])
            pull_losses.append(pull * pull_loss_factor[i])
        else:
            push_losses.append(None)
            pull_losses.append(None)
    return hm_losses, push_losses, pull_losses
