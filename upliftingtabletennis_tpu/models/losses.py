"""Pose-estimation loss library (JAX port of the vendored mmpose losses).

The reference ships a full loss family inside the vendored ViTPose package
(ref: vit_pose/vit_models/losses/ — JointsMSELoss/JointsOHKMMSELoss in
mse_loss.py, AdaptiveWingLoss, WingLoss, SoftWingLoss, plus mesh/GAN/AE
losses specific to human-pose workflows). Only JointsMSELoss is exercised
by its (dormant) trainer; this module provides the keypoint-relevant subset
as pure JAX functions usable inside jitted training steps.
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
