"""The 2D->3D uplifting transformer, flax.linen, TPU-first.

Re-implements the novel model of the reference (ref: uplifting/model.py) as
an idiomatic JAX transformer:

* RoPE over *timestamps* (not indices): positions are round(t * MAX_FPS)
  (ref: model.py:56-102).
* "Dynamic" table-token stage: per-timestep attention of the ball token
  against the 13 embedded table keypoints, invisible keypoints masked out,
  fake times encoding keypoint identity (ref: model.py:360-384). Here it is
  computed as a single batched einsum-attention over shape (B, T, 14, D)
  instead of the reference's reshape to (B*T, 14, D).
* Variants: 'singlestage' (cls token + joint heads), 'multistage' (two-stage
  with re-embedded detached 3D positions), 'connectstage' (second stage
  consumes the high-dim tokens via skip connection) (ref: model.py:393-571).
* Sizes: small(32,8,4H), base(64,12,4H), large(128,16,4H), huge(192,16,8H)
  (ref: model.py:574-603).

Parameter-structure notes for torch-weight porting (tests/golden parity):
* qkv is one fused projection with bias (qkv_bias=True in all reference
  configs, ref: model.py:579-597).
* The attention output projection has NO bias: the reference passes
  attn_drop_rate (0.0, falsy) into the proj_bias positional arg
  (ref: model.py:268 vs model.py:162) — we reproduce proj_bias=False.
* MLP hidden dim equals the model dim (ratio 1) with ReLU
  (ref: model.py:269).
* Xavier-uniform init with the reference's per-layer gains.

Masks are {0,1} floats at the public interface and converted once to
additive {NEG_INF, 0} biases.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from upliftingtabletennis_tpu.core.geometry import MAX_FPS, NUM_TABLE_KEYPOINTS, KEYPOINT_VISIBLE
from upliftingtabletennis_tpu.ops.attention import NEG_INF, apply_rope_over_time, masked_attention


def xavier_uniform(gain: float = 1.0):
    """Xavier-uniform with gain: limit = gain * sqrt(6 / (fan_in + fan_out))."""
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


class Mlp2(nn.Module):
    """Two-layer MLP, ReLU, gains (1.414, 1) (ref: model.py:10-36,105-158)."""

    dim: int
    hidden: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        hidden = self.hidden or self.dim
        x = nn.Dense(hidden, kernel_init=xavier_uniform(1.414), bias_init=nn.initializers.zeros, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim, kernel_init=xavier_uniform(1.0), bias_init=nn.initializers.zeros, name="fc2")(x)
        return x


class Head3(nn.Module):
    """Regression head dim -> dim/2 -> dim/4 -> 3 (ref: model.py:232-261)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim // 2, kernel_init=xavier_uniform(1.414), bias_init=nn.initializers.zeros, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.dim // 4, kernel_init=xavier_uniform(1.414), bias_init=nn.initializers.zeros, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dense(3, kernel_init=xavier_uniform(1.0), bias_init=nn.initializers.zeros, name="fc3")(x)
        return x


class RopeAttention(nn.Module):
    """Multi-head attention with RoPE-over-time on q/k, additive padding mask.

    (ref: AttentionWithRotaryPositionalEmbedding, model.py:161-229)
    """

    dim: int
    num_heads: int
    time_rotation: str = "new"

    @nn.compact
    def __call__(self, x, mask_add, times, num_cls_token: int = 0):
        """x: (..., N, D); mask_add: (..., N) additive; times: (..., N - num_cls_token)."""
        h, d = self.num_heads, self.dim
        hd = d // h
        qkv = nn.Dense(3 * d, use_bias=True, kernel_init=xavier_uniform(1.0),
                       bias_init=nn.initializers.zeros, name="qkv")(x)
        qkv = qkv.reshape(*x.shape[:-1], 3, h, hd)
        # (..., N, 3, H, Dh) -> 3 x (..., H, N, Dh)
        qkv = jnp.moveaxis(qkv, (-3, -2), (0, -3))
        q, k, v = qkv[0], qkv[1], qkv[2]

        if num_cls_token > 0:
            q = jnp.concatenate(
                [q[..., :num_cls_token, :],
                 apply_rope_over_time(q[..., num_cls_token:, :], times, self.time_rotation)],
                axis=-2,
            )
            k = jnp.concatenate(
                [k[..., :num_cls_token, :],
                 apply_rope_over_time(k[..., num_cls_token:, :], times, self.time_rotation)],
                axis=-2,
            )
        else:
            q = apply_rope_over_time(q, times, self.time_rotation)
            k = apply_rope_over_time(k, times, self.time_rotation)

        out = masked_attention(q, k, v, mask_add)  # (..., H, N, Dh)
        out = jnp.moveaxis(out, -3, -2).reshape(*x.shape[:-1], d)
        # proj_bias=False: reference quirk, see module docstring.
        out = nn.Dense(d, use_bias=False, kernel_init=xavier_uniform(1.0), name="proj")(out)
        return out


class TransformerLayer(nn.Module):
    """Pre-LN attention + pre-LN MLP(ratio 1, ReLU) block.

    (ref: SimpleStaticLayer, model.py:264-300)
    """

    dim: int
    num_heads: int
    time_rotation: str = "new"

    @nn.compact
    def __call__(self, x, mask_add, times, num_cls_token: int = 0):
        y = nn.LayerNorm(name="norm1")(x)
        y = RopeAttention(self.dim, self.num_heads, self.time_rotation, name="attn")(
            y, mask_add, times, num_cls_token
        )
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = Mlp2(self.dim, name="mlp1")(y)
        return x + y


class _TableTokenStage(nn.Module):
    """Per-timestep attention of the ball token against 13 table tokens.

    The 'dynamic' token mode (ref: model.py:360-384 / 456-482). Runs as one
    attention over (B, T, 14, D): the ball token at index 0 is the cls token
    (no RoPE), table tokens get fake times n / (MAX_FPS / 5) encoding
    keypoint identity; invisible keypoints are masked additively.
    """

    dim: int
    num_heads: int
    time_rotation: str = "new"
    depth: int = 4

    @nn.compact
    def __call__(self, x, table_img):
        """x: (B, T, D) embedded ball tokens; table_img: (B, 13, 3) with
        visibility in the last channel. Returns (B, T, D)."""
        B, T, D = x.shape
        N = table_img.shape[-2]

        vis = table_img[..., 2]  # (B, N)
        table_mask = jnp.where(vis == KEYPOINT_VISIBLE, 0.0, NEG_INF)  # (B, N)
        # cls (ball) token is always visible
        mask_add = jnp.concatenate([jnp.zeros((B, 1), x.dtype), table_mask], axis=1)
        mask_add = mask_add[:, None, :]  # (B, 1, N+1) broadcasting over T

        table_times = jnp.arange(N, dtype=x.dtype) / (MAX_FPS / 5)  # (N,)
        table_times = jnp.broadcast_to(table_times, (B, 1, N))

        table_tok = Mlp2(self.dim, name="table_embed")(table_img[..., :2])  # (B, N, D)
        table_tok = jnp.broadcast_to(table_tok[:, None], (B, T, N, D))
        tokens = jnp.concatenate([x[:, :, None, :], table_tok], axis=2)  # (B, T, N+1, D)

        for i in range(self.depth):
            tokens = TransformerLayer(
                self.dim, self.num_heads, self.time_rotation, name=f"pos_layers_{i}"
            )(tokens, mask_add, table_times, num_cls_token=1)
        return tokens[:, :, 0, :]  # keep the ball token


class FirstStage(nn.Module):
    """Position-predicting stage (ref: FirstStage, model.py:303-390)."""

    dim: int
    depth: int
    num_heads: int
    mode: str = "dynamic"
    time_rotation: str = "new"

    @nn.compact
    def __call__(self, ball_img, table_img, mask_add, times):
        B, T, _ = ball_img.shape

        if self.mode == "stacked":
            flat = jnp.broadcast_to(
                table_img.reshape(B, 1, -1), (B, T, NUM_TABLE_KEYPOINTS * 3)
            )
            ball_in = jnp.concatenate([ball_img, flat], axis=-1)
        elif self.mode == "originalmethod":
            flat = jnp.broadcast_to(
                table_img[..., :2].reshape(B, 1, -1), (B, T, NUM_TABLE_KEYPOINTS * 2)
            )
            ball_in = jnp.concatenate([ball_img, flat], axis=-1)
        else:
            ball_in = ball_img

        x = Mlp2(self.dim, name="ball_embed")(ball_in)

        if self.mode == "dynamic":
            x = _TableTokenStage(self.dim, self.num_heads, self.time_rotation, name="table_stage")(
                x, table_img
            )

        for i in range(self.depth):
            x = TransformerLayer(self.dim, self.num_heads, self.time_rotation, name=f"layers_{i}")(
                x, mask_add, times
            )

        positions = Head3(self.dim, name="position_head")(x)
        return positions, x


class SingleStageModel(nn.Module):
    """cls token + joint rotation/position heads (ref: model.py:393-499)."""

    dim: int
    depth: int
    num_heads: int
    mode: str = "dynamic"
    time_rotation: str = "new"

    @nn.compact
    def __call__(self, ball_img, table_img, mask, times):
        B, T, _ = ball_img.shape
        mask_add = jnp.where(mask > 0.5, 0.0, NEG_INF).astype(ball_img.dtype)

        if self.mode == "stacked":
            flat = jnp.broadcast_to(
                table_img.reshape(B, 1, -1), (B, T, NUM_TABLE_KEYPOINTS * 3)
            )
            ball_in = jnp.concatenate([ball_img, flat], axis=-1)
        else:
            ball_in = ball_img
        x = Mlp2(self.dim, name="ball_embed")(ball_in)

        if self.mode == "dynamic":
            x = _TableTokenStage(self.dim, self.num_heads, self.time_rotation, name="table_stage")(
                x, table_img
            )

        cls = self.param("cls_token", xavier_uniform(1.0), (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        mask_add = jnp.concatenate([jnp.zeros((B, 1), mask_add.dtype), mask_add], axis=1)

        for i in range(self.depth):
            x = TransformerLayer(self.dim, self.num_heads, self.time_rotation, name=f"layers_{i}")(
                x, mask_add, times, num_cls_token=1
            )

        rot = Head3(self.dim, name="rotation_head")(x[:, 0])
        pos = Head3(self.dim, name="position_head")(x[:, 1:])
        return rot, pos


class MultiStageModel(nn.Module):
    """Two-stage model: FirstStage positions -> second stage -> spin.

    use_skipconnection=True is the 'connectstage' variant (paper default)
    (ref: model.py:502-571).
    """

    dim: int
    depth: int
    num_heads: int
    mode: str = "dynamic"
    time_rotation: str = "new"
    use_skipconnection: bool = True
    full_backprop: bool = False
    depth_secondstage: int = 4

    @nn.compact
    def __call__(self, ball_img, table_img, mask, times):
        B, T, _ = ball_img.shape
        mask_add = jnp.where(mask > 0.5, 0.0, NEG_INF).astype(ball_img.dtype)

        pos, pos_token = FirstStage(
            self.dim,
            self.depth - self.depth_secondstage,
            self.num_heads,
            self.mode,
            self.time_rotation,
            name="firststage",
        )(ball_img, table_img, mask_add, times)

        x = pos_token if self.use_skipconnection else pos
        if not self.full_backprop:
            # spin gradient must not influence position learning (ref: model.py:553-555)
            x = jax.lax.stop_gradient(x)
        if not self.use_skipconnection:
            x = Mlp2(self.dim, name="embed")(x)

        cls = self.param("cls_token", xavier_uniform(1.0), (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        mask_add2 = jnp.concatenate([jnp.zeros((B, 1), mask_add.dtype), mask_add], axis=1)

        for i in range(self.depth_secondstage):
            x = TransformerLayer(
                self.dim, self.num_heads, self.time_rotation, name=f"secondstage_{i}"
            )(x, mask_add2, times, num_cls_token=1)

        rot = Head3(self.dim, name="rotation_head")(x[:, 0])
        return rot, pos


_SIZES = {
    "small": (32, 8, 4),
    "base": (64, 12, 4),
    "large": (128, 16, 4),
    "huge": (192, 16, 8),
}


def get_uplifting_model(
    name: str = "connectstage",
    size: str = "large",
    mode: str = "dynamic",
    time_rotation: str = "new",
    full_backprop: bool = False,
):
    """Model factory matching the reference's get_model (ref: model.py:574-603).

    Defaults are the paper configuration: connectstage / large / dynamic /
    'new' time rotation (ref: uplifting/train.py:17-21).
    """
    if time_rotation not in ("old", "new"):
        raise ValueError("time_rotation must be 'old' or 'new'")
    if size not in _SIZES:
        raise ValueError(f"unknown size {size!r}")
    dim, depth, heads = _SIZES[size]
    if name == "singlestage":
        if mode not in ("free", "dynamic", "stacked"):
            raise ValueError(f"mode {mode!r} invalid for singlestage")
        return SingleStageModel(dim, depth, heads, mode, time_rotation)
    if name in ("multistage", "connectstage"):
        if mode not in ("dynamic", "stacked", "originalmethod"):
            raise ValueError(f"mode {mode!r} invalid for {name}")
        return MultiStageModel(
            dim,
            depth,
            heads,
            mode,
            time_rotation,
            use_skipconnection=(name == "connectstage"),
            full_backprop=full_backprop,
        )
    raise ValueError(f"unknown model name {name!r}")
