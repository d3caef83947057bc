"""Monodepth2 pose networks (flax) + pose utilities.

Reference: depth/monodepth2/pose_cnn.py:13-50, pose_decoder.py:14-54 and
``transformation_from_parameters`` (layers.py:28-103).  The reference ships
these with the depth model but never calls them in the tracking pipeline
(SURVEY.md 2.4); they are provided for model-zoo completeness and for
training depth+pose self-supervised on new rigs.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp


class PoseCNN(nn.Module):
    """Stacked strided convs -> mean-pooled 6-DoF deltas (0.01-scaled)."""

    num_input_frames: int = 2

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7), (32, 5), (64, 3), (128, 3), (256, 3), (256, 3),
                 (256, 3)]
        for i, (c, k) in enumerate(specs):
            x = nn.relu(nn.Conv(c, (k, k), strides=(2, 2), padding=k // 2,
                                name=f"conv{i}")(x))
        x = nn.Conv(6 * (self.num_input_frames - 1), (1, 1),
                    name="pose_conv")(x)
        out = 0.01 * jnp.mean(x, axis=(1, 2))
        out = out.reshape(-1, self.num_input_frames - 1, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseDecoder(nn.Module):
    """Pose head on encoder features (one ResNet pyramid per frame)."""

    num_input_features: int = 2
    num_frames_to_predict_for: int = 1

    @nn.compact
    def __call__(self, input_features: List[List[jnp.ndarray]]):
        last = [f[-1] for f in input_features]
        squeezed = [nn.relu(nn.Conv(256, (1, 1), name=f"squeeze_{i}"
                                    if i else "squeeze")(f))
                    for i, f in enumerate(last)]
        x = jnp.concatenate(squeezed, axis=-1)
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="pose_1")(x))
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                    name="pose_2")(x)
        out = 0.01 * jnp.mean(x, axis=(1, 2))
        out = out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


def axisangle_to_matrix(vec):
    """Rodrigues rotation (layers.py:55-103 ``rot_from_axisangle``)."""
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    axis = vec / (angle + 1e-7)
    ca = jnp.cos(angle)[..., None]
    sa = jnp.sin(angle)[..., None]
    c1 = (1 - ca)
    x, y, z = axis[..., 0:1, None], axis[..., 1:2, None], axis[..., 2:3, None]
    rot = jnp.concatenate([
        jnp.concatenate([x * x * c1 + ca, x * y * c1 - z * sa,
                         z * x * c1 + y * sa], -1),
        jnp.concatenate([x * y * c1 + z * sa, y * y * c1 + ca,
                         y * z * c1 - x * sa], -1),
        jnp.concatenate([z * x * c1 - y * sa, y * z * c1 + x * sa,
                         z * z * c1 + ca], -1),
    ], axis=-2)
    return rot


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axisangle, translation) -> 4x4 transform (layers.py:28-52)."""
    r = axisangle_to_matrix(axisangle)
    t = translation
    if invert:
        r = jnp.swapaxes(r, -1, -2)
        t = -jnp.einsum("...ij,...j->...i", r, t)
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)
