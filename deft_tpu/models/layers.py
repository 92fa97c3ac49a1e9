"""Shared flax building blocks (NHWC, torch-compatible padding).

Convolutions use explicit torch-style symmetric padding rather than XLA
"SAME": for stride-2 3x3 convs the two conventions sample different pixels,
and checkpoint-parity with the reference (PyTorch) requires the torch
alignment.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def torch_pad(kernel: int, dilation: int = 1) -> Tuple[Tuple[int, int], ...]:
    p = dilation * (kernel // 2)
    return ((p, p), (p, p))


class ConvBNReLU(nn.Module):
    """Conv -> BN -> optional ReLU with torch padding (dla.py:40-44 pattern)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    relu: bool = True
    use_bias: bool = False
    groups: int = 1               # torch Conv2d(groups=...) for BottleneckX
    dtype: Optional[str] = None   # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=torch_pad(self.kernel, self.dilation),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class BatchNorm(nn.Module):
    """Standalone BatchNorm matching torch defaults."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="bn",
        )(x)


def max_pool(x, window: int, stride: int):
    """torch nn.MaxPool2d(window, stride) on NHWC (VALID padding)."""
    return nn.max_pool(x, (window, window), strides=(stride, stride))


def bilinear_upsample_kernel(k: int) -> jnp.ndarray:
    """The depthwise bilinear kernel the reference writes into its
    ConvTranspose2d upsamplers (dla.py:565-573 ``fill_up_weights``)."""
    f = -(-k // 2)  # ceil(k/2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = jnp.zeros((k, k), jnp.float32)
    i = jnp.arange(k, dtype=jnp.float32)
    row = 1 - jnp.abs(i / f - c)
    return row[:, None] * row[None, :]


class DepthwiseConvTranspose(nn.Module):
    """Depthwise transposed conv (groups == channels), bilinear-initialized.

    Mirrors ``nn.ConvTranspose2d(o, o, f*2, stride=f, padding=f//2, groups=o,
    bias=False)`` (dla.py:677-687).  Implemented as an input-dilated regular
    convolution with the kernel spatially flipped, which is what XLA lowers
    transposed convs to anyway; depthwise via feature_group_count keeps it off
    the MXU's wasteful dense path.
    """

    factor: int  # upsampling factor f

    @nn.compact
    def __call__(self, x):
        import jax

        f = self.factor
        k = 2 * f
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key: jnp.broadcast_to(
                bilinear_upsample_kernel(k)[:, :, None, None], (k, k, 1, c)
            ),
        )
        # transposed conv (stride f, pad f//2) == conv with lhs_dilation=f and
        # padding (k - 1 - f//2) per side, kernel flipped
        pad = k - 1 - f // 2
        return jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
