"""Alternative necks: generic DLAUp and the MSRA deconv neck.

Rebuilds of ``/root/reference/src/lib/model/networks/necks/{dlaup,msraup}.py``.
The generic DLAUp reuses the IDA machinery from models/dla.py over an
arbitrary backbone channel plan; MSRAUp is the CenterNet-classic 3x deconv
stack (DCN 3x3 -> BN/ReLU -> bilinear-init ConvTranspose x2 -> BN/ReLU),
producing one stride-4 map of ``msra_outchannel`` channels.
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from deft_tpu.models.dcn import DCNv2
from deft_tpu.models.dla import DLAUp, IDAUp
from deft_tpu.models.layers import BN_EPS, BN_MOMENTUM, DepthwiseConvTranspose


class GenericDLAUp(nn.Module):
    """DLAUp + final IDAUp over a backbone pyramid (necks/dlaup.py:183-259).

    Consumes the last 4 scales of the backbone output; returns the stride-4
    aggregated map plus the intermediate maps for AFE-style taps.
    """

    channels: Sequence[int]        # backbone channel plan (5 entries)
    node_type: str = "dcn"
    dtype: object = None

    @property
    def out_channel(self) -> int:
        return int(self.channels[-4])

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        pyramid = list(feats[-4:])
        chans = list(self.channels[-4:])
        dla_up_out = DLAUp(0, chans, self.node_type, dtype=self.dtype,
                           name="dla_up")(pyramid, train)
        y = list(dla_up_out[:3])
        y = IDAUp(chans[0], [2 ** i for i in range(3)], self.node_type,
                  dtype=self.dtype, name="ida_up")(y, 0, len(y), train)
        return y[-1], list(dla_up_out) + list(y)


class IDAUpV0(nn.Module):
    """Legacy IDAUp (``networks/dlav0.py:561-631``): per-level 1x1
    conv-BN-ReLU proj (identity when channels match), bilinear-init
    depthwise up by the CUMULATIVE factor, then sequential CONCAT nodes
    (3x3 conv on 2*out_dim) -- vs the modern add-based DCN nodes."""

    out_dim: int
    channels: Sequence[int]
    up_factors: Sequence[int]
    node_kernel: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        from deft_tpu.models.layers import ConvBNReLU, DepthwiseConvTranspose

        assert len(layers) == len(self.channels)
        ups = []
        for i, (c, f) in enumerate(zip(self.channels, self.up_factors)):
            x = layers[i]
            if c != self.out_dim:
                x = ConvBNReLU(self.out_dim, kernel=1, dtype=self.dtype,
                               name=f"proj_{i}")(x, train)
            if int(f) != 1:
                x = DepthwiseConvTranspose(int(f), name=f"up_{i}")(x)
            ups.append(x)
        x = ups[0]
        y = []
        for i in range(1, len(ups)):
            cat = jnp.concatenate([x, ups[i]], axis=-1)
            x = ConvBNReLU(self.out_dim, kernel=self.node_kernel,
                           dtype=self.dtype, name=f"node_{i}")(cat, train)
            y.append(x)
        return x, y


class DLAUpV0(nn.Module):
    """Legacy DLAUp (``networks/dlav0.py:633-656``): the iterative deep
    aggregation over levels 2..5 built from IDAUpV0 stages; produces ONE
    stride-4 map of channels[0] (64 for dla34) -- the pre-DCN DLASeg neck.
    """

    channels: Sequence[int]        # e.g. (64, 128, 256, 512)
    dtype: object = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        chans = list(self.channels)
        layers = list(feats[-len(chans):])
        scales = [2 ** i for i in range(len(chans))]
        in_channels = list(chans)
        taps = []
        x = layers[-1]
        for i in range(len(chans) - 1):
            j = -i - 2
            x, y = IDAUpV0(
                chans[j], tuple(in_channels[j:]),
                tuple(s // scales[j] for s in scales[j:]),
                dtype=self.dtype, name=f"ida_{i}",
            )(layers[j:], train)
            layers[j + 1:] = y
            scales[j + 1:] = [scales[j] for _ in scales[j + 1:]]
            in_channels[j + 1:] = [chans[j] for _ in chans[j + 1:]]
            taps.append(x)
        return x, taps


class FullConvTranspose(nn.Module):
    """Dense (non-depthwise) transposed conv, stride 2, kernel 4, pad 1."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        # torch ConvTranspose2d(k=4, s=2, p=1) == flax explicit padding (2, 2)
        # (flax's numbers pad the underlying dilated conv: k - 1 - p per side)
        return nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
            use_bias=False, dtype=self.dtype, name="deconv",
        )(x)


class MSRAUp(nn.Module):
    """3x (DCN -> BN -> ReLU -> deconv x2 -> BN -> ReLU)
    (necks/msraup.py:50-134; also the PoseResDCN deconv stack,
    resdcn.py:231-276).  ``plain=True`` drops the DCN+BN+ReLU prefix,
    giving PoseResNet's plain deconv layers (resnet.py:192-220:
    ConvTranspose -> BN -> ReLU only, filters [256, 256, 256])."""

    out_channel: int = 256         # opt.msra_outchannel, 64 or 256
    plain: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        x = feats[-1]
        filters = ([256, 128, 64] if self.out_channel == 64 and not self.plain
                   else [256, 256, 256])
        taps = []
        for i, f in enumerate(filters):
            if not self.plain:
                x = DCNv2(f, dtype=self.dtype, name=f"dcn_{i}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 dtype=self.dtype, name=f"bn_a_{i}")(x)
                x = nn.relu(x)
            x = FullConvTranspose(f, dtype=self.dtype, name=f"up_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name=f"bn_b_{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return x, taps
