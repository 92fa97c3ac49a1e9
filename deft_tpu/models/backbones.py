"""Alternative backbones: ResNet and MobileNetV2 (NHWC, flax).

Rebuilds of ``/root/reference/src/lib/model/networks/backbones/{resnet,
mobilenet}.py``: both return 5 feature scales (strides 1..16 relative to the
stem's /2, i.e. overall strides [2, 4, 8, 16, 32]) and support the additive
``pre_img``/``pre_hm`` conditioning stems.  Channel plans follow torchvision;
``channels`` matches the reference attribute the necks consume.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deft_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvBNReLU, max_pool, torch_pad

RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class ResBasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNReLU(self.features, 3, self.stride, dtype=self.dtype,
                         name="conv1")(x, train)
        out = ConvBNReLU(self.features, 3, 1, relu=False, dtype=self.dtype,
                         name="conv2")(out, train)
        if self.downsample:
            identity = ConvBNReLU(self.features, 1, self.stride, relu=False,
                                  dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResBottleneck(nn.Module):
    features: int            # bottleneck width; output = 4x
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBNReLU(self.features, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNReLU(self.features, 3, self.stride, dtype=self.dtype,
                         name="conv2")(out, train)
        out = ConvBNReLU(self.features * 4, 1, 1, relu=False, dtype=self.dtype,
                         name="conv3")(out, train)
        if self.downsample:
            identity = ConvBNReLU(self.features * 4, 1, self.stride, relu=False,
                                  dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-style ResNet returning the 5 stage outputs."""

    depth: int = 50
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @property
    def channels(self) -> List[int]:
        kind, _ = RESNET_SPECS[self.depth]
        mult = 1 if kind == "basic" else 4
        return [64, 64 * mult, 128 * mult, 256 * mult, 512 * mult]

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        kind, blocks = RESNET_SPECS[self.depth]
        block = ResBasicBlock if kind == "basic" else ResBottleneck
        if self.dtype is not None:
            x = x.astype(self.dtype)

        x = ConvBNReLU(64, 7, 2, name="conv1", dtype=self.dtype)(x, train)
        if pre_img is not None and self.with_pre_img:
            x = x + ConvBNReLU(64, 7, 2, dtype=self.dtype,
                               name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            x = x + ConvBNReLU(64, 7, 2, dtype=self.dtype,
                               name="pre_hm_layer")(pre_hm, train)
        outs = [x]                                   # stride 2
        x = max_pool(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                             constant_values=-jnp.inf), 3, 2)
        widths = (64, 128, 256, 512)
        for stage, (w, n) in enumerate(zip(widths, blocks)):
            for b in range(n):
                stride = 2 if (b == 0 and stage > 0) else 1
                mult = 1 if kind == "basic" else 4
                need_ds = b == 0 and (stride != 1 or x.shape[-1] != w * mult)
                x = block(w, stride, need_ds, dtype=self.dtype,
                          name=f"layer{stage+1}_{b}")(x, train)
            outs.append(x)
        return outs


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        use_res = self.stride == 1 and cin == self.features
        out = x
        if self.expand != 1:
            out = ConvBNReLU(hidden, 1, dtype=self.dtype, name="expand")(out, train)
        # depthwise
        out = nn.Conv(hidden, (3, 3), strides=(self.stride,) * 2,
                      padding=torch_pad(3), feature_group_count=hidden,
                      use_bias=False, dtype=self.dtype, name="dw")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=self.dtype, name="dw_bn")(out)
        out = nn.relu6(out) if hasattr(nn, "relu6") else jnp.clip(out, 0, 6)
        out = ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                         name="project")(out, train)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    """MobileNetV2 returning 5 scales (backbones/mobilenet.py:98-217)."""

    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    # (expand, channels, repeats, stride)
    cfg: Tuple = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                  (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                  (6, 320, 1, 1))

    @property
    def channels(self) -> List[int]:
        return [16, 24, 32, 96, 320]

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = ConvBNReLU(32, 3, 2, dtype=self.dtype, name="stem")(x, train)
        if pre_img is not None and self.with_pre_img:
            x = x + ConvBNReLU(32, 3, 2, dtype=self.dtype,
                               name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            x = x + ConvBNReLU(32, 3, 2, dtype=self.dtype,
                               name="pre_hm_layer")(pre_hm, train)
        outs = []
        block_id = 0
        capture = {0: False}
        # capture outputs at the end of channel groups [16, 24, 32, 96, 320]
        capture_channels = {16, 24, 32, 96, 320}
        for expand, ch, repeats, stride in self.cfg:
            for r in range(repeats):
                s = stride if r == 0 else 1
                x = InvertedResidual(ch, s, expand, dtype=self.dtype,
                                     name=f"block{block_id}")(x, train)
                block_id += 1
            if ch in capture_channels:
                outs.append(x)
        return outs
