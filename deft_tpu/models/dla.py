"""DLA-34 backbone + IDA/DLA upsampling necks (NHWC, flax).

A from-scratch JAX implementation of the architecture in
``/root/reference/src/lib/model/networks/dla.py``: the hierarchical-deep-
aggregation backbone (``Tree``/``Root`` recursion with channel plan
[16, 32, 64, 128, 256, 512], levels [1, 1, 1, 2, 2, 1] for DLA-34), the
iterative deep aggregation neck (``DLAUp``/``IDAUp`` with deformable-conv
projection and node ops plus depthwise bilinear transposed-conv upsampling),
and the optional additive ``pre_img``/``pre_hm`` conditioning layers
(dla.py:346-361).

The Tree recursion is unrolled at module-construction time (depths are static
Python ints), so XLA sees one flat graph.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deft_tpu.models.dcn import DCNv2
from deft_tpu.models.layers import BN_EPS, BN_MOMENTUM, ConvBNReLU, DepthwiseConvTranspose, max_pool, torch_pad

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)

# depth -> (levels, channels, block, residual_root); the reference's
# dla34..dla169 constructors (dla.py:414-496; selectable via --arch dla_<d>).
# "x"-suffixed (BottleneckX) variants use string keys: dla.py maps arch
# numbers only, so plain depths are what --arch reaches; the X plans are
# exposed for completeness via create_dla_plan("60x") etc.
DLA_PLANS = {
    "34": (DLA34_LEVELS, DLA34_CHANNELS, "basic", False),
    "46_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneck", False),
    "46x_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), "bottleneckx", False),
    "60x_c": ((1, 1, 1, 2, 3, 1), (16, 32, 64, 64, 128, 256), "bottleneckx", False),
    "60": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", False),
    "60x": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx", False),
    "102": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", True),
    "102x": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneckx", True),
    "169": ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024), "bottleneck", True),
}


class BasicBlock(nn.Module):
    """Two 3x3 conv-BN with residual add (dla.py:47-87)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBNReLU(self.features, 3, self.stride, self.dilation,
                         dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNReLU(self.features, 3, 1, self.dilation, relu=False,
                         dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + residual)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (dla.py:88-130 Bottleneck, expansion
    2); ``cardinality > 0`` gives the grouped-conv BottleneckX variant
    (dla.py:133-181, bottle = features * cardinality // 32)."""

    features: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 0
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = (self.features * self.cardinality // 32 if self.cardinality
                  else self.features // 2)
        out = ConvBNReLU(bottle, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNReLU(bottle, 3, self.stride, self.dilation,
                         groups=max(self.cardinality, 1), dtype=self.dtype,
                         name="conv2")(out, train)
        out = ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                         name="conv3")(out, train)
        return nn.relu(out + residual)


def _make_block(block: str, features: int, stride: int, name: str, dtype=None):
    if block == "basic":
        return BasicBlock(features, stride, dtype=dtype, name=name)
    if block == "bottleneck":
        return BottleneckBlock(features, stride, dtype=dtype, name=name)
    if block == "bottleneckx":
        return BottleneckBlock(features, stride, cardinality=32, dtype=dtype,
                               name=name)
    raise ValueError(f"unknown dla block {block}")


class Root(nn.Module):
    """1x1 conv over concatenated children (dla.py:184-207)."""

    features: int
    residual: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                       name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation node (dla.py:210-284)."""

    levels: int
    features: int
    in_features: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_residual: bool = False
    block: str = "basic"
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, children: Optional[List[jnp.ndarray]] = None,
                 train: bool = False):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.features
        if self.level_root:
            root_dim += self.in_features

        children = [] if children is None else list(children)
        bottom = max_pool(x, self.stride, self.stride) if self.stride > 1 else x
        if self.in_features != self.features:
            residual = ConvBNReLU(self.features, 1, relu=False, dtype=self.dtype,
                                  name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = _make_block(self.block, self.features, self.stride,
                             "tree1", self.dtype)(x, residual, train)
            x2 = _make_block(self.block, self.features, 1,
                             "tree2", self.dtype)(x1, None, train)
            return Root(self.features, self.root_residual, dtype=self.dtype,
                        name="root")([x2, x1] + children, train)
        x1 = Tree(
            self.levels - 1, self.features, self.in_features, self.stride,
            root_residual=self.root_residual, block=self.block,
            dtype=self.dtype, name="tree1",
        )(x, None, train)
        children.append(x1)
        return Tree(
            self.levels - 1, self.features, self.features, 1,
            root_dim=root_dim + self.features,
            root_residual=self.root_residual, block=self.block,
            dtype=self.dtype, name="tree2",
        )(x1, children, train)


class DLA(nn.Module):
    """The 6-level backbone (dla.py:287-411), returning all level outputs."""

    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    residual_root: bool = False
    block: str = "basic"
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        ch = self.channels
        dt = self.dtype
        x = ConvBNReLU(ch[0], 7, dtype=dt, name="base_layer")(x, train)
        if pre_img is not None and self.with_pre_img:
            x = x + ConvBNReLU(ch[0], 7, dtype=dt, name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            x = x + ConvBNReLU(ch[0], 7, dtype=dt, name="pre_hm_layer")(pre_hm, train)

        outputs = []
        # level0/level1: plain conv levels (dla.py:379-398)
        for i in range(self.levels[0]):
            x = ConvBNReLU(ch[0], 3, 1, dtype=dt, name=f"level0_conv{i}")(x, train)
        outputs.append(x)
        for i in range(self.levels[1]):
            x = ConvBNReLU(ch[1], 3, 2 if i == 0 else 1, dtype=dt,
                           name=f"level1_conv{i}")(x, train)
        outputs.append(x)

        x = Tree(self.levels[2], ch[2], ch[1], 2, level_root=False,
                 root_residual=self.residual_root, block=self.block,
                 dtype=dt, name="level2")(x, None, train)
        outputs.append(x)
        x = Tree(self.levels[3], ch[3], ch[2], 2, level_root=True,
                 root_residual=self.residual_root, block=self.block,
                 dtype=dt, name="level3")(x, None, train)
        outputs.append(x)
        x = Tree(self.levels[4], ch[4], ch[3], 2, level_root=True,
                 root_residual=self.residual_root, block=self.block,
                 dtype=dt, name="level4")(x, None, train)
        outputs.append(x)
        x = Tree(self.levels[5], ch[5], ch[4], 2, level_root=True,
                 root_residual=self.residual_root, block=self.block,
                 dtype=dt, name="level5")(x, None, train)
        outputs.append(x)
        return outputs


class DeformNode(nn.Module):
    """DCN -> BN -> ReLU ("dcn" node, dla.py:646-665)."""

    features: int
    dtype: Optional[str] = None
    dcn_impl: str = "gather"
    dcn_offset_range: int = 4
    offset_range_map: Tuple[Tuple[str, int], ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCNv2(self.features, dtype=self.dtype, impl=self.dcn_impl,
                  offset_range=self.dcn_offset_range,
                  offset_range_map=self.offset_range_map, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="actf_bn")(x)
        return nn.relu(x)


class GlobalConvNode(nn.Module):
    """Separable large-kernel conv node ("gcn", dla.py:589-643): sum of a
    (k,1)->(1,k) and a (1,k)->(k,1) branch, then BN + ReLU."""

    features: int
    k: int = 7
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.k
        p = k // 2
        gl = nn.Conv(self.features, (k, 1), padding=((p, p), (0, 0)),
                     use_bias=False, dtype=self.dtype, name="gcl_0")(x)
        gl = nn.Conv(self.features, (1, k), padding=((0, 0), (p, p)),
                     use_bias=False, dtype=self.dtype, name="gcl_1")(gl)
        gr = nn.Conv(self.features, (1, k), padding=((0, 0), (p, p)),
                     use_bias=False, dtype=self.dtype, name="gcr_0")(x)
        gr = nn.Conv(self.features, (k, 1), padding=((p, p), (0, 0)),
                     use_bias=False, dtype=self.dtype, name="gcr_1")(gr)
        out = gl + gr
        out = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                           epsilon=BN_EPS, dtype=self.dtype, name="act_bn")(out)
        return nn.relu(out)


class ConvNode(nn.Module):
    """1x1 conv -> BN -> ReLU ("conv" node, dla.py:576-586)."""

    features: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNReLU(self.features, 1, dtype=self.dtype, name="conv")(x, train)


def _make_node(node_type: str, features: int, name: str, dtype=None,
               offset_range: int = 4,
               offset_range_map: Tuple[Tuple[str, int], ...] = ()):
    if node_type.startswith("dcn"):
        impl = {"dcn": "gather", "dcn_shift": "shift",
                "dcn_pallas": "pallas", "dcn_onehot": "onehot",
                "dcn_pallas_cm": "pallas_cm", "dcn_hybrid": "hybrid"}[node_type]
        return DeformNode(features, dtype=dtype, dcn_impl=impl,
                          dcn_offset_range=offset_range,
                          offset_range_map=offset_range_map, name=name)
    if node_type == "conv":
        return ConvNode(features, dtype=dtype, name=name)
    if node_type == "gcn":
        # reference pairs a 1x1 Conv proj with a GlobalConv node
        # (DLA_NODE["gcn"] = (Conv, GlobalConv), dla.py:751-755); the proj/
        # node distinction is carried by the caller's name
        if name.startswith("proj"):
            return ConvNode(features, dtype=dtype, name=name)
        return GlobalConvNode(features, dtype=dtype, name=name)
    raise ValueError(f"unknown dla node type: {node_type}")


class IDAUp(nn.Module):
    """Iterative deep aggregation step (dla.py:668-699).

    Modifies a window of the feature pyramid in place: for each level above
    ``startp``, project to ``features`` channels, upsample by its factor, and
    merge with the previous level through the node op.
    """

    features: int
    up_factors: Sequence[int]   # per input level (index 0 unused)
    node_type: str = "dcn"
    dtype: Optional[str] = None
    offset_range: int = 4
    offset_range_map: Tuple[Tuple[str, int], ...] = ()

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], startp: int, endp: int,
                 train: bool = False):
        for i in range(startp + 1, endp):
            j = i - startp
            proj = _make_node(self.node_type, self.features, f"proj_{j}",
                              self.dtype, self.offset_range,
                              self.offset_range_map)
            node = _make_node(self.node_type, self.features, f"node_{j}",
                              self.dtype, self.offset_range,
                              self.offset_range_map)
            f = int(self.up_factors[j])
            x = proj(layers[i], train)
            if f > 1:
                x = DepthwiseConvTranspose(f, name=f"up_{j}")(x)
            layers[i] = node(x + layers[i - 1], train)
        return layers


class DLAUp(nn.Module):
    """Stack of IDAUp passes over levels [startp..5] (dla.py:702-735)."""

    startp: int
    channels: Sequence[int]
    node_type: str = "dcn"
    dtype: Optional[str] = None
    offset_range: int = 4
    offset_range_map: Tuple[Tuple[str, int], ...] = ()

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        channels = list(self.channels)
        scales = [2 ** i for i in range(len(channels))]
        in_channels = list(channels)
        # NOTE: the reference operates on the full 6-level list with
        # startp-relative indices (dla.py:728-733); we receive the sliced
        # [startp:] window, so the loop runs len(layers)-1 times with the
        # same (startp, endp) windows relative to this list.
        layers = list(layers)
        out = [layers[-1]]
        for i in range(len(layers) - 1):
            j = -i - 2
            ida = IDAUp(
                channels[j],
                [s // scales[j] for s in scales[j:]],
                node_type=self.node_type,
                dtype=self.dtype,
                offset_range=self.offset_range,
                offset_range_map=self.offset_range_map,
                name=f"ida_{i}",
            )
            ida(layers, len(layers) - i - 2, len(layers), train)
            out.insert(0, layers[-1])
            scales[j + 1:] = [scales[j]] * len(scales[j + 1:])
            in_channels[j + 1:] = [channels[j]] * len(in_channels[j + 1:])
        return out


class DLASeg(nn.Module):
    """Full detector trunk: DLA backbone -> DLAUp -> IDAUp (dla.py:758-817).

    ``__call__`` returns ``(head_input, feature_maps)`` where ``feature_maps``
    is the 13-scale list the AFE matching head samples from:
    6 backbone levels + 4 DLAUp outputs + 3 IDAUp outputs
    (channels [16,32,64,128,256,512, 64,128,256,512, 64,64,64]).
    """

    node_type: str = "dcn"
    down_ratio: int = 4
    last_level: int = 5
    offset_range: int = 4
    offset_range_map: Tuple[Tuple[str, int], ...] = ()
    with_pre_img: bool = False
    with_pre_hm: bool = False
    channels: Sequence[int] = DLA34_CHANNELS
    levels: Sequence[int] = DLA34_LEVELS
    block: str = "basic"
    residual_root: bool = False
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        first_level = int(np.log2(self.down_ratio))
        base_outs = DLA(
            self.levels, self.channels,
            residual_root=self.residual_root, block=self.block,
            with_pre_img=self.with_pre_img, with_pre_hm=self.with_pre_hm,
            dtype=self.dtype, name="base",
        )(x, pre_img, pre_hm, train)
        feature_maps = list(base_outs)

        dla_up_out = DLAUp(
            first_level, self.channels[first_level:], self.node_type,
            dtype=self.dtype, offset_range=self.offset_range,
            offset_range_map=self.offset_range_map, name="dla_up"
        )(base_outs[first_level:], train)
        feature_maps += list(dla_up_out)

        y = list(dla_up_out[: self.last_level - first_level])
        y = IDAUp(
            self.channels[first_level],
            [2 ** i for i in range(self.last_level - first_level)],
            self.node_type,
            dtype=self.dtype,
            offset_range=self.offset_range,
            offset_range_map=self.offset_range_map,
            name="ida_up",
        )(y, 0, len(y), train)
        feature_maps += list(y)

        return y[-1], feature_maps
