"""PyTorch checkpoint -> flax parameter converter.

Maps the reference's ``state_dict`` layout (``model.py:113-121`` save format:
``{epoch, state_dict, optimizer}``) onto this framework's parameter pytree so
published DEFT checkpoints (model_mot.pth etc.) run here.  Handles:

* name translation (``base.level3.tree1.conv1.weight`` ->
  ``trunk/base/level3/tree1/conv1/conv/kernel`` and friends);
* layout: OIHW conv weights -> HWIO; torch Linear [out, in] -> flax
  [in, out]; BatchNorm weight/bias/running_mean/running_var ->
  scale/bias + batch_stats mean/var;
* DCNv2: CharlesShang's interleaved offset channels ((dy, dx) per tap,
  conv_offset_mask) -> this framework's tap-major [9 dy, 9 dx, 9 mask]
  (see models/dcn.py docstring), and the dense [Cout, Cin, 3, 3] weight ->
  the [9*Cin, Cout] gather-matmul weight;
* depthwise ConvTranspose2d up_* [C, 1, k, k] -> [k, k, 1, C] kernels;
* AFE: selector convs, the shared stacker BN, and the final-net 1x1 conv
  stack ([512, 2E, 1, 1] -> the split [2E, 512] kernel + Dense layers);
* the ``module.``-prefix tolerance of ``load_model`` (model.py:47-54).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class TorchConverter:
    """Builds (params, batch_stats) trees from a reference state_dict."""

    def __init__(self, dataset: str = "mot"):
        self.dataset = dataset
        self.params: dict = {}
        self.stats: dict = {}
        self.unused: list = []

    # -- primitive writers ---------------------------------------------------

    def conv(self, dst: Tuple[str, ...], sd, src: str, bias: bool = None):
        if f"{src}.weight" not in sd:
            return False
        _set(self.params, dst + ("kernel",), _conv_kernel(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            _set(self.params, dst + ("bias",), sd[f"{src}.bias"])
        return True

    def bn(self, dst: Tuple[str, ...], sd, src: str):
        if f"{src}.weight" not in sd:
            return False
        _set(self.params, dst + ("scale",), sd[f"{src}.weight"])
        _set(self.params, dst + ("bias",), sd[f"{src}.bias"])
        _set(self.stats, dst + ("mean",), sd[f"{src}.running_mean"])
        _set(self.stats, dst + ("var",), sd[f"{src}.running_var"])
        return True

    def conv_bn(self, dst: Tuple[str, ...], sd, conv_src: str, bn_src: str):
        ok = self.conv(dst + ("conv",), sd, conv_src)
        ok &= self.bn(dst + ("bn",), sd, bn_src)
        return ok

    def dense(self, dst: Tuple[str, ...], sd, src: str):
        if f"{src}.weight" not in sd:
            return False
        _set(self.params, dst + ("kernel",), sd[f"{src}.weight"].T)
        if f"{src}.bias" in sd:
            _set(self.params, dst + ("bias",), sd[f"{src}.bias"])
        return True

    def dcn(self, dst: Tuple[str, ...], sd, src: str):
        """CharlesShang DCN module: weight/bias + conv_offset_mask."""
        if f"{src}.weight" not in sd:
            return False
        w = sd[f"{src}.weight"]                      # [Cout, Cin, 3, 3]
        cout, cin = w.shape[:2]
        # tap-major gather weight [9*Cin, Cout]: tap k = (ky*3+kx) rows of Cin
        wk = np.transpose(w, (2, 3, 1, 0)).reshape(9 * cin, cout)
        _set(self.params, dst + ("weight",), wk)
        _set(self.params, dst + ("bias",), sd[f"{src}.bias"])

        om_w = sd[f"{src}.conv_offset_mask.weight"]  # [27, Cin, 3, 3]
        om_b = sd[f"{src}.conv_offset_mask.bias"]
        # reference channel c=2k -> dy_k, c=2k+1 -> dx_k, 18+k -> mask_k;
        # ours: [0:9] dy, [9:18] dx, [18:27] mask
        perm = [2 * k for k in range(9)] + [2 * k + 1 for k in range(9)] + \
               list(range(18, 27))
        om_w = om_w[perm]
        om_b = om_b[perm]
        _set(self.params, dst + ("conv_offset_mask", "kernel"),
             _conv_kernel(om_w))
        _set(self.params, dst + ("conv_offset_mask", "bias"), om_b)
        return True

    def up(self, dst: Tuple[str, ...], sd, src: str):
        """Depthwise ConvTranspose2d [C, 1, k, k] -> [k, k, 1, C]."""
        if f"{src}.weight" not in sd:
            return False
        w = sd[f"{src}.weight"]
        _set(self.params, dst + ("kernel",), np.transpose(w, (2, 3, 1, 0)))
        return True

    def up_full(self, dst: Tuple[str, ...], sd, src: str):
        """Dense ConvTranspose2d [Cin, Cout, k, k] -> flax ConvTranspose
        kernel [k, k, Cin, Cout], spatially flipped (flax's conv_transpose
        correlates the unflipped kernel; torch's ConvTranspose2d is the
        gradient-of-conv, i.e. the flipped orientation)."""
        if f"{src}.weight" not in sd:
            return False
        w = sd[f"{src}.weight"]
        w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
        _set(self.params, dst + ("deconv", "kernel",), np.ascontiguousarray(w))
        if f"{src}.bias" in sd:
            _set(self.params, dst + ("deconv", "bias",), sd[f"{src}.bias"])
        return True

    # -- composite translators ----------------------------------------------

    def basic_block(self, dst, sd, src):
        self.conv_bn(dst + ("conv1",), sd, f"{src}.conv1", f"{src}.bn1")
        self.conv_bn(dst + ("conv2",), sd, f"{src}.conv2", f"{src}.bn2")
        # Bottleneck(X) blocks carry a third conv (dla.py:88-181)
        self.conv_bn(dst + ("conv3",), sd, f"{src}.conv3", f"{src}.bn3")

    def tree(self, dst, sd, src, levels: int):
        if levels == 1:
            self.basic_block(dst + ("tree1",), sd, f"{src}.tree1")
            self.basic_block(dst + ("tree2",), sd, f"{src}.tree2")
            self.conv_bn(dst + ("root", "conv"), sd, f"{src}.root.conv",
                         f"{src}.root.bn")
        else:
            self.tree(dst + ("tree1",), sd, f"{src}.tree1", levels - 1)
            self.tree(dst + ("tree2",), sd, f"{src}.tree2", levels - 1)
        # project exists when in != out channels
        self.conv_bn(dst + ("project",), sd, f"{src}.project.0",
                     f"{src}.project.1")

    def node(self, dst, sd, src, node_type: str):
        """IDAUp proj/node module: DeformConv (dcn) or Conv (conv)."""
        if node_type == "dcn":
            self.dcn(dst + ("conv",), sd, f"{src}.conv")
            self.bn(dst + ("actf_bn",), sd, f"{src}.actf.0")
        else:
            self.conv_bn(dst + ("conv",), sd, f"{src}.conv.0", f"{src}.conv.1")

    def ida(self, dst, sd, src, n: int, node_type: str):
        for j in range(1, n):
            self.node(dst + (f"proj_{j}",), sd, f"{src}.proj_{j}", node_type)
            self.node(dst + (f"node_{j}",), sd, f"{src}.node_{j}", node_type)
            self.up(dst + (f"up_{j}",), sd, f"{src}.up_{j}")

    def dla34_base(self, sd, prefix: str = "base.", levels=(1, 1, 1, 2, 2, 1)):
        """DLA trunk mapping.  ``prefix="base."`` for DLASeg checkpoints;
        ``prefix=""`` for a bare imagenet ``dla34`` state_dict (the layout
        model_zoo serves for dla.py:433-441 pretrained init).  ``levels`` is
        the depth plan (DLA_PLANS) for non-34 variants."""
        base = ("trunk", "base")
        self.conv_bn(base + ("base_layer",), sd, f"{prefix}base_layer.0",
                     f"{prefix}base_layer.1")
        for name in ("pre_img_layer", "pre_hm_layer"):
            self.conv_bn(base + (name,), sd, f"{prefix}{name}.0",
                         f"{prefix}{name}.1")
        # level0/level1 repeat [conv, bn, relu] triplets levels[i] times
        for li in (0, 1):
            for i in range(levels[li]):
                self.conv_bn(base + (f"level{li}_conv{i}",), sd,
                             f"{prefix}level{li}.{3 * i}",
                             f"{prefix}level{li}.{3 * i + 1}")
        for lvl, depth in (("level2", levels[2]), ("level3", levels[3]),
                           ("level4", levels[4]), ("level5", levels[5])):
            self.tree(base + (lvl,), sd, f"{prefix}{lvl}", depth)

    def convert_dla34(self, sd, heads: Dict[str, int], node_type: str = "dcn",
                      levels=(1, 1, 1, 2, 2, 1)):
        # backbone
        self.dla34_base(sd, "base.", levels)

        # dla_up: ida_0 (2 ch), ida_1 (3 ch), ida_2 (4 ch)
        for i, n in enumerate((2, 3, 4)):
            self.ida(("trunk", "dla_up", f"ida_{i}"), sd, f"dla_up.ida_{i}",
                     n, node_type)
        self.ida(("trunk", "ida_up"), sd, "ida_up", 3, node_type)

        self.convert_heads(sd, heads)
        self.convert_afe(sd)
        return self.params, self.stats

    def convert_heads(self, sd, heads):
        """torch names head towers directly (hm.0.weight, hm.2.weight ...;
        base_model.py:36-94)."""
        for head in heads:
            if f"{head}.0.weight" in sd:
                self.conv(("head_" + head, "conv0"), sd, f"{head}.0")
                self.conv(("head_" + head, "out"), sd, f"{head}.2")
            elif f"{head}.weight" in sd:
                self.conv(("head_" + head, "out"), sd, head)

    # -- PoseResNet / PoseResDCN (networks/{resnet,resdcn}.py) ----------------

    _RESNET_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                      101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

    def resnet_block(self, dst, sd, src, bottleneck: bool):
        self.conv_bn(dst + ("conv1",), sd, f"{src}.conv1", f"{src}.bn1")
        self.conv_bn(dst + ("conv2",), sd, f"{src}.conv2", f"{src}.bn2")
        if bottleneck:
            self.conv_bn(dst + ("conv3",), sd, f"{src}.conv3", f"{src}.bn3")
        if f"{src}.downsample.0.weight" in sd:
            self.conv_bn(dst + ("downsample",), sd, f"{src}.downsample.0",
                         f"{src}.downsample.1")

    def resnet_backbone(self, sd, num_layers: int):
        """torchvision-layout ResNet trunk (conv1/bn1/layerN.M...) -- the
        same names an imagenet ``resnetXX`` state_dict uses (the reference
        loads those via model_zoo, resnet.py:122-127)."""
        bottleneck = num_layers >= 50
        bb = ("backbone",)
        self.conv_bn(bb + ("conv1",), sd, "conv1", "bn1")
        for s, n in enumerate(self._RESNET_BLOCKS[num_layers]):
            for b in range(n):
                self.resnet_block(bb + (f"layer{s + 1}_{b}",), sd,
                                  f"layer{s + 1}.{b}", bottleneck)

    def convert_pose_resnet(self, sd, heads: Dict[str, int], num_layers: int,
                            dcn: bool):
        """PoseResNet (plain deconvs, resnet.py:120-259) / PoseResDCN
        (DCN deconv stages, resdcn.py:151-295) -> GenericNet params."""
        self.resnet_backbone(sd, num_layers)
        # deconv stack: per stage resdcn packs [DCN, BN, ReLU, up, BN, ReLU]
        # (resdcn.py:231-276); resnet packs [up, BN, ReLU] (resnet.py:192-220)
        stride = 6 if dcn else 3
        for i in range(3):
            base = f"deconv_layers.{i * stride}"
            if dcn:
                self.dcn(("neck", f"dcn_{i}"), sd, base)
                self.bn(("neck", f"bn_a_{i}"), sd,
                        f"deconv_layers.{i * stride + 1}")
                self.up_full(("neck", f"up_{i}"), sd,
                             f"deconv_layers.{i * stride + 3}")
                self.bn(("neck", f"bn_b_{i}"), sd,
                        f"deconv_layers.{i * stride + 4}")
            else:
                self.up_full(("neck", f"up_{i}"), sd, base)
                self.bn(("neck", f"bn_b_{i}"), sd,
                        f"deconv_layers.{i * stride + 1}")
        self.convert_heads(sd, heads)
        return self.params, self.stats

    def convert_afe(self, sd):
        dst = ("afe",)
        for i in range(13):
            self.conv(dst + (f"selector_{i}",), sd, f"AFE.selector.{i}")
        # shared stacker BN
        if "AFE.stacker2_bn.weight" in sd:
            _set(self.params, dst + ("stacker2_bn", "scale"),
                 sd["AFE.stacker2_bn.weight"])
            _set(self.params, dst + ("stacker2_bn", "bias"),
                 sd["AFE.stacker2_bn.bias"])
            _set(self.stats, dst + ("stacker2_bn", "mean"),
                 sd["AFE.stacker2_bn.running_mean"])
            _set(self.stats, dst + ("stacker2_bn", "var"),
                 sd["AFE.stacker2_bn.running_var"])
        # final net: ModuleList [conv, bn, relu]*3 + [conv, relu]*2 ->
        # indices conv:0 bn:1 | conv:3 bn:4 | conv:6 bn:7 | conv:9 | conv:11
        def final_conv(idx):
            w = sd.get(f"AFE.final_net.{idx}.weight")
            if w is None:
                return None, None
            return w[:, :, 0, 0], sd.get(f"AFE.final_net.{idx}.bias")

        w0, b0 = final_conv(0)
        if w0 is not None:
            _set(self.params, dst + ("final_0_kernel",), w0.T)  # [2E, 512]
            _set(self.params, dst + ("final_0_bias",), b0)
            self.bn(dst + ("final_0_bn",), sd, "AFE.final_net.1")
            layer_map = [(3, "final_1", "final_1_bn", 4),
                         (6, "final_2", "final_2_bn", 7),
                         (9, "final_3", None, None),
                         (11, "final_4", None, None)]
            for idx, name, bn_name, bn_idx in layer_map:
                w, b = final_conv(idx)
                if w is None:
                    continue
                _set(self.params, dst + (name, "kernel"), w.T)
                _set(self.params, dst + (name, "bias"), b)
                if bn_name:
                    self.bn(dst + (bn_name,), sd, f"AFE.final_net.{bn_idx}")


def is_imagenet_backbone_sd(sd) -> bool:
    """A bare imagenet trunk state_dict: dla34 (base_layer.* without the
    DLASeg ``base.`` prefix) or torchvision resnet (conv1 + layer1 without
    any deconv/head keys)."""
    if "base_layer.0.weight" in sd and "base.base_layer.0.weight" not in sd:
        return True
    return ("conv1.weight" in sd and "layer1.0.conv1.weight" in sd
            and not any(k.startswith("deconv_layers") for k in sd)
            and "hm.0.weight" not in sd and "hm.weight" not in sd)


def convert_torch_imagenet_backbone(path_or_sd, cfg):
    """Bare imagenet trunk .pth -> trunk-only (params, stats) trees.

    The reference initializes its backbones from imagenet model-zoo weights
    (dla.py:433-441 ``dla34(pretrained=...)``, resnet.py:122-127
    model_zoo.load_url); this is the equivalent conversion for training from
    real data: only trunk leaves are produced, everything else (neck on
    resnet archs, heads, AFE) keeps its fresh initialization via the
    tolerant merge in convert_torch_checkpoint.
    """
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    conv = TorchConverter(cfg.dataset)
    arch = cfg.arch.split("_")[0]
    if "base_layer.0.weight" in sd:
        from deft_tpu.models.dla import DLA_PLANS

        depth = (cfg.arch.split("_", 1)[1]
                 if cfg.arch.startswith("dla_") else "34")
        levels = DLA_PLANS.get(depth, DLA_PLANS["34"])[0]
        conv.dla34_base(sd, prefix="", levels=levels)
    else:
        num_layers = (int(cfg.arch.split("_")[1])
                      if "_" in cfg.arch and arch in ("res", "resdcn")
                      else 18)
        conv.resnet_backbone(sd, num_layers)
    return conv.params, conv.stats


def convert_torch_checkpoint(path_or_sd, cfg):
    """Reference .pth (or a loaded state_dict) -> {"params", "batch_stats"}
    overlayed onto a freshly initialized model (tolerant like model.py:47-90).
    Bare imagenet backbone checkpoints are detected and mapped trunk-only.
    """
    import jax

    from deft_tpu.models import create_model
    from deft_tpu.models.factory import init_model
    from deft_tpu.train.checkpoint import _merge_tolerant

    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    conv = TorchConverter(cfg.dataset)
    arch = cfg.arch.split("_")[0]
    if is_imagenet_backbone_sd(sd):
        params_t, stats_t = convert_torch_imagenet_backbone(sd, cfg)
    elif arch in ("res", "resdcn"):
        num_layers = int(cfg.arch.split("_")[1]) if "_" in cfg.arch else 18
        params_t, stats_t = conv.convert_pose_resnet(
            sd, cfg.heads, num_layers, dcn=(arch == "resdcn")
        )
    else:
        from deft_tpu.models.dla import DLA_PLANS

        depth = (cfg.arch.split("_", 1)[1]
                 if cfg.arch.startswith("dla_") else "34")
        levels = DLA_PLANS.get(depth, DLA_PLANS["34"])[0]
        params_t, stats_t = conv.convert_dla34(sd, cfg.heads, cfg.dla_node,
                                               levels)

    model = create_model(cfg.arch, cfg)
    params, stats = init_model(model, cfg)
    params = _merge_tolerant(
        jax.tree.map(np.asarray, params, is_leaf=lambda x: not isinstance(x, dict)),
        params_t,
    )
    stats = _merge_tolerant(
        jax.tree.map(np.asarray, stats, is_leaf=lambda x: not isinstance(x, dict)),
        stats_t,
    )
    return {"params": params, "batch_stats": stats}


def convert_torch_lstm(path_or_sd, dataset: str):
    """Reference DecoderRNN .pth -> flax DecoderRNN variables.

    torch LSTM gate order is [i, f, g, o] with separate ih/hh weights and two
    biases; flax OptimizedLSTMCell keeps per-gate Dense kernels (ii/if/ig/io
    from input, hi/hf/hg/ho from hidden) with one bias set on the hidden
    Denses... we map onto the cell's parameter naming.
    """
    sd = (load_torch_state_dict(path_or_sd)
          if isinstance(path_or_sd, str) else dict(path_or_sd))
    h = 128
    w_ih = sd["lstm.weight_ih_l0"]      # [4h, in]
    w_hh = sd["lstm.weight_hh_l0"]      # [4h, h]
    b = sd["lstm.bias_ih_l0"] + sd["lstm.bias_hh_l0"]
    gates = ("i", "f", "g", "o")
    params = {"cell": {}}
    for gi, g in enumerate(gates):
        sl = slice(gi * h, (gi + 1) * h)
        params["cell"][f"i{g}"] = {"kernel": w_ih[sl].T}
        params["cell"][f"h{g}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    params["out1"] = {"kernel": sd["out1.weight"].T, "bias": sd["out1.bias"]}
    params["out2"] = {"kernel": sd["out2.weight"].T, "bias": sd["out2.bias"]}
    return {"params": params}
