"""Generic backbone x neck detector (arch "generic", "res_*", "resdcn_*").

Rebuild of ``/root/reference/src/lib/model/networks/generic_network.py``
(backbone_factory {dla34, resnet, mobilenet} x neck_factory {dlaup, msraup})
plus the standalone PoseResNet / PoseResDCN archs (``networks/resnet.py``,
``networks/resdcn.py``), which are ResNet + deconv necks (plain or
DCN-based).  Like the reference, the generic family carries detection heads
only (no AFE -- AFE.py's 13-scale tap contract is DLA-specific,
generic_network.py has no AFE member).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deft_tpu.models.backbones import MobileNetV2, ResNet
from deft_tpu.models.deft import HeadTower, clamped_sigmoid
from deft_tpu.models.dla import DLA, DLA34_CHANNELS
from deft_tpu.models.necks import DLAUpV0, GenericDLAUp, MSRAUp
from deft_tpu.ops import decode as decode_ops


class GenericNet(nn.Module):
    heads: Dict[str, int]
    head_convs: Dict[str, Tuple[int, ...]]
    backbone: str = "dla34"        # dla34 | resnet | mobilenet
    neck: str = "dlaup"            # dlaup | msraup | msraup_plain
    num_layers: int = 50           # resnet depth
    msra_outchannel: int = 256
    prior_bias: float = -4.6
    head_kernel: int = 3
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    def setup(self):
        if self.backbone == "dla34":
            self.bb = DLA(with_pre_img=self.with_pre_img,
                          with_pre_hm=self.with_pre_hm, dtype=self.dtype,
                          name="backbone")
            channels = list(DLA34_CHANNELS[1:])
        elif self.backbone == "resnet":
            self.bb = ResNet(self.num_layers, self.with_pre_img,
                             self.with_pre_hm, dtype=self.dtype,
                             name="backbone")
            channels = ResNet(self.num_layers).channels
        elif self.backbone == "mobilenet":
            self.bb = MobileNetV2(self.with_pre_img, self.with_pre_hm,
                                  dtype=self.dtype, name="backbone")
            channels = MobileNetV2().channels
        else:
            raise ValueError(f"unknown backbone {self.backbone}")

        if self.neck == "dlaup":
            self.nk = GenericDLAUp(tuple(channels), dtype=self.dtype,
                                   name="neck")
            last_channel = self.nk.out_channel
        elif self.neck == "dlaupv0":
            # the true legacy DLASegv0 neck (networks/dlav0.py:561-692):
            # 1x1 projs + concat nodes, single stride-4 output map
            self.nk = DLAUpV0(tuple(channels[-4:]), dtype=self.dtype,
                              name="neck")
            last_channel = channels[-4]
        elif self.neck in ("msraup", "msraup_plain"):
            self.nk = MSRAUp(self.msra_outchannel,
                             plain=(self.neck == "msraup_plain"),
                             dtype=self.dtype, name="neck")
            last_channel = self.msra_outchannel
        else:
            raise ValueError(f"unknown neck {self.neck}")
        del last_channel  # head towers infer input channels

        self.head_towers = {
            h: HeadTower(
                c, tuple(self.head_convs.get(h, ())),
                head_kernel=self.head_kernel,
                prior_bias=self.prior_bias if "hm" in h else None,
                dtype=self.dtype, name=f"head_{h}",
            )
            for h, c in self.heads.items()
        }

    def __call__(self, image, pre_img=None, pre_hm=None, train: bool = False):
        feats = self.bb(image, pre_img, pre_hm, train)
        y, taps = self.nk(feats, train)
        outputs = {h: tower(y) for h, tower in self.head_towers.items()}
        return outputs, list(feats) + list(taps)

    def detect(self, image, k: int = 100, pre_img=None, pre_hm=None):
        outputs, _ = self(image, pre_img, pre_hm, train=False)
        outputs = dict(outputs)
        outputs["hm"] = clamped_sigmoid(outputs["hm"])
        return decode_ops.generic_decode(outputs, k=k)


def build_generic(cfg):
    import jax.numpy as jnp

    dtype = None if cfg.compute_dtype in ("float32", "") else jnp.dtype(
        cfg.compute_dtype
    )
    return GenericNet(
        heads=dict(cfg.heads),
        head_convs={h: tuple(c) for h, c in cfg.head_convs.items()},
        backbone=cfg.backbone,
        neck=cfg.neck,
        num_layers=cfg.num_layers,
        msra_outchannel=cfg.msra_outchannel,
        prior_bias=cfg.prior_bias,
        head_kernel=cfg.head_kernel,
        with_pre_img=cfg.pre_img,
        with_pre_hm=cfg.pre_hm,
        dtype=dtype,
    )
