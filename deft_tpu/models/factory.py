"""Model factory: arch-string -> network (model/model.py:23-37 equivalent).

``create_model("dla_34", cfg)`` parses the reference arch convention
("name_layers") and returns an un-initialized flax module; ``init_model``
produces the parameter/state pytrees.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from deft_tpu.config import Config
from deft_tpu.models.deft import DEFTNet

_SUPPORTED = ("dla", "dlav0", "resdcn", "res", "generic", "mobilenet")


def parse_layer_radii(spec: str) -> Tuple[Tuple[str, int], ...]:
    """Parse ``cfg.dcn_layer_radii`` (JSON object: path-substring -> radius)
    into the hashable tuple the flax modules carry.  Longest pattern first so
    the most specific match wins in DCNv2's path lookup."""
    if not spec:
        return ()
    import json

    m = json.loads(spec)
    return tuple(sorted(((str(k), int(v)) for k, v in m.items()),
                        key=lambda kv: -len(kv[0])))


def create_model(arch: str, cfg: Config) -> DEFTNet:
    num_layers = int(arch[arch.find("_") + 1:]) if "_" in arch else 0
    name = arch[: arch.find("_")] if "_" in arch else arch
    if name == "dla":
        from deft_tpu.models.dla import DLA_PLANS

        depth = str(num_layers) if num_layers else "34"
        if depth not in DLA_PLANS:
            raise ValueError(
                f"dla_{num_layers} has no plan; available: "
                f"{sorted(DLA_PLANS)} (reference dla.py:414-496)")
        import jax.numpy as jnp

        dtype = None if cfg.compute_dtype in ("float32", "") else jnp.dtype(
            cfg.compute_dtype
        )
        node = cfg.dla_node
        if node == "dcn" and cfg.dcn_impl != "gather":
            node = f"dcn_{cfg.dcn_impl}"
        return DEFTNet(
            heads=dict(cfg.heads),
            head_convs={h: tuple(c) for h, c in cfg.head_convs.items()},
            dataset=cfg.dataset,
            dla_node=node,
            dcn_offset_range=cfg.dcn_offset_range,
            dcn_layer_radii=parse_layer_radii(cfg.dcn_layer_radii),
            max_object=cfg.max_object,
            prior_bias=cfg.prior_bias,
            head_kernel=cfg.head_kernel,
            with_pre_img=cfg.pre_img,
            with_pre_hm=cfg.pre_hm,
            align_corners=cfg.align_corners,
            depth_scale=cfg.depth_scale,
            dla_depth=depth,
            dtype=dtype,
        )
    if name == "generic":
        from deft_tpu.models.generic import build_generic
        return build_generic(cfg)
    if name in ("res", "resdcn", "mobilenet"):
        # PoseResNet (plain deconv) / PoseResDCN (DCN deconv) / mobilenet --
        # all expressed through the generic backbone x neck assembly
        # (networks/resnet.py, networks/resdcn.py semantics)
        from deft_tpu.models.generic import build_generic
        # PoseResDCN sizes its deconv stack from head_conv (resdcn.py:154,
        # 172-179: 64 -> slimmed [256,128,64], else [256,256,256]);
        # PoseResNet is always [256,256,256] (resnet.py:139)
        msra = cfg.msra_outchannel
        if name == "resdcn" and cfg.heads and cfg.head_convs.get("hm"):
            msra = int(cfg.head_convs["hm"][0])
        elif name == "res":
            msra = 256
        cfg2 = cfg.replace(
            backbone="mobilenet" if name == "mobilenet" else "resnet",
            neck="msraup_plain" if name == "res" else "msraup",
            num_layers=num_layers if num_layers else cfg.num_layers,
            msra_outchannel=msra,
        )
        return build_generic(cfg2)
    if name == "dlav0":
        # the true legacy DLASegv0 (networks/dlav0.py:669-692): dla34
        # backbone + the pre-DCN concat-node DLAUp, ONE stride-4 feature map,
        # detection heads only (like the reference, dlav0 has no AFE member)
        from deft_tpu.models.generic import build_generic
        return build_generic(cfg.replace(backbone="dla34", neck="dlaupv0"))
    raise ValueError(f"unknown arch {arch}; supported: {_SUPPORTED}")


def init_model(model: DEFTNet, cfg: Config, rng: Optional[jax.Array] = None,
               batch: int = 1):
    """Initialize parameters with a dummy forward. Returns (params, batch_stats)."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed)
    image = jnp.zeros((batch, cfg.input_h, cfg.input_w, 3), jnp.float32)
    centers = jnp.zeros((batch, cfg.max_object, 2), jnp.float32)

    def init_fn(m):
        outs, fmaps = m(image, train=False)
        # touch the AFE so its params exist (generic/dlav0 archs carry
        # detection heads only, like the reference -- no AFE member)
        if hasattr(m, "extract"):
            e = m.extract(fmaps, centers)
            m.afe.affinity(e, e, train=False)
        return outs

    variables = jax.jit(lambda r: model.init(r, method=init_fn))(rng)
    return variables["params"], variables.get("batch_stats", {})
