"""PyTorch -> Flax checkpoint importer for UNCRTAINTS.

Maps the reference's ``state_dict_G`` parameter names
(/root/reference/model/src/model_utils.py:117-125 checkpoints) onto this
framework's NHWC flax tree, including the legacy ``in_block1 -> in_block0``
key rename the reference applies on load (model_utils.py:209-219).

Weight layout transforms:
- Conv2d  [out,in,kh,kw]      -> HWIO [kh,kw,in,out]
- dw Conv [ch,1,kh,kw]        -> [kh,kw,1,ch]
- Linear  [out,in]            -> [in,out]
- Conv1d  [out,in,1]          -> Dense [in,out]
- norms: weight->scale, bias->bias, running_mean/var -> batch_stats

Used for (a) serving reference-trained checkpoints on TPU and (b) the
numerical-parity harness (tests/test_torch_parity.py): ported weights must
reproduce the PyTorch forward within fp32 tolerance (BASELINE.md <=1e-3
RMSE north star).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
import jax


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth.tar and return state_dict_G as numpy arrays."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict_G", blob)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def normalize_legacy_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """in_block1 -> in_block0 etc. (model_utils.py:209-219 rename rule).
    Reference ModuleList entries are `in_block.{i}`; legacy checkpoints used
    1-based indices."""
    out = {}
    has_zero = any(re.match(r"(in|out)_block\.0\.", k) for k in sd)
    for k, v in sd.items():
        m = re.match(r"(in_block|out_block)\.(\d+)\.(.*)", k)
        if m and not has_zero:
            k = f"{m.group(1)}.{int(m.group(2)) - 1}.{m.group(3)}"
        out[k] = v
    return out


def _conv_w(w):   # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(w, (2, 3, 1, 0))


def _lin_w(w):    # [O,I] -> [I,O]
    return np.transpose(w)


def _conv1d_w(w):  # [O,I,1] -> [I,O]
    return np.transpose(w[..., 0])


def uncrtaints_mapping(cfg) -> Dict[str, Tuple[str, object]]:
    """flax-path -> (torch-name, transform) for the UNCRTAINTS tree.

    Covers the default architecture (mbconv blocks, shared out_conv, tiny
    L-TAE); separate_out heads are included when enabled."""
    m: Dict[str, Tuple[str, object]] = {}
    ident = lambda a: a

    def conv(flax_prefix, torch_prefix, bias=True):
        m[f"{flax_prefix}/kernel"] = (f"{torch_prefix}.weight", _conv_w)
        if bias:
            m[f"{flax_prefix}/bias"] = (f"{torch_prefix}.bias", ident)

    def norm(flax_prefix, torch_prefix, batch=False):
        m[f"{flax_prefix}/scale"] = (f"{torch_prefix}.weight", ident)
        m[f"{flax_prefix}/bias"] = (f"{torch_prefix}.bias", ident)
        if batch:
            m[f"B:{flax_prefix}/mean"] = (f"{torch_prefix}.running_mean", ident)
            m[f"B:{flax_prefix}/var"] = (f"{torch_prefix}.running_var", ident)

    def norm2d(flax_parent, idx, torch_prefix, kind):
        # Norm2d keeps scale/bias (and batch running stats) directly on its
        # own scope for both batch & group kinds
        if kind == "batch":
            norm(f"{flax_parent}/Norm2d_{idx}", torch_prefix, batch=True)
        elif kind == "group":
            norm(f"{flax_parent}/Norm2d_{idx}", torch_prefix)
        # instance norm has no params

    def mbconv(flax_name, torch_name, kind):
        norm2d(flax_name, 0, f"{torch_name}.conv.norm", kind)      # PreNorm
        conv(f"{flax_name}/Conv2d_0", f"{torch_name}.conv.fn.0",
             bias=False)                                           # pw
        norm2d(flax_name, 1, f"{torch_name}.conv.fn.1", kind)
        conv(f"{flax_name}/Conv2d_1", f"{torch_name}.conv.fn.3",
             bias=False)                                           # dw
        norm2d(flax_name, 2, f"{torch_name}.conv.fn.4", kind)
        m[f"{flax_name}/SE_0/Dense_0/kernel"] = (
            f"{torch_name}.conv.fn.6.fc.0.weight", _lin_w)
        m[f"{flax_name}/SE_0/Dense_1/kernel"] = (
            f"{torch_name}.conv.fn.6.fc.2.weight", _lin_w)
        conv(f"{flax_name}/Conv2d_2", f"{torch_name}.conv.fn.7",
             bias=False)                                           # pw-linear
        norm2d(flax_name, 3, f"{torch_name}.conv.fn.8", kind)

    def residual_block(flax_name, torch_name, kind):
        for j, tsub in enumerate(("conv1", "conv2", "conv3")):
            conv(f"{flax_name}/ConvLayer_{j}/Conv2d_0",
                 f"{torch_name}.{tsub}.conv.0")
            norm2d(f"{flax_name}/ConvLayer_{j}", 0,
                   f"{torch_name}.{tsub}.conv.1", kind)

    # encoder
    conv("in_conv/ConvLayer_0/Conv2d_0", "in_conv.conv.conv.0")
    norm2d("in_conv/ConvLayer_0", 0, "in_conv.conv.conv.1", cfg.encoder_norm)
    for i in range(len(cfg.encoder_widths)):
        if cfg.block_type == "mbconv":
            mbconv(f"in_block{i}", f"in_block.{i}", cfg.encoder_norm)
        else:
            residual_block(f"in_block{i}", f"in_block.{i}", cfg.encoder_norm)

    # temporal encoder: tiny L-TAE by default; --use_v swaps in the FULL
    # LTAE2d (value path + MLP + out_norm, ltae.py:10-141,
    # uncrtaints.py:324-338) plus the include_v fusion conv
    if not cfg.pretrain:
        te = "temporal_encoder"
        in_norm_path = f"{te}/in_norm" if cfg.use_v else f"{te}/GroupNormCT_0"
        norm(in_norm_path, f"{te}.in_norm")
        m[f"{te}/inconv/kernel"] = (f"{te}.inconv.weight", _conv1d_w)
        m[f"{te}/inconv/bias"] = (f"{te}.inconv.bias", ident)
        m[f"{te}/Q"] = (f"{te}.attention_heads.Q", ident)
        m[f"{te}/fc1_k/kernel"] = (f"{te}.attention_heads.fc1_k.weight", _lin_w)
        m[f"{te}/fc1_k/bias"] = (f"{te}.attention_heads.fc1_k.bias", ident)
        if cfg.use_v:
            # MLP: Linear -> BatchNorm1d -> ReLU (ltae.py:74-84); with
            # mlp=[d_model, encoder_widths[0]] there is exactly one stage
            m[f"{te}/Dense_0/kernel"] = (f"{te}.mlp.0.weight", _lin_w)
            m[f"{te}/Dense_0/bias"] = (f"{te}.mlp.0.bias", ident)
            m[f"{te}/BatchNorm_0/scale"] = (f"{te}.mlp.1.weight", ident)
            m[f"{te}/BatchNorm_0/bias"] = (f"{te}.mlp.1.bias", ident)
            m[f"B:{te}/BatchNorm_0/mean"] = (f"{te}.mlp.1.running_mean", ident)
            m[f"B:{te}/BatchNorm_0/var"] = (f"{te}.mlp.1.running_var", ident)
            m[f"{te}/out_norm/scale"] = (f"{te}.out_norm.weight", ident)
            m[f"{te}/out_norm/bias"] = (f"{te}.out_norm.bias", ident)
            conv("include_v", "include_v")

    # decoder
    for i in range(len(cfg.decoder_widths)):
        if cfg.block_type == "mbconv":
            mbconv(f"out_block{i}", f"out_block.{i}", cfg.decoder_norm)
        else:
            residual_block(f"out_block{i}", f"out_block.{i}", cfg.decoder_norm)

    # heads
    if cfg.separate_out:
        conv("out_conv_mean_1/ConvLayer_0/Conv2d_0",
             "out_conv_mean_1.conv.conv.0")
        conv("out_conv_var_1/ConvLayer_0/Conv2d_0",
             "out_conv_var_1.conv.conv.0")
    else:
        conv("out_conv/ConvLayer_0/Conv2d_0", "out_conv.conv.conv.0")
    return m


def _convT_w(w):  # torch ConvTranspose2d [in,out,kh,kw] -> flax flipped HWIO
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def unet_mapping(cfg) -> Dict[str, Tuple[str, object]]:
    """flax-path -> (torch-name, transform) for the UNet pretrain backbone
    (utae.py:27-201: in_conv, strided DownConvBlocks, UpConvBlocks with
    skip/up branches, out_conv)."""
    m: Dict[str, Tuple[str, object]] = {}
    ident = lambda a: a

    def conv(fp, tp, bias=True):
        m[f"{fp}/kernel"] = (f"{tp}.weight", _conv_w)
        if bias:
            m[f"{fp}/bias"] = (f"{tp}.bias", ident)

    def norm(fp, tp, batch=False):
        m[f"{fp}/scale"] = (f"{tp}.weight", ident)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)
        if batch:
            m[f"B:{fp}/mean"] = (f"{tp}.running_mean", ident)
            m[f"B:{fp}/var"] = (f"{tp}.running_var", ident)

    def convlayer(fp, tp, kind):
        conv(f"{fp}/Conv2d_0", f"{tp}.conv.0")
        if kind in ("group", "batch"):
            norm(f"{fp}/Norm2d_0", f"{tp}.conv.1", batch=(kind == "batch"))

    n = len(cfg.encoder_widths)
    enc, dec = cfg.encoder_norm, cfg.decoder_norm
    convlayer("in_conv/ConvLayer_0", "in_conv.conv", enc)
    for i in range(n - 1):
        convlayer(f"down_block{i}/ConvLayer_0", f"down_blocks.{i}.down", enc)
        convlayer(f"down_block{i}/ConvLayer_1", f"down_blocks.{i}.conv1", enc)
        convlayer(f"down_block{i}/ConvLayer_2", f"down_blocks.{i}.conv2", enc)
    for i in range(n - 1):
        ub = f"up_block{i}"
        tb = f"up_blocks.{i}"
        conv(f"{ub}/Conv2d_0", f"{tb}.skip_conv.0")
        norm(f"{ub}/Norm2d_0", f"{tb}.skip_conv.1", batch=True)  # norm_skip
        m[f"{ub}/ConvTranspose_0/kernel"] = (f"{tb}.up.0.weight", _convT_w)
        m[f"{ub}/ConvTranspose_0/bias"] = (f"{tb}.up.0.bias", ident)
        norm(f"{ub}/Norm2d_1", f"{tb}.up.1", batch=True)         # norm_up
        convlayer(f"{ub}/ConvLayer_0", f"{tb}.conv1", dec)
        convlayer(f"{ub}/ConvLayer_1", f"{tb}.conv2", dec)
    conv("out_conv/ConvLayer_0/Conv2d_0", "out_conv.conv.conv.0")
    return m


def import_unet(variables, sd: Dict[str, np.ndarray], cfg):
    """Map a reference UNet state_dict into the flax tree."""
    return _import_with_mapping(variables, sd, unet_mapping(cfg))


def utae_mapping(cfg) -> Dict[str, Tuple[str, object]]:
    """U-TAE = UNet blocks + a full L-TAE (value path + MLP) bottleneck
    (utae.py:205-406, ltae.py:10-141)."""
    m = unet_mapping(cfg)
    ident = lambda a: a
    te = "temporal_encoder"
    m[f"{te}/in_norm/scale"] = (f"{te}.in_norm.weight", ident)
    m[f"{te}/in_norm/bias"] = (f"{te}.in_norm.bias", ident)
    m[f"{te}/inconv/kernel"] = (f"{te}.inconv.weight", _conv1d_w)
    m[f"{te}/inconv/bias"] = (f"{te}.inconv.bias", ident)
    m[f"{te}/Q"] = (f"{te}.attention_heads.Q", ident)
    m[f"{te}/fc1_k/kernel"] = (f"{te}.attention_heads.fc1_k.weight", _lin_w)
    m[f"{te}/fc1_k/bias"] = (f"{te}.attention_heads.fc1_k.bias", ident)
    # MLP: Linear -> BatchNorm1d -> ReLU (ltae.py:74-84)
    m[f"{te}/Dense_0/kernel"] = (f"{te}.mlp.0.weight", _lin_w)
    m[f"{te}/Dense_0/bias"] = (f"{te}.mlp.0.bias", ident)
    m[f"{te}/BatchNorm_0/scale"] = (f"{te}.mlp.1.weight", ident)
    m[f"{te}/BatchNorm_0/bias"] = (f"{te}.mlp.1.bias", ident)
    m[f"B:{te}/BatchNorm_0/mean"] = (f"{te}.mlp.1.running_mean", ident)
    m[f"B:{te}/BatchNorm_0/var"] = (f"{te}.mlp.1.running_var", ident)
    m[f"{te}/out_norm/scale"] = (f"{te}.out_norm.weight", ident)
    m[f"{te}/out_norm/bias"] = (f"{te}.out_norm.bias", ident)
    return m


def import_utae(variables, sd: Dict[str, np.ndarray], cfg):
    """Map a reference UTAE state_dict into the flax tree."""
    return _import_with_mapping(variables, sd, utae_mapping(cfg))


def _conv3d_w(w):   # [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT3d_w(w):  # torch ConvTranspose3d [I,O,kt,kh,kw] -> flipped [kt,kh,kw,I,O]
    # verified: flax ConvTranspose(padding=((1,2),)*3) with this transform
    # matches torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1) exactly
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


def unet3d_mapping() -> Dict[str, Tuple[str, object]]:
    """flax-path -> (torch-name, transform) for UNet3D
    (/root/reference/model/src/backbones/unet3d.py:14-120)."""
    m: Dict[str, Tuple[str, object]] = {}
    ident = lambda a: a

    def conv3d(fp, tp):
        m[f"{fp}/kernel"] = (f"{tp}.weight", _conv3d_w)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)

    def bn3d(fp, tp):
        m[f"{fp}/scale"] = (f"{tp}.weight", ident)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)
        m[f"B:{fp}/mean"] = (f"{tp}.running_mean", ident)
        m[f"B:{fp}/var"] = (f"{tp}.running_var", ident)

    for blk in ("en3", "en4", "dc4", "dc3"):
        conv3d(f"{blk}/Conv_0", f"{blk}.0")
        bn3d(f"{blk}/BatchNorm3d_0/BatchNorm_0", f"{blk}.1")
        conv3d(f"{blk}/Conv_1", f"{blk}.3")
        bn3d(f"{blk}/BatchNorm3d_1/BatchNorm_0", f"{blk}.4")
    conv3d("center_in", "center_in.0")
    bn3d("BatchNorm3d_0/BatchNorm_0", "center_in.1")
    conv3d("Conv_0", "center_out.0")
    bn3d("BatchNorm3d_1/BatchNorm_0", "center_out.1")
    m["center_out/kernel"] = ("center_out.3.weight", _convT3d_w)
    m["center_out/bias"] = ("center_out.3.bias", ident)
    m["trans3/kernel"] = ("trans3.0.weight", _convT3d_w)
    m["trans3/bias"] = ("trans3.0.bias", ident)
    bn3d("BatchNorm3d_2/BatchNorm_0", "trans3.1")
    conv3d("final", "final")
    return m


def import_unet3d(variables, sd: Dict[str, np.ndarray]):
    return _import_with_mapping(variables, sd, unet3d_mapping())


def recunet_mapping(n_stages: int, temporal: str = "lstm",
                    encoder_norm: str = "group") -> Dict[str, Tuple[str, object]]:
    """flax-path -> (torch-name, transform) for RecUNet (utae.py:691-852):
    group-norm U-Net blocks, ConvLSTM/BConvLSTM bottleneck, batch-norm
    skip/up norms (the reference leaves those at their defaults)."""
    m: Dict[str, Tuple[str, object]] = {}
    ident = lambda a: a

    def conv(fp, tp):
        m[f"{fp}/kernel"] = (f"{tp}.weight", _conv_w)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)

    def norm(fp, tp, batch=False):
        m[f"{fp}/scale"] = (f"{tp}.weight", ident)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)
        if batch:
            m[f"B:{fp}/mean"] = (f"{tp}.running_mean", ident)
            m[f"B:{fp}/var"] = (f"{tp}.running_var", ident)

    # in_conv: ConvBlock([in, e0, e0]) = one ConvLayer with two convs
    conv("in_conv/ConvLayer_0/Conv2d_0", "in_conv.conv.conv.0")
    norm("in_conv/ConvLayer_0/Norm2d_0", "in_conv.conv.conv.1")
    conv("in_conv/ConvLayer_0/Conv2d_1", "in_conv.conv.conv.3")
    norm("in_conv/ConvLayer_0/Norm2d_1", "in_conv.conv.conv.4")
    for i in range(n_stages - 1):
        for j, sub in enumerate(("down", "conv1", "conv2")):
            conv(f"down_block{i}/ConvLayer_{j}/Conv2d_0",
                 f"down_blocks.{i}.{sub}.conv.0")
            norm(f"down_block{i}/ConvLayer_{j}/Norm2d_0",
                 f"down_blocks.{i}.{sub}.conv.1")
    if temporal in ("lstm", "blstm"):
        if temporal == "lstm":
            m["temporal_encoder/cell/gates/kernel"] = (
                "temporal_encoder.cell_list.0.conv.weight", _conv_w)
            m["temporal_encoder/cell/gates/bias"] = (
                "temporal_encoder.cell_list.0.conv.bias", ident)
        else:
            for ours, theirs in (("forward", "forward"),
                                 ("backward", "backward")):
                m[f"temporal_encoder/{ours}/cell/gates/kernel"] = (
                    f"temporal_encoder.{theirs}.cell_list.0.conv.weight",
                    _conv_w)
                m[f"temporal_encoder/{ours}/cell/gates/bias"] = (
                    f"temporal_encoder.{theirs}.cell_list.0.conv.bias", ident)
        conv("out_convlstm", "out_convlstm")
    for i in range(n_stages - 1):
        ub, tb = f"up_block{i}", f"up_blocks.{i}"
        conv(f"{ub}/Conv2d_0", f"{tb}.skip_conv.0")
        norm(f"{ub}/Norm2d_0", f"{tb}.skip_conv.1", batch=True)
        m[f"{ub}/ConvTranspose_0/kernel"] = (f"{tb}.up.0.weight", _convT_w)
        m[f"{ub}/ConvTranspose_0/bias"] = (f"{tb}.up.0.bias", ident)
        norm(f"{ub}/Norm2d_1", f"{tb}.up.1", batch=True)
        conv(f"{ub}/ConvLayer_0/Conv2d_0", f"{tb}.conv1.conv.0")
        norm(f"{ub}/ConvLayer_0/Norm2d_0", f"{tb}.conv1.conv.1")
        conv(f"{ub}/ConvLayer_1/Conv2d_0", f"{tb}.conv2.conv.0")
        norm(f"{ub}/ConvLayer_1/Norm2d_0", f"{tb}.conv2.conv.1")
    conv("out_conv/ConvLayer_0/Conv2d_0", "out_conv.conv.conv.0")
    norm("out_conv/ConvLayer_0/Norm2d_0", "out_conv.conv.conv.1", batch=True)
    return m


def import_recunet(variables, sd: Dict[str, np.ndarray], n_stages: int,
                   temporal: str = "lstm"):
    return _import_with_mapping(variables, sd,
                                recunet_mapping(n_stages, temporal))


def fpn_mapping(n_levels: int = 5) -> Dict[str, Tuple[str, object]]:
    """flax-path -> (torch-name, transform) for FPNConvLSTM (fpn.py:7-83)."""
    m: Dict[str, Tuple[str, object]] = {}
    ident = lambda a: a

    def conv(fp, tp):
        m[f"{fp}/kernel"] = (f"{tp}.weight", _conv_w)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)

    def norm(fp, tp):
        m[f"{fp}/scale"] = (f"{tp}.weight", ident)
        m[f"{fp}/bias"] = (f"{tp}.bias", ident)

    conv("inconv/ConvLayer_0/Conv2d_0", "inconv.conv.conv.0")
    norm("inconv/ConvLayer_0/Norm2d_0", "inconv.conv.conv.1")
    conv("inconv/ConvLayer_0/Conv2d_1", "inconv.conv.conv.3")
    norm("inconv/ConvLayer_0/Norm2d_1", "inconv.conv.conv.4")
    conv("pyramid/inconv", "pyramid.inconv")
    for i in range(n_levels - 1):
        conv(f"pyramid/dil{i}", f"pyramid.convs.{i}")
    conv("mid_conv/ConvLayer_0/Conv2d_0", "mid_conv.conv.conv.0")
    norm("mid_conv/ConvLayer_0/Norm2d_0", "mid_conv.conv.conv.1")
    m["convlstm/cell/gates/kernel"] = ("convlstm.cell_list.0.conv.weight",
                                       _conv_w)
    m["convlstm/cell/gates/bias"] = ("convlstm.cell_list.0.conv.bias", ident)
    conv("outconv", "outconv")
    return m


def import_fpn(variables, sd: Dict[str, np.ndarray], n_levels: int = 5):
    return _import_with_mapping(variables, sd, fpn_mapping(n_levels))


def import_uncrtaints(variables, sd: Dict[str, np.ndarray], cfg):
    """Map a reference state_dict into a flax variables dict. Returns the
    updated variables plus lists of (matched, missing) torch keys."""
    sd = normalize_legacy_keys(sd)
    return _import_with_mapping(variables, sd, uncrtaints_mapping(cfg))


def _mapping_for(cfg) -> Tuple[Dict[str, Tuple[str, object]], bool]:
    """(mapping, needs_legacy_rename) for the CLI-reachable model families.

    The reference CLI only ever writes unet/utae/uncrtaints checkpoints
    (model_utils.py:16-110 gates config.model to those three); the other
    importers in this module (unet3d/recunet/fpn) exist for the parity
    harness and take architecture args not derivable from a Config."""
    model = getattr(cfg, "model", "uncrtaints")
    if model == "uncrtaints":
        return uncrtaints_mapping(cfg), True
    if model == "unet":
        return unet_mapping(cfg), False
    if model == "utae":
        return utae_mapping(cfg), False
    raise ValueError(
        f"no PyTorch checkpoint importer for model={model!r}; reference "
        "CLI checkpoints exist only for unet/utae/uncrtaints")


def import_for_model(variables, sd: Dict[str, np.ndarray], cfg):
    """Dispatch the full (strict-shape) import on ``cfg.model``."""
    mapping, legacy = _mapping_for(cfg)
    if legacy:
        sd = normalize_legacy_keys(sd)
    return _import_with_mapping(variables, sd, mapping)


def import_params_partial(cfg, params, sd: Dict[str, np.ndarray]):
    """Partial-transfer import: map the reference state_dict onto a copy of
    ``params``, SKIPPING shape mismatches (the reference's size-mismatch
    filtering in load_model, model_utils.py:156-170). Returns
    (new_params, transferred) where ``transferred`` is the set of
    ``jax.tree_util.keystr`` paths actually filled — the caller freezes
    exactly those (minus the output head), never untransferred init values."""
    mapping, legacy = _mapping_for(cfg)
    if legacy:
        sd = normalize_legacy_keys(sd)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves, transferred = [], set()
    for kp, leaf in flat:
        ks = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in kp)
        ent = mapping.get(ks)
        if ent is not None and ent[0] in sd:
            arr = ent[1](sd[ent[0]]).astype(np.float32)
            if arr.shape == leaf.shape:
                leaves.append(jax.numpy.asarray(arr))
                transferred.add(jax.tree_util.keystr(kp))
                continue
        leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves), transferred


def _import_with_mapping(variables, sd, mapping):
    def keypath_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    matched, missing = [], []

    def fill(tree, prefix=""):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for kp, leaf in flat:
            ks = prefix + keypath_str(kp)
            if ks in mapping:
                tname, tf = mapping[ks]
                if tname in sd:
                    arr = tf(sd[tname]).astype(np.float32)
                    assert arr.shape == leaf.shape, \
                        f"{ks}: {arr.shape} vs {leaf.shape} (from {tname})"
                    leaves.append(jax.numpy.asarray(arr))
                    matched.append(tname)
                    continue
                missing.append(tname)
            leaves.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    new_params = fill(variables["params"])
    new_vars = dict(variables)
    new_vars["params"] = new_params
    if "batch_stats" in variables:
        new_vars["batch_stats"] = fill(variables["batch_stats"], prefix="B:")
    return new_vars, matched, missing
