"""Import reference (PyTorch) GPS-Gaussian checkpoints into flax params.

Maps the reference's `RtStereoHumanModel` state_dict (train_stage2.py saves
{'network': state_dict, ...}) onto this framework's parameter pytree, so
users can switch frameworks without retraining.  Layout transforms:
torch conv (O, I, kH, kW) -> flax (kH, kW, I, O); GroupNorm affine direct.

The channel-order conventions (concat orders, corr tap order, upsample mask
[9, fy, fx] packing, context z/r/q split) are identical by construction and
covered by tests/test_torch_parity.py + test_reference_import.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w, b=None):
    out = {"kernel": np.asarray(w).transpose(2, 3, 1, 0)}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _gn(w, b):
    return {"GroupNorm_0": {"scale": np.asarray(w), "bias": np.asarray(b)}}


def _res_block(sd, p):
    """Reference ResidualBlock (core/extractor.py:6-60) -> our ResidualBlock."""
    out = {
        "conv1": {"Conv_0": _conv(sd[f"{p}.conv1.weight"],
                                  sd[f"{p}.conv1.bias"])},
        "conv2": {"Conv_0": _conv(sd[f"{p}.conv2.weight"],
                                  sd[f"{p}.conv2.bias"])},
        "GroupNorm32_0": _gn(sd[f"{p}.norm1.weight"], sd[f"{p}.norm1.bias"]),
        "GroupNorm32_1": _gn(sd[f"{p}.norm2.weight"], sd[f"{p}.norm2.bias"]),
    }
    if f"{p}.downsample.0.weight" in sd:
        out["downsample"] = {"Conv_0": _conv(sd[f"{p}.downsample.0.weight"],
                                             sd[f"{p}.downsample.0.bias"])}
        out["GroupNorm32_2"] = _gn(sd[f"{p}.norm3.weight"],
                                   sd[f"{p}.norm3.bias"])
    return out


def _unet(sd, p):
    """Reference UnetExtractor (core/extractor.py:63-91)."""
    return {
        "in_conv": {"Conv_0": _conv(sd[f"{p}.in_ds.0.weight"],
                                    sd[f"{p}.in_ds.0.bias"])},
        "GroupNorm32_0": _gn(sd[f"{p}.in_ds.1.weight"],
                             sd[f"{p}.in_ds.1.bias"]),
        "res1a": _res_block(sd, f"{p}.res1.0"),
        "res1b": _res_block(sd, f"{p}.res1.1"),
        "res2a": _res_block(sd, f"{p}.res2.0"),
        "res2b": _res_block(sd, f"{p}.res2.1"),
        "res3a": _res_block(sd, f"{p}.res3.0"),
        "res3b": _res_block(sd, f"{p}.res3.1"),
    }


def _seq_head(sd, p):
    """conv3x3 -> relu -> conv1x1 heads (gs_parm_network.py:34-50)."""
    return ({"Conv_0": _conv(sd[f"{p}.0.weight"], sd[f"{p}.0.bias"])},
            {"Conv_0": _conv(sd[f"{p}.2.weight"], sd[f"{p}.2.bias"])})


def convert_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Reference RtStereoHumanModel state_dict -> flax params dict."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {}

    params["img_encoder"] = _unet(sd, "img_encoder")

    cnet = {
        "feat_res": _res_block(sd, "raft_stereo.cnet.conv2.0"),
        "feat_out": {"Conv_0": _conv(sd["raft_stereo.cnet.conv2.1.weight"],
                                     sd["raft_stereo.cnet.conv2.1.bias"])},
        "hidden_res": _res_block(sd, "raft_stereo.cnet.outputs08.0.0"),
        "hidden_out": {"Conv_0": _conv(
            sd["raft_stereo.cnet.outputs08.0.1.weight"],
            sd["raft_stereo.cnet.outputs08.0.1.bias"])},
        "context_res": _res_block(sd, "raft_stereo.cnet.outputs08.1.0"),
        "context_out": {"Conv_0": _conv(
            sd["raft_stereo.cnet.outputs08.1.1.weight"],
            sd["raft_stereo.cnet.outputs08.1.1.bias"])},
    }

    ub = "raft_stereo.update_module.update_block"
    update_block = {
        "encoder": {name: {"Conv_0": _conv(sd[f"{ub}.encoder.{name}.weight"],
                                           sd[f"{ub}.encoder.{name}.bias"])}
                    for name in ("convc1", "convc2", "convf1", "convf2",
                                 "conv")},
        "gru08": {name: {"Conv_0": _conv(sd[f"{ub}.gru08.{name}.weight"],
                                         sd[f"{ub}.gru08.{name}.bias"])}
                  for name in ("convz", "convr", "convq")},
        "flow_head": {
            "conv1": {"Conv_0": _conv(sd[f"{ub}.flow_head.conv1.weight"],
                                      sd[f"{ub}.flow_head.conv1.bias"])},
            "conv2": {"Conv_0": _conv(sd[f"{ub}.flow_head.conv2.weight"],
                                      sd[f"{ub}.flow_head.conv2.bias"])},
        },
        "mask_conv1": {"Conv_0": _conv(sd[f"{ub}.mask.0.weight"],
                                       sd[f"{ub}.mask.0.bias"])},
        "mask_conv2": {"Conv_0": _conv(sd[f"{ub}.mask.2.weight"],
                                       sd[f"{ub}.mask.2.bias"])},
    }

    params["raft_stereo"] = {
        "cnet": cnet,
        "context_zqr": {"Conv_0": _conv(
            sd["raft_stereo.context_zqr_convs.0.weight"],
            sd["raft_stereo.context_zqr_convs.0.bias"])},
        "update_block": update_block,
    }

    if "gs_parm_regresser.depth_encoder.in_ds.0.weight" in sd:
        g = "gs_parm_regresser"
        gs = {"depth_encoder": _unet(sd, f"{g}.depth_encoder")}
        for ours, theirs in (("dec3a", "decoder3.0"), ("dec3b", "decoder3.1"),
                             ("dec2a", "decoder2.0"), ("dec2b", "decoder2.1"),
                             ("dec1a", "decoder1.0"), ("dec1b", "decoder1.1")):
            gs[ours] = _res_block(sd, f"{g}.{theirs}")
        gs["out_conv"] = {"Conv_0": _conv(sd[f"{g}.out_conv.weight"],
                                          sd[f"{g}.out_conv.bias"])}
        # the three per-head 3x3 convs fuse into one head_conv1 in our
        # gsnet (models/gsnet.py): concatenate their kernels/biases along
        # the output-channel axis in [rot, scale, opacity] order
        h1_kernels, h1_biases = [], []
        for head, ours2 in (("rot_head", "rot_conv2"),
                            ("scale_head", "scale_conv2"),
                            ("opacity_head", "opacity_conv2")):
            a, b = _seq_head(sd, f"{g}.{head}")
            h1_kernels.append(a["Conv_0"]["kernel"])
            h1_biases.append(a["Conv_0"]["bias"])
            gs[ours2] = b
        gs["head_conv1"] = {"Conv_0": {
            "kernel": np.concatenate(h1_kernels, axis=-1),
            "bias": np.concatenate(h1_biases, axis=-1)}}
        params["gs_regresser"] = gs

    return {"params": params}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference .pth (as saved by train_stage*.py: key 'network')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("network", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_state_dict(sd)
