"""Torch-checkpoint porting: reference state_dicts → flax variables.

The reference saves plain ``state_dict`` files from ``nn.DataParallel``-
wrapped models (``Person-ReID/mainKIT.py:169-170``), so keys carry a
``module.`` prefix and follow torchvision naming
(``conv1.weight``, ``layer3.2.bn1.running_mean``, ``last_bn.weight`` — the
wrapper structure at ``Encoders.py:306-351``). This converter lets trained
reference checkpoints (and ImageNet torchvision weights) run on the TPU
stack:

- conv kernels transpose OIHW → HWIO (NHWC layout);
- BatchNorm weight/bias → scale/bias in ``params``; running_mean/var →
  mean/var in ``batch_stats``;
- dense kernels transpose (out, in) → (in, out).

Works on any mapping of str → array-like (a real ``torch.load`` result or a
numpy dict), so torch is only needed to read ``.h5``/``.pth`` pickles.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_module_prefix(state_dict: Mapping[str, object]) -> Dict[str, object]:
    """Drop DataParallel's ``module.`` key prefix (present in all reference
    checkpoints, ``Encoders.py:39-40``)."""
    return {k[len("module."):] if k.startswith("module.") else k: v for k, v in state_dict.items()}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-pickled state_dict into numpy arrays."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_numpy(v) for k, v in strip_module_prefix(sd).items()}


def _conv(sd, key):
    return _to_numpy(sd[key + ".weight"]).transpose(2, 3, 1, 0)


def _bn_params(sd, key):
    return {"scale": _to_numpy(sd[key + ".weight"]), "bias": _to_numpy(sd[key + ".bias"])}


def _bn_stats(sd, key):
    return {"mean": _to_numpy(sd[key + ".running_mean"]), "var": _to_numpy(sd[key + ".running_var"])}


def resnet50_reid_from_torch(state_dict: Mapping[str, object], stage_sizes=(3, 4, 6, 3)):
    """torch ``ResNet50ReID`` state_dict → flax ``{'params', 'batch_stats'}``.

    Key scheme follows the reference wrapper (``Encoders.py:306-351``):
    ``conv1 / bn1 / layer{1-4}.{i}.{conv,bn}{1-3} / layer*.0.downsample.{0,1}
    / last_bn``. Raises ``KeyError`` on missing keys so a mismatched
    checkpoint fails loudly.
    """
    sd = strip_module_prefix(dict(state_dict))
    params: Dict[str, object] = {
        "conv1": {"kernel": _conv(sd, "conv1")},
        "bn1": _bn_params(sd, "bn1"),
        "last_bn": _bn_params(sd, "last_bn"),
    }
    stats: Dict[str, object] = {
        "bn1": _bn_stats(sd, "bn1"),
        "last_bn": _bn_stats(sd, "last_bn"),
    }
    for stage, num_blocks in enumerate(stage_sizes, start=1):
        for b in range(num_blocks):
            t = f"layer{stage}.{b}"
            f = f"layer{stage}_{b}"
            p = {
                "conv1": {"kernel": _conv(sd, f"{t}.conv1")},
                "bn1": _bn_params(sd, f"{t}.bn1"),
                "conv2": {"kernel": _conv(sd, f"{t}.conv2")},
                "bn2": _bn_params(sd, f"{t}.bn2"),
                "conv3": {"kernel": _conv(sd, f"{t}.conv3")},
                "bn3": _bn_params(sd, f"{t}.bn3"),
            }
            s = {
                "bn1": _bn_stats(sd, f"{t}.bn1"),
                "bn2": _bn_stats(sd, f"{t}.bn2"),
                "bn3": _bn_stats(sd, f"{t}.bn3"),
            }
            if f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {"kernel": _conv(sd, f"{t}.downsample.0")}
                p["downsample_bn"] = _bn_params(sd, f"{t}.downsample.1")
                s["downsample_bn"] = _bn_stats(sd, f"{t}.downsample.1")
            params[f] = p
            stats[f] = s
    return {"params": params, "batch_stats": stats}


def resnet50_reid_to_torch_keys(variables) -> Dict[str, np.ndarray]:
    """Inverse mapping (flax → torch-style keys), used for round-trip tests
    and for exporting TPU-trained weights back to the reference format."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: Dict[str, np.ndarray] = {}

    def put_conv(tk, leaf):
        out[tk + ".weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)

    def put_bn(tk, p, s):
        out[tk + ".weight"] = np.asarray(p["scale"])
        out[tk + ".bias"] = np.asarray(p["bias"])
        out[tk + ".running_mean"] = np.asarray(s["mean"])
        out[tk + ".running_var"] = np.asarray(s["var"])

    put_conv("conv1", params["conv1"])
    put_bn("bn1", params["bn1"], stats["bn1"])
    put_bn("last_bn", params["last_bn"], stats["last_bn"])
    for name, p in params.items():
        if not name.startswith("layer"):
            continue
        stage, b = name[len("layer"):].split("_")
        t = f"layer{stage}.{b}"
        for ci in ("conv1", "conv2", "conv3"):
            put_conv(f"{t}.{ci}", p[ci])
        for bi in ("bn1", "bn2", "bn3"):
            put_bn(f"{t}.{bi}", p[bi], stats[name][bi])
        if "downsample_conv" in p:
            put_conv(f"{t}.downsample.0", p["downsample_conv"])
            put_bn(f"{t}.downsample.1", p["downsample_bn"], stats[name]["downsample_bn"])
    return out
