"""Checkpoint conversion CLI: reference torch format ↔ daliid_tpu npz.

The reference trains and saves torch ``state_dict`` pickles
(``Person-ReID/mainKIT.py:165-170``); this framework's native format is a
flat npz of flax variables (``daliid_tpu/train/checkpoint.py``). This CLI
makes both directions one shell command so parity evaluations run the day
real checkpoints are mounted:

    # reference .h5/.pth → TPU npz
    python -m daliid_tpu.cli.export --model_name resnet50 \
        --input model_online_resnet50.h5 --output weights.npz

    # TPU-trained npz → reference-loadable state_dict pickle
    python -m daliid_tpu.cli.export --model_name resnet50 \
        --input weights.npz --output weights.pth

Direction is inferred from the file extensions (torch side accepts
.h5/.pth/.pt/.bin, all torch pickles). Converters cover the full zoo
(``models/torch_port.py``); torch itself is only needed to read/write the
pickles.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

TORCH_EXTS = (".h5", ".pth", ".pt", ".bin")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DaliID-TPU checkpoint conversion")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--img_height", type=int, default=256)
    p.add_argument("--img_width", type=int, default=128)
    p.add_argument("--num_classes", type=int, default=0)
    p.add_argument("--sie_cameras", type=int, default=0)
    return p


def main(args):
    from daliid_tpu.models import get_model
    from daliid_tpu.models.torch_port import (
        load_torch_checkpoint,
        variables_from_torch,
        variables_to_torch,
    )
    from daliid_tpu.train.checkpoint import load_variables, save_variables

    to_torch = args.output.lower().endswith(TORCH_EXTS)
    from_torch = args.input.lower().endswith(TORCH_EXTS)
    npz_in = args.input.lower().endswith(".npz")
    npz_out = args.output.lower().endswith(".npz")
    if not ((from_torch and npz_out) or (npz_in and to_torch)):
        raise SystemExit(
            f"exactly one side must be a torch pickle ({'/'.join(TORCH_EXTS)}) "
            f"and the other an .npz: got {args.input} -> {args.output}"
        )

    model_kw = {}
    if args.num_classes:
        model_kw["num_classes"] = args.num_classes
    if args.sie_cameras:
        model_kw["sie_cameras"] = args.sie_cameras
    bundle = get_model(
        args.model_name, jax.random.key(0),
        img_size=(args.img_height, args.img_width), dtype=jnp.float32, **model_kw,
    )

    if from_torch:
        variables = variables_from_torch(
            args.model_name, load_torch_checkpoint(args.input), module=bundle.module
        )
        save_variables(args.output, variables)
    else:
        import torch

        variables = load_variables(args.input, bundle.variables)
        sd = {k: torch.from_numpy(v.copy()) for k, v in
              variables_to_torch(args.model_name, variables, module=bundle.module).items()}
        torch.save(sd, args.output)
    print(f"converted {args.input} -> {args.output} ({args.model_name})")
    return args.output


if __name__ == "__main__":
    main(build_argparser().parse_args())
