"""Registry-free folder inference with a built-in model zoo
(analog of HAT/ESC/scripts/inference.py:13-80).

Usage:
    python scripts/inference.py --model ESC --scale 4 \
        --weights esc_x4.pth --input ./lq_folder --output ./results
"""

from __future__ import annotations

import argparse
import os
from os import path as osp

import numpy as np

# model zoo: name -> (arch type, constructor kwargs builder)
MODEL_ZOO = {
    "ESC": lambda s: {"type": "ESC", "dim": 64, "pdim": 16, "kernel_size": 13,
                      "n_blocks": 5, "conv_blocks": 5, "window_size": 32,
                      "num_heads": 4, "upscaling_factor": s,
                      "exp_ratio": 1.25},
    "ESC-light": lambda s: {"type": "ESC", "dim": 64, "pdim": 16,
                            "kernel_size": 13, "n_blocks": 3,
                            "conv_blocks": 5, "window_size": 32,
                            "num_heads": 4, "upscaling_factor": s,
                            "exp_ratio": 1.25},
    "ESC-FP": lambda s: {"type": "ESCFP", "dim": 48, "pdim": 16,
                         "kernel_size": 13, "n_blocks": 5, "conv_blocks": 5,
                         "window_size": 32, "num_heads": 3,
                         "upscaling_factor": s, "exp_ratio": 1.25},
    "ESC-Real": lambda s: {"type": "ESCReal", "dim": 64, "pdim": 16,
                           "kernel_size": 13, "n_blocks": 10,
                           "conv_blocks": 5, "window_size": 32,
                           "num_heads": 4, "upscaling_factor": 4,
                           "exp_ratio": 2.0},
    "HAT": lambda s: {"type": "HAT", "img_size": 64, "embed_dim": 180,
                      "depths": [6] * 6, "num_heads": [6] * 6,
                      "window_size": 16, "mlp_ratio": 2, "upscale": s,
                      "upsampler": "pixelshuffle"},
    "HAT-S": lambda s: {"type": "HAT", "img_size": 64, "embed_dim": 144,
                        "depths": [6] * 6, "num_heads": [6] * 6,
                        "window_size": 16, "compress_ratio": 24,
                        "squeeze_factor": 24, "mlp_ratio": 2, "upscale": s,
                        "upsampler": "pixelshuffle"},
    "SwinIR": lambda s: {"type": "SwinIR", "img_size": 48, "embed_dim": 180,
                         "depths": [6] * 6, "num_heads": [6] * 6,
                         "window_size": 8, "upscale": s,
                         "upsampler": "pixelshuffle"},
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", choices=sorted(MODEL_ZOO), default="ESC")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--weights", default=None,
                        help="torch .pth or orbax checkpoint dir")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default="results")
    parser.add_argument("--tile", type=int, default=0,
                        help="tile size for large images (0 = whole image)")
    parser.add_argument("--tile-pad", type=int, default=32)
    args = parser.parse_args()

    from super_resolution_tpu.runtime import build_model
    from super_resolution_tpu.utils.img import img2tensor, imread, imwrite, tensor2img
    from super_resolution_tpu.utils.misc import scandir
    from super_resolution_tpu.utils.options import process_options

    opt = {
        "name": f"inference_{args.model}", "model_type": "HATModel",
        "scale": args.scale, "num_gpu": 1, "manual_seed": 0,
        "network_g": MODEL_ZOO[args.model](args.scale),
        "datasets": {},
        "path": {"pretrain_network_g": args.weights,
                 "param_key_g": "params_ema", "strict_load_g": True},
        "val": {},
    }
    if args.tile:
        opt["tile"] = {"tile_size": args.tile, "tile_pad": args.tile_pad}
    opt = process_options(opt, ".", is_train=False)
    model = build_model(opt)

    os.makedirs(args.output, exist_ok=True)
    names = sorted(scandir(args.input))
    for i, name in enumerate(names):
        lq = img2tensor(imread(osp.join(args.input, name), float32=True))
        model.feed_data({"lq": lq[None]})
        model._run_inference()
        sr = tensor2img(np.asarray(model.output))
        out_path = osp.join(args.output,
                            osp.splitext(name)[0] + f"_{args.model}.png")
        imwrite(sr, out_path)
        print(f"[{i + 1}/{len(names)}] {name} -> {out_path}")


if __name__ == "__main__":
    main()
