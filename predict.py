"""Single-image serving predictor (analog of the reference's Replicate/cog
predictor, ref: HAT/predict.py:10-50).

The reference shells out to hat/test.py per request; here the model loads
once and each predict() is a direct on-device tiled inference — no
subprocess, no filesystem round-trips beyond image IO.

Usage:
    python predict.py --model-config options/test/HAT_SRx4.yml \
        --input in.png --output out.png
"""

from __future__ import annotations

import argparse
from typing import Any

import numpy as np


class Predictor:
    def __init__(self, config_path: str, weights_path: str | None = None):
        from super_resolution_tpu.runtime import build_model
        from super_resolution_tpu.utils.options import process_options, yaml_load

        opt = yaml_load(config_path)
        if weights_path is not None:
            opt.setdefault("path", {})["pretrain_network_g"] = weights_path
        opt.setdefault("datasets", {})
        opt = process_options(opt, ".", is_train=False)
        self.model = build_model(opt)

    def predict(self, image_path: str, output_path: str) -> str:
        from super_resolution_tpu.utils.img import img2tensor, imread, imwrite, tensor2img

        lq = img2tensor(imread(image_path, float32=True))
        self.model.feed_data({"lq": lq[None]})
        self.model._run_inference()
        sr = tensor2img(np.asarray(self.model.output))
        imwrite(sr, output_path)
        return output_path


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-config", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", default="output.png")
    args = parser.parse_args()
    p = Predictor(args.model_config, args.weights)
    print(p.predict(args.input, args.output))
