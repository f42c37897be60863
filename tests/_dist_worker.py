"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Run as: python _dist_worker.py <port> <process_id>

Exercises the multi-host layer with world_size=2 — the blind spot the
round-1 suite left (everything else runs world_size=1): init_distributed
(ref analog: basicsr/utils/dist_util.py:28-57), all_sum_across_processes,
and real process-sharded SRModel.dist_validation over a tiny in-memory
dataset.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


class _TinyDataset:
    """5 paired LQ/GT images, deterministic content."""

    def __init__(self):
        self.opt = {"name": "tiny_val"}
        rng = np.random.default_rng(7)
        self.items = []
        for i in range(5):
            lq = rng.random((12, 12, 3)).astype(np.float32)
            gt = rng.random((24, 24, 3)).astype(np.float32)
            self.items.append({"lq": lq, "gt": gt,
                               "lq_path": f"im_{i}.png"})

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        return dict(self.items[idx])


class _Loader:
    def __init__(self, dataset):
        self.dataset = dataset


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from super_resolution_tpu.parallel.mesh import (all_sum_across_processes,
                                                    init_distributed)

    rank, world = init_distributed()
    assert world == 2, f"world_size {world}, expected 2"
    assert rank == pid

    # metric reduction across processes
    totals = all_sum_across_processes({"x": float(rank + 1), "n": 1.0})
    assert abs(totals["x"] - 3.0) < 1e-9, totals
    assert totals["n"] == 2.0, totals

    # real process-sharded validation: each process evaluates its
    # [rank::world] slice; the reduced mean must equal the serial mean
    from super_resolution_tpu.runtime.sr_model import HATModel

    opt = {
        "name": "dist_t", "scale": 2, "is_train": False, "manual_seed": 0,
        "network_g": {"type": "HAT", "img_size": 16, "embed_dim": 16,
                      "depths": (1,), "num_heads": (2,), "window_size": 4,
                      "mlp_ratio": 2.0, "upscale": 2,
                      "upsampler": "pixelshuffle"},
        "path": {},
        "val": {"metrics": {"psnr": {"type": "calculate_psnr",
                                     "crop_border": 0}}},
    }
    model = HATModel(opt)
    ds = _TinyDataset()
    model.dist_validation(_Loader(ds), current_iter=1, tb_logger=None,
                          save_img=False)
    got = model.metric_results["psnr"]

    # serial expectation, computed identically on every process
    from super_resolution_tpu.metrics import calculate_metric
    from super_resolution_tpu.utils import tensor2img

    vals = []
    for i in range(len(ds)):
        item = ds[i]
        model.feed_data({"lq": item["lq"][None], "gt": item["gt"][None]})
        model._run_inference()
        vis = model.get_current_visuals()
        vals.append(calculate_metric(
            {"img": tensor2img(vis["result"]), "img2": tensor2img(vis["gt"])},
            opt["val"]["metrics"]["psnr"]))
    expected = float(np.mean(vals))
    # process_allgather rides f32 on this backend — tolerance accordingly
    assert abs(got - expected) < 1e-5, (got, expected)
    print(f"DIST_WORKER_OK rank={rank} psnr={got:.6f}")


if __name__ == "__main__":
    main()
