"""Pretrained-weight fetching (ref: basicsr/utils/download_util.py).

This build environment has no network egress, so downloads resolve from a
local weight store first; when the file is absent and egress exists, the
torch-hub style URL fetch is used (import-gated). Checkpoints (.pth) load
through convert/torch_import either way.
"""

from __future__ import annotations

import os
from os import path as osp

WEIGHT_STORE = os.environ.get("SR_TPU_WEIGHT_STORE",
                              "./experiments/pretrained_models")


def load_file_from_url(url: str, model_dir: str | None = None,
                       progress: bool = True, file_name: str | None = None):
    """Resolve a weight URL to a local path (ref: download_util.py:69-96).

    Looks in model_dir (default: the local weight store) first; only then
    attempts a network fetch.
    """
    model_dir = model_dir or WEIGHT_STORE
    file_name = file_name or url.split("/")[-1].split("?")[0]
    cached = osp.abspath(osp.join(model_dir, file_name))
    if osp.exists(cached):
        return cached
    try:
        from urllib.request import urlretrieve

        os.makedirs(model_dir, exist_ok=True)
        urlretrieve(url, cached)
        return cached
    except Exception as e:
        raise FileNotFoundError(
            f"{file_name} not found in {model_dir} and no network egress to "
            f"fetch {url}; place the file in the weight store "
            f"(SR_TPU_WEIGHT_STORE).") from e


def download_file_from_google_drive(file_id: str, save_path: str):
    """(ref: download_util.py:11-38) — requires egress + requests."""
    import requests

    session = requests.Session()
    url = "https://docs.google.com/uc?export=download"
    response = session.get(url, params={"id": file_id}, stream=True)
    token = next((v for k, v in response.cookies.items()
                  if k.startswith("download_warning")), None)
    if token:
        response = session.get(url, params={"id": file_id, "confirm": token},
                               stream=True)
    with open(save_path, "wb") as f:
        for chunk in response.iter_content(32768):
            if chunk:
                f.write(chunk)
