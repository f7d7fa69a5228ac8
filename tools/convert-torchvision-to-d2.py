#!/usr/bin/env python
"""Convert a torchvision ResNet checkpoint for use with this framework
(reference ``tools/convert-torchvision-to-d2.py``).

Usage:
  # download one of the ResNet{18,34,50,101,152} models from torchvision:
  wget https://download.pytorch.org/models/resnet50-19c8e357.pth -O r50.pth
  # run the conversion
  ./convert-torchvision-to-d2.py r50.pth r50.pkl

  # Then use r50.pkl with the following config changes:

MODEL:
  WEIGHTS: "/path/to/r50.pkl"
  PIXEL_MEAN: [123.675, 116.280, 103.530]
  PIXEL_STD: [58.395, 57.120, 57.375]
  RESNETS:
    DEPTH: 50
    STRIDE_IN_1X1: False
INPUT:
  FORMAT: "RGB"

The output .pkl holds a detectron2-style {name: ndarray} dict; the
checkpointer's torch importer (``checkpoint/torch_import.py``) aligns it
into the flax ResNet at load time (tested by ``tests/parity``), so the
renaming only needs to produce the reference naming scheme.
"""

import pickle as pkl
import sys

import numpy as np


def convert(obj):
    """torchvision state_dict -> detectron2-style names (reference :33-56)."""
    newmodel = {}
    for k in list(obj.keys()):
        old_k = k
        if "layer" not in k:
            k = "stem." + k
        for t in [1, 2, 3, 4]:
            k = k.replace(f"layer{t}", f"res{t + 1}")
        for t in [1, 2, 3]:
            k = k.replace(f"bn{t}", f"conv{t}.norm")
        k = k.replace("downsample.0", "shortcut")
        k = k.replace("downsample.1", "shortcut.norm")
        print(old_k, "->", k)
        arr = obj[old_k]
        if hasattr(arr, "numpy"):
            arr = arr.detach().numpy()
        newmodel[k] = np.asarray(arr)
    return newmodel


def main():
    import torch

    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    obj = torch.load(sys.argv[1], map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    res = {
        "model": convert(obj),
        "__author__": "torchvision",
        "matching_heuristics": True,
    }
    with open(sys.argv[2], "wb") as f:
        pkl.dump(res, f)


if __name__ == "__main__":
    main()
