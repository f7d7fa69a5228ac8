#!/usr/bin/env python
"""CenterNet project CLI (parity shim for the fork's
``projects/CenterNet/train_net.py``).

In this framework CenterNet is a first-class meta-architecture — the project
entry point simply forwards to the canonical trainer with the ctdet configs
under ``configs/COCO-Detection/``.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.train_net import main  # noqa: E402
from detectron2_centernet_tpu.engine import default_argument_parser, launch  # noqa: E402

if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    launch(
        main,
        args.num_gpus,
        num_machines=args.num_machines,
        machine_rank=args.machine_rank,
        dist_url=args.dist_url,
        args=(args,),
    )
