"""Worker process for tests/test_multiprocess.py.

Runs the REAL multi-process path: ``engine.defaults.launch`` →
``jax.distributed.initialize`` (reference engine/launch.py:24-94 spawns
per-GPU workers + NCCL init; here each *host* process joins one global SPMD
mesh), then a short sharded train plus an evaluator-style
``comm.all_gather`` (reference utils/comm.py:139-219 pickled-object gather).

Usage: python tests/_mp_worker.py WORLD RANK PORT OUT_JSON
Environment must pin the CPU platform with 8/WORLD virtual devices per
process *before* interpreter start (see the parent test).
"""

import json
import sys


def _tiny_cfg():
    from detectron2_centernet_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_dla34_backbone"
    cfg.INPUT.TRAIN_SIZE = (64, 64)
    cfg.TPU.DTYPE = "float32"
    cfg.MODEL.CENTERNET.TASK.HM = 5
    cfg.MODEL.CENTERNET.LEVELS = [1, 1, 1, 1, 1, 1]
    cfg.MODEL.CENTERNET.CHANNELS = [4, 8, 8, 16, 16, 16]
    cfg.MODEL.CENTERNET.HEAD_CONV = 8
    cfg.MODEL.CENTERNET.MAX_OBJS = 8
    cfg.SOLVER.WARMUP_ITERS = 2
    return cfg


def _run(out_path: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from detectron2_centernet_tpu.engine.train_state import (
        create_train_state,
        make_train_step,
    )
    from detectron2_centernet_tpu.models import build_model
    from detectron2_centernet_tpu.parallel import comm, replicate, shard_batch

    results = {
        "world": comm.get_world_size(),
        "rank": comm.get_rank(),
        "n_global_devices": len(jax.devices()),
    }

    # --- sharded train: identical global batch on every process; the mesh
    # spans all global devices, XLA/gloo insert the cross-process psum.
    cfg = _tiny_cfg()
    model = build_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0))
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    step = make_train_step(model, tx, mesh)
    state = replicate(state, mesh)

    rng = np.random.RandomState(0)
    n = len(jax.devices())
    boxes = rng.rand(n, 8, 4).astype(np.float32) * 32
    boxes[..., 2:] = boxes[..., :2] + 16
    batch = shard_batch(
        {
            "image": jnp.asarray(rng.rand(n, 64, 64, 3) * 255, jnp.float32),
            "gt_boxes": jnp.asarray(boxes),
            "gt_classes": jnp.asarray(rng.randint(0, 5, (n, 8)), jnp.int32),
            "gt_valid": jnp.ones((n, 8), bool),
        },
        mesh,
    )
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    results["losses"] = losses

    # --- evaluator-style gather: per-rank prediction lists of DIFFERENT
    # byte sizes (exercises the padded-buffer path in comm.all_gather).
    rank = comm.get_rank()
    preds = [
        {"image_id": rank * 10 + i, "score": float(rank + i), "blob": "x" * (1 + rank * 4096)}
        for i in range(3)
    ]
    gathered = comm.all_gather(preds)
    merged = sorted(
        (p["image_id"] for rank_preds in gathered for p in rank_preds)
    )
    results["merged_ids"] = merged

    # --- gather(dst=0): non-dst ranks get []
    g0 = comm.gather({"r": rank}, dst=0)
    results["gather_len"] = len(g0)

    # --- reduce_dict mean across processes
    red = comm.reduce_dict({"a": float(rank + 1), "b": 2.0 * (rank + 1)})
    results["reduced"] = {k: float(v) for k, v in red.items()}

    # --- shared seed: identical on all ranks
    results["shared_seed"] = comm.shared_random_seed()

    comm.synchronize()
    with open(out_path, "w") as f:
        json.dump(results, f)


def main() -> None:
    world, rank, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    out_path = sys.argv[4]

    from detectron2_centernet_tpu.engine.defaults import launch

    launch(
        _run,
        num_machines=world,
        machine_rank=rank,
        dist_url=f"tcp://localhost:{port}" if world > 1 else "auto",
        args=(out_path,),
    )


if __name__ == "__main__":
    main()
