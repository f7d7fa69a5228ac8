"""Benchmark: CenterNet DLA-34 ctdet 512x512 inference throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline: the "Objects as Points" paper's DLA-34 ctdet figure of ~52 FPS
(Titan Xp, 512x512) — the only published end-to-end number for this model
family (the fork publishes none; BASELINE.md).  The BASELINE.json north star
asks for >=2x an A100's img/s/chip; an A100 runs this model at roughly
2x the Titan Xp figure, so vs_baseline is reported against 104 img/s.
"""

import json
import time

import numpy as np

BASELINE_IMG_S = 104.0  # ~A100 img/s for ctdet DLA-34 512x512 (2x Titan Xp 52 FPS)
BATCH = 16
WARMUP = 3
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from detectron2_centernet_tpu.config import get_cfg
    from detectron2_centernet_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNet"
    cfg.MODEL.BACKBONE.NAME = "build_dla34_backbone"
    cfg.TPU.DTYPE = "bfloat16"
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), (512, 512))

    predict = jax.jit(model.predict_fn)
    images = jnp.asarray(
        np.random.RandomState(0).rand(BATCH, 512, 512, 3) * 255, jnp.float32
    )

    for _ in range(WARMUP):
        out = predict(variables, images)
    # block_until_ready is not a reliable fence on every PJRT transport
    # (the axon relay acks before execution completes); a host fetch is.
    float(np.asarray(out["scores"]).sum())

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = predict(variables, images)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - t0

    img_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "ctdet_dla34_512_infer_throughput",
                "value": round(img_s, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
