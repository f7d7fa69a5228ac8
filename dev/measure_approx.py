"""Measure the AP cost of documented approximations (PARITY.md deviations).

Two measurements, each on the synthetic training-acc tasks (the strongest
accuracy proxy available without COCO on disk — same substrate as the
measured 0.24 AP approx-decode delta, PARITY dev 10):

  roialign  ROIAlign ``sampling_ratio=0`` (adaptive) is approximated with a
            fixed 2x2 sample grid (PARITY dev 3).  Trains + evals the
            Mask R-CNN synth task at sampling_ratio 2 and 4 and reports the
            bbox/segm AP delta — the cost of the fixed-density grid vs a
            denser one.  (Reference adaptive mode: ceil(roi_size/out_size)
            samples/bin, ROIAlign_cuda.cu:60-83.)

  int8      Weight-only int8 PTQ (export/quantization.py, the TensorRT-int8
            analog).  Trains the ctdet synth task once, then evals the same
            trained state with f32 weights and with int8 quantize->
            dequantize weights; reports the AP delta.

Usage:  python dev/measure_approx.py [roialign] [int8]
        (no args = both; runs on whatever jax backend is available)
"""

import sys

sys.path.insert(0, ".")


def _train_and_test(cfg):
    from detectron2_centernet_tpu.data.datasets.synthetic import (
        ensure_synthetic_datasets,
    )
    from detectron2_centernet_tpu.engine import DefaultTrainer

    ensure_synthetic_datasets(tuple(cfg.DATASETS.TRAIN) + tuple(cfg.DATASETS.TEST))
    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=False)
    trainer.train()
    return trainer, DefaultTrainer.test(cfg, trainer)


def _load_acc_cfg(path, opts):
    import tempfile

    from detectron2_centernet_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(path)
    cfg.merge_from_list(
        ["TEST.EXPECTED_RESULTS", "[]", "OUTPUT_DIR",
         tempfile.mkdtemp(prefix="approx_")] + opts
    )
    cfg.freeze()
    return cfg


def measure_roialign():
    results = {}
    for s in (2, 4):
        cfg = _load_acc_cfg(
            "configs/quick_schedules/mask_rcnn_synth_training_acc_test.yaml",
            ["MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO", str(s)],
        )
        _, res = _train_and_test(cfg)
        r = next(iter(res.values())) if "bbox" not in res else res
        results[s] = {
            "bbox_AP": round(r["bbox"]["AP"], 2),
            "segm_AP": round(r["segm"]["AP"], 2),
        }
        print(f"[roialign] sampling_ratio={s}: {results[s]}", flush=True)
    d_box = results[2]["bbox_AP"] - results[4]["bbox_AP"]
    d_seg = results[2]["segm_AP"] - results[4]["segm_AP"]
    print(
        f"[roialign] RESULT fixed-2x2 vs 4x4: bbox {d_box:+.2f} AP, "
        f"segm {d_seg:+.2f} AP  ({results})",
        flush=True,
    )


def measure_int8():
    from detectron2_centernet_tpu.engine import DefaultTrainer
    from detectron2_centernet_tpu.export import (
        dequantize_variables,
        quantize_variables,
    )

    cfg = _load_acc_cfg(
        "configs/quick_schedules/ctdet_synth_training_acc_test.yaml", []
    )
    trainer, res_fp = _train_and_test(cfg)
    ap_fp = next(iter(res_fp.values()))["bbox"]["AP"] if "bbox" not in res_fp else res_fp["bbox"]["AP"]

    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    model = trainer.model
    model.variables = dequantize_variables(quantize_variables(variables))
    res_q = DefaultTrainer.test(cfg, model)
    ap_q = next(iter(res_q.values()))["bbox"]["AP"] if "bbox" not in res_q else res_q["bbox"]["AP"]
    print(
        f"[int8] RESULT f32 {ap_fp:.2f} AP -> int8-PTQ {ap_q:.2f} AP "
        f"(delta {ap_fp - ap_q:+.2f})",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["roialign", "int8"]
    if "roialign" in which:
        measure_roialign()
    if "int8" in which:
        measure_int8()
