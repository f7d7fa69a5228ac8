"""detectron2_centernet_tpu — a TPU-native detection framework.

A brand-new JAX/XLA/Pallas re-design of the capability surface of
ShawnNew/Detectron2-CenterNet (a Detectron2 v0.2.1 fork adding a CenterNet
"Objects as Points" meta-architecture with DLA-34 / VoVNet / ResNet backbones).

Design pillars (see SURVEY.md §7):
  * functional models (flax.linen) with params-as-pytrees; one jitted
    ``train_step`` / ``predict_step`` instead of an object-oriented hot loop;
  * static shapes end-to-end: fixed train/eval resolutions, fixed-capacity
    object slots and detection slots with validity masks — no dynamic
    ``Instances`` until the host boundary;
  * NHWC layout and bfloat16-friendly compute so convolutions tile onto the
    MXU; deformable convolution expressed as blocked patch gathers + MXU
    contractions instead of CUDA im2col;
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding — cross-replica
    BatchNorm statistics come for free from XLA's global reductions;
  * the reference's public API names (``get_cfg``, ``build_model``,
    ``DatasetCatalog``, ``DefaultTrainer``, ``DefaultPredictor``,
    ``COCOEvaluator``) kept so its configs and workflows carry over.
"""

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax at package import)."""
    if name in ("get_cfg", "CfgNode"):
        from . import config

        return getattr(config, name)
    if name in ("DatasetCatalog", "MetadataCatalog"):
        from . import data

        return getattr(data, name)
    if name == "build_model":
        from . import models

        return models.build_model
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
