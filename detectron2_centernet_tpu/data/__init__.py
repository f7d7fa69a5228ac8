from .build import (
    build_batch_iterator,
    build_detection_test_loader,
    build_detection_train_loader,
    get_detection_dataset_dicts,
)
from .catalog import DatasetCatalog, Metadata, MetadataCatalog
from .dataset_mapper import DatasetMapper
from .datasets import register_coco_instances
from .samplers import InferenceSampler, RepeatFactorTrainingSampler, TrainingSampler
from .datasets.builtin import register_builtin_datasets

register_builtin_datasets()

__all__ = [
    "DatasetCatalog",
    "DatasetMapper",
    "InferenceSampler",
    "Metadata",
    "MetadataCatalog",
    "RepeatFactorTrainingSampler",
    "TrainingSampler",
    "build_batch_iterator",
    "build_detection_test_loader",
    "build_detection_train_loader",
    "get_detection_dataset_dicts",
    "register_coco_instances",
]
