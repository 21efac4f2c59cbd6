from daliid_tpu.data.registry import (
    ReidTable,
    load_dataset,
    load_multiple_datasets,
    dataset_statistics,
    register_dataset,
    parse_market_duke_dir,
    parse_msmt17_list,
    parse_veri_dir,
    parse_veri_wild_list,
    parse_deepchange_list,
    parse_manifest,
)
from daliid_tpu.data.turbulence import turbulence_path
from daliid_tpu.data.synthetic import make_synthetic_dataset

__all__ = [
    "ReidTable",
    "load_dataset",
    "load_multiple_datasets",
    "dataset_statistics",
    "register_dataset",
    "parse_market_duke_dir",
    "parse_msmt17_list",
    "parse_veri_dir",
    "parse_veri_wild_list",
    "parse_deepchange_list",
    "parse_manifest",
    "turbulence_path",
    "make_synthetic_dataset",
]
