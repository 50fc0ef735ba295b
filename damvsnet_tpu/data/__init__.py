"""Dataset registry (parity: /root/reference/datasets/__init__.py:5-8).

find_dataset_def(name) -> MVSDataset class. Reference names are kept
("dtu_yao", "blendedmvs", "general_eval", "tnt_eval_trans") plus
"synthetic" for hermetic tests/benchmarks.
"""
from .common import collate, DataLoader
from .dtu import DTUTrainDataset
from .general_eval import GeneralEvalDataset
from .blendedmvs import BlendedMVSDataset
from .tnt_eval import TnTEvalDataset
from .synthetic import SyntheticDataset, make_synthetic_sample

_REGISTRY = {
    "dtu_yao": DTUTrainDataset,
    "dtu": DTUTrainDataset,
    "blendedmvs": BlendedMVSDataset,
    "general_eval": GeneralEvalDataset,
    "tnt_eval_trans": TnTEvalDataset,
    "synthetic": SyntheticDataset,
}


def find_dataset_def(name: str):
    return _REGISTRY[name]
