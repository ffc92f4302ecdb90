from mmvid_tpu.data.loader import DataLoader, infinite_batches
from mmvid_tpu.data.datasets import (
    TextImageDataset,
    TextVideoDataset,
    TextMP4Dataset,
    TextImageStackDataset,
)
from mmvid_tpu.data.vox import VoxDataset

__all__ = [
    'DataLoader', 'infinite_batches', 'TextImageDataset', 'TextVideoDataset',
    'TextMP4Dataset', 'TextImageStackDataset', 'VoxDataset',
]
